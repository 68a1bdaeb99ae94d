"""Minimal TensorBoard event-file writer (no tensorboard dependency).

The reference logs training scalars through AllenNLP's
`log_to_tensorboard` callback (summary_interval 512,
/root/reference/expt/nytimes/9_transformer_objects/config.yaml:163-166).
This module writes the same artifact — `events.out.tfevents.*` files a
stock TensorBoard can load — by emitting the TFRecord framing and the
Event/Summary protobuf wire format directly (~scalars only, which is all
the reference ever logged). Pure stdlib: no tensorboard/tensorflow import,
no protobuf runtime.

File format (TFRecord): for each record
    uint64 length (LE) | uint32 masked_crc32c(length bytes) |
    data bytes         | uint32 masked_crc32c(data)
where crc32c is the Castagnoli CRC and masking is TensorFlow's
rot-right-15 + 0xa282ead8.

Proto wire layout used (field numbers from tensorflow/core/util/event.proto
and framework/summary.proto):
    Event   { 1: double wall_time; 2: int64 step;
              3: bytes file_version; 5: Summary summary }
    Summary { 1: repeated Value }
    Value   { 1: string tag; 2: float simple_value }
"""
from __future__ import annotations

import os
import socket
import struct
import time

# -- crc32c (Castagnoli, reflected poly 0x82F63B78) -------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- protobuf wire encoding --------------------------------------------------

def _varint(n: int) -> bytes:
    if n < 0:
        # proto wire rule: negatives are 10-byte two's-complement varints;
        # nothing we encode (steps, lengths, field keys) is ever negative,
        # and Python's arithmetic >> would loop forever on -1
        raise ValueError(f"negative varint: {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_bytes(num: int, payload: bytes) -> bytes:
    return _varint(num << 3 | 2) + _varint(len(payload)) + payload


def _encode_event(wall_time: float, step: int | None = None,
                  file_version: str | None = None,
                  scalars: dict[str, float] | None = None) -> bytes:
    ev = _varint(1 << 3 | 1) + struct.pack("<d", wall_time)
    if step is not None:
        ev += _varint(2 << 3 | 0) + _varint(step)
    if file_version is not None:
        ev += _field_bytes(3, file_version.encode())
    if scalars:
        summary = b"".join(
            _field_bytes(1, _field_bytes(1, tag.encode())
                         + _varint(2 << 3 | 5) + struct.pack("<f", val))
            for tag, val in scalars.items())
        ev += _field_bytes(5, summary)
    return ev


class TensorBoardWriter:
    """Append-only scalar writer; one events file per instance.

    Usage mirrors the slice of SummaryWriter the reference callback used:
        w = TensorBoardWriter(logdir); w.add_scalar("loss", 0.5, step=10)
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        name = (f"events.out.tfevents.{int(time.time())}."
                f"{socket.gethostname()}.{os.getpid()}")
        self.path = os.path.join(logdir, name)
        self._f = open(self.path, "ab")
        self._write_record(_encode_event(time.time(),
                                         file_version="brain.Event:2"))

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: float | None = None) -> None:
        self.add_scalars({tag: value}, step, wall_time)

    def add_scalars(self, scalars: dict[str, float], step: int,
                    wall_time: float | None = None) -> None:
        """One Event carrying every tag (one record per logging call)."""
        import numbers
        clean = {t: float(v) for t, v in scalars.items()
                 if isinstance(v, numbers.Real) and v == v}  # drop NaN/str
        # numbers.Real admits numpy float32/bfloat16 scalars, which a plain
        # (int, float) isinstance silently dropped
        if not clean:
            return
        self._write_record(_encode_event(
            wall_time if wall_time is not None else time.time(),
            step=step, scalars=clean))
        self._f.flush()

    def close(self) -> None:
        self._f.close()
