"""TensorBoard event-writer tests: the reference's log_to_tensorboard
callback (expt config.yaml:163-166) writes scalar summaries; ours must emit
events files a stock TensorBoard can parse. Verified with an independent
TFRecord + protobuf-wire decoder and a crc32c known-answer vector."""
import glob
import struct

from tell_tpu.training.tensorboard import (TensorBoardWriter, _crc32c,
                                           _masked_crc)


def test_crc32c_known_answer():
    # RFC 3720 / standard Castagnoli test vector
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0


def _parse_fields(buf):
    """Generic protobuf wire walk -> list of (field_num, wire, value)."""
    out, off = [], 0
    while off < len(buf):
        key, shift = 0, 0
        while True:
            b = buf[off]
            off += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, shift = 0, 0
            while True:
                b = buf[off]
                off += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:  # 64-bit
            (val,) = struct.unpack("<d", buf[off:off + 8])
            off += 8
        elif wire == 2:  # length-delimited
            ln, shift = 0, 0
            while True:
                b = buf[off]
                off += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = buf[off:off + ln]
            off += ln
        elif wire == 5:  # 32-bit
            (val,) = struct.unpack("<f", buf[off:off + 4])
            off += 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        out.append((field, wire, val))
    return out


def read_events(path):
    """Decode a tfevents file -> [{wall_time, step, file_version, scalars}].

    Checks every record's length and data CRCs (the crc32c implementation
    itself is anchored by test_crc32c_known_answer)."""
    with open(path, "rb") as f:
        data = f.read()
    events, off = [], 0
    while off < len(data):
        header = data[off:off + 8]
        (ln,) = struct.unpack("<Q", header)
        (hc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert hc == _masked_crc(header), "length crc mismatch"
        rec = data[off + 12:off + 12 + ln]
        (dc,) = struct.unpack("<I", data[off + 12 + ln:off + 16 + ln])
        assert dc == _masked_crc(rec), "data crc mismatch"
        off += 16 + ln

        ev = {"scalars": {}}
        for field, _wire, val in _parse_fields(rec):
            if field == 1:
                ev["wall_time"] = val
            elif field == 2:
                ev["step"] = val
            elif field == 3:
                ev["file_version"] = val.decode()
            elif field == 5:
                for f1, _w, value_buf in _parse_fields(val):
                    assert f1 == 1
                    tag, sv = None, None
                    for vf, _vw, vv in _parse_fields(value_buf):
                        if vf == 1:
                            tag = vv.decode()
                        elif vf == 2:
                            sv = vv
                    ev["scalars"][tag] = sv
        events.append(ev)
    return events


def test_writer_roundtrip(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.add_scalar("train/loss", 2.5, step=512)
    w.add_scalars({"epoch/loss": 1.25, "epoch/val_loss": 1.5,
                   "epoch/skipped": 0}, step=1024)
    w.add_scalars({"bad": float("nan"), "note": "str"}, step=3)  # all dropped
    w.close()

    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    evs = read_events(path)
    assert evs[0]["file_version"] == "brain.Event:2"
    assert evs[1]["step"] == 512
    assert abs(evs[1]["scalars"]["train/loss"] - 2.5) < 1e-6
    assert evs[2]["step"] == 1024
    assert abs(evs[2]["scalars"]["epoch/loss"] - 1.25) < 1e-6
    assert abs(evs[2]["scalars"]["epoch/val_loss"] - 1.5) < 1e-6
    assert evs[2]["scalars"]["epoch/skipped"] == 0.0
    assert len(evs) == 3  # NaN/str-only call wrote nothing
    assert all(ev["wall_time"] > 1e9 for ev in evs)
