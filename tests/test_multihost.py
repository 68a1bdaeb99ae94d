"""Multi-host (DCN) smoke tests.

The reference never crosses a host boundary (SURVEY.md §2.10). Here two
coordinated CPU processes (4 virtual devices each) must agree bit-for-bit
on a loss whose mesh spans both — the collectives cross the process
boundary exactly as they would cross DCN between pod slices.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_agrees_with_reference():
    # bounded by communicate(timeout=540) below, not pytest-timeout
    # (plugin not in the image)
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in subprocesses
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    worker = os.path.join(ROOT, "tests", "_multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, f"127.0.0.1:{port}", "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        outs.append(json.loads(stdout.strip().splitlines()[-1]))

    by_pid = {o["pid"] for o in outs}
    assert by_pid == {0, 1}
    # both processes computed the identical global loss...
    assert outs[0]["loss"] == outs[1]["loss"]
    assert outs[0]["gnorm"] == outs[1]["gnorm"]
    # ...and it equals the full-batch numpy reference (i.e. the program saw
    # every process's rows, not only the local shard)
    np.testing.assert_allclose(outs[0]["loss"], outs[0]["ref_loss"],
                               rtol=1e-6)
    # preemption flag raised on process 1 reached both (trainer stop path)
    assert all(o["global_any"] is True for o in outs)


def test_place_global_batch_single_process():
    """Degenerate (1-process) path: place_global_batch must equal a plain
    sharded device_put so callers never branch."""
    import jax
    from tell_tpu.parallel import make_mesh, place_global_batch

    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    b = {"x": np.arange(32, dtype=np.float32).reshape(8, 4),
         "n": np.float32(3.0)}
    placed = place_global_batch(mesh, b)
    np.testing.assert_array_equal(np.asarray(placed["x"]), b["x"])
    assert placed["x"].sharding.spec == jax.sharding.PartitionSpec(
        "data", None)
    np.testing.assert_array_equal(np.asarray(placed["n"]), 3.0)
