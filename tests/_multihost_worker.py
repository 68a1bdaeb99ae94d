"""Worker for tests/test_multihost.py: one of N coordinated CPU processes.

Brings up the JAX distributed runtime, builds a global ("data","model")
mesh spanning both processes' virtual devices, places a process-local
batch shard into a global array, and runs a jitted loss+grad whose
collectives cross the process boundary (the DCN analogue). Prints one
JSON line the parent compares across processes and against a numpy
reference.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    coordinator, num_procs, pid = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]))
    import jax
    import jax.numpy as jnp
    from tell_tpu.parallel import (barrier, global_any, init_multihost,
                                   is_primary, make_mesh,
                                   place_global_batch, shard_params)

    init_multihost(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs
    assert (pid == 0) == is_primary()
    n_local = len(jax.local_devices())
    n_global = jax.device_count()
    assert n_global == num_procs * n_local

    mesh = make_mesh(n_data=n_global // 2, n_model=2)

    # deterministic global data; each process contributes its own rows
    B, D = 16, 8
    x = np.arange(B * D, dtype=np.float32).reshape(B, D) / (B * D)
    y = np.sin(np.arange(B, dtype=np.float32))[:, None]
    lo, hi = pid * (B // num_procs), (pid + 1) * (B // num_procs)
    batch = place_global_batch(mesh, {"x": x[lo:hi], "y": y[lo:hi]})

    # params go through the shared sharding rules (replicated here)
    params = shard_params({"w": jnp.ones((D, 1)) * 0.1}, mesh)

    def loss_fn(p, b):
        pred = b["x"] @ p["w"]
        return jnp.mean((pred - b["y"]) ** 2)

    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, batch)
    out = {"pid": pid, "loss": float(loss),
           "gnorm": float(jnp.linalg.norm(grads["w"]))}

    # numpy reference over the FULL batch: the sharded program must see
    # all rows, not just the local shard
    ref_pred = x @ (np.ones((D, 1), np.float32) * 0.1)
    ref_loss = float(np.mean((ref_pred - y) ** 2))
    out["ref_loss"] = ref_loss

    # preemption-stop primitives: a flag raised on ONE process must be
    # seen by all (trainer._check_stop), and barrier() must not hang
    assert global_any(False) is False
    out["global_any"] = global_any(pid == 1)
    barrier("worker-done")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
