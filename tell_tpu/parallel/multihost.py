"""Multi-host (DCN) support.

The reference is strictly single-host (SURVEY.md §2.10: torch DataParallel
+ ZeroMQ between processes on one machine). On TPU pods the second tier of
scale-out is multi-process: each host owns its local chips, JAX's
distributed runtime stitches them into one global device list, and XLA
routes collectives over ICI within a slice and DCN across slices. This
module is the thin layer that makes the existing mesh/trainer code
multi-process-correct:

* `init_multihost` — bring up the JAX distributed runtime (gRPC
  coordination service on process 0).
* `place_global_batch` — the multi-process replacement for
  `jax.device_put(batch, batch_sharding(mesh, batch))`: each process holds
  only its LOCAL slice of the global batch (its own loader shard), and
  `jax.make_array_from_process_local_data` assembles the global array view
  without any cross-host data movement.
* `is_primary` — guard for host-side artifacts (metrics.jsonl, tfevents)
  that must be written once, not once per process.

Validated by tests/test_multihost.py: two coordinated CPU processes x 4
virtual devices each run a sharded loss+grad over an 8-device global mesh
and must agree bit-for-bit with the single-process reference.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_initialized = False


def init_multihost(coordinator: str, num_processes: int,
                   process_id: int) -> None:
    """Start the JAX distributed runtime (idempotent per process).

    coordinator: "host:port" of process 0's coordination service. After
    this, jax.devices() is GLOBAL (all hosts' chips) and
    jax.local_devices() is this host's subset; make_mesh() therefore
    builds a global mesh with no further changes. Must run before ANY
    call that touches the XLA backend (jax.devices, device_put, ...) —
    which is why the idempotency guard is a module flag, not a
    jax.process_count() probe (that call would itself initialize the
    backend).
    """
    global _initialized
    if _initialized:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def is_primary() -> bool:
    return jax.process_index() == 0


def global_any(flag: bool) -> bool:
    """Cross-process OR of a host-local bool (single-process: identity).

    The trainer uses this to agree on preemption stops: a SIGTERM lands on
    ONE host, and if only that host broke out of the batch loop the others
    would hang in their next collective while it hangs in the checkpoint
    barrier. Every process must call this at the same point in its batch
    schedule.
    """
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    flags = multihost_utils.process_allgather(np.asarray(bool(flag)))
    return bool(np.asarray(flags).any())


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def place_global_batch(mesh: Mesh, batch: dict):
    """Assemble per-process local batch leaves into global arrays sharded
    over the mesh "data" axis.

    Each leaf's leading dim is this process's LOCAL batch; the global
    leading dim is local * process_count. Works single-process too (where
    it degenerates to a plain sharded device_put), so callers don't need
    to branch.
    """
    def f(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        spec = P("data", *([None] * (leaf.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), leaf)
    return jax.tree.map(f, batch)
