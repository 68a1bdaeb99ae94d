"""Test configuration: force an 8-device virtual CPU mesh.

The reference has no multi-device tests at all (SURVEY.md §4); we test every
sharded code path on a virtual CPU mesh so multi-chip code is validated
without a TPU pod.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session presets JAX_PLATFORMS=axon (one real TPU chip) via an
# .axon_site sitecustomize that re-exports the env var, so the env alone is
# not enough — jax.config.update below is authoritative. Tests always run on
# the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Parity tests compare against fp32 numpy references; disable the bf16-speed
# default matmul precision for the test session only.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# ---------------------------------------------------------------------------
# Fast gate: `pytest -m "not slow"` (< 5 min) for iteration; the default
# invocation still runs everything. Slow tests (>= ~10 s on the reference
# box) are listed in tests/slow_tests.txt — regenerate candidates with
# `pytest --durations=150` and keep the manifest sorted. Literal
# @pytest.mark.slow decorations work too.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "slow_tests.txt")


def _load_slow_set():
    try:
        with open(_SLOW_MANIFEST) as f:
            return {line.strip() for line in f
                    if line.strip() and not line.startswith("#")}
    except OSError:  # pragma: no cover
        return set()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: excluded from the fast gate (-m 'not slow')")


def pytest_collection_modifyitems(config, items):
    slow = _load_slow_set()
    if not slow:
        return
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        if base in slow:
            item.add_marker(pytest.mark.slow)
