"""Kernel dispatch policy.

TELL_TPU_FUSED env var:
  "auto" (default) — use Pallas kernels when the default JAX backend is TPU;
  "1"              — force-enable (CPU runs use interpret mode: slow, exact);
  "0"              — force-disable (pure jnp paths everywhere).
"""
from __future__ import annotations

import os

import jax


def _mode() -> str:
    return os.environ.get("TELL_TPU_FUSED", "auto").lower()


def fused_kernels_enabled() -> bool:
    m = _mode()
    if m in ("1", "true", "on"):
        return True
    if m in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu"


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def env_flag(name: str, default: bool = False) -> bool:
    """Shared truthy parsing for kernel opt-in env vars (1/true/on).

    With default=True the flag is an opt-OUT: unset -> True, and an
    explicit falsy value (0/false/off, or set-but-empty as in
    `NAME= cmd`) disables it."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    if default:
        return raw.lower() not in ("", "0", "false", "off")
    return raw.lower() in ("1", "true", "on")


def interpret_mode() -> bool:
    """Pallas interpret=True is required off-TPU (tests force kernels on CPU)."""
    return jax.default_backend() != "tpu"
