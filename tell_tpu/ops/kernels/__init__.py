"""Pallas TPU kernels for the hot ops.

Each kernel has a jnp semantic reference in `tell_tpu/ops/` that it is
parity-tested against (interpret mode on CPU, compiled on TPU). Dispatch is
centralized in `dispatch.py`: kernels engage automatically on TPU backends
and can be forced/disabled with TELL_TPU_FUSED=1/0.
"""
from .dispatch import fused_kernels_enabled
from .dynamic_conv import fused_dynamic_conv
from .decode_attention import fused_decode_attention
