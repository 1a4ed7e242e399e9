"""Bit-exact fixed-point primitives and jnp compute paths."""

from warmup_fir_filter_tpu.ops.qformat import QFormat
from warmup_fir_filter_tpu.ops import validation

__all__ = ["QFormat", "validation"]
