"""Compute-path building blocks (pure functions; Pallas kernels + XLA fallbacks)."""

from interdiff_tpu.ops.attention import (
    banded_qan_attention,
    multi_head_attention,
    normalize_queries,
    rotary_cos_sin,
)

__all__ = [
    "banded_qan_attention",
    "multi_head_attention",
    "normalize_queries",
    "rotary_cos_sin",
]
