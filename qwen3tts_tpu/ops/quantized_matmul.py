"""QuantLinear leaf type + quant-aware matmul (no model imports — this sits
below models/ in the import graph; policy helpers live in ops/quant.py)."""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp


class QuantLinear(NamedTuple):
    """int8 weights + per-output-channel scales for an [..., K, N] weight."""

    q: jnp.ndarray       # int8 [..., K, N]
    scale: jnp.ndarray   # [..., 1, N]


Weight = Union[jnp.ndarray, QuantLinear]


def matmul(x: jnp.ndarray, w: Weight) -> jnp.ndarray:
    """x @ w for a plain or quantized weight. The int8->bf16 convert + scale
    ride the matmul as fused prologue/epilogue; HBM reads stay int8.

    With QWEN3TTS_PALLAS_INT8=1 (and tileable 2-D shapes on TPU) the
    hand-scheduled Pallas fused-dequant kernel is used instead of the XLA
    convert+dot path."""
    if isinstance(w, QuantLinear):
        if w.q.ndim == 2 and x.ndim == 2:
            from .pallas_int8_matmul import int8_matmul_pallas, pallas_int8_enabled

            K, N = w.q.shape
            if pallas_int8_enabled() and K % 128 == 0 and N % 128 == 0:
                return int8_matmul_pallas(x, w.q, w.scale)
        y = jnp.dot(x, w.q.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * w.scale.astype(jnp.float32)).astype(x.dtype)
    return x @ w
