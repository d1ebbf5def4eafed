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
    ride the matmul as fused prologue/epilogue; HBM reads stay int8."""
    if isinstance(w, QuantLinear):
        y = jnp.dot(x, w.q.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * w.scale.astype(jnp.float32)).astype(x.dtype)
    return x @ w
