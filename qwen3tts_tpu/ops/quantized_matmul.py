"""QuantLinear leaf type + quant-aware matmul (no model imports — this sits
below models/ in the import graph; policy helpers live in ops/quant.py)."""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp


class QuantLinear(NamedTuple):
    """int8 weights + per-output-channel scales for an [..., K, N] weight."""

    q: jnp.ndarray       # int8 [..., K, N]
    scale: jnp.ndarray   # [..., 1, N]


class QuantLinear4(NamedTuple):
    """4-bit weights for an [..., K, N] weight, split-half nibble packing.

    Byte [i, n] holds row i in its low nibble and row i + K/2 in its high
    nibble (both stored as value+8 in [1, 15]; symmetric int4 in [-7, 7]).
    This layout unpacks into two contiguous [K/2, N] halves — no lane/sublane
    interleave — so a matmul is two half-K dots, and each half carries its own
    per-output-channel scale (a free 2-group quantization along K).

    Serving-tier parity: the reference ships and runs Q4_K GGUF artifacts
    (convert_tts_to_gguf.py:244-270, scripts/benchmark § q4_k); this is the
    TPU-native 4-bit runtime format those weights re-quantize into at load
    (Q4_K's 32-element blocks are a storage layout tuned for AVX/NEON dot
    kernels, not for MXU dots — see io/gguf.py for the storage codec).
    """

    q: jnp.ndarray       # int8 [..., K//2, N] (two nibbles per byte)
    scale: jnp.ndarray   # [..., 2, N] (row 0: low half, row 1: high half)


Weight = Union[jnp.ndarray, QuantLinear, QuantLinear4]


def weight_in_dim(w: Weight) -> int:
    """Logical K (input dim) of a weight leaf — QuantLinear4 stores K//2
    packed rows."""
    if isinstance(w, QuantLinear4):
        return 2 * w.q.shape[-2]
    if isinstance(w, QuantLinear):
        return w.q.shape[-2]
    return w.shape[-2]


def unpack4(q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Packed [..., K//2, N] int8 -> (lo, hi) int8 halves in [-7, 7]."""
    b = q.astype(jnp.int32)
    lo = ((b & 15) - 8).astype(jnp.int8)
    hi = (((b >> 4) & 15) - 8).astype(jnp.int8)
    return lo, hi


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
    if isinstance(w, QuantLinear4):
        lo, hi = unpack4(w.q)
        Kh = lo.shape[-2]
        y = (jnp.dot(x[..., :Kh], lo.astype(x.dtype),
                     preferred_element_type=jnp.float32)
             * w.scale[..., 0:1, :].astype(jnp.float32)
             + jnp.dot(x[..., Kh:], hi.astype(x.dtype),
                       preferred_element_type=jnp.float32)
             * w.scale[..., 1:2, :].astype(jnp.float32))
        return y.astype(x.dtype)
    return x @ w
