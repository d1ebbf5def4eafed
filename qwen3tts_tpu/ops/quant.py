"""Weight-only int8 quantization for the decode hot path.

The frame loop is HBM-bound on weight reads (talker ~0.9 GB/frame + 15
sequential code-predictor passes ~2.3 GB/frame in bf16); int8 halves that.
Storage parity with the reference's Q8_0 GGUF files lives in io/gguf.py
(per-32-block scales); the runtime compute path uses per-output-channel
scales so the dequant is a fused matmul epilogue (ops/quantized_matmul.py).

Selective policy matches the reference converter
(convert_tts_to_gguf.py:244-270): block projection matrices quantize;
embeddings, norms, heads and biases stay high precision.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.transformer_core import BlockParams
from .quantized_matmul import QuantLinear, Weight, matmul  # noqa: F401 (re-export)


def quantize_per_channel(w: jnp.ndarray, scale_dtype=jnp.float32) -> QuantLinear:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantLinear(q=q, scale=scale.astype(scale_dtype))


def dequantize(w: QuantLinear, dtype=jnp.float32) -> jnp.ndarray:
    return (w.q.astype(jnp.float32) * w.scale.astype(jnp.float32)).astype(dtype)


def quantize_block_params(blocks: BlockParams) -> BlockParams:
    """Quantize the projection matrices of a (stacked) block pytree; norms
    stay as-is. The result remains a BlockParams and scans identically."""
    return blocks._replace(
        wqkv=quantize_per_channel(blocks.wqkv),
        wo=quantize_per_channel(blocks.wo),
        w_gateup=quantize_per_channel(blocks.w_gateup),
        w_down=quantize_per_channel(blocks.w_down),
    )
