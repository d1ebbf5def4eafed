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
from .quantized_matmul import (  # noqa: F401 (re-export)
    QuantLinear, QuantLinear4, Weight, matmul, unpack4)


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


def quantize_w4(w: jnp.ndarray, scale_dtype=jnp.float32) -> QuantLinear4:
    """Symmetric int4 ([-7, 7]) with per-half-per-output-channel scales,
    packed two-nibbles-per-byte in the split-half layout (see QuantLinear4)."""
    wf = w.astype(jnp.float32)
    K = wf.shape[-2]
    halves = jnp.stack([wf[..., :K // 2, :], wf[..., K // 2:, :]], axis=-3)
    amax = jnp.max(jnp.abs(halves), axis=-2)               # [..., 2, N]
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(halves / scale[..., :, None, :]), -7, 7)
    packed = ((q[..., 0, :, :] + 8).astype(jnp.int32)
              | ((q[..., 1, :, :] + 8).astype(jnp.int32) << 4)).astype(jnp.uint8)
    return QuantLinear4(q=packed.view(jnp.int8), scale=scale.astype(scale_dtype))


def dequantize4(w: QuantLinear4, dtype=jnp.float32) -> jnp.ndarray:
    lo, hi = unpack4(w.q)
    return jnp.concatenate(
        [lo.astype(jnp.float32) * w.scale[..., 0:1, :].astype(jnp.float32),
         hi.astype(jnp.float32) * w.scale[..., 1:2, :].astype(jnp.float32)],
        axis=-2).astype(dtype)


def quantize_block_params_w4(blocks: BlockParams) -> BlockParams:
    """4-bit variant of quantize_block_params (the talker's w4a8 serving tier
    — reference Q4_K parity). Same selective policy: projections only."""
    return blocks._replace(
        wqkv=quantize_w4(blocks.wqkv),
        wo=quantize_w4(blocks.wo),
        w_gateup=quantize_w4(blocks.w_gateup),
        w_down=quantize_w4(blocks.w_down),
    )
