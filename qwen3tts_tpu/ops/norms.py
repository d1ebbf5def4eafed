"""Normalization layers (computed in float32 regardless of activation dtype)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm over the last axis: x * rsqrt(mean(x^2) + eps) * weight.

    Matches ``ggml_rms_norm`` followed by ``ggml_mul`` with the norm weight
    (reference src/tts_transformer.cpp:1160-1161). The q/k norms of Qwen3-style
    attention reuse this with weight shaped [head_dim].
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LayerNorm over the last axis (used by the vocoder ConvNeXt blocks,
    reference src/audio_tokenizer_decoder.cpp:521-525, eps=1e-6)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)
