"""NEOX-style rotary position embeddings.

The reference applies ``ggml_rope_ext(..., GGML_ROPE_TYPE_NEOX, ...)`` to both
the talker and code-predictor q/k (``src/tts_transformer.cpp:1181-1187``) and
to the vocoder pre-transformer with theta=1e4
(``src/audio_tokenizer_decoder.cpp:440-446``). NEOX rope rotates feature pairs
``(i, i + d/2)``:

    out[i]       = x[i] * cos(p * f_i) - x[i + d/2] * sin(p * f_i)
    out[i + d/2] = x[i] * sin(p * f_i) + x[i + d/2] * cos(p * f_i)

with ``f_i = theta ** (-2 i / d)``, i in [0, d/2).

The checkpoint metadata carries ``mrope_section [24, 20, 20]`` but the TTS
pipeline always feeds scalar positions, so M-RoPE degenerates to this 1-D
form (SURVEY.md §2 row 5).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions: jnp.ndarray, head_dim: int, theta: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions.

    positions: int array [...]; returns (cos, sin) with shape [..., head_dim/2],
    computed in float32.
    """
    half = head_dim // 2
    # theta ** (-2i/d) == theta ** (-i / (d/2))
    inv_freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply NEOX rope.

    x: [..., n_heads, head_dim]; cos/sin: broadcastable to [..., 1, head_dim/2]
    (i.e. pass cos[..., None, :]).
    Computation is done in float32 and cast back to x.dtype.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1 = xf[..., :half]
    x2 = xf[..., half:]
    out1 = x1 * cos - x2 * sin
    out2 = x1 * sin + x2 * cos
    return jnp.concatenate([out1, out2], axis=-1).astype(dtype)


def rope_for_positions(positions: jnp.ndarray, head_dim: int, theta: float):
    """Convenience: (cos, sin) shaped [..., 1, head_dim/2] ready for apply_rope
    on [..., n_heads, head_dim] activations."""
    cos, sin = rope_angles(positions, head_dim, theta)
    return cos[..., None, :], sin[..., None, :]
