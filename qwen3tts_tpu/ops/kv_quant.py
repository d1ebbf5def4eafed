"""int8 KV-cache quantization (VERDICT r1 #4).

The KV cache dominates decode HBM traffic once contexts grow: at B=64
serving with avg n_past~160 the per-lane valid-prefix DMA is ~1.2 GB per
frame-set — the bulk of the batched talker kernel's 3.7 ms — and at B=128
the bf16 caches alone are 7.7 GB (OOM, CLAUDE.md). Storing K/V rows as int8
with one f32 scale per (layer, k/v, head, slot) halves both.

Layout: the quantized cache is a (q, scale) pair
  q     int8 [..., C, D]   (same leading axes as the bf16 cache)
  scale f32  [..., C]      (per-row dynamic absmax / 127)
Rows are quantized OUTSIDE the Pallas kernels (the fused steps return their
new K/V rows at full precision and the caller quantizes before the scatter —
one tiny XLA op per step), and dequantized INSIDE on the read side without
touching the slabs: K's scale multiplies the [G, chunk] score matrix and V's
scale folds into the softmax probabilities, so the only per-element work on
the [chunk, D] slabs is the int8->bf16 cast the MXU needs anyway (int8
magnitudes <= 127 are exact in bf16).

The reference keeps its cache in F16 with no quantized option
(src/tts_transformer.cpp:714-724); this tier is TPU-side headroom.

Lane limit (CLOSED-WON'T-FIX, r3 hardware): the tier is B<=64-only. At
B=128 the v3 batched talker kernel's scoped-VMEM footprint — per-lane s8
slab windows PLUS the f32 scale planes, which stay full-width when the
slabs shrink — exceeds the Mosaic budget and the program fails to compile.
Chunking the scale planes was considered and rejected: B=128's serving
route is bf16 KV (the chunked-cp + VMEM-scaled-slab path, 8,624 f/s), and
this tier's value is memory at B<=64, where it fits as-is.
pipeline.resolve_kv_quant enforces the cap instead of letting Mosaic die.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def quantize_kv(kv: jnp.ndarray):
    """[..., C, D] float -> (int8 [..., C, D], f32 scale [..., C]).

    Per-row absmax scaling; all-zero rows (unwritten cache slots) quantize to
    zeros with the epsilon scale."""
    x = kv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(amax, _EPS) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / scale[..., None]), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    """Inverse of quantize_kv (tests / XLA fallback paths)."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def is_quantized_kv(kv) -> bool:
    """True when kv is the (q, scale) pair rather than a dense array."""
    return isinstance(kv, tuple)
