"""GQA attention in plain XLA (prefill + single-token decode).

These are the portable reference paths; the Pallas fused decode kernel in
``ops/pallas_attention.py`` is a drop-in replacement for ``decode_attention``
on TPU. Semantics match the reference graphs:

- scale 1/sqrt(head_dim), causal mask, softmax in f32
  (src/tts_transformer.cpp:1219-1226)
- GQA with n_heads query heads sharing n_kv_heads KV heads (16/8 for the
  talker and code predictor; the vocoder pre-transformer is MHA 16/16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # plain float: no device allocation at import time


def prefill_attention(
    q: jnp.ndarray,        # [P, Hq, D]
    k: jnp.ndarray,        # [P, Hkv, D]
    v: jnp.ndarray,        # [P, Hkv, D]
    valid_len: jnp.ndarray | int | None = None,
) -> jnp.ndarray:
    """Causal self-attention over a padded prefill window.

    Positions >= valid_len are padding: they are masked out as keys. (Their
    query outputs are garbage but are never read.) Returns [P, Hq, D].
    """
    P, Hq, D = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(P, Hkv, group, D)
    # scores[p, h, g, c]
    scores = jnp.einsum("phgd,chd->phgc", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale

    pos = jnp.arange(P)
    causal = pos[None, :] <= pos[:, None]            # [P(query), P(key)]
    if valid_len is not None:
        causal = causal & (pos[None, :] < valid_len)
    scores = jnp.where(causal[:, None, None, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("phgc,chd->phgd", probs.astype(v.dtype), v)
    return out.reshape(P, Hq, D)


def decode_attention_layered(
    q: jnp.ndarray,        # [Hq, D]
    kv: jnp.ndarray,       # [L, 2, Hkv, C, D] full head-major cache
    layer: jnp.ndarray,    # scalar int32 layer index
    n_valid: jnp.ndarray,
    start: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Decode attention reading the FULL layer-stacked cache at a dynamic
    layer index. The Pallas kernel indexes the layer in its block index map
    (zero-copy); the XLA path reads kv[layer] as a dynamic-slice that fuses
    into the einsum.

    `start` (scalar): mask out cache positions < start — a lane refilled
    mid-session by the continuous-batching scheduler has stale entries from
    the previous occupant below its splice point (runtime/continuous.py)."""
    from .pallas_attention import decode_attention_pallas_layered, use_pallas_decode

    L, _, Hkv, C, D = kv.shape
    block = 256 if C % 256 == 0 else 128
    MIN_PALLAS_CAPACITY = 1024
    if (start is None and use_pallas_decode() and C % block == 0
            and C >= MIN_PALLAS_CAPACITY
            and D % 128 == 0 and q.shape[0] % Hkv == 0
            and not _is_f8(kv.dtype)):
        return decode_attention_pallas_layered(q, kv, layer, n_valid, block=block)
    return decode_attention(q, kv[layer, 0], kv[layer, 1], n_valid, start)


def decode_attention_auto(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    n_valid: jnp.ndarray,
    start: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dispatch decode attention over a head-major [Hkv, C, D] cache: the
    Pallas fused kernel on TPU when shapes qualify (capacity and head_dim
    multiples of 128), the XLA einsum path otherwise (CPU tests, tiny
    configs, QWEN3TTS_NO_PALLAS=1)."""
    from .pallas_attention import decode_attention_pallas, use_pallas_decode

    # Below ~1k cache slots the whole cache is a few MB and the XLA einsum is
    # faster than 28 extra kernel launches per step; the Pallas kernel wins
    # when capacity is large and mostly empty (long-form budgets).
    MIN_PALLAS_CAPACITY = 1024

    Hkv, C, D = k_cache.shape
    block = 256 if C % 256 == 0 else 128
    if (start is None and use_pallas_decode() and C % block == 0
            and C >= MIN_PALLAS_CAPACITY
            and D % 128 == 0 and q.shape[0] % Hkv == 0
            and not _is_f8(k_cache.dtype)):
        return decode_attention_pallas(q, k_cache, v_cache, n_valid, block=block)
    return decode_attention(q, k_cache, v_cache, n_valid, start)


def _is_f8(dtype) -> bool:
    return dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2)


def decode_attention(
    q: jnp.ndarray,        # [Hq, D]
    k_cache: jnp.ndarray,  # [Hkv, C, D] head-major
    v_cache: jnp.ndarray,  # [Hkv, C, D]
    n_valid: jnp.ndarray,  # scalar int: number of valid cache entries
    start: jnp.ndarray | None = None,  # scalar: entries < start are stale
) -> jnp.ndarray:
    """Single-token attention over a preallocated KV cache. Returns [Hq, D].

    An fp8 (e4m3) cache is upcast explicitly — XLA fuses the convert into
    the matmul operand read, so HBM traffic stays 8-bit (the serving win:
    decode attention is cache-read-bound)."""
    Hq, D = q.shape
    Hkv, C, _ = k_cache.shape
    group = Hq // Hkv
    scale = 1.0 / (D ** 0.5)
    if _is_f8(k_cache.dtype):
        k_cache = k_cache.astype(jnp.bfloat16)
        v_cache = v_cache.astype(jnp.bfloat16)

    qg = q.reshape(Hkv, group, D)
    scores = jnp.einsum("hgd,hcd->hgc", qg, k_cache, preferred_element_type=jnp.float32)
    scores = scores * scale
    mask = jnp.arange(C) < n_valid
    if start is not None:
        mask = mask & (jnp.arange(C) >= start)
    scores = jnp.where(mask[None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgc,hcd->hgd", probs.astype(v_cache.dtype), v_cache)
    return out.reshape(Hq, D)
