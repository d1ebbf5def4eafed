"""Pallas fused decode-attention kernel (single query vs KV cache).

The XLA reference path (ops/attention.py decode_attention) computes masked
attention over the FULL preallocated cache every step: at a 4096-frame budget
that is ~470 MB of KV reads per frame across the talker's 28 layers whether
2 or 4000 positions are valid. This kernel grids over KV blocks, prefetches
``n_valid`` as a scalar, and skips blocks past the valid prefix entirely —
per-step KV traffic is proportional to the actual context (flash-attention
style online softmax, one pass).

Semantics are identical to decode_attention: GQA (Hq query heads over Hkv KV
heads), scale 1/sqrt(D), softmax in f32 over cache[0:n_valid].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 128
NEG_INF = -1e30


def _decode_attn_kernel(n_valid_ref, q_ref, k_ref, v_ref, o_ref,
                        m_ref, l_ref, acc_ref, *, block: int, groups: int):
    j = pl.program_id(1)
    n_valid = n_valid_ref[0]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j * block < n_valid)
    def _block():
        q = q_ref[0].astype(jnp.float32)              # [G, D]
        k = k_ref[:, 0, :].astype(jnp.float32)        # [BLK, D]
        v = v_ref[:, 0, :].astype(jnp.float32)        # [BLK, D]
        d = q.shape[-1]

        s = jax.lax.dot_general(                      # [G, BLK]
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * (1.0 / (d ** 0.5))
        col = j * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, NEG_INF)

        m_prev = m_ref[:, 0]                          # [G]
        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])               # [G, BLK]
        alpha = jnp.exp(m_prev - m_new)               # [G]
        l_new = alpha * l_ref[:, 0] + jnp.sum(p, axis=1)
        acc_ref[...] = acc_ref[...] * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[:, 0] = m_new
        l_ref[:, 0] = l_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:, 0]
        o_ref[0] = (acc_ref[...] / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_pallas(
    q: jnp.ndarray,        # [Hq, D]
    k_cache: jnp.ndarray,  # [C, Hkv, D]
    v_cache: jnp.ndarray,  # [C, Hkv, D]
    n_valid: jnp.ndarray,  # scalar int32
    *,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    Hq, D = q.shape
    C, Hkv, _ = k_cache.shape
    G = Hq // Hkv
    assert C % block == 0, f"cache capacity {C} must be a multiple of {block}"
    n_blocks = C // block

    qg = q.reshape(Hkv, G, D)
    grid = (Hkv, n_blocks)

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, block=block, groups=G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, G, D), lambda h, j, n_ref: (h, 0, 0)),
                # Clamp out-of-range KV block indices to the last valid block:
                # Pallas only issues a DMA when the block index changes, so
                # blocks past n_valid are never fetched from HBM (the kernel's
                # pl.when guard already skips their compute).
                pl.BlockSpec((block, 1, D),
                             lambda h, j, n_ref: (jnp.minimum(j, (n_ref[0] - 1) // block), h, 0)),
                pl.BlockSpec((block, 1, D),
                             lambda h, j, n_ref: (jnp.minimum(j, (n_ref[0] - 1) // block), h, 0)),
            ],
            out_specs=pl.BlockSpec((1, G, D), lambda h, j, n_ref: (h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, 1), jnp.float32),   # running max
                pltpu.VMEM((G, 1), jnp.float32),   # running denom
                pltpu.VMEM((G, D), jnp.float32),   # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32)[None], qg, k_cache, v_cache)
    return out.reshape(Hq, D)


def use_pallas_decode() -> bool:
    """Pallas decode attention is used on real TPU backends unless disabled
    via QWEN3TTS_NO_PALLAS=1 (tests on CPU use the XLA path, or interpret
    mode explicitly)."""
    import os

    if os.environ.get("QWEN3TTS_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
