"""Pallas fused decode-attention kernel (single query vs KV cache).

The XLA reference path (ops/attention.py decode_attention) computes masked
attention over the FULL preallocated cache every step: at a 4096-frame budget
that is ~470 MB of KV reads per frame across the talker's 28 layers whether
2 or 4000 positions are valid. This kernel grids over KV blocks only (all KV
heads processed per iteration — grid-iteration overhead is what kills a
(head, block) grid at 28 calls/frame), prefetches ``n_valid`` as a scalar,
and clamps out-of-range block indices so their DMA is never issued: per-step
KV traffic and grid work are proportional to the actual context
(flash-attention style online softmax, one pass).

TPU tiling notes: the cache is head-major [Hkv, C, D] so a KV block is a
legal (Hkv, BLOCK, D) fetch; the per-head query group (G = Hq/Hkv = 2) is
zero-padded to 8 sublanes and all heads stack into [Hkv*8, D] scratch. The
padded rows compute garbage that is sliced away on return (bandwidth-bound
kernel; the extra VPU rows are free).

Semantics are identical to decode_attention: GQA, scale 1/sqrt(D), softmax in
f32 over cache[0:n_valid].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256
GROUP_PAD = 8
NEG_INF = -1e30


def _decode_attn_kernel(n_valid_ref, q_ref, k_ref, v_ref, o_ref,
                        m_ref, l_ref, acc_ref, *, block: int, n_kv: int):
    j = pl.program_id(0)
    n_valid = n_valid_ref[0]
    GP = GROUP_PAD

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j * block < n_valid)
    def _block():
        col = j * block + jax.lax.broadcasted_iota(jnp.int32, (GP, block), 1)
        valid = col < n_valid
        scale = 1.0 / (q_ref.shape[-1] ** 0.5)
        for h in range(n_kv):  # unrolled: static head count
            rows = slice(h * GP, (h + 1) * GP)
            q = q_ref[h].astype(jnp.float32)            # [GP, D]
            k = k_ref[h].astype(jnp.float32)            # [BLK, D]
            v = v_ref[h].astype(jnp.float32)            # [BLK, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(valid, s, NEG_INF)

            m_prev = m_ref[rows, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[rows, :] = jnp.broadcast_to(
                alpha * l_ref[rows, 0:1] + jnp.sum(p, axis=1, keepdims=True),
                (GP, l_ref.shape[1]))
            acc_ref[rows, :] = acc_ref[rows, :] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            m_ref[rows, :] = jnp.broadcast_to(m_new, (GP, m_ref.shape[1]))

    @pl.when(j == pl.num_programs(0) - 1)
    def _finish():
        l = l_ref[:, 0:1]
        out = (acc_ref[...] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        o_ref[...] = out.reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_pallas(
    q: jnp.ndarray,        # [Hq, D]
    k_cache: jnp.ndarray,  # [Hkv, C, D] head-major
    v_cache: jnp.ndarray,  # [Hkv, C, D]
    n_valid: jnp.ndarray,  # scalar int32
    *,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    Hq, D = q.shape
    Hkv, C, _ = k_cache.shape
    G = Hq // Hkv
    GP = GROUP_PAD
    assert G <= GP, f"query group {G} exceeds sublane padding {GP}"
    assert C % block == 0, f"cache capacity {C} must be a multiple of {block}"
    n_blocks = C // block

    qg = q.reshape(Hkv, G, D)
    q_pad = jnp.zeros((Hkv, GP, D), q.dtype).at[:, :G, :].set(qg)

    # Clamp out-of-range KV block indices to the last valid block: Pallas only
    # issues a DMA when the block index changes, so blocks past n_valid are
    # never fetched from HBM (the kernel's pl.when guard skips their compute).
    # NB: index maps must stay trivially lowerable — truncating lax.div /
    # lax.min (a Python // on traced ints emits a sign-correcting select_n
    # that the Mosaic index-map lowering rejects).
    def kv_index(j, n_ref):
        last = jax.lax.div(n_ref[0] - 1, jnp.int32(block))
        return (0, jax.lax.min(j, last), 0)

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, block=block, n_kv=Hkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((Hkv, GP, D), lambda j, n_ref: (0, 0, 0)),
                pl.BlockSpec((Hkv, block, D), kv_index),
                pl.BlockSpec((Hkv, block, D), kv_index),
            ],
            out_specs=pl.BlockSpec((Hkv, GP, D), lambda j, n_ref: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv * GP, 128), jnp.float32),  # running max
                pltpu.VMEM((Hkv * GP, 128), jnp.float32),  # running denom
                pltpu.VMEM((Hkv * GP, D), jnp.float32),    # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Hkv, GP, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32)[None], q_pad, k_cache, v_cache)
    return out[:, :G, :].reshape(Hq, D)


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


def _decode_attn_kernel_layered(s_ref, q_ref, k_ref, v_ref, o_ref,
                                m_ref, l_ref, acc_ref, *, block: int, n_kv: int):
    """Same math as _decode_attn_kernel with K/V refs blocked as
    (1, 1, Hkv, BLOCK, D) out of the layer-stacked cache."""
    j = pl.program_id(0)
    n_valid = s_ref[0]
    GP = GROUP_PAD

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j * block < n_valid)
    def _block():
        col = j * block + jax.lax.broadcasted_iota(jnp.int32, (GP, block), 1)
        valid = col < n_valid
        scale = 1.0 / (q_ref.shape[-1] ** 0.5)
        for h in range(n_kv):
            rows = slice(h * GP, (h + 1) * GP)
            q = q_ref[h].astype(jnp.float32)
            k = k_ref[0, 0, h].astype(jnp.float32)
            v = v_ref[0, 0, h].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(valid, s, NEG_INF)

            m_prev = m_ref[rows, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[rows, :] = jnp.broadcast_to(
                alpha * l_ref[rows, 0:1] + jnp.sum(p, axis=1, keepdims=True),
                (GP, l_ref.shape[1]))
            acc_ref[rows, :] = acc_ref[rows, :] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            m_ref[rows, :] = jnp.broadcast_to(m_new, (GP, m_ref.shape[1]))

    @pl.when(j == pl.num_programs(0) - 1)
    def _finish():
        l = l_ref[:, 0:1]
        out = (acc_ref[...] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        o_ref[...] = out.reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_pallas_layered(
    q: jnp.ndarray,        # [Hq, D]
    kv: jnp.ndarray,       # [L, 2, Hkv, C, D] full layer-stacked cache
    layer: jnp.ndarray,    # scalar int32
    n_valid: jnp.ndarray,  # scalar int32
    *,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same kernel as decode_attention_pallas but reading K/V directly out of
    the layer-stacked cache via the block index map — the caller never slices
    the cache (a dynamic-slice of [2, Hkv, C, D] would copy ~36 MB/layer at a
    4k-frame budget)."""
    Hq, D = q.shape
    L, _, Hkv, C, _ = kv.shape
    G = Hq // Hkv
    GP = GROUP_PAD
    assert G <= GP
    assert C % block == 0, f"cache capacity {C} must be a multiple of {block}"
    n_blocks = C // block

    qg = q.reshape(Hkv, G, D)
    q_pad = jnp.zeros((Hkv, GP, D), q.dtype).at[:, :G, :].set(qg)
    scalars = jnp.stack([jnp.asarray(n_valid, jnp.int32),
                         jnp.asarray(layer, jnp.int32)])

    def kv_index(kind):
        def index(j, s_ref):
            last = jax.lax.div(s_ref[0] - 1, jnp.int32(block))
            return (s_ref[1], kind, 0, jax.lax.min(j, last), 0)
        return index

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel_layered, block=block, n_kv=Hkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((Hkv, GP, D), lambda j, s_ref: (0, 0, 0)),
                pl.BlockSpec((1, 1, Hkv, block, D), kv_index(0)),
                pl.BlockSpec((1, 1, Hkv, block, D), kv_index(1)),
            ],
            out_specs=pl.BlockSpec((Hkv, GP, D), lambda j, s_ref: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv * GP, 128), jnp.float32),
                pltpu.VMEM((Hkv * GP, 128), jnp.float32),
                pltpu.VMEM((Hkv * GP, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Hkv, GP, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(scalars, q_pad, kv, kv)
    return out[:, :G, :].reshape(Hq, D)
