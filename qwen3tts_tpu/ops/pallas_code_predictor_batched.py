"""Batched mega-fused code-predictor kernel: the 15-code AR inner loop of B
frames (one per batch lane) in ONE Pallas call.

The serving path (BASELINE.json config #5) amortizes weight reads across a
batch, but the XLA path still pays 15 sequential 5-layer passes per frame-set
(weights re-streamed 15x = 1.18 GB) plus ~75 layer-iteration boundaries.
Here the int8 block weights are VMEM-resident (read once per frame-set), all
B lanes advance together through each AR step (M=B MXU dots instead of
GEMVs), and the per-step LM heads AND embedding tables stream from HBM
double-buffered behind compute.

Differences from the single-lane kernel (ops/pallas_code_predictor.py):
- activations are [B, H]; activation quantization is per-lane (per-row amax);
- the KV scratch is [L, Hkv, CTX, B, D] bf16 (lane-major tiles);
- the next-step embedding gather is a one-hot matmul against the step's
  whole table (streamed to VMEM) instead of a per-row DMA — no per-lane
  scalar extraction needed;
- sampling is vectorized over lanes with PER-LANE seeds and counter-hash
  Gumbel noise (ops/kernel_prng.py): lane b's draws are bit-identical to a
  single-stream kernel run with seed_b, so batched sampled serving
  reproduces single-stream output lane-for-lane.

Semantics per lane match the reference code predictor exactly
(src/tts_transformer.cpp:1534-1829, 2310-2575).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_prng import make_sampler, sampling_flags

NEG_INF = -1e30


def _rms(x, w, eps):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * lax.rsqrt(var + eps) * w.astype(jnp.float32)


def _make_kernel(cfg, B, *, top_k, mode, io_dtype, greedy, use_top_p,
                 per_lane_samp=False):
    H = cfg.hidden_size
    L = cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    G = Hq // Hkv
    F = cfg.intermediate_size
    V = cfg.vocab_size
    CTX = cfg.max_ctx
    S = cfg.n_steps
    eps = cfg.rms_norm_eps
    scale = D ** -0.5
    sample = make_sampler(top_k, V, greedy=greedy, use_top_p=use_top_p)

    def mm(x, wq_ref, ws_ref, l):
        """x [B, K] f32 @ stacked weight l -> [B, N] f32 (per-lane act quant)."""
        wq = wq_ref[l]
        ws = ws_ref[l].astype(jnp.float32)
        if mode == "w8a8":
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            s_act = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
            xq = jnp.clip(jnp.round(x / s_act), -127.0, 127.0).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * s_act * ws
        w = wq.astype(jnp.float32) * ws
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def kernel(seeds_ref, temp_ref, topp_ref, xinit_ref, cos_ref, sin_ref,
               attn_n_ref, q_n_ref, k_n_ref, ffn_n_ref, out_n_ref,
               wqkv_q, wqkv_s, wo_q, wo_s, wgu_q, wgu_s, wd_q, wd_s,
               heads_hbm, embds_hbm,
               codes_ref, sum_ref,
               kc, vc, head_buf, table_buf, sc3, sc_flat, sem_h, sem_t):
        seeds = seeds_ref[...]          # [B, 1] int32 per-lane seeds (VMEM)
        # per-lane [B, 1] sampling params broadcast through the row-wise
        # sampler exactly like scalars (continuous serving: each request
        # carries its own temperature/top_p)
        temp = temp_ref[...] if per_lane_samp else temp_ref[0, 0]
        topp = topp_ref[...] if per_lane_samp else topp_ref[0, 0]
        codes_ref[...] = jnp.zeros((B, 128), jnp.int32)
        sum_ref[...] = jnp.zeros((B, H), jnp.float32)
        kc[...] = jnp.zeros((L, Hkv, CTX, B, D), io_dtype)
        vc[...] = jnp.zeros((L, Hkv, CTX, B, D), io_dtype)

        def head_dma(step, slot):
            return pltpu.make_async_copy(
                heads_hbm.at[step], head_buf.at[slot], sem_h.at[slot])

        def table_dma(step, slot):
            return pltpu.make_async_copy(
                embds_hbm.at[step], table_buf.at[slot], sem_t.at[slot])

        def layer_pass(x, p):
            """All B lanes, one token each, through all L layers at pos p."""
            cos_p = cos_ref[p].astype(jnp.float32)     # [1, D/2]
            sin_p = sin_ref[p].astype(jnp.float32)
            pos_mask = lax.broadcasted_iota(
                jnp.int32, (Hkv, CTX, B, D), 1) == p
            key_valid = lax.broadcasted_iota(
                jnp.int32, (G, CTX, B), 1) <= p

            def rope(t):
                half = D // 2
                t1, t2 = t[..., :half], t[..., half:]
                return jnp.concatenate(
                    [t1 * cos_p - t2 * sin_p, t1 * sin_p + t2 * cos_p],
                    axis=-1)

            def one_layer(l, x):
                h = _rms(x, attn_n_ref[l], eps)
                qkv = mm(h, wqkv_q, wqkv_s, l)        # [B, QKV]
                for i in range(Hq + 2 * Hkv):
                    sc3[i] = qkv[:, i * D:(i + 1) * D]
                q = _rms(sc3[0:Hq], q_n_ref[l], eps)          # [Hq, B, D]
                k = _rms(sc3[Hq:Hq + Hkv], k_n_ref[l], eps)   # [Hkv, B, D]
                v = sc3[Hq + Hkv:Hq + 2 * Hkv]
                q = rope(q)
                k = rope(k)

                kc[pl.ds(l, 1)] = jnp.where(
                    pos_mask, k[:, None].astype(io_dtype), kc[pl.ds(l, 1)][0])[None]
                vc[pl.ds(l, 1)] = jnp.where(
                    pos_mask, v[:, None].astype(io_dtype), vc[pl.ds(l, 1)][0])[None]

                for hh in range(Hkv):
                    qh = q[hh * G:(hh + 1) * G]                  # [G, B, D]
                    Kh = kc[pl.ds(l, 1)][0, hh].astype(jnp.float32)  # [CTX, B, D]
                    Vh = vc[pl.ds(l, 1)][0, hh].astype(jnp.float32)
                    s = jnp.sum(qh[:, None] * Kh[None], axis=-1) * scale
                    s = jnp.where(key_valid, s, NEG_INF)         # [G, CTX, B]
                    m = jnp.max(s, axis=1, keepdims=True)
                    e = jnp.exp(s - m)
                    pr = e / jnp.sum(e, axis=1, keepdims=True)
                    oh = jnp.sum(pr[..., None] * Vh[None], axis=1)  # [G, B, D]
                    for gg in range(G):
                        sc_flat[:, (hh * G + gg) * D:(hh * G + gg + 1) * D] = \
                            oh[gg]

                x = x + mm(sc_flat[...], wo_q, wo_s, l)
                h = _rms(x, ffn_n_ref[l], eps)
                gu = mm(h, wgu_q, wgu_s, l)
                gate = gu[:, :F]
                gate = gate / (1.0 + jnp.exp(-gate))
                return x + mm(gate * gu[:, F:], wd_q, wd_s, l)

            return lax.fori_loop(0, L, one_layer, x)

        # pass p=0: talker hidden (conditioning only)
        _ = layer_pass(xinit_ref[0].astype(jnp.float32), 0)
        head_dma(0, 0).start()
        table_dma(0, 0).start()

        lane = lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        lane_v = lax.broadcasted_iota(jnp.int32, (B, V), 1)

        def step(p, code_prev):
            # input: cb0 embed at p==1, else one-hot gather from table u=p-2.
            # Table schedule mirrors the heads: table0 starts pre-loop, table
            # u+1 starts right after table u is consumed (one layer_pass of
            # overlap). At p==1 the buffers are unread in-flight garbage; the
            # result is discarded by the select below.
            u = jnp.maximum(p - 2, 0)
            slot_u = lax.rem(u, 2)

            @pl.when(p >= 2)
            def _():
                table_dma(u, slot_u).wait()

            onehot = jnp.where(lane_v == code_prev, 1.0, 0.0).astype(io_dtype)
            t0 = jax.lax.dot_general(
                onehot, table_buf[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t1 = jax.lax.dot_general(
                onehot, table_buf[1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = jnp.where(slot_u == 0, t0, t1)                # [B, H]

            emb = jnp.where(p == 1, xinit_ref[1].astype(jnp.float32), row)

            @pl.when(p >= 2)
            def _():
                sum_ref[...] += row

            @pl.when(jnp.logical_and(p >= 2, u + 1 <= S - 1))
            def _():
                table_dma(u + 1, lax.rem(u + 1, 2)).start()

            x = layer_pass(emb, p)
            h = _rms(x, out_n_ref[...], eps).astype(io_dtype)

            slot = lax.rem(p - 1, 2)
            head_dma(p - 1, slot).wait()
            h0 = jax.lax.dot_general(
                h, head_buf[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h1 = jax.lax.dot_general(
                h, head_buf[1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = jnp.where(slot == 0, h0, h1)

            @pl.when(p < S)
            def _():
                head_dma(p, lax.rem(p, 2)).start()

            code = sample(logits, temp, topp, seeds, p)         # [B, 1]
            codes_ref[...] = jnp.where(lane == p - 1, code, codes_ref[...])
            return code

        code_last = lax.fori_loop(1, S + 1, step, jnp.zeros((B, 1), jnp.int32))

        # final Sigma term: code_pred_embd[14][code_15] per lane
        table_dma(S - 1, lax.rem(S - 1, 2)).wait()
        tl0 = jax.lax.dot_general(
            jnp.where(lane_v == code_last, 1.0, 0.0).astype(io_dtype),
            table_buf[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        tl1 = jax.lax.dot_general(
            jnp.where(lane_v == code_last, 1.0, 0.0).astype(io_dtype),
            table_buf[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sum_ref[...] += jnp.where(lax.rem(S - 1, 2) == 0, tl0, tl1)

    return kernel


def fused_predict_codes_batched(
    cp_params, cfg, talker_hidden, cb0_embd, seeds, *,
    temperature, top_k: int, top_p=1.0, mode: str = "w8a8",
    interpret: bool = False, greedy=None, use_top_p=None,
):
    """Returns (codes [B, 15] int32, rest_embd_sum [B, H] f32).

    Lane b's sampled codes equal fused_predict_codes run single-stream with
    seed seeds[b] (counter-hash noise is lane-decomposable). temperature and
    top_p are traced scalars — or PER-LANE [B] arrays (continuous serving:
    each request its own values; the row-wise sampler broadcasts [B,1] like
    a scalar); greedy/use_top_p static stage gates (derived from
    python-float params when not given)."""
    greedy, use_top_p = sampling_flags(temperature, top_p, greedy, use_top_p)
    return _fused_predict_codes_batched_jit(
        cp_params, cfg, talker_hidden, cb0_embd, seeds,
        temperature=temperature, top_k=top_k, top_p=top_p, mode=mode,
        interpret=interpret, greedy=greedy, use_top_p=use_top_p)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "top_k", "mode", "interpret", "greedy",
                     "use_top_p"))
def _fused_predict_codes_batched_jit(
    cp_params,
    cfg,
    talker_hidden: jnp.ndarray,   # [B, H]
    cb0_embd: jnp.ndarray,        # [B, H]
    seeds: jnp.ndarray,           # [B] int32 per-lane seeds
    *,
    temperature,                  # traced f32 scalar (recompile-free)
    top_k: int,
    top_p,                        # traced f32 scalar (recompile-free)
    mode: str,
    interpret: bool,
    greedy: bool,
    use_top_p: bool,
):
    if jax.default_backend() == "cpu":
        interpret = True   # CPU has no Mosaic: tests force the fused path
    blocks = cp_params.blocks
    B, H = talker_hidden.shape
    L = cfg.n_layers
    CTX, S, V = cfg.max_ctx, cfg.n_steps, cfg.vocab_size
    Hkv, D = cfg.n_kv_heads, cfg.head_dim
    half = D // 2
    io_dtype = cp_params.embds.dtype

    pos = jnp.arange(CTX, dtype=jnp.float32)[:, None]
    inv_freq = cfg.rope_theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = pos * inv_freq
    cos, sin = jnp.cos(ang)[:, None, :], jnp.sin(ang)[:, None, :]

    xinit = jnp.stack([talker_hidden, cb0_embd]).astype(io_dtype)  # [2, B, H]

    per_lane_samp = getattr(temperature, "ndim", 0) >= 1
    kernel = _make_kernel(cfg, B, top_k=top_k, mode=mode, io_dtype=io_dtype,
                          greedy=greedy, use_top_p=use_top_p,
                          per_lane_samp=per_lane_samp)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    samp_spec = vmem if per_lane_samp else smem
    samp_shape = (B, 1) if per_lane_samp else (1, 1)
    codes_pad, rest_sum = pl.pallas_call(
        kernel,
        in_specs=[
            vmem, samp_spec, samp_spec,  # per-lane seeds, temp, top_p
            vmem, vmem, vmem,
            vmem, vmem, vmem, vmem, vmem,
            vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem,
            any_, any_,
        ],
        out_specs=(vmem, vmem),
        out_shape=(
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, Hkv, CTX, B, D), io_dtype),    # K cache
            pltpu.VMEM((L, Hkv, CTX, B, D), io_dtype),    # V cache
            pltpu.VMEM((2, H, V), cp_params.heads.dtype),  # head dbl buffer
            pltpu.VMEM((2, V, H), io_dtype),               # table dbl buffer
            pltpu.VMEM((cfg.n_heads + 2 * Hkv, B, D), jnp.float32),
            pltpu.VMEM((B, cfg.n_heads * D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(seeds, jnp.int32).reshape(B, 1),
        jnp.asarray(temperature, jnp.float32).reshape(samp_shape),
        jnp.asarray(top_p, jnp.float32).reshape(samp_shape),
        xinit, cos, sin,
        blocks.attn_norm[:, None, :], blocks.q_norm[:, None, :],
        blocks.k_norm[:, None, :], blocks.ffn_norm[:, None, :],
        cp_params.output_norm.reshape(1, H),
        blocks.wqkv.q, blocks.wqkv.scale,
        blocks.wo.q, blocks.wo.scale,
        blocks.w_gateup.q, blocks.w_gateup.scale,
        blocks.w_down.q, blocks.w_down.scale,
        cp_params.heads, cp_params.embds,
    )
    return codes_pad[:, :S], rest_sum
