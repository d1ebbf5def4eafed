"""Mega-fused code-predictor kernel: the entire 15-code AR inner loop of one
frame in ONE Pallas call, with the int8 block weights resident in VMEM.

Why this exists (the measured decomposition in docs/performance.md): the code
predictor is ~50-57% of frame time. The XLA path runs 15 sequential 5-layer
passes per frame, and every pass re-streams the full ~78.5 MB (int8) block
weight set from HBM — a 1.18 GB/frame floor (1.44 ms at v5e's ~819 GB/s) —
plus ~75 layer-iteration boundaries of small-op overhead (~17 us each).
A v5e core has 128 MB of VMEM: the whole quantized block stack *fits*. This
kernel loads it once per frame (~0.1 ms), runs all 16 token passes (2-token
prefill + 14 AR steps, reference src/tts_transformer.cpp:2310-2575) against
the VMEM-resident weights, DMAs each per-step LM head [H, 2048] from HBM
behind the compute (double-buffered), samples each code on-kernel
(temperature/top-k/top-p via threshold binary searches + counter-hash Gumbel
argmax, greedy via argmax — see ops/kernel_prng.py; temperature and top_p
are traced scalars so sampling-config changes never recompile), and
accumulates the Sigma code_pred_embd[cb][code_cb] term of the
next talker step embedding (reference :2759-2790) so the decode loop gets it
for free.

Matmul modes:
- "w8a8" (TPU fast path): activations dynamically quantized per token to
  int8, native s8 x s8 -> s32 MXU dots, dequant in the f32 epilogue
  (act_scale * per-channel weight scale). No per-pass weight conversions.
- "dequant": weights dequantized to f32 tiles before an f32 dot — slower,
  but bit-matches the NumPy reference math; used by parity tests (interpret
  mode) and as a fallback.

KV cache: the code predictor's context is 16 tokens, so K/V live entirely in
VMEM scratch ([L, Hkv, 16, D] f32, ~650 KB) — zero HBM traffic.

Everything here follows the layer semantics of models/transformer_core.py
(RMSNorm -> fused QKV -> q/k-norm -> NEOX RoPE -> GQA attention -> o_proj ->
SwiGLU), which itself mirrors reference src/tts_transformer.cpp:1534-1829.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_prng import make_sampler, sampling_flags

NEG_INF = -1e30


def fused_cp_enabled() -> bool:
    """Default-on on TPU backends; QWEN3TTS_FUSED_CP=0 disables."""
    if os.environ.get("QWEN3TTS_FUSED_CP", "1") in ("0", "false", "off"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _rms(x, w, eps):
    """RMSNorm over the last axis, f32 in/out (w any float dtype)."""
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * lax.rsqrt(var + eps) * w.astype(jnp.float32)


def _rope(x, cos, sin):
    """NEOX rope on [heads, D] with cos/sin [1, D/2] (f32)."""
    half = x.shape[-1] // 2
    x1 = x[:, :half]
    x2 = x[:, half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def _split_heads(vec, scratch, n_heads, d):
    """[1, n_heads*d] -> [n_heads, d] through a VMEM scratch: per-head stores
    perform the lane->sublane relayout (Mosaic rejects the equivalent
    vector concatenate across mismatched sublane offsets)."""
    for i in range(n_heads):
        scratch[i:i + 1, :] = vec[:, i * d:(i + 1) * d]
    return scratch[0:n_heads, :]


def _merge_heads(x, scratch, n_heads, d):
    """[n_heads, d] -> [1, n_heads*d] through a VMEM scratch (see above)."""
    for i in range(n_heads):
        scratch[0:1, i * d:(i + 1) * d] = x[i:i + 1, :]
    return scratch[...]


def _make_kernel(cfg, *, top_k, mode, head_dtype, greedy, use_top_p):
    H = cfg.hidden_size
    L = cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    G = Hq // Hkv
    F = cfg.intermediate_size
    V = cfg.vocab_size
    CTX = cfg.max_ctx          # 16
    S = cfg.n_steps            # 15
    eps = cfg.rms_norm_eps
    scale = D ** -0.5
    sample = make_sampler(top_k, V, greedy=greedy, use_top_p=use_top_p)

    def mm(x, wq_ref, ws_ref, l):
        """x [1, K] f32 @ stacked weight l -> [1, N] f32."""
        wq = wq_ref[l]                       # [K, N] int8
        ws = ws_ref[l].astype(jnp.float32)   # [1, N]
        if mode == "w8a8":
            amax = jnp.max(jnp.abs(x))
            s_act = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
            xq = jnp.clip(jnp.round(x / s_act), -127.0, 127.0).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (s_act * ws)
        w = wq.astype(jnp.float32) * ws
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def kernel(seed_ref, temp_ref, topp_ref, xinit_ref, cos_ref, sin_ref,
               attn_n_ref, q_n_ref, k_n_ref, ffn_n_ref, out_n_ref,
               wqkv_q, wqkv_s, wo_q, wo_s, wgu_q, wgu_s, wd_q, wd_s,
               heads_hbm, embds_hbm,
               codes_ref, sum_ref,
               kc, vc, head_buf, emb_buf, sc_heads, sc_flat, sem_h, sem_e):
        seed = seed_ref[0, 0]
        temp = temp_ref[0, 0]
        topp = topp_ref[0, 0]
        codes_ref[...] = jnp.zeros((1, 128), jnp.int32)
        sum_ref[...] = jnp.zeros((1, H), jnp.float32)
        # Zero the KV scratch: masked-out attention positions multiply V by a
        # zero probability, and 0 * uninitialized-garbage = NaN.
        kc[...] = jnp.zeros((L, Hkv, CTX, D), jnp.float32)
        vc[...] = jnp.zeros((L, Hkv, CTX, D), jnp.float32)

        def head_dma(step, slot):
            return pltpu.make_async_copy(
                heads_hbm.at[step], head_buf.at[slot], sem_h.at[slot])

        def fetch_embd_row(table, code):
            """DMA code_pred_embd[table][code] -> [1, H] f32. HBM slices must
            be sublane-tile aligned, so fetch the aligned 8-row block and
            one-hot-select the row on the VPU."""
            base = pl.multiple_of(lax.div(code, 8) * 8, 8)
            cp = pltpu.make_async_copy(
                embds_hbm.at[table, pl.ds(base, 8), :], emb_buf, sem_e)
            cp.start()
            cp.wait()
            sel = (lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                   == lax.rem(code, 8)).astype(jnp.float32)
            return jnp.sum(emb_buf[...].astype(jnp.float32) * sel,
                           axis=0, keepdims=True)

        def layer_pass(x, p):
            """One token through all L layers at position p. x [1,H] f32.

            Norm/rope tables are shaped [K, 1, dim] so the dynamic index
            lands on an untiled dimension (Mosaic cannot prove dynamic
            sublane-dim indices aligned)."""
            cos_p = cos_ref[p].astype(jnp.float32)
            sin_p = sin_ref[p].astype(jnp.float32)
            pos_mask = lax.broadcasted_iota(jnp.int32, (Hkv, CTX, D), 1) == p
            key_valid = lax.broadcasted_iota(
                jnp.int32, (Hkv, G, CTX), 2) <= p

            def one_layer(l, x):
                h = _rms(x, attn_n_ref[l], eps)
                qkv = mm(h, wqkv_q, wqkv_s, l)
                q = _split_heads(qkv[:, : Hq * D], sc_heads, Hq, D)
                k = _split_heads(
                    qkv[:, Hq * D:(Hq + Hkv) * D], sc_heads.at[Hq:], Hkv, D)
                v = _split_heads(
                    qkv[:, (Hq + Hkv) * D:], sc_heads.at[Hq + Hkv:], Hkv, D)
                q = _rms(q, q_n_ref[l], eps)
                k = _rms(k, k_n_ref[l], eps)
                q = _rope(q, cos_p, sin_p)
                k = _rope(k, cos_p, sin_p)

                # append K/V at position p (one-hot masked full-tile update:
                # no dynamic sublane indexing)
                kc[pl.ds(l, 1)] = jnp.where(
                    pos_mask, k[:, None, :], kc[pl.ds(l, 1)][0])[None]
                vc[pl.ds(l, 1)] = jnp.where(
                    pos_mask, v[:, None, :], vc[pl.ds(l, 1)][0])[None]
                K = kc[pl.ds(l, 1)][0]        # [Hkv, CTX, D]
                Vv = vc[pl.ds(l, 1)][0]

                # GQA: q heads grouped [Hkv, G, D] against K [Hkv, CTX, D]
                q3 = jnp.concatenate(
                    [q[i * G:(i + 1) * G][None] for i in range(Hkv)], axis=0)
                scores = jnp.sum(
                    q3[:, :, None, :] * K[:, None, :, :], axis=-1) * scale
                scores = jnp.where(key_valid, scores, NEG_INF)
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                probs = e / jnp.sum(e, axis=-1, keepdims=True)
                o3 = jnp.sum(
                    probs[:, :, :, None] * Vv[:, None, :, :], axis=2)
                o = jnp.concatenate([o3[i] for i in range(Hkv)], axis=0)

                x = x + mm(_merge_heads(o, sc_flat, Hq, D), wo_q, wo_s, l)
                h = _rms(x, ffn_n_ref[l], eps)
                gu = mm(h, wgu_q, wgu_s, l)
                gate = gu[:, :F]
                gate = gate / (1.0 + jnp.exp(-gate))   # SiLU, f32
                return x + mm(gate * gu[:, F:], wd_q, wd_s, l)

            return lax.fori_loop(0, L, one_layer, x)

        # --- pass p=0: talker hidden (conditioning only; no sampling) ---
        x0 = xinit_ref[0:1, :].astype(jnp.float32)
        _ = layer_pass(x0, 0)
        head_dma(0, 0).start()

        # --- passes p=1..15: sample code p-1 from head p-1 ---
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def step(p, code_prev):
            # input embedding: cb0 embed at p==1, code_pred_embd row after
            # (table index clamped to 0 at p==1; the row is unused then)
            row = fetch_embd_row(jnp.maximum(p - 2, 0), code_prev)
            emb = jnp.where(p == 1, xinit_ref[1:2, :].astype(jnp.float32),
                            row)

            @pl.when(p >= 2)
            def _():
                sum_ref[...] += row

            x = layer_pass(emb, p)
            h = _rms(x, out_n_ref[...], eps).astype(head_dtype)

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

            code = sample(logits, temp, topp, seed, p)[0, 0]
            codes_ref[...] = jnp.where(lane == p - 1, code, codes_ref[...])
            return code

        code_last = lax.fori_loop(1, S + 1, step, jnp.int32(0))

        # final Sigma term: code_pred_embd[14][code_15]
        sum_ref[...] += fetch_embd_row(S - 1, code_last)

    return kernel


def fused_predict_codes(
    cp_params, cfg, talker_hidden, cb0_embd, seed, *,
    temperature, top_k: int, top_p=1.0, mode: str = "w8a8",
    interpret: bool = False, greedy=None, use_top_p=None,
):
    """Returns (codes [15] int32, rest_embd_sum [H] f32).

    rest_embd_sum == Sigma_cb code_pred_embd[cb][codes[cb]] — the decode
    loop's next-step embedding term (reference tts_transformer.cpp:2759-2790).
    Requires int8-quantized blocks (ops/quant.quantize_block_params).

    temperature/top_p are traced scalars (value changes never recompile);
    greedy/use_top_p are static stage gates, derived from python-float
    params when not given (see kernel_prng.sampling_flags).
    """
    greedy, use_top_p = sampling_flags(temperature, top_p, greedy, use_top_p)
    return _fused_predict_codes_jit(
        cp_params, cfg, talker_hidden, cb0_embd, seed,
        temperature=temperature, top_k=top_k, top_p=top_p, mode=mode,
        interpret=interpret, greedy=greedy, use_top_p=use_top_p)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "top_k", "mode", "interpret", "greedy",
                     "use_top_p"))
def _fused_predict_codes_jit(
    cp_params,
    cfg,
    talker_hidden: jnp.ndarray,   # [H] (pre-output-norm talker hidden)
    cb0_embd: jnp.ndarray,        # [H] talker codec_embd[cb0]
    seed: jnp.ndarray,            # scalar int32
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
    H, L = cfg.hidden_size, cfg.n_layers
    CTX, S, V = cfg.max_ctx, cfg.n_steps, cfg.vocab_size
    Hkv, D = cfg.n_kv_heads, cfg.head_dim
    half = D // 2

    pos = jnp.arange(CTX, dtype=jnp.float32)[:, None]
    inv_freq = cfg.rope_theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = pos * inv_freq
    # [CTX, 1, half]: dynamic position index on an untiled leading dim
    cos, sin = jnp.cos(ang)[:, None, :], jnp.sin(ang)[:, None, :]

    xinit = jnp.stack([talker_hidden, cb0_embd]).astype(cp_params.embds.dtype)
    head_dtype = cp_params.heads.dtype
    kernel = _make_kernel(cfg, top_k=top_k, mode=mode, head_dtype=head_dtype,
                          greedy=greedy, use_top_p=use_top_p)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    codes_pad, rest_sum = pl.pallas_call(
        kernel,
        in_specs=[
            smem, smem, smem,                        # seed, temp, top_p
            vmem, vmem, vmem,                        # xinit, cos, sin
            vmem, vmem, vmem, vmem, vmem,            # norms
            vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem,  # weights
            any_, any_,                              # heads, embds (HBM)
        ],
        out_specs=(vmem, vmem),
        out_shape=(
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, Hkv, CTX, D), jnp.float32),   # K cache
            pltpu.VMEM((L, Hkv, CTX, D), jnp.float32),   # V cache
            pltpu.VMEM((2, H, V), head_dtype),           # head double buffer
            pltpu.VMEM((8, H), cp_params.embds.dtype),   # embd 8-row buffer
            pltpu.VMEM((cfg.n_heads + 2 * Hkv, D), jnp.float32),  # head split
            pltpu.VMEM((1, cfg.n_heads * D), jnp.float32),        # head merge
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        # TPU-semantics interpreter: the HLO interpreter lacks the TPU PRNG
        # primitives used by the on-kernel sampler.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        jnp.asarray(temperature, jnp.float32).reshape(1, 1),
        jnp.asarray(top_p, jnp.float32).reshape(1, 1),
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
    return codes_pad[0, :S], rest_sum[0]
