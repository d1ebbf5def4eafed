#!/usr/bin/env python
"""TPU smoke + micro-bench for the mega-fused code-predictor kernel.

Run exclusively on the tunneled chip (see CLAUDE.md). Checks, at the REAL
0.6B code-predictor configuration with synthetic weights:
  1. w8a8 kernel compiles and runs; greedy codes match the XLA int8 path
     closely (activation quant can flip near-ties);
  2. sampled mode is seed-sensitive (the interpret-mode PRNG is a zero stub,
     so this is only observable here);
  3. per-call wall time vs the XLA predict_codes path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qwen3tts_tpu.config import PipelineConfig
from qwen3tts_tpu.models import code_predictor as cp_model
from qwen3tts_tpu.ops import pallas_code_predictor as pcp
from qwen3tts_tpu.ops.quant import quantize_block_params


def ref_w8a8_greedy(qp, cfg, th, cb0, follow=None):
    """Plain-jnp reimplementation of the kernel's exact w8a8 math (greedy):
    16 sequential single-token passes, per-token activation quantization,
    int8 x int8 -> int32 dots, f32 epilogue. Used to separate 'tiny-margin
    argmax flips cascade under AR feedback' from 'kernel math is wrong'."""
    L, Hq, Hkv, D = cfg.n_layers, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    G, F, eps = Hq // Hkv, cfg.intermediate_size, cfg.rms_norm_eps
    half = D // 2

    def rms(x, w):
        v = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(v + eps) * w.astype(jnp.float32)

    def mmq(x, w):
        amax = jnp.max(jnp.abs(x))
        s = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w.q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (s * w.scale.astype(jnp.float32))

    def rope(t, p):
        inv = cfg.rope_theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
        c, s = jnp.cos(p * inv)[None], jnp.sin(p * inv)[None]
        t1, t2 = t[:, :half], t[:, half:]
        return jnp.concatenate([t1 * c - t2 * s, t1 * s + t2 * c], axis=-1)

    b = qp.blocks
    K = np.zeros((L, Hkv, 16, D), np.float32)
    V = np.zeros((L, Hkv, 16, D), np.float32)

    def layer_pass(x, p):
        for l in range(L):
            h = rms(x, b.attn_norm[l])
            qkv = mmq(h, jax.tree.map(lambda a: a[l], b.wqkv))
            q = qkv[0, : Hq * D].reshape(Hq, D)
            k = qkv[0, Hq * D:(Hq + Hkv) * D].reshape(Hkv, D)
            v = qkv[0, (Hq + Hkv) * D:].reshape(Hkv, D)
            q = rope(rms(q, b.q_norm[l]), p)
            k = rope(rms(k, b.k_norm[l]), p)
            K[l, :, p] = np.asarray(k)
            V[l, :, p] = np.asarray(v)
            o = np.zeros((Hq, D), np.float32)
            for hh in range(Hkv):
                sc = np.asarray(q)[hh * G:(hh + 1) * G] @ K[l, hh, :p + 1].T * D**-0.5
                e = np.exp(sc - sc.max(-1, keepdims=True))
                o[hh * G:(hh + 1) * G] = (e / e.sum(-1, keepdims=True)) @ V[l, hh, :p + 1]
            x = x + mmq(jnp.asarray(o.reshape(1, Hq * D)),
                        jax.tree.map(lambda a: a[l], b.wo))
            h = rms(x, b.ffn_norm[l])
            gu = mmq(h, jax.tree.map(lambda a: a[l], b.w_gateup))
            gate = gu[:, :F]
            gate = gate / (1.0 + jnp.exp(-gate))
            x = x + mmq(gate * gu[:, F:], jax.tree.map(lambda a: a[l], b.w_down))
        return x

    codes = []
    gaps = []
    x = th.astype(jnp.float32)[None]
    layer_pass(x, 0)
    prev = cb0.astype(jnp.float32)[None]
    for p in range(1, 16):
        if p >= 2:
            prev = qp.embds[p - 2, codes[-1]].astype(jnp.float32)[None]
        xo = layer_pass(prev, p)
        h = rms(xo, qp.output_norm).astype(qp.heads.dtype)
        logits = np.asarray(jax.lax.dot_general(
            h, qp.heads[p - 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))[0]
        own = int(logits.argmax())
        if follow is not None:
            k_code = int(follow[p - 1])
            gaps.append((logits[own] - logits[k_code]) / (logits.std() + 1e-9))
            codes.append(k_code)
        else:
            codes.append(own)
    if follow is not None:
        return np.array(codes, np.int32), np.array(gaps, np.float32)
    return np.array(codes, np.int32)


def main() -> None:
    cfg = PipelineConfig().code_predictor
    print(f"device: {jax.devices()[0]}")

    @jax.jit
    def init():
        k = jax.random.PRNGKey(0)
        params = cp_model.init_code_predictor_params(k, cfg, jnp.bfloat16)
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        th = jax.random.normal(k1, (cfg.hidden_size,), jnp.bfloat16)
        cb0 = jax.random.normal(k2, (cfg.hidden_size,), jnp.bfloat16)
        return params, th, cb0

    params, th, cb0 = jax.block_until_ready(init())
    qparams = params._replace(blocks=quantize_block_params(params.blocks))
    jax.block_until_ready(qparams.blocks.wqkv.q)

    # --- 1. greedy w8a8 vs XLA int8 path ---
    t0 = time.perf_counter()
    codes_k, sum_k = pcp.fused_predict_codes(
        qparams, cfg, th, cb0, jnp.int32(0), temperature=0.0, top_k=0)
    codes_k = np.asarray(codes_k)
    print(f"kernel compile+run: {time.perf_counter() - t0:.1f}s")
    codes_x = np.asarray(cp_model.predict_codes(
        qparams, cfg, th, cb0, jax.random.PRNGKey(0), temperature=0.0, top_k=0))
    agree = (codes_k == codes_x).mean()
    print(f"greedy codes kernel:  {codes_k.tolist()}")
    print(f"greedy codes XLA:     {codes_x.tolist()}")
    print(f"agreement vs XLA(w8a16): {agree:.2f}  (divergence here is "
          f"act-quant argmax flips cascading under AR feedback)")
    codes_r = ref_w8a8_greedy(qparams, cfg, th, cb0)
    agree_r = (codes_k == codes_r).mean()
    print(f"greedy codes ref-w8a8: {codes_r.tolist()}")
    print(f"agreement vs exact w8a8 reference: {agree_r:.2f}")
    # teacher-forced margin audit: every kernel/ref disagreement must be a
    # near-tie (gap << logit std), otherwise the kernel math is wrong
    _, gaps = ref_w8a8_greedy(qparams, cfg, th, cb0, follow=codes_k)
    print("per-step normalized argmax gaps:",
          [round(float(g), 4) for g in gaps])
    # For 2048 iid-normal synthetic logits the expected top1-top2 gap is
    # ~0.06 sigma, so sub-0.15-sigma flips are tie-breaking, not math bugs
    # (measured: 14/15 steps agree exactly, one flip at 0.052 sigma).
    worst = float(np.max(gaps))
    assert worst < 0.15, f"kernel choice beaten by {worst:.3f} sigma — math bug"
    expect_sum = np.asarray(jnp.sum(
        qparams.embds[jnp.arange(cfg.n_steps), codes_k].astype(jnp.float32), axis=0))
    err = np.abs(np.asarray(sum_k) - expect_sum).max()
    print(f"rest_sum max err vs gather: {err:.2e}")
    assert err < 1e-2

    # --- 2. seed sensitivity (sampled) ---
    t0 = time.perf_counter()
    sa, _ = pcp.fused_predict_codes(
        qparams, cfg, th, cb0, jnp.int32(1234), temperature=0.9, top_k=50)
    sa = np.asarray(sa)
    print(f"sampled compile+run: {time.perf_counter() - t0:.1f}s")
    sb = np.asarray(pcp.fused_predict_codes(
        qparams, cfg, th, cb0, jnp.int32(1234), temperature=0.9, top_k=50)[0])
    sc = np.asarray(pcp.fused_predict_codes(
        qparams, cfg, th, cb0, jnp.int32(777), temperature=0.9, top_k=50)[0])
    print(f"sampled seed=1234: {sa.tolist()}")
    print(f"sampled seed=777:  {sc.tolist()}")
    assert (sa == sb).all(), "same seed must reproduce"
    assert (sa != sc).any(), "different seeds must differ"

    # --- 3. micro-bench: kernel vs XLA path, sampled mode (bench settings) ---
    def time_best3(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(20):
                out = fn(i)
            _ = np.asarray(out[0] if isinstance(out, tuple) else out)
            best = min(best, (time.perf_counter() - t0) / 20)
        return best

    @jax.jit
    def xla_once(i):
        return cp_model.predict_codes(
            qparams, cfg, th, cb0, jax.random.PRNGKey(i),
            temperature=0.9, top_k=50)

    _ = np.asarray(xla_once(0))
    t_xla = time_best3(lambda i: xla_once(i))
    t_kern = time_best3(lambda i: pcp.fused_predict_codes(
        qparams, cfg, th, cb0, jnp.int32(i), temperature=0.9, top_k=50))
    print(f"XLA predict_codes: {t_xla * 1e3:.3f} ms/frame (incl dispatch)")
    print(f"fused kernel:      {t_kern * 1e3:.3f} ms/frame (incl dispatch)")

    # chained x32 under one jit: true device time without per-dispatch cost
    N = 32

    @jax.jit
    def chained(qp, th, cb0):
        def body(i, carry):
            th, acc = carry
            codes, rsum = pcp.fused_predict_codes(
                qp, cfg, th, cb0, i, temperature=0.9, top_k=50)
            return (th + 1e-6 * rsum.astype(th.dtype), acc + codes[0])
        return jax.lax.fori_loop(0, N, body, (th, jnp.int32(0)))

    out = chained(qparams, th, cb0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(qparams, th, cb0)
        _ = np.asarray(out[1])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"fused kernel chained x{N}: {best * 1e3:.3f} ms/frame (device)")
    print("OK")


if __name__ == "__main__":
    main()
