#!/usr/bin/env python
"""TPU smoke + micro-bench for the int8 KV-cache tier (ops/kv_quant.py).

Run exclusively on the tunneled chip. Compiles the v2 (single-stream HBM) and
v3 (batched) fused talker kernels with int8 (q, scale) caches at the real
0.6B configuration, checks the chained-decode hidden state against the bf16
cache variants (cosine), and times N chained steps inside ONE jit per
variant (CLAUDE.md: micro-benchmarks must chain >=100 iterations or the
fixed ~27 ms dispatch swamps the result).

Usage: python tools/smoke_kv_int8.py [--steps 96] [--batch 16] [--capacity 512]
"""

from __future__ import annotations

import argparse
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

from functools import partial

from jax import lax

from qwen3tts_tpu.config import PipelineConfig
from qwen3tts_tpu.models import talker as talker_model
from qwen3tts_tpu.ops.kv_quant import quantize_kv
from qwen3tts_tpu.ops.pallas_talker_step import (
    fused_talker_step_batched, fused_talker_step_hbm)
from qwen3tts_tpu.ops.quant import quantize_block_params


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--start", type=int, default=None,
                    help="initial n_past (default capacity//2)")
    ap.add_argument("--only", choices=["v2", "v3"], default=None,
                    help="run only the single-stream (v2) or batched (v3) pair")
    args = ap.parse_args()

    cfg = PipelineConfig().talker
    C = args.capacity
    N = args.steps
    B = args.batch
    start = args.start if args.start is not None else C // 2
    assert start + N <= C
    print(f"device: {jax.devices()[0]}  C={C} steps={N} start={start} B={B}")

    @jax.jit
    def init():
        params = talker_model.init_talker_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(4), (cfg.hidden_size,), jnp.bfloat16)
        xb = jax.random.normal(jax.random.PRNGKey(5), (B, cfg.hidden_size), jnp.bfloat16)
        kv = 0.1 * jax.random.normal(
            jax.random.PRNGKey(6),
            (cfg.n_layers, 2, cfg.n_kv_heads, C, cfg.head_dim), jnp.bfloat16)
        kv = kv.at[:, :, :, start:].set(0)
        kvb = 0.1 * jax.random.normal(
            jax.random.PRNGKey(7),
            (B, cfg.n_layers, 2, cfg.n_kv_heads, C, cfg.head_dim), jnp.bfloat16)
        kvb = kvb.at[:, :, :, :, start:].set(0)
        return params, x, xb, kv, kvb

    params, x, xb, kv, kvb = jax.block_until_ready(init())
    qblocks = quantize_block_params(params.blocks)
    jax.block_until_ready(qblocks.wqkv.q)

    # NB: weights ride as jit ARGUMENTS — closing over them embeds them in
    # the remote-compile HTTP payload (413, CLAUDE.md)
    @partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
    def chain_v2(blocks, x0, kv0, n):
        def body(i, carry):
            x_c, kv_c = carry
            h, kv_c = fused_talker_step_hbm(
                blocks, cfg, x_c, jnp.int32(start) + i, kv_c)
            return h.astype(x0.dtype), kv_c
        return lax.fori_loop(0, n, body, (x0, kv0))

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
    def chain_v3(blocks, x0, kv0, n):
        def body(i, carry):
            x_c, kv_c = carry
            h, kv_c = fused_talker_step_batched(
                blocks, cfg, x_c, jnp.int32(start) + i, kv_c)
            return h.astype(x0.dtype), kv_c
        return lax.fori_loop(0, n, body, (x0, kv0))

    results = {}
    # caches are built lazily per variant and dropped after (holding all four
    # at once peaks ~8 GB at B=64 and has OOMed the tunneled chip)
    # jit the quantize: eagerly it materializes the full cache as f32
    # (astype) — 7.5 GB at B=64 — where the jitted version fuses elementwise
    qkv_jit = jax.jit(quantize_kv)
    variants = [
        ("v2-bf16", chain_v2, x, lambda: kv),
        ("v2-int8", chain_v2, x, lambda: qkv_jit(kv)),
        ("v3-bf16", chain_v3, xb, lambda: kvb),
        ("v3-int8", chain_v3, xb, lambda: qkv_jit(kvb)),
    ]
    if args.only:
        variants = [v for v in variants if v[0].startswith(args.only)]
    for name, fn, x0, mk in variants:
        kv0 = jax.block_until_ready(mk())
        t0 = time.perf_counter()
        h, _ = fn(qblocks, x0, jax.tree.map(jnp.copy, kv0), N)
        h = np.asarray(h, np.float32)
        print(f"{name}: compile+run {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        h2, _ = fn(qblocks, x0, jax.tree.map(jnp.copy, kv0), N)
        h2 = np.asarray(h2, np.float32)
        dt = time.perf_counter() - t0
        del kv0
        results[name] = h
        per = "step" if name.startswith("v2") else "frame-set"
        print(f"{name}: {N} steps in {dt * 1e3:.1f} ms -> "
              f"{dt / N * 1e3:.3f} ms/{per}")
        np.testing.assert_array_equal(h, h2)  # determinism across runs

    # NB: chained cosine is INFORMATIONAL — after N autoregressive steps the
    # trajectory diverges chaotically for ANY per-step perturbation (per-step
    # parity is 0.9999999+ in interpret mode, tests/test_fused_talker.py);
    # the servable-quality gate is the greedy-codes A/B in the decode loop
    # (tools/ab_kv_int8.py / test_generate_kv_quant_int8_matches_codes).
    ok = all(np.isfinite(v).all() for v in results.values())
    for pair in ("v2", "v3"):
        if f"{pair}-bf16" in results and f"{pair}-int8" in results:
            c = _cos(results[f"{pair}-bf16"], results[f"{pair}-int8"])
            print(f"chained-hidden cosine {pair} int8-vs-bf16: {c:.6f} "
                  f"(informational)")
            ok = ok and c > 0.5
    print("OK" if ok else "FAIL: non-finite or uncorrelated chained hidden")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
