#!/usr/bin/env python
"""TPU smoke + micro-bench for the BATCHED fused talker kernel (v3).

Validates against the vmapped XLA step at the real 0.6B configuration, then
times chained frame-sets (ITERS >= 100: the tunnel's fixed ~27 ms dispatch
otherwise poisons the number) vs the vmapped XLA carried path.
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

from qwen3tts_tpu.config import PipelineConfig
from qwen3tts_tpu.models import talker as talker_model
from qwen3tts_tpu.ops.pallas_talker_step import fused_talker_step_batched
from qwen3tts_tpu.ops.quant import quantize_block_params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--layout", choices=["batch", "lane", "both"],
                    default="batch")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--quant", choices=["int8", "q4", "bf16"], default="int8",
                    help="kernel weight tier: int8 w8a8 / q4 w4bf16 / plain "
                         "bf16 streamed")
    args = ap.parse_args()
    B, C, N = args.batch, args.cap, args.steps

    cfg = PipelineConfig().talker
    print(f"device: {jax.devices()[0]}  B={B} C={C}")

    @jax.jit
    def init():
        params = talker_model.init_talker_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(4), (B, cfg.hidden_size), jnp.bfloat16)
        return params, x
    params, x = jax.block_until_ready(init())
    if args.quant == "q4":
        from qwen3tts_tpu.ops.quant import quantize_block_params_w4

        qblocks = quantize_block_params_w4(params.blocks)
        jax.block_until_ready(qblocks.wqkv.q)
    elif args.quant == "bf16":
        qblocks = params.blocks   # plain arrays: the kernels' "bf16" mode
    else:
        qblocks = quantize_block_params(params.blocks)
        jax.block_until_ready(qblocks.wqkv.q)
    qparams = params._replace(blocks=qblocks)

    # --- correctness at B=8 (three live cache copies don't fit at B=64) ---
    Bc = min(B, 8)
    kv = jnp.zeros((Bc, cfg.n_layers, 2, cfg.n_kv_heads, C, cfg.head_dim), jnp.bfloat16)
    n_hist = 9
    kvh, xh = kv, x[:Bc]

    @jax.jit
    def hist(qparams, xh, kvh):
        def body(i, carry):
            xh, kvh = carry
            h, l, kvh = jax.vmap(lambda e, kvi: talker_model.talker_step(
                qparams, cfg, e, i, kvi, strategy="carried"))(xh, kvh)
            return (h.astype(xh.dtype), kvh)
        return jax.lax.fori_loop(0, n_hist, body, (xh, kvh))
    xh, kvh = jax.block_until_ready(hist(qparams, xh, kvh))

    t0 = time.perf_counter()
    hk, kvk = fused_talker_step_batched(qblocks, cfg, xh, jnp.int32(n_hist), kvh)
    np.asarray(hk)
    print(f"v3 compile+run: {time.perf_counter() - t0:.1f}s")
    hx, lx, kvx = jax.vmap(lambda e, kvi: talker_model.talker_step(
        qparams, cfg, e, jnp.int32(n_hist), kvi, strategy="carried"))(xh, kvh)
    # talker_step returns output-normed hidden; v3 without head returns
    # pre-norm — compare KV exactly and hidden direction via a normed copy
    from qwen3tts_tpu.ops.norms import rms_norm
    hk_n = np.asarray(jax.vmap(lambda h: rms_norm(
        h, params.output_norm.astype(jnp.float32), cfg.rms_norm_eps))(hk), np.float32)
    hx_n = np.asarray(hx, np.float32)
    cos = float((hk_n * hx_n).sum()
                / (np.linalg.norm(hk_n) * np.linalg.norm(hx_n) + 1e-9))
    kv_err = np.abs(np.asarray(kvk, np.float32) - np.asarray(kvx, np.float32)).max()
    print(f"v3 hidden cosine vs XLA(w8a16): {cos:.6f}  kv max err: {kv_err:.4f}")
    assert cos > 0.99 and np.isfinite(hk_n).all()
    del kv, kvh, kvk, kvx, xh, hk, hx, lx

    # --- chained timing at full B ---
    kv = jnp.zeros((B, cfg.n_layers, 2, cfg.n_kv_heads, C, cfg.head_dim), jnp.bfloat16)
    @jax.jit
    def run_v3(qblocks, x, kv):
        def body(i, carry):
            x, kv = carry
            h, kv = fused_talker_step_batched(qblocks, cfg, x, i, kv)
            return (h.astype(x.dtype), kv)
        return jax.lax.fori_loop(0, N, body, (x, kv))

    @jax.jit
    def run_v3_lane(qblocks, x, kv):
        def body(i, carry):
            x, kv = carry
            h, kv = fused_talker_step_batched(qblocks, cfg, x, i, kv,
                                              kv_layout="lane")
            return (h.astype(x.dtype), kv)
        return jax.lax.fori_loop(0, N, body, (x, kv))

    @jax.jit
    def run_xla(qparams, x, kv):
        def body(i, carry):
            x, kv = carry
            h, l, kv = jax.vmap(lambda e, kvi: talker_model.talker_step(
                qparams, cfg, e, i, kvi, strategy="carried"))(x, kv)
            return (h.astype(x.dtype), kv)
        return jax.lax.fori_loop(0, N, body, (x, kv))

    kv_lane = kv.transpose(1, 2, 3, 4, 0, 5)  # [L, 2, Hkv, C, B, D]
    runs = []
    if args.layout in ("batch", "both"):
        runs.append(("v3 batched kernel", run_v3, qblocks, kv))
    if args.layout in ("lane", "both"):
        runs.append(("v3 lane-major    ", run_v3_lane, qblocks, kv_lane))
    if not args.skip_xla:
        runs.append(("XLA vmapped      ", run_xla, qparams, kv))
    for name, fn, arg, kv0 in runs:
        out = jax.block_until_ready(fn(arg, x, kv0))
        best = float("inf")
        for _ in range(3):
            del out
            t0 = time.perf_counter()
            out = fn(arg, x, kv0)
            _ = np.asarray(out[0][:1])
            best = min(best, (time.perf_counter() - t0) / N)
        agg = B / best
        del out
        print(f"{name}: {best*1e3:.2f} ms/frame-set ({agg:.0f} lane-frames/s)")
    print("OK")


if __name__ == "__main__":
    main()
