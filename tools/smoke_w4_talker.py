#!/usr/bin/env python
"""TPU smoke + micro-bench for the w4 fused talker kernel (bf16-dequant group scales).

Validates the 4-bit path against the XLA w4a16 step at the real 0.6B
configuration, then times chained 64-step decodes: int8 v1 vs w4 v1 at
layers_per_step 2 and 4 (the packed weights halve the per-step VMEM block,
so twice the layers fit per grid step) vs w4 v2 (HBM KV).
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
from qwen3tts_tpu.models.transformer_core import forward_step
from qwen3tts_tpu.ops.pallas_talker_step import (
    fused_talker_step, fused_talker_step_hbm)
from qwen3tts_tpu.ops.quant import quantize_block_params, quantize_block_params_w4


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", type=int, nargs="*", default=[512])
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    cfg = PipelineConfig().talker
    print(f"device: {jax.devices()[0]}")

    @jax.jit
    def init():
        params = talker_model.init_talker_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(4), (cfg.hidden_size,), jnp.bfloat16)
        return params, x

    params, x = jax.block_until_ready(init())
    q8 = quantize_block_params(params.blocks)
    q4 = quantize_block_params_w4(params.blocks)
    jax.block_until_ready((q8.wqkv.q, q4.wqkv.q))
    ccfg = talker_model.core_config(cfg)

    # --- correctness: w4 kernel vs XLA step on the same w4 weights ---
    C = 512
    kv = jnp.zeros((cfg.n_layers, 2, cfg.n_kv_heads, C, cfg.head_dim), jnp.bfloat16)
    n_hist = 17
    kvh, xh = kv, x
    for i in range(n_hist):
        h, kvh = forward_step(q4, ccfg, xh, jnp.int32(i), kvh)
        xh = h.astype(x.dtype)
    t0 = time.perf_counter()
    hk, kvk = fused_talker_step(q4, cfg, xh, jnp.int32(n_hist), kvh)
    np.asarray(hk)
    print(f"w4 v1 compile+run: {time.perf_counter() - t0:.1f}s")
    hx, kvx = forward_step(q4, ccfg, xh, jnp.int32(n_hist), kvh)
    hk_n = np.asarray(hk, np.float32)
    hx_n = np.asarray(hx, np.float32)
    cos = float((hk_n * hx_n).sum()
                / (np.linalg.norm(hk_n) * np.linalg.norm(hx_n) + 1e-9))
    kv_err = np.abs(np.asarray(kvk, np.float32) - np.asarray(kvx, np.float32)).max()
    print(f"w4 hidden cosine vs XLA: {cos:.6f}  kv max err: {kv_err:.4f}")
    assert cos > 0.99 and np.isfinite(hk_n).all()

    N = args.steps

    def make_run(step_fn):
        @jax.jit
        def run(blocks, x, kv):
            def body(i, carry):
                x, kv = carry
                h, kv = step_fn(blocks, x, kv, i)
                return (h.astype(x.dtype), kv)
            return jax.lax.fori_loop(0, N, body, (x, kv))
        return run

    for C in args.caps:
        kv = jnp.zeros((cfg.n_layers, 2, cfg.n_kv_heads, C, cfg.head_dim), jnp.bfloat16)
        variants = [
            ("w4 v1 lps2", q4, make_run(
                lambda b, x, kv, i: fused_talker_step(b, cfg, x, i, kv))),
            ("w4 v1 lps4", q4, make_run(
                lambda b, x, kv, i: fused_talker_step(
                    b, cfg, x, i, kv, layers_per_step=4))),
            ("w4 v2 lps2", q4, make_run(
                lambda b, x, kv, i: fused_talker_step_hbm(b, cfg, x, i, kv))),
            ("w4 v2 lps4", q4, make_run(
                lambda b, x, kv, i: fused_talker_step_hbm(
                    b, cfg, x, i, kv, layers_per_step=4))),
        ]
        if C <= 1024:
            variants.insert(0, ("int8 v1   ", q8, make_run(
                lambda b, x, kv, i: fused_talker_step(b, cfg, x, i, kv))))
        for name, blocks, fn in variants:
            try:
                out = fn(blocks, x, kv)
                jax.block_until_ready(out)
            except Exception as e:
                print(f"C={C:5d} {name}: FAILED {type(e).__name__}: {str(e)[:200]}")
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(blocks, x, kv)
                _ = np.asarray(out[0])
                best = min(best, (time.perf_counter() - t0) / N)
            print(f"C={C:5d} {name}: {best * 1e3:.3f} ms/step (chained x{N})")
    print("OK")


if __name__ == "__main__":
    main()
