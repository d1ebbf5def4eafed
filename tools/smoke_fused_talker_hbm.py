#!/usr/bin/env python
"""TPU smoke + micro-bench for the HBM-KV (valid-prefix) fused talker kernel.

Run exclusively on the tunneled chip. Checks v2 against the XLA int8 path at
the real 0.6B configuration, then times chained 64-step decodes:
v1 (VMEM-resident KV) vs v2 (HBM KV, chunked DMA) vs XLA at several KV
capacities. v2's KV traffic is proportional to n_past, so it should match v1
at C=512 and keep that speed at long-form capacities where v1 cannot run.
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
from qwen3tts_tpu.ops.quant import quantize_block_params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", type=int, nargs="*", default=[512, 2304])
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
    qblocks = quantize_block_params(params.blocks)
    jax.block_until_ready(qblocks.wqkv.q)
    ccfg = talker_model.core_config(cfg)
    qparams_blocks = params._replace(blocks=qblocks).blocks

    # --- correctness at C=512, a mid-cache position ---
    C = 512
    kv = jnp.zeros((cfg.n_layers, 2, cfg.n_kv_heads, C, cfg.head_dim), jnp.bfloat16)
    # build some real history so attention reads a non-trivial prefix
    n_hist = 17
    kvh = kv
    xh = x
    for i in range(n_hist):
        h, kvh = forward_step(qparams_blocks, ccfg, xh, jnp.int32(i), kvh)
        xh = h.astype(x.dtype)
    t0 = time.perf_counter()
    hk, kvk = fused_talker_step_hbm(qblocks, cfg, xh, jnp.int32(n_hist), kvh)
    np.asarray(hk)
    print(f"v2 compile+run: {time.perf_counter() - t0:.1f}s")
    hx, kvx = forward_step(qparams_blocks, ccfg, xh, jnp.int32(n_hist), kvh)

    hk_n = np.asarray(hk, np.float32)
    hx_n = np.asarray(hx, np.float32)
    cos = float((hk_n * hx_n).sum()
                / (np.linalg.norm(hk_n) * np.linalg.norm(hx_n) + 1e-9))
    kv_err = np.abs(np.asarray(kvk, np.float32) - np.asarray(kvx, np.float32)).max()
    print(f"hidden cosine vs XLA(w8a16): {cos:.6f}  kv max err: {kv_err:.4f}")
    assert cos > 0.99 and np.isfinite(hk_n).all()

    # --- chained timing at each capacity ---
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
            ("v2 ", make_run(lambda b, x, kv, i: fused_talker_step_hbm(b, cfg, x, i, kv))),
            ("v4 ", make_run(lambda b, x, kv, i: fused_talker_step_hbm(
                b, cfg, x, i, kv, variant="pipelined"))),
            ("XLA", make_run(lambda b, x, kv, i: forward_step(b, ccfg, x, i, kv))),
        ]
        if C <= 1024:
            variants.insert(0, ("v1 ", make_run(
                lambda b, x, kv, i: fused_talker_step(b, cfg, x, i, kv))))
        for name, fn in variants:
            out = fn(qparams_blocks, x, kv)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(qparams_blocks, x, kv)
                _ = np.asarray(out[0])
                best = min(best, (time.perf_counter() - t0) / N)
            print(f"C={C:5d} {name}: {best * 1e3:.3f} ms/step (chained x{N})")
    print("OK")


if __name__ == "__main__":
    main()
