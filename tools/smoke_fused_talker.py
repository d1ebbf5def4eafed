#!/usr/bin/env python
"""TPU smoke + micro-bench for the fused talker-step kernel.

Run exclusively on the tunneled chip. At the real 0.6B talker configuration
(synthetic weights): compiles the kernel, checks the hidden state and KV
update against the XLA int8 path (w8a8 activation quantization bounds the
deviation), and times a 64-step chained decode against the XLA path.
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
from qwen3tts_tpu.models import talker as talker_model
from qwen3tts_tpu.models.transformer_core import forward_step
from qwen3tts_tpu.ops.pallas_talker_step import fused_talker_step
from qwen3tts_tpu.ops.quant import quantize_block_params


def main() -> None:
    cfg = PipelineConfig().talker
    C = 512
    print(f"device: {jax.devices()[0]}  capacity: {C}")

    @jax.jit
    def init():
        params = talker_model.init_talker_params(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(4), (cfg.hidden_size,), jnp.bfloat16)
        kv = jnp.zeros((cfg.n_layers, 2, cfg.n_kv_heads, C, cfg.head_dim), jnp.bfloat16)
        return params, x, kv

    params, x, kv = jax.block_until_ready(init())
    qblocks = quantize_block_params(params.blocks)
    jax.block_until_ready(qblocks.wqkv.q)
    ccfg = talker_model.core_config(cfg)

    # --- correctness: chain 4 steps, compare hidden/kv against XLA int8 ---
    t0 = time.perf_counter()
    hk, kvk = fused_talker_step(qblocks, cfg, x, jnp.int32(0), kv)
    np.asarray(hk)
    print(f"kernel compile+run: {time.perf_counter() - t0:.1f}s")

    qparams_blocks = params._replace(blocks=qblocks).blocks
    hx, kvx = forward_step(qparams_blocks, ccfg, x, jnp.int32(0), kv)

    kvk_n, kvx_n = np.asarray(kvk, np.float32), np.asarray(kvx, np.float32)
    kv_err = np.abs(kvk_n - kvx_n).max()
    hk_n = np.asarray(hk, np.float32)
    hx_n = np.asarray(hx, np.float32)
    cos = float((hk_n * hx_n).sum()
                / (np.linalg.norm(hk_n) * np.linalg.norm(hx_n) + 1e-9))
    rel = float(np.abs(hk_n - hx_n).max() / (np.abs(hx_n).max() + 1e-9))
    print(f"hidden cosine vs XLA(w8a16): {cos:.6f}  max rel err: {rel:.4f}")
    print(f"kv row-write max err: {kv_err:.4f} (bf16 rope/norm tolerance)")
    assert cos > 0.99, "fused talker hidden diverges from the XLA path"
    assert np.isfinite(hk_n).all()

    # --- chained 64-step timing: kernel vs XLA path under one jit ---
    N = 64

    # NB: weights must be jit ARGUMENTS — closing over them embeds 440 MB of
    # constants into the remote-compile payload (HTTP 413)
    @jax.jit
    def run_kernel(blocks, x, kv):
        def body(i, carry):
            x, kv = carry
            h, kv = fused_talker_step(blocks, cfg, x, i, kv)
            return (h.astype(x.dtype), kv)
        return jax.lax.fori_loop(0, N, body, (x, kv))

    @jax.jit
    def run_xla(blocks, x, kv):
        def body(i, carry):
            x, kv = carry
            h, kv = forward_step(blocks, ccfg, x, i, kv)
            return (h.astype(x.dtype), kv)
        return jax.lax.fori_loop(0, N, body, (x, kv))

    for name, fn in (("kernel", run_kernel), ("XLA", run_xla)):
        out = fn(qparams_blocks, x, kv)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(qparams_blocks, x, kv)
            _ = np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / N)
        print(f"{name:7s}: {best * 1e3:.3f} ms/step (chained x{N})")
    print("OK")


if __name__ == "__main__":
    main()
