#!/usr/bin/env python
"""A/B the int8 KV-cache tier against the bf16 cache on the REAL generation
path (decode_loop.generate_from_tokens / _batched), on hardware.

Reports per-run wall time and the code match rate between the two cache
representations with identical PRNG keys. Codes can legitimately diverge
after the first near-tie sample flip (AR), so the match rate is read
qualitatively: a healthy tier matches the frame prefix exactly and keeps
total frame counts identical.

Usage: python tools/ab_kv_int8.py [--frames 256] [--batch 0] [--capacity-frames N]
  --batch 0 = single-stream; >0 = batched serving shape.
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
from qwen3tts_tpu.models import code_predictor as cp_model
from qwen3tts_tpu.models import talker as talker_model
from qwen3tts_tpu.ops.quant import quantize_block_params
from qwen3tts_tpu.runtime import decode_loop


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--greedy", action="store_true")
    args = ap.parse_args()

    cfg = PipelineConfig()
    tcfg, ccfg = cfg.talker, cfg.code_predictor
    B = args.batch
    print(f"device: {jax.devices()[0]}  frames={args.frames} B={B or 'single'}")

    @jax.jit
    def init():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return (talker_model.init_talker_params(k1, tcfg, jnp.bfloat16),
                cp_model.init_code_predictor_params(k2, ccfg, jnp.bfloat16))

    tp, cp = jax.block_until_ready(init())
    tp = tp._replace(blocks=quantize_block_params(tp.blocks))
    cp = cp._replace(blocks=quantize_block_params(cp.blocks))
    jax.block_until_ready((tp.blocks.wqkv.q, cp.blocks.wqkv.q))

    rng = np.random.default_rng(0)
    KV = -(-(10 + args.frames + 8) // 256) * 256
    sampling = dict(temperature=0.0 if args.greedy else 0.9,
                    top_k=0 if args.greedy else 50, repetition_penalty=1.05)

    outs = {}
    for kvq in ("none", "int8"):
        if B:
            tokens = np.zeros((B, 64), np.int32)
            tokens[:, :32] = rng.integers(2, 150000, size=(B, 32))

            def run():
                return decode_loop.generate_from_tokens_batched(
                    tp, cp, jnp.asarray(tokens), jnp.full((B,), 32, jnp.int32),
                    jnp.zeros((B, tcfg.hidden_size), jnp.float32),
                    jnp.full((B,), 2050, jnp.int32),
                    jax.random.split(jax.random.PRNGKey(1), B),
                    talker_cfg=tcfg, cp_cfg=ccfg, max_frames=args.frames,
                    kv_capacity=KV, allow_eos=False, kv_quant=kvq, **sampling)
        else:
            tokens = np.zeros((64,), np.int32)
            tokens[:32] = rng.integers(2, 150000, size=32)

            def run():
                return decode_loop.generate_from_tokens(
                    tp, cp, jnp.asarray(tokens), jnp.int32(32),
                    jnp.zeros((tcfg.hidden_size,), jnp.float32), jnp.int32(2050),
                    jax.random.PRNGKey(1),
                    talker_cfg=tcfg, cp_cfg=ccfg, max_frames=args.frames,
                    kv_capacity=KV, allow_eos=False, kv_quant=kvq, **sampling)

        t0 = time.perf_counter()
        g = run()
        codes = np.asarray(g.codes)
        print(f"kv_quant={kvq}: compile+run {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            g = run()
            codes = np.asarray(g.codes)
            best = min(best, time.perf_counter() - t0)
        total = int(np.asarray(g.n_frames).sum())
        print(f"kv_quant={kvq}: best wall {best:.3f}s -> "
              f"{total / best:.1f} frames/s")
        outs[kvq] = codes

    a, b = outs["none"], outs["int8"]
    match = float((a == b).mean())
    fa = a.reshape(-1, a.shape[-1])
    fb = b.reshape(-1, b.shape[-1])
    framewise = (fa == fb).all(axis=1)
    # length of the exactly-matching frame prefix (per lane averaged)
    print(f"code match rate: {match:.4f}  frame-exact: {framewise.mean():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
