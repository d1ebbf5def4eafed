"""Mosaic-in-shard_map smoke on the real chip (VERDICT r4 #1).

The CPU-mesh dryrun validates the shard_map kernel route with INTERPRET
kernels; this tool proves the same program lowers and runs with the real
Mosaic kernels inside shard_map on TPU — a 1-device dp mesh is the largest
this environment offers, but it exercises exactly the lowering path
(pallas_call traced inside shard_map under jit) that a multi-chip dp mesh
would, per-device.

Run exclusively on the tunneled chip:  python tools/smoke_shard_map_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from qwen3tts_tpu import pipeline as pl
from qwen3tts_tpu.config import PipelineConfig
from qwen3tts_tpu.models import code_predictor as cp_model
from qwen3tts_tpu.models import talker as talker_model
from qwen3tts_tpu.ops.quant import quantize_block_params
from qwen3tts_tpu.parallel import kernel_safety, mesh as mesh_mod
from qwen3tts_tpu.runtime import decode_loop


def main():
    pl._enable_compile_cache()
    cfg = PipelineConfig()
    tcfg, ccfg = cfg.talker, cfg.code_predictor
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = talker_model.init_talker_params(k1, tcfg, jnp.bfloat16)
    cp = cp_model.init_code_predictor_params(k2, ccfg, jnp.bfloat16)
    tpq = tp._replace(blocks=quantize_block_params(tp.blocks))
    cpq = cp._replace(blocks=quantize_block_params(cp.blocks))

    B = 8
    rng = np.random.default_rng(0)
    tokens = np.zeros((B, 32), np.int32)
    tokens[:, :11] = rng.integers(2, 100, size=(B, 11))
    args = [jnp.asarray(tokens), jnp.full((B,), 11, jnp.int32),
            jnp.zeros((B, tcfg.hidden_size), jnp.bfloat16),
            jnp.full((B,), 2050, jnp.int32),
            jax.random.split(jax.random.PRNGKey(1), B)]
    kw = dict(talker_cfg=tcfg, cp_cfg=ccfg, max_frames=8, kv_capacity=256,
              temperature=0.0, top_k=0, repetition_penalty=1.05,
              fused_cp=True, fused_talker=True)

    t0 = time.perf_counter()
    base = decode_loop.generate_from_tokens_batched(tpq, cpq, *args, **kw)
    jax.block_until_ready(base.codes)
    t_base = time.perf_counter() - t0

    mesh = mesh_mod.make_mesh(1, 1)   # ("dp","tp") over the one real chip
    # force dp=1 to still take the shard_map route for the lowering proof
    rep, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    tps, cps = jax.device_put(tpq, rep), jax.device_put(cpq, rep)
    margs = [jax.device_put(a, dsh) for a in args]
    t0 = time.perf_counter()
    got = decode_loop._generate_batched_shard_map(
        mesh, tps, cps, *margs,
        dict(kw, top_p=1.0, nothink=False, allow_eos=True, kv_quant="none",
             greedy=True, use_top_p=False))
    jax.block_until_ready(got.codes)
    t_sm = time.perf_counter() - t0

    ok = (np.array_equal(np.asarray(base.codes), np.asarray(got.codes))
          and np.array_equal(np.asarray(base.n_frames), np.asarray(got.n_frames)))
    print(f"direct fused path:    {t_base:.2f}s (codes {np.asarray(base.codes).shape})")
    print(f"shard_map fused path: {t_sm:.2f}s — Mosaic kernels lowered+ran inside shard_map")
    print(f"codes exact match: {ok}")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
