#!/usr/bin/env python
"""Where does batched-vocode e2e wall actually go? (r4 follow-up to
tools/ab_vocode_precision.py, which showed precision tiers are wall-neutral.)

Hypotheses measured, each on the real chip:
  1. vmap overhead: vmapped 16-lane dispatch vs lax.map (sequential per-lane,
     same unbatched program body, ONE dispatch) vs per-lane unbatched walls.
  2. lane-group size: 16 vs 32 vs 64-lane programs at f32 (the 64-lane f32
     program failed to compile in r2 — retest).
  3. host fetch: np.asarray of the full [64, 491520] f32 audio vs device-side
     int16 PCM conversion (half the bytes; the WAV writer wants PCM16 anyway)
     vs tail-only settle.

    python tools/probe_vocode_e2e.py [--frames 256] [--reps 3]

Run exclusively on the tunneled chip.
"""

from __future__ import annotations

import argparse
import json
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
from qwen3tts_tpu.models import vocoder as V


def best_of(fn, reps):
    t = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        t = min(t, time.perf_counter() - t0)
    return t


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--total-lanes", type=int, default=64)
    args = ap.parse_args()

    cfg = PipelineConfig().vocoder
    T, B = args.frames, args.total_lanes
    spf = cfg.samples_per_frame
    params = jax.block_until_ready(jax.jit(
        lambda: V.init_vocoder_params(jax.random.PRNGKey(3), cfg, jnp.bfloat16))())
    rng = np.random.default_rng(0)
    out: dict = {"frames": T, "total_lanes": B, "device": str(jax.devices()[0]),
                 "sections": {}}

    def mk_codes(G):
        return jnp.asarray(rng.integers(0, 256, size=(G, T, cfg.n_codebooks)),
                           jnp.int32)

    def run_f32(body):
        def wrapped(*a):
            with jax.default_matmul_precision("float32"):
                return body(*a)
        return jax.jit(wrapped)

    # --- 1. vmap vs lax.map vs unbatched, 16 lanes ---
    G = 16
    codes16 = mk_codes(G)
    n16 = jnp.full((G,), T, jnp.int32)

    vmapped = run_f32(lambda p, c, n: jax.vmap(
        lambda ci, ni: V.vocoder_forward(p, cfg, ci, ni))(c, n))
    seqmap = run_f32(lambda p, c, n: jax.lax.map(
        lambda cn: V.vocoder_forward(p, cfg, cn[0], cn[1][0]), (c, n[:, None])))
    single = run_f32(lambda p, c, n: V.vocoder_forward(p, cfg, c, n))

    sec = {}
    for name, fn, fa in (("vmap16", vmapped, (params, codes16, n16)),
                         ("laxmap16", seqmap, (params, codes16, n16)),
                         ("single", single, (params, codes16[0], n16[0]))):
        try:
            y = fn(*fa)
            _ = np.asarray(y)[..., -4:]
            t = best_of(lambda: np.asarray(fn(*fa))[..., -4:], args.reps)
            per_lane = t / (G if name != "single" else 1)
            sec[name] = {"wall_s": round(t, 3), "ms_per_lane": round(per_lane * 1e3, 1)}
        except Exception as e:  # noqa: BLE001
            sec[name] = {"error": str(e)[:200]}
        print(json.dumps({name: sec[name]}), flush=True)
    out["sections"]["shape"] = sec

    # --- 2. lane-group size at f32 ---
    sec = {}
    for G in (16, 32, 64):
        codes = mk_codes(G)
        n = jnp.full((G,), T, jnp.int32)
        try:
            y = vmapped(params, codes, n)
            _ = np.asarray(y)[..., -4:]
            t = best_of(lambda: np.asarray(vmapped(params, codes, n))[..., -4:],
                        args.reps)
            sec[f"lanes{G}"] = {"wall_s": round(t, 3),
                                "ms_per_lane": round(t / G * 1e3, 1)}
        except Exception as e:  # noqa: BLE001
            sec[f"lanes{G}"] = {"error": str(e)[:300]}
        print(json.dumps({f"lanes{G}": sec[f"lanes{G}"]}), flush=True)
    out["sections"]["group_size"] = sec

    # --- 3. host fetch cost for B lanes of audio ---
    audio = vmapped(params, mk_codes(16), n16)
    # materialize a full [B, T*spf] f32 on device (tile the 16-lane output)
    full = jax.jit(lambda a: jnp.tile(a, (B // 16, 1)))(audio)
    pcm = jax.jit(lambda a: jnp.clip(a * 32767.0, -32768, 32767)
                  .astype(jnp.int16))(full)
    bf16 = jax.jit(lambda a: a.astype(jnp.bfloat16))(full)
    jax.block_until_ready((full, pcm, bf16))
    sec = {}
    for name, arr in (("f32", full), ("int16_pcm", pcm), ("bf16", bf16)):
        t = best_of(lambda: np.asarray(arr), args.reps)
        mb = arr.size * arr.dtype.itemsize / 1e6
        sec[name] = {"wall_s": round(t, 3), "mb": round(mb, 1),
                     "mb_per_s": round(mb / t, 1)}
        print(json.dumps({f"fetch_{name}": sec[name]}), flush=True)
    t = best_of(lambda: np.asarray(full[:, -8:]), args.reps)
    sec["tail_only"] = {"wall_s": round(t, 4)}
    out["sections"]["fetch"] = sec

    print(json.dumps({"summary": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
