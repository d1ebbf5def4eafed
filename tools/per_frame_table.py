#!/usr/bin/env python
"""Canonical per-frame cost table (VERDICT r3 #5).

The reference's QWEN3_TTS_TIMING build dumps a per-frame ms breakdown at the
end of generate() (src/tts_transformer.h:19-53, tts_transformer.cpp:2806-2848;
sample README.md:273-295: 314 ms/frame = 84 talker + 225 code-pred). This is
the TPU analog: one reproducible tool that emits the same table for the
single-stream and batched serving modes, built ONLY from dispatch-amortized
timings (CLAUDE.md rule: every component chains >=64 iterations inside one
jit so the fixed ~27 ms tunnel dispatch cannot poison per-frame numbers).

Method per mode:
  full       decode ms/frame as the SLOPE between two frame counts of the
             real generation program at EQUAL kv capacity — prefill, dispatch
             and host glue cancel in the difference.
  prefill    intercept of that fit minus the measured per-dispatch overhead
             (a trivial chained-null program timed separately).
  talker/cp  the fused kernels chained x N under one jit (same shapes/
             capacity as the full runs).
  glue       full - talker - cp (sampling, step-embd assembly, loop carry).
  vocode     the vocoder program chained x K in one jit, per frame.

    python tools/per_frame_table.py [--mode single|batched|both]
        [--json out.json]

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

REPS = 3


def _timed(fn, *args, reps=REPS, settle=lambda out: np.asarray(out)[..., :1]):
    """min-of-reps wall for fn(*args); a tiny host transfer forces settle
    (block_until_ready has been seen returning early over the tunnel)."""
    out = fn(*args)
    _ = settle(out)
    best = float("inf")
    for _rep in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = settle(out)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_dispatch_ms() -> float:
    """Fixed per-dispatch overhead: a null program's wall, min over 10."""
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32)
    _ = np.asarray(f(x))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def single_stream_table(tp, cp, tcfg, ccfg, vcfg, dispatch_ms):
    from qwen3tts_tpu.models import vocoder as vocoder_model
    from qwen3tts_tpu.ops.pallas_code_predictor import fused_predict_codes
    from qwen3tts_tpu.ops.pallas_talker_step import fused_talker_step
    from qwen3tts_tpu.runtime import decode_loop

    C = 512
    tokens = np.zeros((64,), np.int32)
    tokens[:24] = np.random.default_rng(0).integers(2, 150000, size=24)

    def gen(F):
        def run():
            return decode_loop.generate_from_tokens(
                tp, cp, jnp.asarray(tokens), jnp.int32(24),
                jnp.zeros((tcfg.hidden_size,), jnp.float32), jnp.int32(2050),
                jax.random.PRNGKey(7), talker_cfg=tcfg, cp_cfg=ccfg,
                max_frames=F, kv_capacity=C, temperature=0.9, top_k=50,
                repetition_penalty=1.05, allow_eos=False)
        return _timed(run, settle=lambda g: np.asarray(g.codes[:1, :1]))

    F1, F2 = 128, 256
    t1, t2 = gen(F1), gen(F2)
    slope_ms = 1e3 * (t2 - t1) / (F2 - F1)          # decode ms/frame
    intercept_ms = 1e3 * t1 - slope_ms * F1          # prefill + dispatch
    prefill_ms = max(0.0, intercept_ms - dispatch_ms)

    # talker kernel chained (same capacity; n_past advances like the loop)
    N = 96
    qb = tp.blocks

    @jax.jit
    def talker_chain(blocks, x, kv):
        def body(i, carry):
            x, kv = carry
            h, kv = fused_talker_step(blocks, tcfg, x, jnp.int32(10) + i, kv)
            return h.astype(x.dtype), kv
        return jax.lax.fori_loop(0, N, body, (x, kv))

    x0 = jnp.zeros((tcfg.hidden_size,), jnp.bfloat16)
    kv0 = jnp.zeros((tcfg.n_layers, 2, tcfg.n_kv_heads, C, tcfg.head_dim),
                    jnp.bfloat16)
    talker_ms = 1e3 * _timed(
        talker_chain, qb, x0, kv0,
        settle=lambda out: np.asarray(out[0][:1])) / N

    @jax.jit
    def cp_chain(cp_params, h, e):
        def body(i, carry):
            h, e = carry
            codes, nxt = fused_predict_codes(
                cp_params, ccfg, h, e, i, temperature=0.9, top_k=50)
            return h + nxt.astype(h.dtype) * 1e-6, e + codes.sum() * 0
        return jax.lax.fori_loop(0, N, body, (h, e))

    h0 = jnp.zeros((tcfg.hidden_size,), jnp.bfloat16)
    cp_ms = 1e3 * _timed(
        cp_chain, cp, h0, h0,
        settle=lambda out: np.asarray(out[0][:1])) / N

    glue_ms = slope_ms - talker_ms - cp_ms

    # vocoder: per frame, chained x4 in one jit
    from qwen3tts_tpu.models.vocoder import vocoder_forward
    K, Fv = 4, 256
    codes = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, size=(Fv, vcfg.n_codebooks)),
        jnp.int32)

    @jax.jit
    def voc_chain(vp, codes):
        def body(i, acc):
            # codes vary with i so XLA cannot hoist the loop-invariant body
            audio = vocoder_forward(vp, vcfg, codes + (i % 2), jnp.int32(Fv))
            return acc + audio[:8]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((8,), jnp.float32))

    from qwen3tts_tpu.models import vocoder as V
    vp = jax.block_until_ready(jax.jit(
        lambda: V.init_vocoder_params(jax.random.PRNGKey(3), vcfg,
                                      jnp.bfloat16))())
    vocode_ms = 1e3 * _timed(voc_chain, vp, codes,
                             settle=lambda out: np.asarray(out[:1])) / (K * Fv)

    return {
        "mode": "single_stream", "quant": "int8", "kv_capacity": C,
        "fit_frames": [F1, F2], "fit_walls_s": [round(t1, 3), round(t2, 3)],
        "prefill_ms": round(prefill_ms, 2),
        "per_frame": {
            "talker_ms": round(talker_ms, 3),
            "code_predictor_ms": round(cp_ms, 3),
            "glue_ms": round(glue_ms, 3),
            "decode_total_ms": round(slope_ms, 3),
            "vocode_ms": round(vocode_ms, 3),
            "total_ms": round(slope_ms + vocode_ms, 3),
        },
        "frames_per_s_decode": round(1e3 / slope_ms, 1),
    }


def batched_table(tp, cp, tcfg, ccfg, vcfg, dispatch_ms, B=64):
    from qwen3tts_tpu.models.vocoder import vocoder_forward
    from qwen3tts_tpu.ops.pallas_code_predictor_batched import (
        fused_predict_codes_batched)
    from qwen3tts_tpu.ops.pallas_talker_step import fused_talker_step_batched
    from qwen3tts_tpu.runtime import decode_loop

    C = 256
    rng = np.random.default_rng(0)
    tokens = np.zeros((B, 64), np.int32)
    tokens[:, :32] = rng.integers(2, 150000, size=(B, 32))
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    def gen(F):
        def run():
            return decode_loop.generate_from_tokens_batched(
                tp, cp, jnp.asarray(tokens), jnp.full((B,), 32, jnp.int32),
                jnp.zeros((B, tcfg.hidden_size), jnp.float32),
                jnp.full((B,), 2050, jnp.int32), keys,
                talker_cfg=tcfg, cp_cfg=ccfg, max_frames=F, kv_capacity=C,
                temperature=0.9, top_k=50, repetition_penalty=1.05,
                allow_eos=False)
        return _timed(run, settle=lambda g: np.asarray(g.codes[:1, :1, :1]))

    F1, F2 = 96, 192
    t1, t2 = gen(F1), gen(F2)
    slope_ms = 1e3 * (t2 - t1) / (F2 - F1)          # ms/frame-set
    intercept_ms = 1e3 * t1 - slope_ms * F1
    prefill_ms = max(0.0, intercept_ms - dispatch_ms)

    N = 96
    Vc = tcfg.codec_vocab_size
    samp = dict(top_k=50, suppress_start=Vc - tcfg.n_suppressed_tail,
                eos_id=tcfg.codec_eos_id, greedy=False, use_top_p=True)

    @jax.jit
    def talker_chain(blocks, output_norm, codec_head, x, kv, seen):
        def body(i, carry):
            x, kv, seen = carry
            h, cb0, kv = fused_talker_step_batched(
                blocks, tcfg, x, jnp.int32(10) + i, kv,
                output_norm=output_norm, codec_head=codec_head,
                seen=seen, seeds=jnp.arange(B, dtype=jnp.int32) + i,
                temperature=0.9, top_p=1.0, repetition_penalty=1.05, **samp)
            return h.astype(x.dtype), kv, seen
        return jax.lax.fori_loop(0, N, body, (x, kv, seen))

    x0 = jnp.zeros((B, tcfg.hidden_size), jnp.bfloat16)
    kv0 = jnp.zeros((B, tcfg.n_layers, 2, tcfg.n_kv_heads, C, tcfg.head_dim),
                    jnp.bfloat16)
    seen0 = jnp.zeros((B, Vc), jnp.bool_)
    talker_ms = 1e3 * _timed(
        talker_chain, tp.blocks, tp.output_norm, tp.codec_head, x0, kv0, seen0,
        settle=lambda out: np.asarray(out[0][:1, :1])) / N

    @jax.jit
    def cp_chain(cp_params, h, e):
        def body(i, carry):
            h, e = carry
            codes, nxt = fused_predict_codes_batched(
                cp_params, ccfg, h, e, jnp.arange(B, dtype=jnp.int32) + i,
                temperature=0.9, top_k=50)
            return h + nxt.astype(h.dtype) * 1e-6, e + codes.sum() * 0
        return jax.lax.fori_loop(0, N, body, (h, e))

    h0 = jnp.zeros((B, tcfg.hidden_size), jnp.bfloat16)
    cp_ms = 1e3 * _timed(
        cp_chain, cp, h0, h0,
        settle=lambda out: np.asarray(out[0][:1, :1])) / N

    glue_ms = slope_ms - talker_ms - cp_ms

    # batched vocode per frame-set: the serving path's 16-lane dispatch
    # (lax.map default since r4 — QWEN3TTS_VOCODE_MAP) at the pipeline's
    # resolved precision tier, chained x2
    from qwen3tts_tpu.models import vocoder as V
    from qwen3tts_tpu.pipeline import _VOCODE_MAP, _vocode_precision
    lanes, Fv, K = 16, 256, 2
    vp = jax.block_until_ready(jax.jit(
        lambda: V.init_vocoder_params(jax.random.PRNGKey(3), vcfg,
                                      jnp.bfloat16))())
    vcodes = jnp.asarray(
        rng.integers(0, 256, size=(lanes, Fv, vcfg.n_codebooks)), jnp.int32)
    nfr = jnp.full((lanes,), Fv, jnp.int32)
    precision = _vocode_precision()

    @jax.jit
    def voc_chain(vp, codes, nfr):
        def body(i, acc):
            with jax.default_matmul_precision(precision):
                ci = codes + (i % 2)   # i-dependence defeats LICM
                if _VOCODE_MAP == "laxmap":
                    audio = jax.lax.map(
                        lambda cn: vocoder_forward(vp, vcfg, cn[0], cn[1][0]),
                        (ci, nfr[:, None]))
                else:
                    audio = jax.vmap(
                        lambda c, n: vocoder_forward(vp, vcfg, c, n))(ci, nfr)
            return acc + audio[:, :8].sum(0)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((8,), jnp.float32))

    # ms per frame-SET at B lanes = (wall / (K * Fv)) * (B / lanes)
    voc_wall = _timed(voc_chain, vp, vcodes, nfr,
                      settle=lambda out: np.asarray(out[:1]))
    vocode_ms = 1e3 * voc_wall / (K * Fv) * (B / lanes)

    return {
        "mode": "batched", "batch": B, "quant": "int8", "kv_capacity": C,
        "fit_frames": [F1, F2], "fit_walls_s": [round(t1, 3), round(t2, 3)],
        "prefill_ms": round(prefill_ms, 2),
        "vocode_precision": precision,
        "per_frame_set": {
            "talker_ms": round(talker_ms, 3),
            "code_predictor_ms": round(cp_ms, 3),
            "glue_ms": round(glue_ms, 3),
            "decode_total_ms": round(slope_ms, 3),
            "vocode_ms": round(vocode_ms, 3),
            "total_ms": round(slope_ms + vocode_ms, 3),
        },
        "aggregate_frames_per_s_decode": round(B * 1e3 / slope_ms, 1),
        "aggregate_frames_per_s_e2e": round(B * 1e3 / (slope_ms + vocode_ms), 1),
    }


def render_markdown(rows: list[dict]) -> str:
    """Reference-style per-frame table (README.md:273-295 analog)."""
    lines = ["| mode | prefill ms | talker | code-pred | glue | decode total "
             "| vocode | total ms | f/s (decode) |",
             "|---|---|---|---|---|---|---|---|---|"]
    for r in rows:
        pf = r.get("per_frame") or r.get("per_frame_set")
        unit = "frame" if "per_frame" in r else f"frame-set (B={r['batch']})"
        fps = r.get("frames_per_s_decode",
                    r.get("aggregate_frames_per_s_decode"))
        lines.append(
            f"| {r['mode']} (per {unit}) | {r['prefill_ms']} | "
            f"{pf['talker_ms']} | {pf['code_predictor_ms']} | "
            f"{pf['glue_ms']} | {pf['decode_total_ms']} | {pf['vocode_ms']} | "
            f"{pf['total_ms']} | {fps} |")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="both",
                    choices=["single", "batched", "both"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from qwen3tts_tpu.config import PipelineConfig
    from qwen3tts_tpu.models import code_predictor as cp_model
    from qwen3tts_tpu.models import talker as talker_model
    from qwen3tts_tpu.ops.quant import quantize_block_params

    cfg = PipelineConfig()
    tcfg, ccfg, vcfg = cfg.talker, cfg.code_predictor, cfg.vocoder
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    @jax.jit
    def init_all():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return (talker_model.init_talker_params(k1, tcfg, jnp.bfloat16),
                cp_model.init_code_predictor_params(k2, ccfg, jnp.bfloat16))

    tp, cp = jax.block_until_ready(init_all())
    tp = tp._replace(blocks=quantize_block_params(tp.blocks))
    cp = cp._replace(blocks=quantize_block_params(cp.blocks))
    jax.block_until_ready((tp.blocks.wqkv.q, cp.blocks.wqkv.q))

    dispatch_ms = measure_dispatch_ms()
    print(f"per-dispatch overhead: {dispatch_ms:.1f} ms", file=sys.stderr)

    rows = []
    if args.mode in ("single", "both"):
        rows.append(single_stream_table(tp, cp, tcfg, ccfg, vcfg, dispatch_ms))
        print(json.dumps(rows[-1]), flush=True)
    if args.mode in ("batched", "both"):
        rows.append(batched_table(tp, cp, tcfg, ccfg, vcfg, dispatch_ms,
                                  B=args.batch))
        print(json.dumps(rows[-1]), flush=True)

    print()
    print(render_markdown(rows))
    out = {"dispatch_ms": round(dispatch_ms, 1),
           "device": str(jax.devices()[0]), "rows": rows}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"\nwrote {args.json}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
