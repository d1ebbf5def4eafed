#!/usr/bin/env python
"""Decompose the batched serving frame-set (VERDICT r2 task 5): where do the
ms/frame-set go at B=64 — talker kernel, cp kernel, or XLA glue?

Two independent methods, both tunnel-dispatch-safe:

1. **Chained-iteration subtraction**: time (a) the full batched decode loop,
   (b) the v3 batched talker kernel chained N times in one jit, (c) the
   batched cp kernel chained N times. glue = (a) - (b) - (c). Every loop
   chains >= 64 iterations inside ONE dispatch so the fixed ~27 ms tunnel
   cost amortizes out (CLAUDE.md measurement rule).

2. **jax.profiler trace** of a few warm frame-sets, written to --trace-dir
   (XProf/TensorBoard format). If a perfetto/chrome-trace .json.gz lands in
   the dir, the top device ops are summarized inline; otherwise inspect the
   directory offline.

    python tools/profile_batched.py --batch 64 --frames 128 [--trace-dir /tmp/bprof]

Run exclusively on the tunneled chip.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=96,
                    help="chained kernel iterations per timed dispatch")
    ap.add_argument("--trace-dir", default="")
    args = ap.parse_args()

    from qwen3tts_tpu.config import PipelineConfig
    from qwen3tts_tpu.models import code_predictor as cp_model
    from qwen3tts_tpu.models import talker as talker_model
    from qwen3tts_tpu.ops.pallas_code_predictor_batched import (
        fused_predict_codes_batched)
    from qwen3tts_tpu.ops.pallas_talker_step import fused_talker_step_batched
    from qwen3tts_tpu.ops.quant import quantize_block_params
    from qwen3tts_tpu.runtime import decode_loop

    cfg = PipelineConfig()
    tcfg, ccfg = cfg.talker, cfg.code_predictor
    B, F = args.batch, args.frames
    C = -(-(10 + F + 8) // 256) * 256
    print(f"device: {jax.devices()[0]}  B={B} frames={F} C={C}", file=sys.stderr)

    @jax.jit
    def init_all():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return (talker_model.init_talker_params(k1, tcfg, jnp.bfloat16),
                cp_model.init_code_predictor_params(k2, ccfg, jnp.bfloat16))

    tp, cp = jax.block_until_ready(init_all())
    tp = tp._replace(blocks=quantize_block_params(tp.blocks))
    cp = cp._replace(blocks=quantize_block_params(cp.blocks))
    jax.block_until_ready((tp.blocks.wqkv.q, cp.blocks.wqkv.q))

    rng = np.random.default_rng(0)
    tokens = np.zeros((B, 64), np.int32)
    tokens[:, :32] = rng.integers(2, 150000, size=(B, 32))
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    def run_full():
        return decode_loop.generate_from_tokens_batched(
            tp, cp, jnp.asarray(tokens), jnp.full((B,), 32, jnp.int32),
            jnp.zeros((B, tcfg.hidden_size), jnp.float32),
            jnp.full((B,), 2050, jnp.int32), keys,
            talker_cfg=tcfg, cp_cfg=ccfg, max_frames=F, kv_capacity=C,
            temperature=0.9, top_k=50, repetition_penalty=1.05,
            allow_eos=False)

    # (a) full loop
    g = run_full()
    _ = np.asarray(g.codes)
    t_full = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        g = run_full()
        _ = np.asarray(g.codes)
        t_full = min(t_full, time.perf_counter() - t0)
    per_set_full = 1e3 * t_full / F
    print(f"full loop: {t_full:.3f} s = {per_set_full:.3f} ms/frame-set")

    # (b) talker v3 kernel chained (KV threaded; n_past advances so DMA work
    # matches the real loop's average history depth)
    Vc = tcfg.codec_vocab_size
    N = args.iters
    samp = dict(top_k=50, suppress_start=Vc - tcfg.n_suppressed_tail,
                eos_id=tcfg.codec_eos_id, greedy=False, use_top_p=True)

    # weights ride as ARGS, never closure constants — closed-over full-size
    # weights are embedded in the remote-compile HTTP payload and it 413s
    # (this exact line killed the r3 run of this tool)
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

    talker_chain_full = jax.jit(talker_chain, donate_argnums=(4,))
    talker_chain_j = lambda x, kv, seen: talker_chain_full(  # noqa: E731
        tp.blocks, tp.output_norm, tp.codec_head, x, kv, seen)
    x0 = jnp.zeros((B, tcfg.hidden_size), jnp.bfloat16)
    kv0 = jnp.zeros((B, tcfg.n_layers, 2, tcfg.n_kv_heads, C, tcfg.head_dim),
                    jnp.bfloat16)
    seen0 = jnp.zeros((B, Vc), jnp.bool_)
    out = talker_chain_j(x0, kv0, seen0)
    _ = np.asarray(out[0][:1, :1])
    t_talker = float("inf")
    for _rep in range(3):
        kv0 = jnp.zeros_like(out[1])
        t0 = time.perf_counter()
        out = talker_chain_j(x0, kv0, seen0)
        _ = np.asarray(out[0][:1, :1])
        t_talker = min(t_talker, time.perf_counter() - t0)
    per_set_talker = 1e3 * t_talker / N
    print(f"talker v3 chained x{N}: {per_set_talker:.3f} ms/frame-set")

    # (c) batched cp kernel chained
    def cp_chain(cp_params, h, e):
        def body(i, carry):
            h, e = carry
            codes, nxt = fused_predict_codes_batched(
                cp_params, ccfg, h, e, jnp.arange(B, dtype=jnp.int32) + i,
                temperature=0.9, top_k=50)
            return h + nxt.astype(h.dtype) * 1e-6, e + codes.sum() * 0
        return jax.lax.fori_loop(0, N, body, (h, e))

    cp_chain_full = jax.jit(cp_chain)
    cp_chain_j = lambda h, e: cp_chain_full(cp, h, e)  # noqa: E731
    h0 = jnp.zeros((B, tcfg.hidden_size), jnp.bfloat16)
    out2 = cp_chain_j(h0, h0)
    _ = np.asarray(out2[0][:1, :1])
    t_cp = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        out2 = cp_chain_j(h0, h0)
        _ = np.asarray(out2[0][:1, :1])
        t_cp = min(t_cp, time.perf_counter() - t0)
    per_set_cp = 1e3 * t_cp / N
    print(f"cp batched chained x{N}: {per_set_cp:.3f} ms/frame-set")

    glue = per_set_full - per_set_talker - per_set_cp

    # (d) direct attribution of the glue: the PRNG chain (per-frame threefry
    # splits + bits — the body's only sequential small-op chain) and the XLA
    # assembly ops (one-hot cb0 embedding matmul, lockstep emission writes,
    # trailing-row reduction, seen update), each chained N times in ONE jit.
    H = tcfg.hidden_size
    Trb = 29

    def prng_chain(keys):
        def body(i, keys):
            ks = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
            keys_next, k_cb0, k_cp = ks[:, 0], ks[:, 1], ks[:, 2]
            s1 = jax.vmap(lambda kk: jax.lax.bitcast_convert_type(
                jax.random.bits(kk, (), "uint32"), jnp.int32))(k_cb0)
            s2 = jax.vmap(lambda kk: jax.lax.bitcast_convert_type(
                jax.random.bits(kk, (), "uint32"), jnp.int32))(k_cp)
            # fold the seeds back in so nothing dead-codes
            return keys_next.at[:, 0].add(
                (s1 + s2).astype(jnp.uint32) * jnp.uint32(0))
        return jax.lax.fori_loop(0, N, body, keys)

    prng_chain_j = jax.jit(prng_chain)
    out3 = prng_chain_j(keys)
    _ = np.asarray(out3[:1])
    t_prng = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        out3 = prng_chain_j(keys)
        _ = np.asarray(out3[:1])
        t_prng = min(t_prng, time.perf_counter() - t0)
    per_set_prng = 1e3 * t_prng / N
    print(f"prng chain x{N}: {per_set_prng:.3f} ms/frame-set")

    def assembly_chain(embd_table, trailing, codes_buf, hidden_buf, seen):
        def body(i, carry):
            codes_buf, hidden_buf, seen, acc = carry
            cb0 = (jnp.abs(acc[:, 0]).astype(jnp.int32) + i) % Vc   # [B]
            onehot = (cb0[:, None] == jnp.arange(Vc)[None, :])
            cb0_embd = jax.lax.dot_general(
                onehot.astype(jnp.bfloat16), embd_table,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                  # [B, H]
            emit = cb0 != 0
            fc = jnp.broadcast_to(cb0[:, None], (B, tcfg.n_codebooks))
            codes_buf = jax.lax.dynamic_update_slice(
                codes_buf,
                jnp.where(emit[:, None, None], fc[:, None, :],
                          jax.lax.dynamic_slice(
                              codes_buf, (0, i, 0), (B, 1, tcfg.n_codebooks))),
                (0, i, 0))
            h_row = cb0_embd.astype(jnp.bfloat16)[:, None, :]
            hidden_buf = jax.lax.dynamic_update_slice(
                hidden_buf,
                jnp.where(emit[:, None, None], h_row,
                          jax.lax.dynamic_slice(
                              hidden_buf, (0, i, 0), (B, 1, H))),
                (0, i, 0))
            seen = seen | (onehot & emit[:, None])
            t_idx = jnp.minimum(jnp.full((B,), i), Trb - 1)
            t_mask = (jnp.arange(Trb)[None, :] == t_idx[:, None])
            trailing_row = jnp.sum(
                jnp.where(t_mask[:, :, None], trailing, 0).astype(jnp.float32),
                axis=1)
            return codes_buf, hidden_buf, seen, acc + cb0_embd + trailing_row
        acc0 = jnp.zeros((B, H), jnp.float32)
        return jax.lax.fori_loop(
            0, N, body, (codes_buf, hidden_buf, seen, acc0))

    assembly_chain_j = jax.jit(assembly_chain, donate_argnums=(2, 3))
    embd_t = jnp.zeros((Vc, H), jnp.bfloat16)
    trail0 = jnp.zeros((B, Trb, H), jnp.bfloat16)
    cbuf0 = jnp.zeros((B, F, tcfg.n_codebooks), jnp.int32)
    hbuf0 = jnp.zeros((B, F, H), jnp.bfloat16)
    out4 = assembly_chain_j(embd_t, trail0, cbuf0, hbuf0, seen0)
    _ = np.asarray(out4[3][:1, :1])
    t_asm = float("inf")
    for _rep in range(3):
        cbuf0 = jnp.zeros((B, F, tcfg.n_codebooks), jnp.int32)
        hbuf0 = jnp.zeros((B, F, H), jnp.bfloat16)
        t0 = time.perf_counter()
        out4 = assembly_chain_j(embd_t, trail0, cbuf0, hbuf0, seen0)
        _ = np.asarray(out4[3][:1, :1])
        t_asm = min(t_asm, time.perf_counter() - t0)
    per_set_asm = 1e3 * t_asm / N
    print(f"assembly chain x{N}: {per_set_asm:.3f} ms/frame-set")

    print(json.dumps({
        "scenario": "batched_decomposition", "batch": B, "frames": F,
        "ms_per_frame_set": round(per_set_full, 3),
        "talker_ms": round(per_set_talker, 3),
        "cp_ms": round(per_set_cp, 3),
        "glue_ms": round(glue, 3),
        "glue_pct": round(100 * glue / per_set_full, 1),
        "glue_prng_ms": round(per_set_prng, 3),
        "glue_assembly_ms": round(per_set_asm, 3),
        "glue_unattributed_ms": round(glue - per_set_prng - per_set_asm, 3),
    }))

    if args.trace_dir:
        from qwen3tts_tpu.utils.profiling import trace
        with trace(args.trace_dir):
            g = run_full()
            _ = np.asarray(g.codes)
        print(f"trace written to {args.trace_dir}", file=sys.stderr)
        _summarize_trace(args.trace_dir)
    return 0


def _summarize_trace(trace_dir: str) -> None:
    """Best-effort inline summary: if the profiler emitted a chrome/perfetto
    .json(.gz) file, print the top device ops by total duration."""
    paths = (glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
             + glob.glob(os.path.join(trace_dir, "**", "*.trace.json"),
                         recursive=True))
    if not paths:
        print("no chrome-trace json found (inspect the xplane.pb in "
              "XProf/TensorBoard offline)", file=sys.stderr)
        return
    opener = gzip.open if paths[0].endswith(".gz") else open
    try:
        with opener(paths[0], "rt") as f:
            data = json.load(f)
    except Exception as e:  # noqa: BLE001
        print(f"trace parse failed: {e}", file=sys.stderr)
        return
    events = data.get("traceEvents", [])
    totals: dict[str, float] = {}
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            totals[name] = totals.get(name, 0.0) + ev["dur"]
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
    print("top trace events by total duration (us):")
    for name, dur in top:
        print(f"  {dur:12.0f}  {name[:110]}")


if __name__ == "__main__":
    sys.exit(main())
