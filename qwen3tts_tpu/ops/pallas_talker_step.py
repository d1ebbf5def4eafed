"""Fused talker decode step: all 28 layers of one AR frame in ONE Pallas
call, gridded over layer groups so each layer's int8 weights stream
HBM->VMEM exactly once, double-buffered behind the previous group's compute.

Why: the XLA step path costs ~28 layer-iteration boundaries of small-op
overhead per frame on top of the weight streaming, and XLA's M=1 GEMVs run
below HBM speed-of-light. Gridding one kernel over layers removes the
per-layer dispatch entirely and lets Mosaic pipeline weight DMA against
compute; the activation (a single [1, H] vector) is carried across grid
steps in VMEM scratch.

Per layer (semantics of models/transformer_core._forward_step_*, reference
src/tts_transformer.cpp:1268-1411):
  RMSNorm -> fused QKV (int8 w8a8 dot) -> q/k RMSNorm -> NEOX RoPE
  -> KV-cache row write at n_past (one-hot masked full-block update)
  -> GQA attention over cache[0:n_past+1] (per-kv-head NT dots, f32 softmax)
  -> o_proj -> RMSNorm -> SwiGLU -> residual.
After the last layer the kernel also applies the output RMSNorm and the
codec LM head (reference :1837-1845), so the decode loop gets
(normed hidden, logits) in the same call.

The v1 KV cache block [LPS, 2, Hkv, C, D] rides the grid as input AND
output (aliased): read, row-updated, written back. That bounds v1 to
moderate capacities (the whole block must fit in VMEM twice); long-form
buckets route to the HBM-cache variants below (v2 grid, v4 pipelined),
whose valid-prefix chunked DMA has no capacity gate.

`layers_per_step` (LPS) controls how many layers one grid step processes:
more layers per step amortizes per-grid-step overhead against more VMEM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# v1's KV blocks (2*Hkv*C*D per layer group) ride the grid in and out, so
# ITS KV traffic scales with CAPACITY; the HBM variants' (v2 grid /
# v4 pipelined) scale with the valid prefix and have no capacity gate.
# This constant only selects v1-vs-HBM in the "auto" kernel policy
# (runtime/decode_loop._make_body): at C<=512 v1 measured 1.23 vs v2's
# 1.35 ms/step; at C=2304 v2 runs 1.36 vs XLA 1.82 (long-form never falls
# back to XLA — the r1-era crossover note about 221 vs 360 f/s predates
# v2). QWEN3TTS_TALKER_KERNEL=pipelined routes v4 everywhere.
MAX_FUSED_CAPACITY = 1024
DEFAULT_LAYERS_PER_STEP = 2


def fused_talker_enabled() -> bool:
    """Default-on on TPU backends; QWEN3TTS_FUSED_TALKER=0 disables."""
    if os.environ.get("QWEN3TTS_FUSED_TALKER", "1") in ("0", "false", "off"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _rms(x, w, eps):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * lax.rsqrt(var + eps) * w.astype(jnp.float32)


def _make_mm_values(mode):
    """Value-level in-kernel x[M,K] @ W (see _make_mm for the mode table):
    takes the already-loaded weight block `wq` and scale rows `ws` — the
    grid kernels slice them from blocked refs (_make_mm), the pipelined v4
    kernel from its manually-DMA'd scratch slabs."""
    modes = (mode,) * 4 if isinstance(mode, str) else tuple(mode)

    def quant_act(x):
        # per-row scales: one token per row (M=1 single-stream; M=B lanes in
        # the batched kernel — each lane keeps its own dynamic range)
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s_act = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x / s_act), -127.0, 127.0).astype(jnp.int8)
        return xq, s_act

    def dot(a, b, accum_dtype):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=accum_dtype)

    def mmv(x, wq, ws, which=0):
        mode = modes[which]
        ws = ws.astype(jnp.float32)
        if mode in ("w4bf16", "w4dequant"):
            Kh, N = wq.shape
            G = ws.shape[0] // 2        # ws stacks [scales; zeros], G rows each
            Gh = G // 2
            gs = (2 * Kh) // G
            b = wq.astype(jnp.int32)
            lo = (b & 15).astype(jnp.float32)
            hi = ((b >> 4) & 15).astype(jnp.float32)
            s, z = ws[:G], ws[G:]

            def full(rows):
                # broadcast each group's row over its gs K-rows (row-major
                # collapse [G/2, gs, N] -> [K/2, N] is tile-aligned: gs % 8
                # == 0 at real shapes)
                return jnp.broadcast_to(
                    rows[:, None, :], (Gh, gs, N)).reshape(Kh, N)

            w_lo = lo * full(s[:Gh]) - full(z[:Gh])
            w_hi = hi * full(s[Gh:]) - full(z[Gh:])
            if mode == "w4bf16":
                xb = x.astype(jnp.bfloat16)
                return (dot(xb[:, :Kh], w_lo.astype(jnp.bfloat16), jnp.float32)
                        + dot(xb[:, Kh:], w_hi.astype(jnp.bfloat16), jnp.float32))
            return (dot(x[:, :Kh], w_lo, jnp.float32)
                    + dot(x[:, Kh:], w_hi, jnp.float32))
        if mode == "w8a8":
            xq, s_act = quant_act(x)
            return dot(xq, wq, jnp.int32).astype(jnp.float32) * (s_act * ws)
        if mode == "bf16":
            # full-precision tier: plain bf16 weights, f32 MXU accum (ws is
            # a dummy ones row — unquantized blocks have no scales)
            return dot(x.astype(wq.dtype), wq, jnp.float32)
        return dot(x, wq.astype(jnp.float32) * ws, jnp.float32)

    return mmv


def _make_mm(mode):
    """In-kernel x[1,K] @ W for sub-layer j of the grid step's weight block.

    Modes: "w8a8" int8 weights / dynamic per-token int8 activations (int32
    MXU accum); "dequant" int8 weights dequantized to f32 (test reference);
    "w4bf16"/"w4dequant" the same pair for split-half nibble-packed int4
    weights with per-K-group scales (QuantLinear4): the byte block [K/2, N]
    unpacks into two contiguous halves (mask/shift only, no interleave),
    each dequantized in-register with its group-broadcast scales and dotted
    in bf16 ("w4bf16") or f32 ("w4dequant") — halved HBM weight traffic; the
    group scales are what keep the 4-bit tier servable (cosine >= 0.99).

    `mode` may also be a 4-tuple of per-weight modes in (wqkv, wo, w_gateup,
    w_down) order — the MIXED tier (attn int8 / ffn u4) resolves there; call
    sites select their slot via mm's `which` argument."""
    mmv = _make_mm_values(mode)

    def mm(x, wq_ref, ws_ref, j, which=0):
        return mmv(x, wq_ref[0, j], ws_ref[0, j], which)

    return mm


def _weight_mode(blocks, mode):
    """Resolve the kernel weight mode from the block pytree's leaf types.
    Homogeneous blocks yield one string; the MIXED tier (attn int8 / ffn u4,
    ops/quant.quantize_block_params_mixed) yields a 4-tuple in
    (wqkv, wo, w_gateup, w_down) order that _make_mm resolves per call."""
    from .quantized_matmul import QuantLinear, QuantLinear4

    def leaf(w):
        if isinstance(w, QuantLinear4):
            return "w4dequant" if mode == "dequant" else "w4bf16"
        if not isinstance(w, QuantLinear):
            return "bf16"   # plain [L, K, N] arrays: the full-precision tier
        return mode

    ms = tuple(leaf(w) for w in (blocks.wqkv, blocks.wo,
                                 blocks.w_gateup, blocks.w_down))
    return ms[0] if len(set(ms)) == 1 else ms


def _weight_specs_and_operands(blocks, blk, grp):
    """(in_specs, operands) for the four projection weights: block shapes are
    derived from the leaves so int8 ([K, N] q + [1, N] scale) and packed u4
    ([K/2, N] q + per-group affine params) route through the same plumbing.
    QuantLinear4's scale and zero rows stack into ONE [2G, N] operand (rows
    [0, G) scales, [G, 2G) zeros) to keep the kernel signature fixed."""
    from .quantized_matmul import QuantLinear4

    specs, ops = [], []
    for w in (blocks.wqkv, blocks.wo, blocks.w_gateup, blocks.w_down):
        if isinstance(w, QuantLinear4):
            q = w.q
            sz = jnp.concatenate([w.scale, w.zero], axis=-2)
        elif hasattr(w, "q"):
            q, sz = w.q, w.scale
        else:   # plain [L, K, N] bf16 weights: dummy ones scale row
            q = w
            sz = jnp.ones(w.shape[:-2] + (1, 128), jnp.float32)
        specs += [blk(tuple(q.shape[-2:])), blk(tuple(sz.shape[-2:]))]
        ops += [grp(q), grp(sz)]
    return specs, ops


def _sample_cfg(codec_head, top_k, suppress_start, eos_id, greedy, use_top_p,
                per_lane=False):
    """Static config for the in-kernel cb0 sampling epilogue."""
    from .kernel_prng import make_sampler

    Vc = codec_head.shape[-1]
    return {
        "fn": make_sampler(top_k, Vc, greedy=greedy, use_top_p=use_top_p),
        "suppress_start": Vc if suppress_start is None else suppress_start,
        "eos_id": eos_id,
        "per_lane": per_lane,
    }


def _sample_epilogue(logits, seen_ref, samp_ref, seed_ref, sample, out_ref):
    """cb0 sampling on in-VMEM logits [R, Vc]: suppression of
    [suppress_start, Vc) except eos_id, HF repetition penalty over the seen
    mask, then the shared counter-hash temp/top-k/top-p sampler
    (semantics: ops/sampling.{apply_suppression,apply_repetition_penalty,
    sample_token}). Writes int32 [R, 1] token ids to out_ref.

    With sample["per_lane"], samp_ref is [R, 4] VMEM rows of
    (temp, top_p, penalty, 0) — each [R, 1] column broadcasts through the
    row-wise math exactly like the scalar (continuous serving: per-request
    sampling params)."""
    R, Vc = logits.shape
    ids = lax.broadcasted_iota(jnp.int32, (R, Vc), 1)
    smask = jnp.logical_and(ids >= sample["suppress_start"],
                            ids != sample["eos_id"])
    logits = jnp.where(smask, NEG_INF, logits)
    if sample.get("per_lane"):
        pen, temp, topp = (samp_ref[:, 2:3], samp_ref[:, 0:1],
                           samp_ref[:, 1:2])
    else:
        pen, temp, topp = samp_ref[0, 2], samp_ref[0, 0], samp_ref[0, 1]
    seen = seen_ref[...] != 0
    penalized = jnp.where(logits > 0.0, logits / pen, logits * pen)
    logits = jnp.where(seen, penalized, logits)
    out_ref[...] = sample["fn"](
        logits, temp, topp, seed_ref[...], jnp.int32(0))


def _sample_operands(seen, seeds, temperature, top_p, repetition_penalty):
    """(specs, operands) for the sampling epilogue's three extra inputs.
    Scalar params pack into one SMEM (1,4) row; per-lane [B] arrays pack
    into a VMEM [B,4] slab (columns: temp, top_p, penalty, pad)."""
    R = seen.shape[0]
    per_lane = any(getattr(v, "ndim", 0) >= 1
                   for v in (temperature, top_p, repetition_penalty))
    if per_lane:
        def col(v):
            v = jnp.asarray(v, jnp.float32)
            return jnp.broadcast_to(v.reshape(-1, 1) if v.ndim else v,
                                    (R, 1))
        samp = jnp.concatenate(
            [col(temperature), col(top_p), col(repetition_penalty),
             jnp.zeros((R, 1), jnp.float32)], axis=1)
        samp_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        samp = jnp.stack([
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_p, jnp.float32),
            jnp.asarray(repetition_penalty, jnp.float32),
            jnp.float32(0.0)]).reshape(1, 4)
        samp_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
             samp_spec,
             pl.BlockSpec(memory_space=pltpu.VMEM)]
    ops = [seen.astype(jnp.int8), samp,
           jnp.asarray(seeds, jnp.int32).reshape(R, 1)]
    return specs, ops, per_lane


def _make_kernel(cfg, C, *, mode, kv_dtype, lps, with_head, sample=None):
    H = cfg.hidden_size
    L = cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    G = Hq // Hkv
    F = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    scale = D ** -0.5
    mm = _make_mm(mode)

    def kernel(n_past_ref, x_in_ref, cos_ref, sin_ref,
               attn_n_ref, q_n_ref, k_n_ref, ffn_n_ref,
               wqkv_q, wqkv_s, wo_q, wo_s, wgu_q, wgu_s, wd_q, wd_s,
               *rest):
        rest = list(rest)
        if with_head:
            out_n_ref, head_ref = rest[0], rest[1]
            del rest[:2]
            if sample is not None:
                seen_ref, samp_ref, seed_ref = rest[0], rest[1], rest[2]
                del rest[:3]
        (kv_in_ref, kv_out_ref, hid_ref) = rest[:3]
        logits_ref = rest[3] if with_head else None
        x_ref, sc_heads, sc_flat = rest[(4 if with_head else 3):]

        g = pl.program_id(0)
        n_past = n_past_ref[0, 0]

        @pl.when(g == 0)
        def _():
            x_ref[...] = x_in_ref[...].astype(jnp.float32)

        x = x_ref[...]
        cos = cos_ref[...].astype(jnp.float32)   # [1, D/2]
        sin = sin_ref[...].astype(jnp.float32)

        def rope(t):
            half = D // 2
            t1, t2 = t[:, :half], t[:, half:]
            return jnp.concatenate(
                [t1 * cos - t2 * sin, t1 * sin + t2 * cos], axis=-1)

        pos = lax.broadcasted_iota(jnp.int32, (Hkv, C, D), 1)
        col = lax.broadcasted_iota(jnp.int32, (G, C), 1)
        valid = col <= n_past

        for j in range(lps):
            l = g * lps + j
            h = _rms(x, attn_n_ref[l], eps)
            qkv = mm(h, wqkv_q, wqkv_s, j, 0)

            # lane->sublane relayout through scratch (per-head rows)
            for i in range(Hq + 2 * Hkv):
                sc_heads[i:i + 1, :] = qkv[:, i * D:(i + 1) * D]
            q = _rms(sc_heads[0:Hq, :], q_n_ref[l], eps)
            k = _rms(sc_heads[Hq:Hq + Hkv, :], k_n_ref[l], eps)
            v = sc_heads[Hq + Hkv:Hq + 2 * Hkv, :]
            q = rope(q)
            k = rope(k)

            # KV row write at n_past: one-hot masked full-block update
            kv_out_ref[0, j, 0] = jnp.where(
                pos == n_past, k[:, None, :].astype(kv_dtype),
                kv_in_ref[0, j, 0])
            kv_out_ref[0, j, 1] = jnp.where(
                pos == n_past, v[:, None, :].astype(kv_dtype),
                kv_in_ref[0, j, 1])

            # GQA attention over cache[0:n_past+1] (per-kv-head NT dots)
            for hh in range(Hkv):
                qh = q[hh * G:(hh + 1) * G, :].astype(kv_dtype)   # [G, D]
                kh = kv_out_ref[0, j, 0, hh]                       # [C, D]
                vh = kv_out_ref[0, j, 1, hh]
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = jnp.where(valid, s, NEG_INF)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                oh = jax.lax.dot_general(
                    p.astype(kv_dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)            # [G, D]
                for gg in range(G):
                    sc_flat[0:1, (hh * G + gg) * D:(hh * G + gg + 1) * D] = \
                        oh[gg:gg + 1, :]

            x = x + mm(sc_flat[...], wo_q, wo_s, j, 1)
            h = _rms(x, ffn_n_ref[l], eps)
            gu = mm(h, wgu_q, wgu_s, j, 2)
            gate = gu[:, :F]
            gate = gate / (1.0 + jnp.exp(-gate))
            x = x + mm(gate * gu[:, F:], wd_q, wd_s, j, 3)

        x_ref[...] = x

        if with_head:
            @pl.when(g == pl.num_programs(0) - 1)
            def _():
                normed = _rms(x_ref[...], out_n_ref[...], eps)
                hid_ref[...] = normed
                logits = jax.lax.dot_general(
                    normed.astype(head_ref.dtype), head_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if sample is None:
                    logits_ref[...] = logits
                else:
                    _sample_epilogue(logits, seen_ref, samp_ref, seed_ref,
                                     sample, logits_ref)
        else:
            hid_ref[...] = x

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "cfg", "mode", "layers_per_step", "top_k", "suppress_start", "eos_id",
    "greedy", "use_top_p", "interpret"))
def fused_talker_step(
    blocks,                    # BlockParams with QuantLinear projections
    cfg,                       # TalkerConfig
    step_embd: jnp.ndarray,    # [H]
    n_past: jnp.ndarray,       # scalar int32
    kv: jnp.ndarray,           # [L, 2, Hkv, C, D]
    *,
    output_norm: jnp.ndarray | None = None,   # [H] -> also apply norm+head
    codec_head: jnp.ndarray | None = None,    # [H, Vc]
    mode: str = "w8a8",
    layers_per_step: int | None = None,   # None => DEFAULT (bf16 mode: 1)
    seen: jnp.ndarray | None = None,       # [Vc] bool — enables cb0 sampling
    seeds: jnp.ndarray | None = None,      # scalar int32 counter-hash seed
    temperature=1.0, top_p=1.0, repetition_penalty=1.0,   # traced scalars
    top_k: int = 0,
    suppress_start: int | None = None,
    eos_id: int = -1,
    greedy: bool = False,
    use_top_p: bool = True,
    interpret: bool = False,
):
    """One talker decode step through all layers.

    Returns (hidden [H] f32, kv) — hidden is pre-output-norm; or, when
    output_norm/codec_head are given, (normed_hidden [H] f32,
    logits [Vc] f32, kv).

    When `seen` is given (requires codec_head), the kernel samples NEXT
    frame's codebook-0 token in its head epilogue (see _sample_epilogue)
    and returns (normed_hidden, cb0 scalar int32, kv) — the logits never
    leave the kernel."""
    if jax.default_backend() == "cpu":
        interpret = True   # CPU has no Mosaic: tests force the fused path
    H, L = cfg.hidden_size, cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    F = cfg.intermediate_size
    C = kv.shape[3]
    half = D // 2
    QKV = (Hq + 2 * Hkv) * D
    mode = _weight_mode(blocks, mode)
    if layers_per_step is None:
        # bf16 weight blocks are 2x int8: halve the default VMEM footprint
        layers_per_step = 1 if mode == "bf16" else DEFAULT_LAYERS_PER_STEP
    lps = layers_per_step if L % layers_per_step == 0 else 1
    with_head = codec_head is not None
    sample_cb0 = seen is not None
    if sample_cb0:
        assert with_head, "cb0 sampling needs codec_head"
        sample = _sample_cfg(codec_head, top_k, suppress_start, eos_id,
                             greedy, use_top_p)
    else:
        sample = None

    angles = (jnp.asarray(n_past, jnp.float32)
              * cfg.rope_theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half))
    cos, sin = jnp.cos(angles)[None, :], jnp.sin(angles)[None, :]

    kernel = _make_kernel(cfg, C, mode=mode, kv_dtype=kv.dtype, lps=lps,
                          with_head=with_head, sample=sample)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def blk(shape):
        nd = len(shape) + 1
        return pl.BlockSpec(
            (1, lps) + shape, lambda g: (g,) + (0,) * nd,
            memory_space=pltpu.VMEM)

    def grp(a):
        """[L, ...] -> [L/lps, lps, ...] (free reshape on the leading axis)."""
        return a.reshape((L // lps, lps) + a.shape[1:])

    wspecs, wops = _weight_specs_and_operands(blocks, blk, grp)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),    # n_past (1,1)
        vmem_full, vmem_full, vmem_full,          # x, cos, sin
        vmem_full, vmem_full, vmem_full, vmem_full,  # norms [L,1,dim]
    ] + wspecs
    operands = [
        jnp.asarray(n_past, jnp.int32).reshape(1, 1),
        step_embd.reshape(1, H), cos, sin,
        blocks.attn_norm[:, None, :], blocks.q_norm[:, None, :],
        blocks.k_norm[:, None, :], blocks.ffn_norm[:, None, :],
    ] + wops
    if with_head:
        Vc = codec_head.shape[-1]
        in_specs += [vmem_full, vmem_full]
        operands += [output_norm.reshape(1, H), codec_head]
        if sample_cb0:
            sspecs, sops, _ = _sample_operands(
                seen.reshape(1, -1), seeds, temperature, top_p,
                repetition_penalty)
            in_specs += sspecs
            operands += sops
    kv_operand_index = len(operands)
    in_specs.append(blk((2, Hkv, C, D)))
    operands.append(grp(kv))

    out_specs = [
        blk((2, Hkv, C, D)),                      # kv out (aliased)
        pl.BlockSpec((1, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L // lps, lps) + kv.shape[1:], kv.dtype),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
    ]
    if with_head and sample_cb0:
        out_specs.append(
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.int32))
    elif with_head:
        out_specs.append(
            pl.BlockSpec((1, Vc), lambda g: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, Vc), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(L // lps,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),                 # x carry
            pltpu.VMEM((Hq + 2 * Hkv, D), jnp.float32),      # head split
            pltpu.VMEM((1, Hq * D), jnp.float32),            # head merge
        ],
        input_output_aliases={kv_operand_index: 0},          # kv in -> kv out
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # double-buffered per-group weight blocks (~15.7*lps MB int8) +
            # the KV block in/out + scratch
            vmem_limit_bytes=115 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)

    kv_new = outs[0].reshape(kv.shape)
    if with_head and sample_cb0:
        return outs[1][0], outs[2][0, 0], kv_new
    if with_head:
        return outs[1][0], outs[2][0], kv_new
    return outs[1][0], kv_new


# ---------------------------------------------------------------------------
# v2: HBM-resident KV with valid-prefix chunked DMA (flash-decode attention)
# ---------------------------------------------------------------------------
#
# The v1 kernel above carries whole KV blocks [lps, 2, Hkv, C, D] through
# VMEM as aliased grid inputs/outputs: its KV traffic scales with CAPACITY
# (read + write back every layer) and the double-buffered blocks bound it to
# C <= 1024. This variant leaves the cache in HBM (pl.ANY) and, per layer,
# DMAs only the VALID prefix in CHUNK-row slabs, double-buffered behind the
# flash (online-softmax) accumulation — KV traffic is proportional to n_past,
# there is no capacity gate, and the freed VMEM headroom belongs to weights.
#
# The current step's K/V row never enters the cache inside the kernel: its
# attention contribution is folded analytically into the flash state as one
# extra column, the per-layer rows are returned as a [L, 2, Hkv, D] output,
# and the caller scatters them at n_past with ONE dynamic_update_slice
# (in-place on the donated while_loop carry).

_DEFAULT_KV_CHUNK = 256


def _int8_chunk(C: int, chunk: int) -> int:
    """Chunk size for int8-KV DMA: the per-row scale slab slices its C axis
    as the LANE (minor) dim, so chunks must be multiples of 128 on hardware
    (CLAUDE.md DMA rule). Tiny test capacities (<128, interpret-only) fall
    back to plain divisors."""
    chunk = max(chunk, 128)
    while C % chunk != 0 or (C >= 128 and chunk % 128 != 0):
        chunk -= 1
        if chunk == 0:
            return C
    return chunk


def _make_kernel_hbm(cfg, C, *, mode, kv_dtype, lps, with_head, chunk,
                     kv_int8=False, sample=None):
    H = cfg.hidden_size
    L = cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    G = Hq // Hkv
    F = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    scale = D ** -0.5
    mm = _make_mm(mode)
    # int8 cache: slabs stay int8 on the MXU input side (cast to bf16 — int8
    # magnitudes are exact in bf16); K's row scales multiply the [G, chunk]
    # score matrix and V's fold into p, so dequant never touches [chunk, D]
    cdt = jnp.bfloat16 if kv_int8 else kv_dtype

    def kernel(n_past_ref, x_in_ref, cos_ref, sin_ref,
               attn_n_ref, q_n_ref, k_n_ref, ffn_n_ref,
               wqkv_q, wqkv_s, wo_q, wo_s, wgu_q, wgu_s, wd_q, wd_s,
               *rest):
        rest = list(rest)
        if with_head:
            out_n_ref, head_ref = rest[0], rest[1]
            del rest[:2]
            if sample is not None:
                seen_ref, samp_ref, seed_ref = rest[0], rest[1], rest[2]
                del rest[:3]
        kv_hbm = rest.pop(0)
        kvs_hbm = rest.pop(0) if kv_int8 else None
        kvrow_ref = rest.pop(0)
        hid_ref = rest.pop(0)
        logits_ref = rest.pop(0) if with_head else None
        x_ref, sc_heads, sc_flat, kv_buf, sem = rest[:5]
        if kv_int8:
            sc_buf, sem_s = rest[5], rest[6]

        g = pl.program_id(0)
        n_past = n_past_ref[0, 0]
        # prefix chunks to stream: ceil(n_past / chunk)
        trip = lax.div(n_past + (chunk - 1), jnp.int32(chunk))

        @pl.when(g == 0)
        def _():
            x_ref[...] = x_in_ref[...].astype(jnp.float32)

        x = x_ref[...]
        cos = cos_ref[...].astype(jnp.float32)
        sin = sin_ref[...].astype(jnp.float32)

        def rope(t):
            half = D // 2
            t1, t2 = t[:, :half], t[:, half:]
            return jnp.concatenate(
                [t1 * cos - t2 * sin, t1 * sin + t2 * cos], axis=-1)

        for j in range(lps):
            l = g * lps + j
            h = _rms(x, attn_n_ref[l], eps)
            qkv = mm(h, wqkv_q, wqkv_s, j, 0)

            for i in range(Hq + 2 * Hkv):
                sc_heads[i:i + 1, :] = qkv[:, i * D:(i + 1) * D]
            q = _rms(sc_heads[0:Hq, :], q_n_ref[l], eps)
            k = _rms(sc_heads[Hq:Hq + Hkv, :], k_n_ref[l], eps)
            v = sc_heads[Hq + Hkv:Hq + 2 * Hkv, :]
            q = rope(q)
            k = rope(k)

            kvrow_ref[0, j, 0] = k.astype(kv_dtype)
            kvrow_ref[0, j, 1] = v.astype(kv_dtype)

            # match the v1/XLA numerics: q and the cached K/V interact at the
            # cache dtype (the current row goes through the same cast)
            qc = q.astype(cdt)
            kc = k.astype(cdt)
            vc = v.astype(cdt)

            # int8 cache note: an s8xs8 MXU variant (q/p re-quantized
            # per row, scales folded into the [G, chunk] score matrix) was
            # measured SLOWER than this cast-and-dot form (1.944 vs 1.734
            # ms/step at C=2304 — Mosaic transposes the s8 slab for the NT
            # dot, re-paying the relayout the s8 dot was meant to avoid), so
            # int8 reads dequantize via a cdt cast + score-matrix scaling.

            def dma(c, slot):
                off = pl.multiple_of(c * chunk, chunk)
                cps = [pltpu.make_async_copy(
                    kv_hbm.at[l, :, :, pl.ds(off, chunk), :],
                    kv_buf.at[slot], sem.at[slot])]
                if kv_int8:
                    cps.append(pltpu.make_async_copy(
                        kvs_hbm.at[l, :, :, pl.ds(off, chunk)],
                        sc_buf.at[slot], sem_s.at[slot]))
                return cps

            def dma_start(c, slot):
                for cp in dma(c, slot):
                    cp.start()

            def dma_wait(c, slot):
                for cp in dma(c, slot):
                    cp.wait()

            @pl.when(trip > 0)
            def _():
                dma_start(jnp.int32(0), jnp.int32(0))

            # flash state stacked [Hkv, G, *]: per-head updates rebuild the
            # stack by concatenation on the untiled leading axis (Mosaic has
            # no scatter; value .at[].set would not lower)
            def chunk_body(c, carry):
                m, lsum, acc = carry
                slot = lax.rem(c, 2)

                @pl.when(c + 1 < trip)
                def _():
                    dma_start(c + 1, 1 - slot)

                dma_wait(c, slot)
                col = c * chunk + lax.broadcasted_iota(
                    jnp.int32, (G, chunk), 1)
                valid = col < n_past
                ms, ls, accs = [], [], []
                for hh in range(Hkv):
                    rows = slice(hh * G, (hh + 1) * G)
                    s = jax.lax.dot_general(
                        qc[rows], kv_buf[slot, 0, hh].astype(cdt),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    if kv_int8:
                        s = s * sc_buf[slot, 0, hh:hh + 1]   # [G,ch]*[1,ch]
                    s = jnp.where(valid, s, NEG_INF)
                    m_new = jnp.maximum(
                        m[hh], jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(m[hh] - m_new)
                    ls.append((alpha * lsum[hh]
                               + jnp.sum(p, axis=-1, keepdims=True))[None])
                    pv = p * sc_buf[slot, 1, hh:hh + 1] if kv_int8 else p
                    accs.append((acc[hh] * alpha + jax.lax.dot_general(
                        pv.astype(cdt), kv_buf[slot, 1, hh].astype(cdt),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))[None])
                    ms.append(m_new[None])
                return (jnp.concatenate(ms, axis=0),
                        jnp.concatenate(ls, axis=0),
                        jnp.concatenate(accs, axis=0))

            m0 = jnp.full((Hkv, G, 1), NEG_INF, jnp.float32)
            l0 = jnp.zeros((Hkv, G, 1), jnp.float32)
            a0 = jnp.zeros((Hkv, G, D), jnp.float32)
            m, lsum, acc = lax.fori_loop(0, trip, chunk_body, (m0, l0, a0))

            # fold in the current step's K/V as one extra attention column
            for hh in range(Hkv):
                rows = slice(hh * G, (hh + 1) * G)
                # [G, 1] score vs the current row: elementwise reduce (an
                # N=1 NT dot trips a Mosaic vector.broadcast verifier bug)
                s_cur = jnp.sum(
                    qc[rows].astype(jnp.float32)
                    * kc[hh:hh + 1].astype(jnp.float32),
                    axis=-1, keepdims=True) * scale
                m_fin = jnp.maximum(m[hh], s_cur)
                p_cur = jnp.exp(s_cur - m_fin)
                alpha = jnp.exp(m[hh] - m_fin)
                l_fin = alpha * lsum[hh] + p_cur
                o = (acc[hh] * alpha
                     + p_cur * vc[hh:hh + 1].astype(jnp.float32))
                o = o / jnp.maximum(l_fin, 1e-30)
                for gg in range(G):
                    sc_flat[0:1, (hh * G + gg) * D:(hh * G + gg + 1) * D] = \
                        o[gg:gg + 1, :]

            x = x + mm(sc_flat[...], wo_q, wo_s, j, 1)
            h = _rms(x, ffn_n_ref[l], eps)
            gu = mm(h, wgu_q, wgu_s, j, 2)
            gate = gu[:, :F]
            gate = gate / (1.0 + jnp.exp(-gate))
            x = x + mm(gate * gu[:, F:], wd_q, wd_s, j, 3)

        x_ref[...] = x

        if with_head:
            @pl.when(g == pl.num_programs(0) - 1)
            def _():
                normed = _rms(x_ref[...], out_n_ref[...], eps)
                hid_ref[...] = normed
                logits = jax.lax.dot_general(
                    normed.astype(head_ref.dtype), head_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if sample is None:
                    logits_ref[...] = logits
                else:
                    _sample_epilogue(logits, seen_ref, samp_ref, seed_ref,
                                     sample, logits_ref)
        else:
            hid_ref[...] = x

    return kernel


def _make_kernel_hbm_pipelined(cfg, C, *, mode, kv_dtype, with_head, chunk,
                               kv_int8=False, sample=None, depth=2):
    """v4: ONE grid step for all 28 layers — the layer loop is a
    lax.fori_loop and the per-layer weight blocks are DMA'd manually from
    HBM into double-buffered VMEM slabs (layer l+1's four weight copies are
    issued before layer l's compute begins). Rationale: the gridded v1/v2
    kernels pay ~28 us of non-overlapped per-grid-step work (measured r3/r4
    decomposition — 14 steps at lps=2 is ~0.39 ms of the 1.23 ms int8
    step); a single grid step removes the per-step entry/exit entirely
    while keeping the same valid-prefix chunked KV DMA as v2 (traffic
    proportional to n_past, no capacity gate). Each layer's first KV chunk
    is issued alongside its weight wait, ahead of the qkv matmul that v2
    serialized it behind."""
    H = cfg.hidden_size
    L = cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    G = Hq // Hkv
    F = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    scale = D ** -0.5
    mmv = _make_mm_values(mode)
    cdt = jnp.bfloat16 if kv_int8 else kv_dtype

    def kernel(n_past_ref, x_in_ref, cos_ref, sin_ref,
               attn_n_ref, q_n_ref, k_n_ref, ffn_n_ref,
               wqkv_q, wqkv_s, wo_q, wo_s, wgu_q, wgu_s, wd_q, wd_s,
               *rest):
        rest = list(rest)
        if with_head:
            out_n_ref, head_ref = rest[0], rest[1]
            del rest[:2]
            if sample is not None:
                seen_ref, samp_ref, seed_ref = rest[0], rest[1], rest[2]
                del rest[:3]
        kv_hbm = rest.pop(0)
        kvs_hbm = rest.pop(0) if kv_int8 else None
        kvrow_ref = rest.pop(0)
        hid_ref = rest.pop(0)
        logits_ref = rest.pop(0) if with_head else None
        sc_heads, sc_flat = rest[0], rest[1]
        wbufs = tuple(rest[2:6])
        wsem = rest[6]
        kv_buf, sem = rest[7], rest[8]
        if kv_int8:
            sc_buf, sem_s = rest[9], rest[10]

        n_past = n_past_ref[0, 0]
        trip = lax.div(n_past + (chunk - 1), jnp.int32(chunk))
        whbm = (wqkv_q, wo_q, wgu_q, wd_q)

        def w_copy(l, slot, i):
            return pltpu.make_async_copy(
                whbm[i].at[l], wbufs[i].at[slot], wsem.at[slot, i])

        def w_start(l, slot):
            for i in range(4):
                w_copy(l, slot, i).start()

        def w_wait(l, slot):
            for i in range(4):
                w_copy(l, slot, i).wait()

        # prologue: fill depth-1 slots so the DMA queue stays >=depth-1
        # layers deep throughout (depth 2 = classic double buffering)
        for i in range(depth - 1):
            w_start(jnp.int32(i), jnp.int32(i))

        cos = cos_ref[...].astype(jnp.float32)
        sin = sin_ref[...].astype(jnp.float32)

        def rope(t):
            half = D // 2
            t1, t2 = t[:, :half], t[:, half:]
            return jnp.concatenate(
                [t1 * cos - t2 * sin, t1 * sin + t2 * cos], axis=-1)

        def kv_dma(l, c, slot):
            off = pl.multiple_of(c * chunk, chunk)
            cps = [pltpu.make_async_copy(
                kv_hbm.at[l, :, :, pl.ds(off, chunk), :],
                kv_buf.at[slot], sem.at[slot])]
            if kv_int8:
                cps.append(pltpu.make_async_copy(
                    kvs_hbm.at[l, :, :, pl.ds(off, chunk)],
                    sc_buf.at[slot], sem_s.at[slot]))
            return cps

        def layer_body(l, x):
            slot = lax.rem(l, depth)

            # prefetch: the slot freed last layer refills depth-1 layers
            # ahead + this layer's first KV chunk rides alongside
            @pl.when(l + depth - 1 < L)
            def _():
                w_start(l + depth - 1, lax.rem(l + depth - 1, depth))

            @pl.when(trip > 0)
            def _():
                for cp in kv_dma(l, jnp.int32(0), jnp.int32(0)):
                    cp.start()

            w_wait(l, slot)
            h = _rms(x, attn_n_ref[l], eps)
            qkv = mmv(h, wbufs[0][slot], wqkv_s[l], 0)

            for i in range(Hq + 2 * Hkv):
                sc_heads[i:i + 1, :] = qkv[:, i * D:(i + 1) * D]
            q = _rms(sc_heads[0:Hq, :], q_n_ref[l], eps)
            k = _rms(sc_heads[Hq:Hq + Hkv, :], k_n_ref[l], eps)
            v = sc_heads[Hq + Hkv:Hq + 2 * Hkv, :]
            q = rope(q)
            k = rope(k)

            kvrow_ref[l, 0] = k.astype(kv_dtype)
            kvrow_ref[l, 1] = v.astype(kv_dtype)

            qc = q.astype(cdt)
            kc = k.astype(cdt)
            vc = v.astype(cdt)

            def chunk_body(c, carry):
                m, lsum, acc = carry
                cslot = lax.rem(c, 2)

                @pl.when(c + 1 < trip)
                def _():
                    for cp in kv_dma(l, c + 1, 1 - cslot):
                        cp.start()

                for cp in kv_dma(l, c, cslot):
                    cp.wait()
                col = c * chunk + lax.broadcasted_iota(
                    jnp.int32, (G, chunk), 1)
                valid = col < n_past
                ms, ls, accs = [], [], []
                for hh in range(Hkv):
                    rows = slice(hh * G, (hh + 1) * G)
                    s = jax.lax.dot_general(
                        qc[rows], kv_buf[cslot, 0, hh].astype(cdt),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    if kv_int8:
                        s = s * sc_buf[cslot, 0, hh:hh + 1]
                    s = jnp.where(valid, s, NEG_INF)
                    m_new = jnp.maximum(
                        m[hh], jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(m[hh] - m_new)
                    ls.append((alpha * lsum[hh]
                               + jnp.sum(p, axis=-1, keepdims=True))[None])
                    pv = p * sc_buf[cslot, 1, hh:hh + 1] if kv_int8 else p
                    accs.append((acc[hh] * alpha + jax.lax.dot_general(
                        pv.astype(cdt), kv_buf[cslot, 1, hh].astype(cdt),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))[None])
                    ms.append(m_new[None])
                return (jnp.concatenate(ms, axis=0),
                        jnp.concatenate(ls, axis=0),
                        jnp.concatenate(accs, axis=0))

            m0 = jnp.full((Hkv, G, 1), NEG_INF, jnp.float32)
            l0 = jnp.zeros((Hkv, G, 1), jnp.float32)
            a0 = jnp.zeros((Hkv, G, D), jnp.float32)
            m, lsum, acc = lax.fori_loop(0, trip, chunk_body, (m0, l0, a0))

            # fold in the current step's K/V as one extra attention column
            for hh in range(Hkv):
                rows = slice(hh * G, (hh + 1) * G)
                s_cur = jnp.sum(
                    qc[rows].astype(jnp.float32)
                    * kc[hh:hh + 1].astype(jnp.float32),
                    axis=-1, keepdims=True) * scale
                m_fin = jnp.maximum(m[hh], s_cur)
                p_cur = jnp.exp(s_cur - m_fin)
                alpha = jnp.exp(m[hh] - m_fin)
                l_fin = alpha * lsum[hh] + p_cur
                o = (acc[hh] * alpha
                     + p_cur * vc[hh:hh + 1].astype(jnp.float32))
                o = o / jnp.maximum(l_fin, 1e-30)
                for gg in range(G):
                    sc_flat[0:1, (hh * G + gg) * D:(hh * G + gg + 1) * D] = \
                        o[gg:gg + 1, :]

            x = x + mmv(sc_flat[...], wbufs[1][slot], wo_s[l], 1)
            h = _rms(x, ffn_n_ref[l], eps)
            gu = mmv(h, wbufs[2][slot], wgu_s[l], 2)
            gate = gu[:, :F]
            gate = gate / (1.0 + jnp.exp(-gate))
            x = x + mmv(gate * gu[:, F:], wbufs[3][slot], wd_s[l], 3)
            return x

        x = lax.fori_loop(
            0, L, layer_body, x_in_ref[...].astype(jnp.float32))

        if with_head:
            normed = _rms(x, out_n_ref[...], eps)
            hid_ref[...] = normed
            logits = jax.lax.dot_general(
                normed.astype(head_ref.dtype), head_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if sample is None:
                logits_ref[...] = logits
            else:
                _sample_epilogue(logits, seen_ref, samp_ref, seed_ref,
                                 sample, logits_ref)
        else:
            hid_ref[...] = x

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "cfg", "mode", "layers_per_step", "chunk", "top_k", "suppress_start",
    "eos_id", "greedy", "use_top_p", "interpret", "variant"))
def fused_talker_step_hbm(
    blocks,                    # BlockParams with QuantLinear projections
    cfg,                       # TalkerConfig
    step_embd: jnp.ndarray,    # [H]
    n_past: jnp.ndarray,       # scalar int32
    kv: jnp.ndarray,           # [L, 2, Hkv, C, D]
    *,
    output_norm: jnp.ndarray | None = None,
    codec_head: jnp.ndarray | None = None,
    mode: str = "w8a8",
    layers_per_step: int | None = None,   # None => DEFAULT (bf16 mode: 1)
    chunk: int = _DEFAULT_KV_CHUNK,
    seen: jnp.ndarray | None = None,       # [Vc] bool — enables cb0 sampling
    seeds: jnp.ndarray | None = None,      # scalar int32 counter-hash seed
    temperature=1.0, top_p=1.0, repetition_penalty=1.0,   # traced scalars
    top_k: int = 0,
    suppress_start: int | None = None,
    eos_id: int = -1,
    greedy: bool = False,
    use_top_p: bool = True,
    interpret: bool = False,
    variant: str = "grid",
):
    """One talker decode step, KV cache resident in HBM (no capacity gate).

    variant="grid" is the v2 kernel (grid over layer groups, Mosaic
    pipelines the blocked weight specs); variant="pipelined" is v4: one
    grid step, lax.fori_loop over layers, manual double-buffered weight
    DMA — removes the ~28 us/grid-step overhead (see
    _make_kernel_hbm_pipelined).

    Same contract as fused_talker_step: returns (hidden, kv) or
    (normed_hidden, logits, kv) with the cache row at n_past updated (the
    scatter happens outside the kernel as one dynamic_update_slice); with
    `seen` given, samples next frame's cb0 in-kernel and returns
    (normed_hidden, cb0 scalar int32, kv) — see fused_talker_step.

    kv may be the dense [L, 2, Hkv, C, D] cache or an int8 (q, scale) pair
    from ops/kv_quant.py — the int8 form halves the valid-prefix DMA that
    dominates long-context steps; the kernel returns full-precision K/V rows
    and this wrapper re-quantizes them before the scatter."""
    if jax.default_backend() == "cpu":
        interpret = True
    kv_int8 = isinstance(kv, tuple)
    kv_arr = kv[0] if kv_int8 else kv
    row_dtype = jnp.bfloat16 if kv_int8 else kv_arr.dtype
    H, L = cfg.hidden_size, cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    F = cfg.intermediate_size
    C = kv_arr.shape[3]
    half = D // 2
    QKV = (Hq + 2 * Hkv) * D
    chunk = min(chunk, C)
    if kv_int8:
        chunk = _int8_chunk(C, chunk)
    elif C % chunk != 0:
        # library callers can pass arbitrary capacities; fall back to the
        # largest divisor <= chunk instead of asserting (pipeline.py always
        # 256-aligns, so this only triggers for direct API users)
        while C % chunk != 0:
            chunk -= 1
    with_head = codec_head is not None
    mode = _weight_mode(blocks, mode)
    if layers_per_step is None:
        # bf16 weight blocks are 2x int8: halve the default VMEM footprint
        layers_per_step = 1 if mode == "bf16" else DEFAULT_LAYERS_PER_STEP
    lps = layers_per_step if L % layers_per_step == 0 else 1
    sample_cb0 = seen is not None
    if sample_cb0:
        assert with_head, "cb0 sampling needs codec_head"
        sample = _sample_cfg(codec_head, top_k, suppress_start, eos_id,
                             greedy, use_top_p)
    else:
        sample = None

    angles = (jnp.asarray(n_past, jnp.float32)
              * cfg.rope_theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half))
    cos, sin = jnp.cos(angles)[None, :], jnp.sin(angles)[None, :]

    pipelined = variant == "pipelined"
    if pipelined:
        # weight-slab pipeline depth: 3 for sub-bf16 weight bytes (deeper
        # DMA queue chases the chip's burst bandwidth; 3 x ~15.7 MB int8
        # slabs fit the 115 MB budget), 2 for bf16 (31.4 MB slabs)
        depth = 2 if mode == "bf16" else 3
        kernel = _make_kernel_hbm_pipelined(
            cfg, C, mode=mode, kv_dtype=row_dtype, with_head=with_head,
            chunk=chunk, kv_int8=kv_int8, sample=sample, depth=depth)
    else:
        kernel = _make_kernel_hbm(
            cfg, C, mode=mode, kv_dtype=row_dtype, lps=lps,
            with_head=with_head, chunk=chunk, kv_int8=kv_int8, sample=sample)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def blk(shape):
        nd = len(shape) + 1
        return pl.BlockSpec(
            (1, lps) + shape, lambda g: (g,) + (0,) * nd,
            memory_space=pltpu.VMEM)

    def grp(a):
        return a.reshape((L // lps, lps) + a.shape[1:])

    if pipelined:
        # weights stay in HBM (manual per-layer DMA); scales are small and
        # VMEM-resident with untiled [L, rows, N] layouts for dynamic-l reads
        wspecs, wops, wslabs = [], [], []
        for w in (blocks.wqkv, blocks.wo, blocks.w_gateup, blocks.w_down):
            from .quantized_matmul import QuantLinear4

            if isinstance(w, QuantLinear4):
                q = w.q
                sz = jnp.concatenate([w.scale, w.zero], axis=-2)
            elif hasattr(w, "q"):
                q, sz = w.q, w.scale
            else:   # plain bf16 weights: dummy ones scale row
                q = w
                sz = jnp.ones(w.shape[:-2] + (1, 128), jnp.float32)
            wspecs += [pl.BlockSpec(memory_space=pl.ANY), vmem_full]
            wops += [q, sz]
            wslabs.append(pltpu.VMEM((depth,) + q.shape[1:], q.dtype))
    else:
        wspecs, wops = _weight_specs_and_operands(blocks, blk, grp)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),    # n_past (1,1)
        vmem_full, vmem_full, vmem_full,          # x, cos, sin
        vmem_full, vmem_full, vmem_full, vmem_full,  # norms [L,1,dim]
    ] + wspecs
    operands = [
        jnp.asarray(n_past, jnp.int32).reshape(1, 1),
        step_embd.reshape(1, H), cos, sin,
        blocks.attn_norm[:, None, :], blocks.q_norm[:, None, :],
        blocks.k_norm[:, None, :], blocks.ffn_norm[:, None, :],
    ] + wops
    if with_head:
        Vc = codec_head.shape[-1]
        in_specs += [vmem_full, vmem_full]
        operands += [output_norm.reshape(1, H), codec_head]
        if sample_cb0:
            sspecs, sops, _ = _sample_operands(
                seen.reshape(1, -1), seeds, temperature, top_p,
                repetition_penalty)
            in_specs += sspecs
            operands += sops
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # kv stays in HBM
    operands.append(kv_arr)
    if kv_int8:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # row scales
        operands.append(kv[1])

    if pipelined:
        out_specs = [vmem_full, vmem_full]
        out_shape = [
            jax.ShapeDtypeStruct((L, 2, Hkv, D), row_dtype),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ]
        if with_head and sample_cb0:
            out_specs.append(vmem_full)
            out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.int32))
        elif with_head:
            out_specs.append(vmem_full)
            out_shape.append(jax.ShapeDtypeStruct((1, Vc), jnp.float32))
        scratch = [
            pltpu.VMEM((Hq + 2 * Hkv, D), jnp.float32),      # head split
            pltpu.VMEM((1, Hq * D), jnp.float32),            # head merge
            *wslabs,                                # weight slabs x depth
            pltpu.SemaphoreType.DMA((depth, 4)),    # weight sems
            pltpu.VMEM((2, 2, Hkv, chunk, D), kv_arr.dtype),  # KV chunk x2
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if kv_int8:
            scratch += [
                pltpu.VMEM((2, 2, Hkv, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        grid = (1,)
    else:
        out_specs = [
            blk((2, Hkv, D)),                          # current-step K/V rows
            pl.BlockSpec((1, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((L // lps, lps, 2, Hkv, D), row_dtype),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ]
        if with_head and sample_cb0:
            out_specs.append(
                pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.int32))
        elif with_head:
            out_specs.append(
                pl.BlockSpec((1, Vc), lambda g: (0, 0), memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, Vc), jnp.float32))

        scratch = [
            pltpu.VMEM((1, H), jnp.float32),                 # x carry
            pltpu.VMEM((Hq + 2 * Hkv, D), jnp.float32),      # head split
            pltpu.VMEM((1, Hq * D), jnp.float32),            # head merge
            pltpu.VMEM((2, 2, Hkv, chunk, D), kv_arr.dtype),  # KV chunk x2
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if kv_int8:
            scratch += [
                pltpu.VMEM((2, 2, Hkv, chunk), jnp.float32),  # scale chunk x2
                pltpu.SemaphoreType.DMA((2,)),
            ]
        grid = (L // lps,)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=115 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)

    # scatter the new K/V rows at n_past: ONE in-place update on the carry
    rows = outs[0].reshape(L, 2, Hkv, 1, D)
    if kv_int8:
        from .kv_quant import quantize_kv

        rq, rs = quantize_kv(rows)
        n0 = jnp.asarray(n_past, jnp.int32)
        kv_new = (
            lax.dynamic_update_slice(kv[0], rq, (0, 0, 0, n0, 0)),
            lax.dynamic_update_slice(kv[1], rs, (0, 0, 0, n0)),
        )
    else:
        kv_new = lax.dynamic_update_slice(
            kv, rows, (0, 0, 0, jnp.asarray(n_past, jnp.int32), 0))
    if with_head and sample_cb0:
        return outs[1][0], outs[2][0, 0], kv_new
    if with_head:
        return outs[1][0], outs[2][0], kv_new
    return outs[1][0], kv_new


# ---------------------------------------------------------------------------
# v3: BATCHED talker step (the serving path's kernel)
# ---------------------------------------------------------------------------
#
# Under vmap the XLA step at B=64 costs ~18.6 ms/frame-set: profiling shows
# ~10.7 ms of full-capacity cache reads (the einsum reads all C slots for
# every lane) and ~4.9 ms of w8a16 matmuls (4x the int8 roofline). This
# kernel streams each layer's int8 weights once for ALL lanes (M=B MXU dots
# at full int8 rate), DMAs only the VALID KV prefix per lane in chunked
# slabs, and runs GQA flash attention on the VPU with lanes stacked on
# sublanes — at B rows, per-head tensors are contiguous lane slices, so the
# M=1 kernels' scratch relayout games disappear entirely.
#
# Same caller contract as v2: the current step's K/V rows come back as an
# output ([L, B, 2, Hkv, D]) and are scattered at n_past with one
# dynamic_update_slice; lanes are LOCKSTEP (shared scalar n_past), which is
# exactly the hand-batched serving loop's invariant.

_BATCHED_KV_CHUNK = 32
# int8 KV chunks must be 128 (the scale slab's DMA slices C as its lane dim)
_BATCHED_KV_CHUNK_INT8 = 128


def _make_kernel_batched_lane(cfg, B, C, *, mode, kv_dtype, with_head, chunk):
    """Lane-major variant: cache [L, 2, Hkv, C, B, D]. Each per-trip
    (kv, head) DMA is one contiguous chunk*B*D run (~512 KB at chunk=32)
    instead of the batch-major layout's B strided 8 KB blocks. Measured on
    hardware (B=64, C=512): faster at shallow history (3.42 vs 3.70
    ms/frame-set averaged over steps 0..100) but slower at deep (7.29 vs
    7.06 over 0..400) — the contiguous slab's [chunk, B, D] compute layout
    pays more VPU relayout per score than the DMA saves once the slab is
    large. Net e2e serving: a wash; kept as the opt-in
    QWEN3TTS_BATCHED_KV_LAYOUT=lane tier for short-utterance workloads."""
    H = cfg.hidden_size
    L = cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    G = Hq // Hkv
    F = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    scale = D ** -0.5
    mm = _make_mm(mode)

    def kernel(n_past_ref, x_in_ref, cos_ref, sin_ref,
               attn_n_ref, q_n_ref, k_n_ref, ffn_n_ref,
               wqkv_q, wqkv_s, wo_q, wo_s, wgu_q, wgu_s, wd_q, wd_s,
               *rest):
        rest = list(rest)
        if with_head:
            out_n_ref, head_ref = rest[0], rest[1]
            del rest[:2]
        kv_hbm = rest.pop(0)
        kvrow_ref = rest.pop(0)
        hid_ref = rest.pop(0)
        logits_ref = rest.pop(0) if with_head else None
        x_ref, o_ref, kv_buf, sem = rest[:4]

        l = pl.program_id(0)
        n_past = n_past_ref[0, 0]
        trip = lax.div(n_past + (chunk - 1), jnp.int32(chunk))

        @pl.when(l == 0)
        def _():
            x_ref[...] = x_in_ref[...].astype(jnp.float32)

        x = x_ref[...]                                   # [B, H] f32
        cos = cos_ref[...].astype(jnp.float32)           # [1, D/2]
        sin = sin_ref[...].astype(jnp.float32)

        def rope(t):                                     # [B, D]
            half = D // 2
            t1, t2 = t[:, :half], t[:, half:]
            return jnp.concatenate(
                [t1 * cos - t2 * sin, t1 * sin + t2 * cos], axis=-1)

        h = _rms(x, attn_n_ref[l], eps)
        qkv = mm(h, wqkv_q, wqkv_s, 0, 0)                   # [B, QKV] f32

        def head(i):
            return qkv[:, i * D:(i + 1) * D]

        qs, ks, vs = [], [], []
        for i in range(Hq):
            qs.append(rope(_rms(head(i), q_n_ref[l], eps)))
        for i in range(Hkv):
            ks.append(rope(_rms(head(Hq + i), k_n_ref[l], eps)))
            vs.append(head(Hq + Hkv + i))

        for i in range(Hkv):
            kvrow_ref[0, :, 0, i] = ks[i].astype(kv_dtype)
            kvrow_ref[0, :, 1, i] = vs[i].astype(kv_dtype)

        def dma(c, slot):
            off = pl.multiple_of(c * chunk, chunk)
            return pltpu.make_async_copy(
                kv_hbm.at[l, :, :, pl.ds(off, chunk), :, :],
                kv_buf.at[slot], sem.at[slot])

        @pl.when(trip > 0)
        def _():
            dma(jnp.int32(0), jnp.int32(0)).start()

        # flash state stacked [Hq, B, *]; the slab is [2, Hkv, chunk, B, D]
        # so per-head scores live [chunk, B] (softmax over axis 0)
        def chunk_body(c, carry):
            m, lsum, acc = carry
            slot = lax.rem(c, 2)

            @pl.when(c + 1 < trip)
            def _():
                dma(c + 1, 1 - slot).start()

            dma(c, slot).wait()
            col = c * chunk + lax.broadcasted_iota(jnp.int32, (chunk, B), 0)
            valid = col < n_past                          # [chunk, B]
            ms, ls, accs = [], [], []
            for hh in range(Hkv):
                kc = kv_buf[slot, 0, hh].astype(jnp.float32)   # [ch, B, D]
                vc = kv_buf[slot, 1, hh].astype(jnp.float32)
                for g in range(G):
                    i = hh * G + g
                    q_i = qs[i].astype(kv_dtype).astype(jnp.float32)  # [B, D]
                    s = jnp.sum(q_i[None] * kc, axis=-1) * scale
                    s = jnp.where(valid, s, NEG_INF)      # [chunk, B]
                    m_new = jnp.maximum(m[i], jnp.max(s, axis=0)[:, None])
                    p = jnp.exp(s - m_new[:, 0][None, :])  # [chunk, B]
                    alpha = jnp.exp(m[i] - m_new)          # [B, 1]
                    ls.append((alpha * lsum[i]
                               + jnp.sum(p, axis=0)[:, None])[None])
                    accs.append((acc[i] * alpha + jnp.sum(
                        p[:, :, None] * vc, axis=0))[None])
                    ms.append(m_new[None])
            return (jnp.concatenate(ms, axis=0),
                    jnp.concatenate(ls, axis=0),
                    jnp.concatenate(accs, axis=0))

        m0 = jnp.full((Hq, B, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((Hq, B, 1), jnp.float32)
        a0 = jnp.zeros((Hq, B, D), jnp.float32)
        m, lsum, acc = lax.fori_loop(0, trip, chunk_body, (m0, l0, a0))

        # fold in the current step's K/V as one extra attention column
        for hh in range(Hkv):
            kc = ks[hh].astype(kv_dtype).astype(jnp.float32)      # [B, D]
            vc = vs[hh].astype(kv_dtype).astype(jnp.float32)
            for g in range(G):
                i = hh * G + g
                q_i = qs[i].astype(kv_dtype).astype(jnp.float32)
                s_cur = jnp.sum(q_i * kc, axis=-1, keepdims=True) * scale
                m_fin = jnp.maximum(m[i], s_cur)
                p_cur = jnp.exp(s_cur - m_fin)
                alpha = jnp.exp(m[i] - m_fin)
                l_fin = alpha * lsum[i] + p_cur
                o = (acc[i] * alpha + p_cur * vc) / jnp.maximum(l_fin, 1e-30)
                o_ref[:, i * D:(i + 1) * D] = o           # [B, D] lane slice

        x = x + mm(o_ref[...], wo_q, wo_s, 0, 1)
        hff = _rms(x, ffn_n_ref[l], eps)
        gu = mm(hff, wgu_q, wgu_s, 0, 2)
        gate = gu[:, :F]
        gate = gate / (1.0 + jnp.exp(-gate))
        x = x + mm(gate * gu[:, F:], wd_q, wd_s, 0, 3)

        x_ref[...] = x

        if with_head:
            @pl.when(l == pl.num_programs(0) - 1)
            def _():
                normed = _rms(x_ref[...], out_n_ref[...], eps)
                hid_ref[...] = normed
                logits_ref[...] = jax.lax.dot_general(
                    normed.astype(head_ref.dtype), head_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:
            hid_ref[...] = x

    return kernel


def _make_kernel_batched(cfg, B, C, *, mode, kv_dtype, with_head, chunk,
                         kv_int8=False, sample=None, with_start=False):
    H = cfg.hidden_size
    L = cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    G = Hq // Hkv
    F = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    scale = D ** -0.5
    mm = _make_mm(mode)
    cdt = jnp.bfloat16 if kv_int8 else kv_dtype

    def kernel(n_past_ref, x_in_ref, cos_ref, sin_ref,
               attn_n_ref, q_n_ref, k_n_ref, ffn_n_ref,
               wqkv_q, wqkv_s, wo_q, wo_s, wgu_q, wgu_s, wd_q, wd_s,
               *rest):
        rest = list(rest)
        if with_start:
            # continuous batching: per-lane first-valid cache column
            # (runtime/continuous.py splices refilled requests mid-cache)
            start_ref = rest.pop(0)   # VMEM [B, 1] int32
            smin_ref = rest.pop(0)    # SMEM (1, 1) int32: min over lanes
        if with_head:
            out_n_ref, head_ref = rest[0], rest[1]
            del rest[:2]
            if sample is not None:
                seen_ref, samp_ref, seed_ref = rest[0], rest[1], rest[2]
                del rest[:3]
        kv_hbm = rest.pop(0)
        kvs_hbm = rest.pop(0) if kv_int8 else None
        kvrow_ref = rest.pop(0)
        hid_ref = rest.pop(0)
        logits_ref = rest.pop(0) if with_head else None
        x_ref, o_ref, kv_buf, sem = rest[:4]
        if kv_int8:
            sc_buf, sem_s = rest[4], rest[5]

        l = pl.program_id(0)
        n_past = n_past_ref[0, 0]
        trip = lax.div(n_past + (chunk - 1), jnp.int32(chunk))
        # chunks fully below every lane's start hold no valid columns for
        # anyone — skip their DMAs entirely (the oldest active request's
        # splice point advances through a serving session)
        t0 = (lax.div(smin_ref[0, 0], jnp.int32(chunk)) if with_start
              else jnp.int32(0))

        @pl.when(l == 0)
        def _():
            x_ref[...] = x_in_ref[...].astype(jnp.float32)

        x = x_ref[...]                                   # [B, H] f32
        cos = cos_ref[...].astype(jnp.float32)           # [1, D/2]
        sin = sin_ref[...].astype(jnp.float32)

        def rope(t):                                     # [B, D]
            half = D // 2
            t1, t2 = t[:, :half], t[:, half:]
            return jnp.concatenate(
                [t1 * cos - t2 * sin, t1 * sin + t2 * cos], axis=-1)

        h = _rms(x, attn_n_ref[l], eps)
        qkv = mm(h, wqkv_q, wqkv_s, 0, 0)                   # [B, QKV] f32

        # per-head views are [B, D] LANE slices — no relayout at M=B
        def head(i):
            return qkv[:, i * D:(i + 1) * D]

        qs, ks, vs = [], [], []
        for i in range(Hq):
            qs.append(rope(_rms(head(i), q_n_ref[l], eps)))
        for i in range(Hkv):
            ks.append(rope(_rms(head(Hq + i), k_n_ref[l], eps)))
            vs.append(head(Hq + Hkv + i))

        for i in range(Hkv):
            kvrow_ref[0, :, 0, i] = ks[i].astype(kv_dtype)
            kvrow_ref[0, :, 1, i] = vs[i].astype(kv_dtype)

        def dma(c, slot):
            off = pl.multiple_of(c * chunk, chunk)
            cps = [pltpu.make_async_copy(
                kv_hbm.at[:, l, :, :, pl.ds(off, chunk), :],
                kv_buf.at[slot], sem.at[slot])]
            if kv_int8:
                cps.append(pltpu.make_async_copy(
                    kvs_hbm.at[:, l, :, :, pl.ds(off, chunk)],
                    sc_buf.at[slot], sem_s.at[slot]))
            return cps

        def dma_start(c, slot):
            for cp in dma(c, slot):
                cp.start()

        def dma_wait(c, slot):
            for cp in dma(c, slot):
                cp.wait()

        @pl.when(trip > t0)
        def _():
            dma_start(t0, lax.rem(t0, 2))

        # flash state stacked [Hq, B, *]; per-pair updates rebuild the stack
        # by concatenation on the untiled leading axis
        def chunk_body(c, carry):
            m, lsum, acc = carry
            slot = lax.rem(c, 2)

            @pl.when(c + 1 < trip)
            def _():
                dma_start(c + 1, 1 - slot)

            dma_wait(c, slot)
            col = c * chunk + lax.broadcasted_iota(jnp.int32, (B, chunk), 1)
            valid = col < n_past                          # [B, chunk]
            if with_start:
                valid = valid & (col >= start_ref[...])   # [B,1] broadcast
            ms, ls, accs = [], [], []
            for hh in range(Hkv):
                kc = kv_buf[slot, :, 0, hh].astype(jnp.float32)   # [B, ch, D]
                vc = kv_buf[slot, :, 1, hh].astype(jnp.float32)
                # int8 cache: K's per-row scales multiply the [B, chunk]
                # score matrix; V's fold into p — dequant never touches
                # the [B, chunk, D] slabs
                ksc = sc_buf[slot, :, 0, hh] if kv_int8 else None
                vsc = sc_buf[slot, :, 1, hh] if kv_int8 else None
                for g in range(G):
                    i = hh * G + g
                    q_i = qs[i].astype(cdt).astype(jnp.float32)
                    # VPU "dot": broadcast q over the chunk dim, reduce D
                    s = jnp.sum(q_i[:, None, :] * kc, axis=-1) * scale
                    if kv_int8:
                        s = s * ksc                       # [B, chunk]
                    s = jnp.where(valid, s, NEG_INF)      # [B, chunk]
                    m_new = jnp.maximum(
                        m[i], jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp(s - m_new)                # [B, chunk]
                    alpha = jnp.exp(m[i] - m_new)
                    ls.append((alpha * lsum[i]
                               + jnp.sum(p, axis=-1, keepdims=True))[None])
                    pv = p * vsc if kv_int8 else p
                    accs.append((acc[i] * alpha + jnp.sum(
                        pv[:, :, None] * vc, axis=1))[None])
                    ms.append(m_new[None])
            return (jnp.concatenate(ms, axis=0),
                    jnp.concatenate(ls, axis=0),
                    jnp.concatenate(accs, axis=0))

        m0 = jnp.full((Hq, B, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((Hq, B, 1), jnp.float32)
        a0 = jnp.zeros((Hq, B, D), jnp.float32)
        m, lsum, acc = lax.fori_loop(t0, trip, chunk_body, (m0, l0, a0))

        # fold in the current step's K/V as one extra attention column
        for hh in range(Hkv):
            kc = ks[hh].astype(cdt).astype(jnp.float32)           # [B, D]
            vc = vs[hh].astype(cdt).astype(jnp.float32)
            for g in range(G):
                i = hh * G + g
                q_i = qs[i].astype(cdt).astype(jnp.float32)
                s_cur = jnp.sum(q_i * kc, axis=-1, keepdims=True) * scale
                m_fin = jnp.maximum(m[i], s_cur)
                p_cur = jnp.exp(s_cur - m_fin)
                alpha = jnp.exp(m[i] - m_fin)
                l_fin = alpha * lsum[i] + p_cur
                o = (acc[i] * alpha + p_cur * vc) / jnp.maximum(l_fin, 1e-30)
                o_ref[:, i * D:(i + 1) * D] = o           # [B, D] lane slice

        x = x + mm(o_ref[...], wo_q, wo_s, 0, 1)
        hff = _rms(x, ffn_n_ref[l], eps)
        gu = mm(hff, wgu_q, wgu_s, 0, 2)
        gate = gu[:, :F]
        gate = gate / (1.0 + jnp.exp(-gate))
        x = x + mm(gate * gu[:, F:], wd_q, wd_s, 0, 3)

        x_ref[...] = x

        if with_head:
            @pl.when(l == pl.num_programs(0) - 1)
            def _():
                normed = _rms(x_ref[...], out_n_ref[...], eps)
                hid_ref[...] = normed
                logits = jax.lax.dot_general(
                    normed.astype(head_ref.dtype), head_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if sample is None:
                    logits_ref[...] = logits
                else:
                    # next frame's cb0 sampled while the logits are still in
                    # VMEM — the frame loop never round-trips [B, Vc]
                    # through XLA sampling glue
                    _sample_epilogue(logits, seen_ref, samp_ref, seed_ref,
                                     sample, logits_ref)
        else:
            hid_ref[...] = x

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "cfg", "mode", "chunk", "kv_layout", "top_k", "suppress_start", "eos_id",
    "greedy", "use_top_p", "interpret"))
def fused_talker_step_batched(
    blocks,                    # BlockParams with QuantLinear projections
    cfg,                       # TalkerConfig
    step_embd: jnp.ndarray,    # [B, H]
    n_past: jnp.ndarray,       # scalar int32 (lockstep across lanes)
    kv: jnp.ndarray,           # see kv_layout
    *,
    output_norm: jnp.ndarray | None = None,
    codec_head: jnp.ndarray | None = None,
    mode: str = "w8a8",
    chunk: int | None = None,   # None => _BATCHED_KV_CHUNK (bf16 mode: half)
    kv_layout: str = "batch",
    seen: jnp.ndarray | None = None,       # [B, Vc] bool — enables cb0 sampling
    seeds: jnp.ndarray | None = None,      # [B] int32 counter-hash seeds
    start: jnp.ndarray | None = None,      # [B] int32 first-valid cache column
    temperature=1.0, top_p=1.0, repetition_penalty=1.0,   # traced scalars
    top_k: int = 0,
    suppress_start: int | None = None,
    eos_id: int = -1,
    greedy: bool = False,
    use_top_p: bool = True,
    interpret: bool = False,
):
    """One talker decode step for B lockstep lanes, KV in HBM.

    Returns (hidden [B, H] f32, kv) or (normed_hidden, logits [B, Vc], kv)
    with each lane's cache row at n_past updated.

    When `seen` is given (requires codec_head + batch-major layout), the
    kernel additionally samples NEXT frame's codebook-0 token in its head
    epilogue — suppression of [suppress_start, Vc) except eos_id, HF
    repetition penalty over `seen`, then the shared counter-hash
    temp/top-k/top-p sampler (ops/kernel_prng.make_sampler) with per-lane
    `seeds` — and returns (normed_hidden, cb0 [B] int32, kv) instead of
    logits, which never leave the kernel.

    kv_layout:
      - "batch": cache [B, L, 2, Hkv, C, D] (also the int8 (q, scale) form —
        the scale slab's lane-dim DMA rule pins its layout). The serving
        default: per-trip DMA gathers B*2*Hkv strided 8 KB blocks.
      - "lane": cache [L, 2, Hkv, C, B, D] — each (kv, head) is one
        contiguous chunk*B*D run per trip. Opt-in
        (QWEN3TTS_BATCHED_KV_LAYOUT=lane): wins ~8% at shallow history,
        loses ~3% deep; e2e serving a wash (see _make_kernel_batched_lane).

    `start` ([B] int32, batch-major only): per-lane first-valid cache
    column for continuous batching — a refilled lane spliced its prefill at
    [start, n_past) and columns below start belong to the previous occupant
    (runtime/continuous.py). Chunks below min(start) skip their DMA.
    """
    if jax.default_backend() == "cpu":
        interpret = True
    kv_int8 = isinstance(kv, tuple)
    kv_arr = kv[0] if kv_int8 else kv
    row_dtype = jnp.bfloat16 if kv_int8 else kv_arr.dtype
    lane_major = kv_layout == "lane"
    assert not (kv_int8 and lane_major), \
        "int8 KV requires the batch-major layout (scale-slab DMA alignment)"
    H, L = cfg.hidden_size, cfg.n_layers
    Hq, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    F = cfg.intermediate_size
    if lane_major:
        C, B = kv_arr.shape[3], kv_arr.shape[4]
    else:
        B, C = kv_arr.shape[0], kv_arr.shape[4]
    half = D // 2
    QKV = (Hq + 2 * Hkv) * D
    mode = _weight_mode(blocks, mode)
    if chunk is None:
        # bf16 weight blocks are 2x int8: shrink the KV slab so the
        # double-buffered layer stream still fits
        chunk = _BATCHED_KV_CHUNK // 2 if mode == "bf16" else _BATCHED_KV_CHUNK
        # the double-buffered slab scales with B*chunk: keep it at the B=64
        # budget (2 slots x B x 2 x Hkv x chunk x D) for larger batches
        while B * chunk > 64 * _BATCHED_KV_CHUNK and chunk > 8:
            chunk //= 2
    if kv_int8:
        chunk = _int8_chunk(C, _BATCHED_KV_CHUNK_INT8)
    else:
        chunk = min(chunk, C)
        while C % chunk != 0:   # largest divisor <= chunk (no assert: see v2)
            chunk -= 1
    with_head = codec_head is not None
    sample_cb0 = seen is not None
    if sample_cb0:
        assert with_head and not lane_major, \
            "cb0 sampling needs codec_head and the batch-major layout"
        per_lane_samp = any(getattr(v, "ndim", 0) >= 1
                            for v in (temperature, top_p,
                                      repetition_penalty))
        sample = _sample_cfg(codec_head, top_k, suppress_start, eos_id,
                             greedy, use_top_p, per_lane=per_lane_samp)
    else:
        sample = None

    angles = (jnp.asarray(n_past, jnp.float32)
              * cfg.rope_theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half))
    cos, sin = jnp.cos(angles)[None, :], jnp.sin(angles)[None, :]

    with_start = start is not None
    assert not (with_start and lane_major), \
        "per-lane start (continuous batching) needs the batch-major layout"
    if lane_major:
        kernel = _make_kernel_batched_lane(
            cfg, B, C, mode=mode, kv_dtype=row_dtype, with_head=with_head,
            chunk=chunk)
    else:
        kernel = _make_kernel_batched(
            cfg, B, C, mode=mode, kv_dtype=row_dtype, with_head=with_head,
            chunk=chunk, kv_int8=kv_int8, sample=sample,
            with_start=with_start)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def blk(shape):
        nd = len(shape) + 1
        return pl.BlockSpec(
            (1, 1) + shape, lambda g: (g,) + (0,) * nd,
            memory_space=pltpu.VMEM)

    def grp(a):
        return a.reshape((L, 1) + a.shape[1:])

    wspecs, wops = _weight_specs_and_operands(blocks, blk, grp)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),    # n_past (1,1)
        vmem_full, vmem_full, vmem_full,          # x, cos, sin
        vmem_full, vmem_full, vmem_full, vmem_full,  # norms [L,1,dim]
    ] + wspecs
    operands = [
        jnp.asarray(n_past, jnp.int32).reshape(1, 1),
        step_embd, cos, sin,
        blocks.attn_norm[:, None, :], blocks.q_norm[:, None, :],
        blocks.k_norm[:, None, :], blocks.ffn_norm[:, None, :],
    ] + wops
    if with_start:
        in_specs += [vmem_full, pl.BlockSpec(memory_space=pltpu.SMEM)]
        start_col = jnp.asarray(start, jnp.int32).reshape(B, 1)
        operands += [start_col, jnp.min(start_col).reshape(1, 1)]
    if with_head:
        Vc = codec_head.shape[-1]
        in_specs += [vmem_full, vmem_full]
        operands += [output_norm.reshape(1, H), codec_head]
        if sample_cb0:
            sspecs, sops, _pl = _sample_operands(
                seen, seeds, temperature, top_p, repetition_penalty)
            assert _pl == sample["per_lane"]
            in_specs += sspecs
            operands += sops
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # kv stays in HBM
    operands.append(kv_arr)
    if kv_int8:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # row scales
        operands.append(kv[1])

    out_specs = [
        pl.BlockSpec((1, B, 2, Hkv, D), lambda g: (g, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),            # new K/V rows
        pl.BlockSpec((B, H), lambda g: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L, B, 2, Hkv, D), row_dtype),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    ]
    if with_head and sample_cb0:
        out_specs.append(
            pl.BlockSpec((B, 1), lambda g: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, 1), jnp.int32))
    elif with_head:
        out_specs.append(
            pl.BlockSpec((B, Vc), lambda g: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, Vc), jnp.float32))

    slab_shape = ((2, 2, Hkv, chunk, B, D) if lane_major
                  else (2, B, 2, Hkv, chunk, D))
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),                 # x carry
        pltpu.VMEM((B, Hq * D), jnp.float32),            # attn out
        pltpu.VMEM(slab_shape, kv_arr.dtype),            # KV slab x2
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if kv_int8:
        scratch += [
            pltpu.VMEM((2, B, 2, Hkv, chunk), jnp.float32),  # scale slab x2
            pltpu.SemaphoreType.DMA((2,)),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)

    # scatter each lane's new K/V rows at n_past: one in-place update
    n0 = jnp.asarray(n_past, jnp.int32)
    if lane_major:
        rows = outs[0].transpose(0, 2, 3, 1, 4).reshape(L, 2, Hkv, 1, B, D)
        kv_new = lax.dynamic_update_slice(kv, rows, (0, 0, 0, n0, 0, 0))
    elif kv_int8:
        from .kv_quant import quantize_kv

        rows = outs[0].transpose(1, 0, 2, 3, 4).reshape(B, L, 2, Hkv, 1, D)
        rq, rs = quantize_kv(rows)
        kv_new = (
            lax.dynamic_update_slice(kv[0], rq, (0, 0, 0, 0, n0, 0)),
            lax.dynamic_update_slice(kv[1], rs, (0, 0, 0, 0, n0)),
        )
    else:
        rows = outs[0].transpose(1, 0, 2, 3, 4).reshape(B, L, 2, Hkv, 1, D)
        kv_new = lax.dynamic_update_slice(kv, rows, (0, 0, 0, 0, n0, 0))
    if with_head and sample_cb0:
        return outs[1], outs[2][:, 0], kv_new
    if with_head:
        return outs[1], outs[2], kv_new
    return outs[1], kv_new
