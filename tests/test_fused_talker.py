"""Parity tests for the fused talker-step Pallas kernel
(ops/pallas_talker_step.py) against the XLA forward_step path, in interpret
mode on CPU at the tiny configuration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import tiny_pipeline_config
from qwen3tts_tpu.models import talker as talker_model
from qwen3tts_tpu.models.transformer_core import forward_step
from qwen3tts_tpu.ops import pallas_talker_step as pts
from qwen3tts_tpu.ops.quant import dequantize, quantize_block_params


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_pipeline_config().talker
    params = talker_model.init_talker_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    qblocks = quantize_block_params(params.blocks)
    deq_blocks = qblocks._replace(
        wqkv=dequantize(qblocks.wqkv, jnp.float32),
        wo=dequantize(qblocks.wo, jnp.float32),
        w_gateup=dequantize(qblocks.w_gateup, jnp.float32),
        w_down=dequantize(qblocks.w_down, jnp.float32),
    )
    C = 32
    kv = jax.random.normal(
        jax.random.PRNGKey(9),
        (cfg.n_layers, 2, cfg.n_kv_heads, C, cfg.head_dim), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(11), (cfg.hidden_size,), jnp.float32)
    return cfg, params, qblocks, deq_blocks, kv, x


def test_dequant_matches_forward_step(setup):
    cfg, params, qblocks, deq_blocks, kv, x = setup
    n_past = jnp.int32(7)

    hidden_ref, kv_ref = forward_step(
        deq_blocks, talker_model.core_config(cfg), x, n_past, kv)
    hidden_k, kv_k = pts.fused_talker_step(
        qblocks, cfg, x, n_past, kv, mode="dequant", interpret=True)

    np.testing.assert_allclose(
        np.asarray(hidden_k), np.asarray(hidden_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(kv_k), np.asarray(kv_ref), rtol=2e-4, atol=2e-4)


def test_dequant_matches_forward_step_pos0(setup):
    cfg, params, qblocks, deq_blocks, kv, x = setup
    kv0 = jnp.zeros_like(kv)
    hidden_ref, kv_ref = forward_step(
        deq_blocks, talker_model.core_config(cfg), x, jnp.int32(0), kv0)
    hidden_k, kv_k = pts.fused_talker_step(
        qblocks, cfg, x, jnp.int32(0), kv0, mode="dequant", interpret=True)
    np.testing.assert_allclose(
        np.asarray(hidden_k), np.asarray(hidden_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(kv_k), np.asarray(kv_ref), rtol=2e-4, atol=2e-4)


def test_head_fusion_and_layer_grouping(setup):
    """output-norm+codec-head fusion and layers_per_step=2 both match the
    ungrouped, unfused-head dequant path."""
    cfg, params, qblocks, deq_blocks, kv, x = setup
    from qwen3tts_tpu.ops.norms import rms_norm

    n_past = jnp.int32(5)
    hidden_ref, kv_ref = pts.fused_talker_step(
        qblocks, cfg, x, n_past, kv, mode="dequant", layers_per_step=1,
        interpret=True)
    normed_ref = rms_norm(hidden_ref, params.output_norm, cfg.rms_norm_eps)
    logits_ref = (normed_ref.astype(params.codec_head.dtype)
                  @ params.codec_head).astype(jnp.float32)

    hidden2, logits2, kv2 = pts.fused_talker_step(
        qblocks, cfg, x, n_past, kv, mode="dequant", layers_per_step=2,
        output_norm=params.output_norm, codec_head=params.codec_head,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(hidden2), np.asarray(normed_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(logits_ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(kv2), np.asarray(kv_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n_past", [0, 7, 31])
def test_hbm_variant_matches_forward_step(setup, n_past):
    """v2 (HBM KV, valid-prefix chunked DMA + flash softmax) matches the XLA
    step, including the empty-prefix and full-capacity edges."""
    cfg, params, qblocks, deq_blocks, kv, x = setup
    kv0 = jnp.zeros_like(kv) if n_past == 0 else kv
    hidden_ref, kv_ref = forward_step(
        deq_blocks, talker_model.core_config(cfg), x, jnp.int32(n_past), kv0)
    hidden_k, kv_k = pts.fused_talker_step_hbm(
        qblocks, cfg, x, jnp.int32(n_past), kv0, mode="dequant", chunk=8,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(hidden_k), np.asarray(hidden_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(kv_k), np.asarray(kv_ref), rtol=2e-4, atol=2e-4)


def test_hbm_variant_head_and_grouping(setup):
    """v2 with fused output-norm+head and layers_per_step=2 matches v1."""
    cfg, params, qblocks, deq_blocks, kv, x = setup
    n_past = jnp.int32(5)
    h1, l1, kv1 = pts.fused_talker_step(
        qblocks, cfg, x, n_past, kv, mode="dequant", layers_per_step=2,
        output_norm=params.output_norm, codec_head=params.codec_head,
        interpret=True)
    h2, l2, kv2 = pts.fused_talker_step_hbm(
        qblocks, cfg, x, n_past, kv, mode="dequant", layers_per_step=2,
        chunk=8, output_norm=params.output_norm, codec_head=params.codec_head,
        interpret=True)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kv2), np.asarray(kv1), rtol=2e-4, atol=2e-4)


def test_w8a8_close(setup):
    cfg, params, qblocks, deq_blocks, kv, x = setup
    n_past = jnp.int32(3)
    hidden_d, kv_d = pts.fused_talker_step(
        qblocks, cfg, x, n_past, kv, mode="dequant", interpret=True)
    hidden_q, kv_q = pts.fused_talker_step(
        qblocks, cfg, x, n_past, kv, mode="w8a8", interpret=True)
    # activation quantization: small relative error on the hidden state
    ref = np.asarray(hidden_d)
    err = np.abs(np.asarray(hidden_q) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.15, f"w8a8 relative error too large: {err}"
    assert np.isfinite(np.asarray(hidden_q)).all()


@pytest.fixture(scope="module")
def w4setup(setup):
    from qwen3tts_tpu.ops.quant import dequantize4, quantize_block_params_w4

    cfg, params, _, _, kv, x = setup
    w4blocks = quantize_block_params_w4(params.blocks)
    deq4_blocks = w4blocks._replace(
        wqkv=dequantize4(w4blocks.wqkv, jnp.float32),
        wo=dequantize4(w4blocks.wo, jnp.float32),
        w_gateup=dequantize4(w4blocks.w_gateup, jnp.float32),
        w_down=dequantize4(w4blocks.w_down, jnp.float32),
    )
    return cfg, params, w4blocks, deq4_blocks, kv, x


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_w4_dequant_matches_forward_step(w4setup, variant):
    """Both kernels with split-half nibble-packed int4 weights (mode
    auto-resolves to w4dequant) match the XLA step on the dequantized
    weights exactly (same math, different packing)."""
    cfg, params, w4blocks, deq4_blocks, kv, x = w4setup
    n_past = jnp.int32(7)
    hidden_ref, kv_ref = forward_step(
        deq4_blocks, talker_model.core_config(cfg), x, n_past, kv)
    fn = pts.fused_talker_step if variant == "v1" else pts.fused_talker_step_hbm
    kwargs = {} if variant == "v1" else {"chunk": 8}
    hidden_k, kv_k = fn(
        w4blocks, cfg, x, n_past, kv, mode="dequant", interpret=True, **kwargs)
    np.testing.assert_allclose(
        np.asarray(hidden_k), np.asarray(hidden_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(kv_k), np.asarray(kv_ref), rtol=2e-4, atol=2e-4)


def test_w4a8_close_and_head_fusion(w4setup):
    cfg, params, w4blocks, deq4_blocks, kv, x = w4setup
    n_past = jnp.int32(3)
    hidden_d, kv_d = pts.fused_talker_step(
        w4blocks, cfg, x, n_past, kv, mode="dequant", interpret=True)
    hidden_q, logits_q, kv_q = pts.fused_talker_step(
        w4blocks, cfg, x, n_past, kv, layers_per_step=2,
        output_norm=params.output_norm, codec_head=params.codec_head,
        interpret=True)
    from qwen3tts_tpu.ops.norms import rms_norm
    normed_d = rms_norm(hidden_d, params.output_norm, cfg.rms_norm_eps)
    ref = np.asarray(normed_d)
    err = np.abs(np.asarray(hidden_q) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.15, f"w4a8 relative error too large: {err}"
    assert np.isfinite(np.asarray(logits_q)).all()


def test_w4_decode_loop_routes_fused(w4setup):
    """quant=q4 talker params route through the fused kernel in the decode
    loop (interpret on CPU) and produce finite codes."""
    from qwen3tts_tpu.config import tiny_pipeline_config
    from qwen3tts_tpu.models import code_predictor as CP
    from qwen3tts_tpu.ops.quant import quantize_block_params
    from qwen3tts_tpu.runtime import decode_loop as DL

    CFG = tiny_pipeline_config()
    cfg, params, w4blocks, deq4_blocks, kv, x = w4setup
    tp4 = params._replace(blocks=w4blocks)
    cp = CP.init_code_predictor_params(
        jax.random.PRNGKey(12), CFG.code_predictor, jnp.float32)
    cpq = cp._replace(blocks=quantize_block_params(cp.blocks))
    tokens = np.zeros((16,), np.int32)
    tokens[:11] = np.arange(2, 13)
    out = DL.generate_from_tokens(
        tp4, cpq, jnp.asarray(tokens), jnp.int32(11),
        jnp.zeros((cfg.hidden_size,), jnp.float32), jnp.int32(2050),
        jax.random.PRNGKey(0), talker_cfg=cfg, cp_cfg=CFG.code_predictor,
        max_frames=4, kv_capacity=24, temperature=0.0, top_k=0,
        repetition_penalty=1.05, fused_talker=True, fused_cp=False)
    assert int(out.n_frames) > 0
    assert np.isfinite(np.asarray(out.hidden)).all()


@pytest.mark.parametrize("n_past", [0, 7, 31])
def test_batched_kernel_matches_vmapped_forward_step(setup, n_past):
    """v3 (batched, lockstep n_past, HBM KV) matches vmap(forward_step) on
    the dequantized weights, including empty-prefix and full-capacity."""
    cfg, params, qblocks, deq_blocks, kv, x = setup
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(21), B)
    xb = jax.vmap(lambda k: jax.random.normal(
        k, (cfg.hidden_size,), jnp.float32))(keys)
    kvb = jnp.stack([jnp.zeros_like(kv) if n_past == 0 else kv * (i + 1) * 0.2
                     for i in range(B)])
    hidden_ref, kv_ref = jax.vmap(
        lambda e, kvi: forward_step(
            deq_blocks, talker_model.core_config(cfg), e, jnp.int32(n_past), kvi)
    )(xb, kvb)
    hidden_k, kv_k = pts.fused_talker_step_batched(
        qblocks, cfg, xb, jnp.int32(n_past), kvb, mode="dequant", chunk=8,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(hidden_k), np.asarray(hidden_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(kv_k), np.asarray(kv_ref), rtol=2e-4, atol=2e-4)


def test_batched_kernel_head_and_w8a8(setup):
    cfg, params, qblocks, deq_blocks, kv, x = setup
    B = 4
    n_past = jnp.int32(5)
    keys = jax.random.split(jax.random.PRNGKey(23), B)
    xb = jax.vmap(lambda k: jax.random.normal(
        k, (cfg.hidden_size,), jnp.float32))(keys)
    kvb = jnp.stack([kv * (i + 1) * 0.2 for i in range(B)])

    hd, ld, kvd = pts.fused_talker_step_batched(
        qblocks, cfg, xb, n_past, kvb, mode="dequant", chunk=8,
        output_norm=params.output_norm, codec_head=params.codec_head,
        interpret=True)
    # reference: per-lane single-stream kernel with head fusion (a Python
    # loop — vmap over a pallas_call is not supported in interpret mode)
    for b in range(B):
        hs, ls, kvs = pts.fused_talker_step(
            qblocks, cfg, xb[b], n_past, kvb[b], mode="dequant",
            output_norm=params.output_norm, codec_head=params.codec_head,
            interpret=True)
        np.testing.assert_allclose(np.asarray(hd[b]), np.asarray(hs),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ld[b]), np.asarray(ls),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(kvd[b]), np.asarray(kvs),
                                   rtol=2e-4, atol=2e-4)

    hq, lq, kvq = pts.fused_talker_step_batched(
        qblocks, cfg, xb, n_past, kvb, mode="w8a8", chunk=8,
        output_norm=params.output_norm, codec_head=params.codec_head,
        interpret=True)
    ref = np.asarray(hd)
    err = np.abs(np.asarray(hq) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.15, f"w8a8 relative error too large: {err}"
    assert np.isfinite(np.asarray(lq)).all()
