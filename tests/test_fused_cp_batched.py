"""Parity tests for the BATCHED fused code-predictor kernel against the
single-lane kernel (interpret mode, tiny config): per-lane math must be
identical, so greedy dequant codes match lane-for-lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import tiny_pipeline_config
from qwen3tts_tpu.models import code_predictor as cp_model
from qwen3tts_tpu.ops.pallas_code_predictor import fused_predict_codes
from qwen3tts_tpu.ops.pallas_code_predictor_batched import fused_predict_codes_batched
from qwen3tts_tpu.ops.quant import quantize_block_params

B = 3


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_pipeline_config().code_predictor
    params = cp_model.init_code_predictor_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    qparams = params._replace(blocks=quantize_block_params(params.blocks))
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    th = jax.random.normal(k1, (B, cfg.hidden_size), jnp.float32)
    cb0 = jax.random.normal(k2, (B, cfg.hidden_size), jnp.float32)
    return cfg, qparams, th, cb0


def test_batched_greedy_matches_single_lane(setup):
    cfg, qparams, th, cb0 = setup
    codes_b, sum_b = fused_predict_codes_batched(
        qparams, cfg, th, cb0, jnp.zeros((B,), jnp.int32),
        temperature=0.0, top_k=0, mode="dequant", interpret=True)
    assert codes_b.shape == (B, cfg.n_steps)
    for b in range(B):
        codes_1, sum_1 = fused_predict_codes(
            qparams, cfg, th[b], cb0[b], jnp.int32(0),
            temperature=0.0, top_k=0, mode="dequant", interpret=True)
        np.testing.assert_array_equal(
            np.asarray(codes_b[b]), np.asarray(codes_1), err_msg=f"lane {b}")
        np.testing.assert_allclose(
            np.asarray(sum_b[b]), np.asarray(sum_1), rtol=1e-4, atol=1e-4)


def test_batched_sampled_matches_single_lane_per_seed(setup):
    """SAMPLED lane parity (VERDICT r1 #8): lane b of a batched run with
    per-lane seeds must equal the single-stream kernel with seed seeds[b] —
    the counter-hash noise is lane-decomposable by construction."""
    cfg, qparams, th, cb0 = setup
    seeds = jnp.asarray([17, -1234567, 900001], jnp.int32)
    codes_b, _ = fused_predict_codes_batched(
        qparams, cfg, th, cb0, seeds,
        temperature=0.9, top_k=50, top_p=0.95, mode="dequant", interpret=True)
    for b in range(B):
        codes_1, _ = fused_predict_codes(
            qparams, cfg, th[b], cb0[b], seeds[b],
            temperature=0.9, top_k=50, top_p=0.95, mode="dequant",
            interpret=True)
        np.testing.assert_array_equal(
            np.asarray(codes_b[b]), np.asarray(codes_1), err_msg=f"lane {b}")
    # and distinct seeds actually decorrelate lanes with identical inputs
    same_in = fused_predict_codes_batched(
        qparams, cfg, jnp.broadcast_to(th[0], th.shape),
        jnp.broadcast_to(cb0[0], cb0.shape), seeds,
        temperature=0.9, top_k=50, mode="dequant", interpret=True)[0]
    assert (np.asarray(same_in[0]) != np.asarray(same_in[1])).any()


def test_batched_rest_sum_consistency(setup):
    cfg, qparams, th, cb0 = setup
    codes, rest_sum = fused_predict_codes_batched(
        qparams, cfg, th, cb0, jnp.zeros((B,), jnp.int32),
        temperature=0.0, top_k=0, mode="dequant", interpret=True)
    expect = jnp.sum(
        qparams.embds[jnp.arange(cfg.n_steps)[None, :], codes].astype(jnp.float32),
        axis=1)
    np.testing.assert_allclose(
        np.asarray(rest_sum), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_batched_w8a8_valid(setup):
    cfg, qparams, th, cb0 = setup
    codes, _ = fused_predict_codes_batched(
        qparams, cfg, th, cb0, jnp.full((B,), 5, jnp.int32),
        temperature=0.9, top_k=50, mode="w8a8", interpret=True)
    c = np.asarray(codes)
    assert c.shape == (B, cfg.n_steps)
    assert (c >= 0).all() and (c < cfg.vocab_size).all()


def test_hand_batched_loop_matches_single_stream_greedy():
    """The hand-batched serving loop (batched kernel + lockstep n_past +
    emission masking) must produce, lane for lane, exactly what the
    single-stream fused path produces under greedy decoding."""
    import numpy as np
    from qwen3tts_tpu.runtime import decode_loop

    cfg = tiny_pipeline_config()
    tcfg, ccfg = cfg.talker, cfg.code_predictor
    from qwen3tts_tpu.models import talker as talker_model
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = talker_model.init_talker_params(k1, tcfg, jnp.float32)
    cp = cp_model.init_code_predictor_params(k2, ccfg, jnp.float32)
    from qwen3tts_tpu.ops.quant import quantize_block_params
    tpq = tp._replace(blocks=quantize_block_params(tp.blocks))
    cpq = cp._replace(blocks=quantize_block_params(cp.blocks))

    Bn, Tb, maxF, KV = 2, 16, 4, 32
    rng = np.random.default_rng(0)
    tokens = np.zeros((Bn, Tb), np.int32)
    tokens[:, :12] = rng.integers(2, 400, size=(Bn, 12))
    n_tok = jnp.full((Bn,), 12, jnp.int32)
    spk = jnp.zeros((Bn, tcfg.hidden_size), jnp.float32)
    lang = jnp.full((Bn,), 2050, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(9), Bn)

    batched = decode_loop._generate_batched_fused(
        tpq, cpq, jnp.asarray(tokens), n_tok, spk, lang, keys,
        talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF, kv_capacity=KV,
        temperature=0.0, top_k=0, top_p=1.0, repetition_penalty=1.05,
        nothink=False)

    for b in range(Bn):
        single = decode_loop.generate_from_tokens(
            tpq, cpq, jnp.asarray(tokens[b]), n_tok[b], spk[b], lang[b],
            keys[b], talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF,
            kv_capacity=KV, temperature=0.0, top_k=0,
            repetition_penalty=1.05, fused_cp=True, fused_talker=False)
        assert int(batched.n_frames[b]) == int(single.n_frames)
        np.testing.assert_array_equal(
            np.asarray(batched.codes[b]), np.asarray(single.codes),
            err_msg=f"lane {b}")


def test_hand_batched_loop_matches_single_stream_sampled():
    """SAMPLED serving parity (VERDICT r1 #8): with per-lane key chains and
    per-lane cp-kernel seeds, lane b of a temperature>0 batched run equals
    the single-stream run with keys[b] — codes AND frame counts."""
    import numpy as np
    from qwen3tts_tpu.runtime import decode_loop

    cfg = tiny_pipeline_config()
    tcfg, ccfg = cfg.talker, cfg.code_predictor
    from qwen3tts_tpu.models import talker as talker_model
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = talker_model.init_talker_params(k1, tcfg, jnp.float32)
    cp = cp_model.init_code_predictor_params(k2, ccfg, jnp.float32)
    from qwen3tts_tpu.ops.quant import quantize_block_params
    tpq = tp._replace(blocks=quantize_block_params(tp.blocks))
    cpq = cp._replace(blocks=quantize_block_params(cp.blocks))

    Bn, Tb, maxF, KV = 2, 16, 4, 32
    rng = np.random.default_rng(1)
    tokens = np.zeros((Bn, Tb), np.int32)
    tokens[:, :12] = rng.integers(2, 400, size=(Bn, 12))
    n_tok = jnp.full((Bn,), 12, jnp.int32)
    spk = jnp.zeros((Bn, tcfg.hidden_size), jnp.float32)
    lang = jnp.full((Bn,), 2050, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(42), Bn)

    batched = decode_loop._generate_batched_fused(
        tpq, cpq, jnp.asarray(tokens), n_tok, spk, lang, keys,
        talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF, kv_capacity=KV,
        temperature=0.8, top_k=50, top_p=0.95, repetition_penalty=1.05,
        nothink=False)

    for b in range(Bn):
        single = decode_loop.generate_from_tokens(
            tpq, cpq, jnp.asarray(tokens[b]), n_tok[b], spk[b], lang[b],
            keys[b], talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF,
            kv_capacity=KV, temperature=0.8, top_k=50, top_p=0.95,
            repetition_penalty=1.05, fused_cp=True, fused_talker=False)
        assert int(batched.n_frames[b]) == int(single.n_frames)
        np.testing.assert_array_equal(
            np.asarray(batched.codes[b]), np.asarray(single.codes),
            err_msg=f"lane {b}")


def test_hand_batched_loop_kernel_cb0_greedy_parity(monkeypatch):
    """fused_talker=True routes the batched loop through the v3 kernel with
    the cb0-sampling epilogue (kernel_cb0). Greedy decode is PRNG-free, so
    its codes must match the SAME kernel loop with the epilogue disabled
    (QWEN3TTS_KERNEL_CB0=0 -> XLA suppression/penalty/argmax on the kernel's
    logits) exactly — isolating the in-kernel sampling fold and the
    carried-cb0 loop restructure (interpret mode)."""
    import numpy as np
    from qwen3tts_tpu.runtime import decode_loop

    cfg = tiny_pipeline_config()
    tcfg, ccfg = cfg.talker, cfg.code_predictor
    from qwen3tts_tpu.models import talker as talker_model
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = talker_model.init_talker_params(k1, tcfg, jnp.float32)
    cp = cp_model.init_code_predictor_params(k2, ccfg, jnp.float32)
    from qwen3tts_tpu.ops.quant import quantize_block_params
    tpq = tp._replace(blocks=quantize_block_params(tp.blocks))
    cpq = cp._replace(blocks=quantize_block_params(cp.blocks))

    Bn, Tb, maxF, KV = 2, 16, 3, 32
    rng = np.random.default_rng(3)
    tokens = np.zeros((Bn, Tb), np.int32)
    tokens[:, :12] = rng.integers(2, 400, size=(Bn, 12))
    n_tok = jnp.full((Bn,), 12, jnp.int32)
    spk = jnp.zeros((Bn, tcfg.hidden_size), jnp.float32)
    lang = jnp.full((Bn,), 2050, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(9), Bn)

    kw = dict(talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF, kv_capacity=KV,
              temperature=0.0, top_k=0, top_p=1.0, repetition_penalty=1.05,
              nothink=False)
    kernel = decode_loop._generate_batched_fused(
        tpq, cpq, jnp.asarray(tokens), n_tok, spk, lang, keys,
        fused_talker=True, **kw)
    monkeypatch.setenv("QWEN3TTS_KERNEL_CB0", "0")
    xla = decode_loop._generate_batched_fused(
        tpq, cpq, jnp.asarray(tokens), n_tok, spk, lang, keys,
        fused_talker=True, **kw)
    np.testing.assert_array_equal(np.asarray(kernel.n_frames),
                                  np.asarray(xla.n_frames))
    np.testing.assert_array_equal(np.asarray(kernel.codes),
                                  np.asarray(xla.codes))


def test_hand_batched_kernel_cb0_sampled_matches_single_stream():
    """SAMPLED kernel-path serving parity: with in-kernel cb0 sampling active
    on BOTH the batched (v3) and single-stream (v1) fused talker paths, lane
    b of a temperature>0 batched run equals the single-stream run with
    keys[b] — the counter-hash cb0 seeds and the (key, k_cb0, k_cp) chain
    derive identically (interpret mode)."""
    import numpy as np
    from qwen3tts_tpu.runtime import decode_loop

    cfg = tiny_pipeline_config()
    tcfg, ccfg = cfg.talker, cfg.code_predictor
    from qwen3tts_tpu.models import talker as talker_model
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = talker_model.init_talker_params(k1, tcfg, jnp.float32)
    cp = cp_model.init_code_predictor_params(k2, ccfg, jnp.float32)
    from qwen3tts_tpu.ops.quant import quantize_block_params
    tpq = tp._replace(blocks=quantize_block_params(tp.blocks))
    cpq = cp._replace(blocks=quantize_block_params(cp.blocks))

    Bn, Tb, maxF, KV = 2, 16, 3, 32
    rng = np.random.default_rng(7)
    tokens = np.zeros((Bn, Tb), np.int32)
    tokens[:, :12] = rng.integers(2, 400, size=(Bn, 12))
    n_tok = jnp.full((Bn,), 12, jnp.int32)
    spk = jnp.zeros((Bn, tcfg.hidden_size), jnp.float32)
    lang = jnp.full((Bn,), 2050, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(21), Bn)

    batched = decode_loop._generate_batched_fused(
        tpq, cpq, jnp.asarray(tokens), n_tok, spk, lang, keys,
        talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF, kv_capacity=KV,
        temperature=0.8, top_k=50, top_p=0.95, repetition_penalty=1.05,
        nothink=False, fused_talker=True)

    for b in range(Bn):
        single = decode_loop.generate_from_tokens(
            tpq, cpq, jnp.asarray(tokens[b]), n_tok[b], spk[b], lang[b],
            keys[b], talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF,
            kv_capacity=KV, temperature=0.8, top_k=50, top_p=0.95,
            repetition_penalty=1.05, fused_cp=True, fused_talker=True)
        assert int(batched.n_frames[b]) == int(single.n_frames)
        np.testing.assert_array_equal(
            np.asarray(batched.codes[b]), np.asarray(single.codes),
            err_msg=f"lane {b}")


def test_hand_batched_loop_bf16_xla_cp_matches_single_stream():
    """bf16-tier serving: the hand-batched loop with UNQUANTIZED params runs
    the v3 talker kernel + the vmapped XLA code predictor (no int8 cp
    kernel) and must match the single-stream fused-talker run lane-for-lane
    — greedy and sampled."""
    import numpy as np
    from qwen3tts_tpu.models import talker as talker_model
    from qwen3tts_tpu.runtime import decode_loop

    cfg = tiny_pipeline_config()
    tcfg, ccfg = cfg.talker, cfg.code_predictor
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    tp = talker_model.init_talker_params(k1, tcfg, jnp.float32)
    cp = cp_model.init_code_predictor_params(k2, ccfg, jnp.float32)

    Bn, Tb, maxF, KV = 2, 16, 4, 32
    rng = np.random.default_rng(1)
    tokens = np.zeros((Bn, Tb), np.int32)
    tokens[:, :12] = rng.integers(2, 400, size=(Bn, 12))
    n_tok = jnp.full((Bn,), 12, jnp.int32)
    spk = jnp.zeros((Bn, tcfg.hidden_size), jnp.float32)
    lang = jnp.full((Bn,), 2050, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), Bn)

    for temperature, top_k in ((0.0, 0), (0.9, 6)):
        batched = decode_loop._generate_batched_fused(
            tp, cp, jnp.asarray(tokens), n_tok, spk, lang, keys,
            talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF, kv_capacity=KV,
            temperature=temperature, top_k=top_k, top_p=1.0,
            repetition_penalty=1.05, nothink=False,
            fused_cp=False, fused_talker=True)
        for b in range(Bn):
            single = decode_loop.generate_from_tokens(
                tp, cp, jnp.asarray(tokens[b]), n_tok[b], spk[b], lang[b],
                keys[b], talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF,
                kv_capacity=KV, temperature=temperature, top_k=top_k,
                repetition_penalty=1.05, fused_cp=False, fused_talker=True)
            assert int(batched.n_frames[b]) == int(single.n_frames)
            np.testing.assert_array_equal(
                np.asarray(batched.codes[b]), np.asarray(single.codes),
                err_msg=f"lane {b} t={temperature}")


def test_hand_batched_loop_chunked_cp_matches_single_stream(monkeypatch):
    """Above _CP_KERNEL_MAX_LANES the hand-batched loop runs the cp kernel
    in lane chunks (the B=128 serving route). Force a tiny cap so B=5 takes
    the chunked path and assert lane-for-lane parity with single-stream."""
    import numpy as np
    from qwen3tts_tpu.models import talker as talker_model
    from qwen3tts_tpu.ops.quant import quantize_block_params
    from qwen3tts_tpu.runtime import decode_loop

    monkeypatch.setattr(decode_loop, "_CP_KERNEL_MAX_LANES", 2)

    cfg = tiny_pipeline_config()
    tcfg, ccfg = cfg.talker, cfg.code_predictor
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    tp = talker_model.init_talker_params(k1, tcfg, jnp.float32)
    cp = cp_model.init_code_predictor_params(k2, ccfg, jnp.float32)
    tpq = tp._replace(blocks=quantize_block_params(tp.blocks))
    cpq = cp._replace(blocks=quantize_block_params(cp.blocks))

    Bn, Tb, maxF, KV = 5, 16, 3, 32
    rng = np.random.default_rng(2)
    tokens = np.zeros((Bn, Tb), np.int32)
    tokens[:, :12] = rng.integers(2, 400, size=(Bn, 12))
    n_tok = jnp.full((Bn,), 12, jnp.int32)
    spk = jnp.zeros((Bn, tcfg.hidden_size), jnp.float32)
    lang = jnp.full((Bn,), 2050, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(13), Bn)

    batched = decode_loop._generate_batched_fused(
        tpq, cpq, jnp.asarray(tokens), n_tok, spk, lang, keys,
        talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF, kv_capacity=KV,
        temperature=0.9, top_k=6, top_p=1.0, repetition_penalty=1.05,
        nothink=False)
    for b in range(Bn):
        single = decode_loop.generate_from_tokens(
            tpq, cpq, jnp.asarray(tokens[b]), n_tok[b], spk[b], lang[b],
            keys[b], talker_cfg=tcfg, cp_cfg=ccfg, max_frames=maxF,
            kv_capacity=KV, temperature=0.9, top_k=6,
            repetition_penalty=1.05, fused_cp=True, fused_talker=False)
        assert int(batched.n_frames[b]) == int(single.n_frames)
        np.testing.assert_array_equal(
            np.asarray(batched.codes[b]), np.asarray(single.codes),
            err_msg=f"lane {b}")
