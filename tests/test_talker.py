"""Talker correctness vs the independent NumPy float64 reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import tiny_pipeline_config
from qwen3tts_tpu.models import talker as T
from qwen3tts_tpu.models.transformer_core import forward_prefill, forward_step

import reference_impl as ref

CFG = tiny_pipeline_config()
TCFG = CFG.talker


@pytest.fixture(scope="module")
def params():
    return T.init_talker_params(jax.random.PRNGKey(7), TCFG, jnp.float32)


def test_text_projection_matches_reference(params):
    tokens = np.array([1, 5, 9, 250, 3])
    got = np.asarray(T.project_text_tokens(params, jnp.asarray(tokens)))
    want = ref.text_projection(params, tokens)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_prefill_embedding_layout(params):
    """The 10-position prefill layout of det_prefill_token_types.json."""
    tokens = np.array([151644 % TCFG.text_vocab_size, 77091 % TCFG.text_vocab_size,
                       198 % TCFG.text_vocab_size, 42, 43, 44, 7, 8, 1, 2], np.int32)
    speaker = np.random.default_rng(0).normal(size=(TCFG.hidden_size,)).astype(np.float32)
    lang = TCFG.english_language_id

    Tb = 16
    padded = np.zeros((Tb,), np.int32)
    padded[:len(tokens)] = tokens
    got = T.build_prefill(params, TCFG, jnp.asarray(padded), jnp.int32(len(tokens)),
                          jnp.asarray(speaker), jnp.int32(lang))
    want_prefill, want_trailing, want_pad = ref.build_prefill(params, TCFG, tokens, speaker, lang)

    assert got.prefill_embd.shape == (10, TCFG.hidden_size)
    np.testing.assert_allclose(np.asarray(got.prefill_embd), want_prefill, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.tts_pad_embd), want_pad, rtol=1e-4, atol=1e-4)
    # trailing schedule: text rows then tts_eos, padded with tts_pad
    n_trail = len(tokens) - 8
    assert int(got.trailing_len) == n_trail
    np.testing.assert_allclose(np.asarray(got.trailing[:n_trail]), want_trailing, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.trailing[n_trail + 1]), want_pad, rtol=1e-4, atol=1e-4)


def test_nothink_prefill_is_nine_positions(params):
    padded = jnp.arange(16, dtype=jnp.int32)
    got = T.build_prefill(params, TCFG, padded, jnp.int32(10),
                          jnp.zeros((TCFG.hidden_size,)), jnp.int32(-1), nothink=True)
    assert got.prefill_embd.shape == (9, TCFG.hidden_size)


def test_prefill_forward_matches_reference(params):
    rng = np.random.default_rng(1)
    P = 10
    x = rng.normal(size=(P, TCFG.hidden_size)).astype(np.float32) * 0.3
    kv = T.make_kv_cache(TCFG, 32, jnp.float32)
    hidden, logits, kv = T.talker_prefill(params, TCFG, jnp.asarray(x), kv)

    want_hidden, want_logits = ref.talker_logits_full(params, TCFG, x)
    np.testing.assert_allclose(np.asarray(hidden), want_hidden[-1], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), want_logits[-1], rtol=1e-3, atol=1e-4)


def test_step_equals_full_recompute(params):
    """Incremental KV-cache decode == full-sequence recomputation."""
    rng = np.random.default_rng(2)
    P, extra = 6, 3
    seq = rng.normal(size=(P + extra, TCFG.hidden_size)).astype(np.float32) * 0.3
    kv = T.make_kv_cache(TCFG, 32, jnp.float32)
    _, logits, kv = T.talker_prefill(params, TCFG, jnp.asarray(seq[:P]), kv)
    for i in range(extra):
        hidden, logits, kv = T.talker_step(params, TCFG, jnp.asarray(seq[P + i]), jnp.int32(P + i), kv)
    want_hidden, want_logits = ref.talker_logits_full(params, TCFG, seq)
    np.testing.assert_allclose(np.asarray(logits), want_logits[-1], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hidden), want_hidden[-1], rtol=1e-3, atol=1e-4)


def test_prefill_padding_mask(params):
    """Padding keys beyond valid_len must not affect valid positions."""
    rng = np.random.default_rng(3)
    core = T.core_config(TCFG)
    x = rng.normal(size=(8, TCFG.hidden_size)).astype(np.float32) * 0.3
    kv = jnp.zeros((TCFG.n_layers, 2, TCFG.n_kv_heads, 16, TCFG.head_dim), jnp.float32)
    h_full, _ = forward_prefill(params.blocks, core, jnp.asarray(x[:5]),
                                jnp.arange(5, dtype=jnp.int32), None, kv, 0)
    xp = x.copy()
    xp[5:] = 99.0  # garbage in padding
    h_pad, _ = forward_prefill(params.blocks, core, jnp.asarray(xp),
                               jnp.arange(8, dtype=jnp.int32), jnp.int32(5), kv, 0)
    np.testing.assert_allclose(np.asarray(h_pad[:5]), np.asarray(h_full), rtol=1e-4, atol=1e-5)


def test_step_equals_full_recompute_carried_cache(params):
    """The large-capacity (carry-threaded) cache strategy must agree with the
    full-sequence recompute exactly like the sliced strategy does."""
    from qwen3tts_tpu.models.transformer_core import CARRY_THRESHOLD
    rng = np.random.default_rng(4)
    P, extra = 6, 3
    seq = rng.normal(size=(P + extra, TCFG.hidden_size)).astype(np.float32) * 0.3
    kv = T.make_kv_cache(TCFG, CARRY_THRESHOLD, jnp.float32)  # triggers carried path
    _, logits, kv = T.talker_prefill(params, TCFG, jnp.asarray(seq[:P]), kv)
    for i in range(extra):
        hidden, logits, kv = T.talker_step(params, TCFG, jnp.asarray(seq[P + i]), jnp.int32(P + i), kv)
    want_hidden, want_logits = ref.talker_logits_full(params, TCFG, seq)
    np.testing.assert_allclose(np.asarray(logits), want_logits[-1], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hidden), want_hidden[-1], rtol=1e-3, atol=1e-4)
