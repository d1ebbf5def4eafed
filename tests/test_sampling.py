"""Sampling-op semantics vs the reference CLI rules."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3tts_tpu.ops import sampling as S


def test_suppression_masks_tail_except_eos():
    logits = jnp.zeros((3072,))
    out = np.asarray(S.apply_suppression(logits, 2048, 2150))
    assert (out[:2048] == 0).all()
    assert out[2150] == 0
    masked = np.delete(out[2048:], 2150 - 2048)
    assert (masked <= -1e29).all()


def test_repetition_penalty_hf_semantics():
    logits = jnp.array([2.0, -2.0, 1.0, -1.0])
    seen = jnp.array([True, True, False, False])
    out = np.asarray(S.apply_repetition_penalty(logits, seen, 1.25))
    np.testing.assert_allclose(out, [2.0 / 1.25, -2.0 * 1.25, 1.0, -1.0], rtol=1e-6)


def test_top_k_threshold_keeps_ties():
    logits = jnp.array([5.0, 4.0, 4.0, 1.0, 0.0])
    out = np.asarray(S.apply_top_k(logits, 2))
    # threshold = 2nd largest = 4.0; both 4.0s survive (reference partial_sort
    # semantics: only values strictly below threshold are masked)
    assert out[0] == 5.0 and out[1] == 4.0 and out[2] == 4.0
    assert out[3] <= -1e29 and out[4] <= -1e29


def test_top_p_keeps_crossing_token():
    logits = jnp.log(jnp.array([0.5, 0.3, 0.15, 0.05]))
    out = np.asarray(S.apply_top_p(logits, 0.7))
    assert np.isfinite(out[0]) and np.isfinite(out[1])
    assert out[2] <= -1e29 and out[3] <= -1e29


def test_greedy_matches_argmax_and_temperature_zero():
    key = jax.random.PRNGKey(0)
    logits = jnp.array([0.1, 3.0, 2.9, -1.0])
    tok = S.sample_token(key, logits, temperature=0.0, top_k=0)
    assert int(tok) == 1


def test_sampling_respects_topk_support():
    key = jax.random.PRNGKey(0)
    logits = jnp.array([10.0, 9.0, -5.0, -6.0, -7.0])
    toks = [int(S.sample_token(jax.random.fold_in(key, i), logits,
                               temperature=1.0, top_k=2)) for i in range(64)]
    assert set(toks) <= {0, 1}
    assert len(set(toks)) == 2  # both supported tokens appear


def test_sampling_distribution_roughly_matches_softmax():
    key = jax.random.PRNGKey(42)
    logits = jnp.array([1.0, 0.0, -1.0])
    n = 4000
    keys = jax.random.split(key, n)
    toks = jax.vmap(lambda k: S.sample_token(k, logits, temperature=1.0, top_k=0))(keys)
    counts = np.bincount(np.asarray(toks), minlength=3) / n
    probs = np.asarray(jax.nn.softmax(logits))
    np.testing.assert_allclose(counts, probs, atol=0.05)
