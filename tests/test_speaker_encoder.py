"""Speaker encoder + mel front end vs the NumPy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.audio import mel as mel_mod
from qwen3tts_tpu.config import tiny_pipeline_config
from qwen3tts_tpu.models import speaker_encoder as SE

import reference_impl as ref

CFG = tiny_pipeline_config().speaker_encoder


@pytest.fixture(scope="module")
def params():
    return SE.init_speaker_encoder_params(jax.random.PRNGKey(31), CFG, jnp.float32)


def _audio(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=n) * 0.1).astype(np.float32)


def test_mel_matches_reference():
    fb = jnp.asarray(mel_mod.slaney_mel_filterbank(CFG))
    win = jnp.asarray(mel_mod.centered_hann(CFG))
    n = 700
    audio = _audio(n)
    Sb = 1024
    buf = np.zeros(Sb, np.float32)
    buf[:n] = audio
    mel, n_frames = mel_mod.log_mel(jnp.asarray(buf), jnp.int32(n), CFG, fb, win)
    want = ref.mel_ref(audio, CFG)
    assert int(n_frames) == want.shape[0]
    np.testing.assert_allclose(np.asarray(mel)[: want.shape[0]], want, rtol=1e-3, atol=1e-3)


def test_embedding_matches_reference(params):
    Tf = 24
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(Tf, CFG.n_mels)).astype(np.float32)
    got = np.asarray(SE.speaker_encoder_forward(params, CFG, jnp.asarray(mel), jnp.int32(Tf)))
    want = ref.speaker_encoder_ref(params, CFG, mel)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_frame_padding_is_invisible(params):
    """Masked forward over a padded bucket must equal the exact-length run."""
    Tf = 19
    rng = np.random.default_rng(3)
    mel = rng.normal(size=(Tf, CFG.n_mels)).astype(np.float32)
    exact = np.asarray(SE.speaker_encoder_forward(params, CFG, jnp.asarray(mel), jnp.int32(Tf)))
    padded = np.zeros((32, CFG.n_mels), np.float32)
    padded[:Tf] = mel
    padded[Tf:] = 123.0  # garbage
    got = np.asarray(SE.speaker_encoder_forward(params, CFG, jnp.asarray(padded), jnp.int32(Tf)))
    np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_mel_sample_padding_is_invisible():
    fb = jnp.asarray(mel_mod.slaney_mel_filterbank(CFG))
    win = jnp.asarray(mel_mod.centered_hann(CFG))
    n = 640
    audio = _audio(n, seed=5)
    outs = []
    for Sb in (768, 1024):
        buf = np.zeros(Sb, np.float32)
        buf[:n] = audio
        mel, nf = mel_mod.log_mel(jnp.asarray(buf), jnp.int32(n), CFG, fb, win)
        outs.append(np.asarray(mel)[: int(nf)])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
