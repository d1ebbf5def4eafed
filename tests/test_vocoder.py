"""Vocoder correctness: NumPy float64 reference parity, length, causality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import tiny_pipeline_config, VocoderConfig
from qwen3tts_tpu.models import vocoder as V

import reference_impl as ref

CFG = tiny_pipeline_config().vocoder


@pytest.fixture(scope="module")
def params():
    return V.init_vocoder_params(jax.random.PRNGKey(21), CFG, jnp.float32)


def _codes(T, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, CFG.codebook_size, size=(T, CFG.n_codebooks)).astype(np.int32)


def test_output_length_is_1920x_per_frame(params):
    # tiny config keeps upsample rates 8/5/4/3 and 2 ConvNeXt x2 blocks
    codes = _codes(5)
    audio = V.vocoder_forward(params, CFG, jnp.asarray(codes))
    assert audio.shape == (5 * CFG.samples_per_frame,)
    assert CFG.samples_per_frame == 1920


def test_matches_numpy_reference(params):
    codes = _codes(4, seed=3)
    got = np.asarray(V.vocoder_forward(params, CFG, jnp.asarray(codes)))
    want = ref.vocoder_ref(params, CFG, codes)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_causality(params):
    """Changing frame t must not change samples before t * 1920 (the stack is
    causal: left-padded convs, causal attention, right-trimmed transposed
    convs)."""
    codes = _codes(6, seed=4)
    a = np.asarray(V.vocoder_forward(params, CFG, jnp.asarray(codes)))
    codes2 = codes.copy()
    codes2[4] = (codes2[4] + 17) % CFG.codebook_size
    b = np.asarray(V.vocoder_forward(params, CFG, jnp.asarray(codes2)))
    spf = CFG.samples_per_frame
    np.testing.assert_array_equal(a[: 4 * spf], b[: 4 * spf])
    assert np.abs(a[4 * spf:] - b[4 * spf:]).max() > 0


def test_frame_padding_is_invisible(params):
    """Right-padding codes into a larger bucket must not change valid samples
    (this is what makes bucketed + streaming decode safe)."""
    codes = _codes(5, seed=5)
    a = np.asarray(V.vocoder_decode(params, CFG, jnp.asarray(codes), jnp.int32(5)))
    padded = np.zeros((8, CFG.n_codebooks), np.int32)
    padded[:5] = codes
    b = np.asarray(V.vocoder_decode(params, CFG, jnp.asarray(padded), jnp.int32(5)))
    spf = CFG.samples_per_frame
    # fp reassociation across different padded shapes allows tiny drift
    np.testing.assert_allclose(b[: 5 * spf], a, rtol=1e-3, atol=5e-4)


def test_symmetric_trim_variant_matches_reference(params):
    """The C++-compatible symmetric trim drops `stride` samples per block."""
    codes = _codes(4, seed=6)
    got = np.asarray(V.vocoder_forward(params, CFG, jnp.asarray(codes), trim="symmetric"))
    want = ref.vocoder_ref(params, CFG, codes, trim="symmetric")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
