"""Parity tests for the fused vocoder residual-block kernel
(ops/pallas_vocoder.py) against the XLA path, interpret mode on CPU."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.models.vocoder import conv1d, snake
from qwen3tts_tpu.ops.pallas_vocoder import fused_res_block


def _xla_res_block(x, w1, b1, a1, be1, w2, b2, a2, be2, dilation):
    r = x
    x = snake(x, a1, be1)
    x = conv1d(x, w1, b1, dilation=dilation, causal=True)
    x = snake(x, a2, be2)
    x = conv1d(x, w2, b2, causal=True)
    return r + x


def _mk(key, T, C, dtype):
    ks = jax.random.split(key, 9)
    sc = 1.0 / np.sqrt(7 * C)
    return (
        jax.random.normal(ks[0], (T, C), dtype),
        (jax.random.normal(ks[1], (7, C, C), dtype) * sc,
         jax.random.normal(ks[2], (C,), dtype) * 0.1,
         jax.random.normal(ks[3], (C,), dtype) * 0.1,
         jax.random.normal(ks[4], (C,), dtype) * 0.1,
         jax.random.normal(ks[5], (1, C, C), dtype) * sc * 2,
         jax.random.normal(ks[6], (C,), dtype) * 0.1,
         jax.random.normal(ks[7], (C,), dtype) * 0.1,
         jax.random.normal(ks[8], (C,), dtype) * 0.1),
    )


@pytest.mark.parametrize("dilation", [1, 3, 9])
def test_fused_res_block_matches_xla(dilation):
    """Multi-tile grid (tile=64 over T=192) with the d=9 halo spanning most
    of a tile; first-tile halo is the causal zero pad."""
    x, ws = _mk(jax.random.PRNGKey(dilation), 192, 16, jnp.float32)
    want = _xla_res_block(x, *ws, dilation)
    got = fused_res_block(x, *ws, dilation=dilation, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_res_block_single_tile_and_bf16():
    x, ws = _mk(jax.random.PRNGKey(7), 64, 16, jnp.bfloat16)
    want = np.asarray(_xla_res_block(x, *ws, 3), np.float32)
    got = np.asarray(
        fused_res_block(x, *ws, dilation=3, tile=64, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_fused_res_block_odd_tile_divisor():
    """T not divisible by the default tile: the wrapper halves the tile until
    it divides (e.g. streaming chunk shapes)."""
    x, ws = _mk(jax.random.PRNGKey(9), 80, 16, jnp.float32)
    want = _xla_res_block(x, *ws, 1)
    got = fused_res_block(x, *ws, dilation=1, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forced_fused_path_matches_plain(monkeypatch):
    """QWEN3TTS_FUSED_VOC=force runs the padded-lane decoder stack (channels
    zero-padded to 128 multiples) with the kernel in interpret mode where
    supported; output must match the plain XLA path."""
    from qwen3tts_tpu.config import tiny_pipeline_config
    from qwen3tts_tpu.models import vocoder as V

    cfg = tiny_pipeline_config().vocoder
    params = V.init_vocoder_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    codes = jax.random.randint(jax.random.PRNGKey(4), (8, 16), 0, cfg.codebook_size)

    monkeypatch.setenv("QWEN3TTS_FUSED_VOC", "0")
    plain = np.asarray(V.vocoder_forward(params, cfg, codes, jnp.int32(8)))
    monkeypatch.setenv("QWEN3TTS_FUSED_VOC", "force")
    forced = np.asarray(V.vocoder_forward(params, cfg, codes, jnp.int32(8)))
    # the kernel's sum-of-7-dots accumulates in a different order than the
    # single im2col dot; through 4 stacked decoder blocks + tanh that is a
    # ~1e-4 drift, not a layout error (those would be O(1))
    np.testing.assert_allclose(forced, plain, rtol=5e-3, atol=5e-4)
