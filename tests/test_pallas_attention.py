"""Pallas decode-attention kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.ops.attention import decode_attention
from qwen3tts_tpu.ops.pallas_attention import decode_attention_pallas


@pytest.mark.parametrize("n_valid", [1, 5, 127, 128, 129, 200, 256])
def test_matches_xla_reference(n_valid):
    rng = np.random.default_rng(n_valid)
    Hq, Hkv, D, C = 16, 8, 128, 256
    q = jnp.asarray(rng.normal(size=(Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(Hkv, C, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(Hkv, C, D)), jnp.float32)

    want = decode_attention(q, k, v, jnp.int32(n_valid))
    got = decode_attention_pallas(q, k, v, jnp.int32(n_valid), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_garbage_beyond_valid_is_ignored():
    rng = np.random.default_rng(0)
    Hq, Hkv, D, C = 4, 2, 128, 256
    q = jnp.asarray(rng.normal(size=(Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(Hkv, C, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(Hkv, C, D)), jnp.float32)
    a = decode_attention_pallas(q, k, v, jnp.int32(100), interpret=True)
    k2 = k.at[:, 100:].set(1e4)
    v2 = v.at[:, 100:].set(-1e4)
    b = decode_attention_pallas(q, k2, v2, jnp.int32(100), interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_inputs():
    rng = np.random.default_rng(3)
    Hq, Hkv, D, C = 16, 8, 128, 128
    q = jnp.asarray(rng.normal(size=(Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(Hkv, C, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(Hkv, C, D)), jnp.bfloat16)
    want = decode_attention(q, k, v, jnp.int32(77))
    got = decode_attention_pallas(q, k, v, jnp.int32(77), block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_vmap_over_kernel_matches_reference():
    """Batched serving vmaps the decode attention; the Pallas batching rule
    must agree with the XLA path per lane."""
    rng = np.random.default_rng(9)
    B, Hq, Hkv, D, C = 3, 16, 8, 128, 256
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    n = jnp.asarray([10, 100, 256], jnp.int32)
    got = jax.vmap(lambda q, k, v, n: decode_attention_pallas(
        q, k, v, n, interpret=True))(q, k, v, n)
    want = jax.vmap(decode_attention)(q, k, v, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_layered_kernel_matches_reference():
    from qwen3tts_tpu.ops.pallas_attention import decode_attention_pallas_layered
    rng = np.random.default_rng(12)
    L, Hq, Hkv, D, C = 3, 16, 8, 128, 256
    kv = jnp.asarray(rng.normal(size=(L, 2, Hkv, C, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(Hq, D)), jnp.float32)
    for li in range(L):
        for n in (1, 130, 256):
            want = decode_attention(q, kv[li, 0], kv[li, 1], jnp.int32(n))
            got = decode_attention_pallas_layered(
                q, kv, jnp.int32(li), jnp.int32(n), block=128, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)


def test_layered_kernel_under_vmap():
    from qwen3tts_tpu.ops.pallas_attention import decode_attention_pallas_layered
    rng = np.random.default_rng(13)
    B, L, Hq, Hkv, D, C = 2, 2, 16, 8, 128, 256
    kv = jnp.asarray(rng.normal(size=(B, L, 2, Hkv, C, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)
    li = jnp.asarray([0, 1], jnp.int32)
    n = jnp.asarray([100, 256], jnp.int32)
    got = jax.vmap(lambda q, kv, li, n: decode_attention_pallas_layered(
        q, kv, li, n, block=128, interpret=True))(q, kv, li, n)
    want = jax.vmap(lambda q, kv, li, n: decode_attention(
        q, kv[li, 0], kv[li, 1], n))(q, kv, li, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
