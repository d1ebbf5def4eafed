"""Counter-hash sampling noise (ops/kernel_prng.py): NumPy-mirror parity,
lane decomposability, and distribution sanity — all on CPU in Pallas
interpret mode (the point of replacing the hardware PRNG, whose interpreter
stub was zeros)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3tts_tpu.ops.kernel_prng import gumbel_noise
import reference_impl as ref


def _noise_via_kernel(seeds, step, shape):
    """Run gumbel_noise inside a trivial interpret-mode Pallas kernel."""

    def kern(seed_ref, out_ref):
        out_ref[...] = gumbel_noise(seed_ref[...], jnp.int32(step), shape)

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=pltpu.InterpretParams(),
    )(jnp.asarray(seeds, jnp.int32))


def test_matches_numpy_mirror():
    seeds = np.array([[3], [-17], [123456789], [0]], np.int32)
    got = np.asarray(_noise_via_kernel(seeds, 7, (4, 128)), np.float64)
    want = ref.gumbel_noise_ref(seeds, 7, (4, 128))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lane_decomposable():
    """Row b of a batched draw == a single-row draw with seed_b (the property
    that makes batched sampling reproduce single-stream lane-for-lane)."""
    seeds = np.array([[11], [-5], [999]], np.int32)
    batched = np.asarray(_noise_via_kernel(seeds, 3, (3, 128)))
    for b in range(3):
        single = np.asarray(_noise_via_kernel(seeds[b:b + 1], 3, (1, 128)))
        np.testing.assert_array_equal(batched[b], single[0], err_msg=f"lane {b}")


def test_step_and_seed_sensitivity():
    s = np.array([[42]], np.int32)
    a = np.asarray(_noise_via_kernel(s, 1, (1, 256)))
    b = np.asarray(_noise_via_kernel(s, 2, (1, 256)))
    c = np.asarray(_noise_via_kernel(np.array([[43]], np.int32), 1, (1, 256)))
    assert (a != b).mean() > 0.99
    assert (a != c).mean() > 0.99


def test_gumbel_distribution_sanity():
    """Mean ~ Euler-Mascheroni (0.5772), var ~ pi^2/6 (1.6449); a coarse
    two-sided gate catches a broken mix or a degenerate uniform."""
    seeds = np.arange(64, dtype=np.int32).reshape(64, 1)
    x = np.asarray(_noise_via_kernel(seeds, 5, (64, 512)), np.float64).ravel()
    assert abs(x.mean() - 0.5772) < 0.02, x.mean()
    assert abs(x.var() - 1.6449) < 0.08, x.var()
    # uniform-in-(0,1) inputs -> no +-inf
    assert np.isfinite(x).all()


@pytest.mark.parametrize("top_p", [0.3, 0.8])
def test_xla_top_p_bsearch_matches_sort_formulation(top_p):
    """ops/sampling.apply_top_p (binary search) == the sort-based nucleus
    definition (keep tokens whose preceding cumulative mass < top_p)."""
    from qwen3tts_tpu.ops.sampling import apply_top_p, NEG_INF

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 257)).astype(np.float32) * 3.0
    got = np.asarray(apply_top_p(jnp.asarray(logits), top_p))
    for r in range(logits.shape[0]):
        row = logits[r].astype(np.float64)
        order = np.argsort(-row)
        probs = np.exp(row - row.max())
        probs /= probs.sum()
        cum = np.cumsum(probs[order])
        keep_sorted = (cum - probs[order]) < top_p
        keep = np.zeros(row.shape, bool)
        keep[order[keep_sorted]] = True
        masked = got[r] <= NEG_INF / 2
        np.testing.assert_array_equal(~masked, keep, err_msg=f"row {r}")
