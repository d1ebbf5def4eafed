"""Counter-based Gumbel noise + shared sampler for the fused Pallas kernels.

Replaces the hardware PRNG (pltpu.prng_random_bits) in the on-kernel
samplers: noise for a (seed, step, vocab slot) triple is a pure integer
hash, which buys three properties the hardware stream cannot give:

- lane decomposability: row b of a batched kernel using lane seed s_b is
  BIT-IDENTICAL to a single-stream kernel run with seed s_b, so batched
  sampled serving reproduces single-stream output lane-for-lane;
- CPU testability: interpret mode computes real noise (the TPU interpreter
  stubs prng_random_bits to zeros), so sampling is verified end-to-end on
  CPU against the NumPy mirror in tests/reference_impl.py;
- dynamic sampling params: temperature/top_p ride in as traced scalars, so
  one compiled program serves every sampling configuration (the reference
  accepts them per-call at zero cost, src/tts_transformer.cpp:2577-2596 —
  over a remote compile service that matters even more).

The mix is two murmur3-finalizer rounds over a per-(seed, step) base plus
the vocab-slot counter — avalanche quality far beyond what Gumbel-argmax
sampling needs. int32 arithmetic wraps like uint32 bit-for-bit (mul/add/xor);
logical shifts go through uint32 bitcasts (Mosaic cannot cast uint32->f32,
so the final 24-bit uniform comes back as a non-negative int32).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_BSEARCH_ITERS = 30
_TOPP_ITERS = 20


def sampling_flags(temperature, top_p, greedy=None, use_top_p=None):
    """Static sampler-stage gates, derived once at the OUTERMOST entry point
    from python-float sampling params (traced scalars keep the conservative
    dynamic path: greedy=False, use_top_p=True).

    Why flags instead of pure branchless compute: the binary searches are
    chains of full-vector reductions — measured ~1 ms/frame of pure overhead
    when the stage is a no-op (top_p == 1, or greedy decode). With flags the
    common classes pay nothing, while changing temperature/top_p VALUES
    within a class never recompiles (they stay traced scalars). Moving
    between classes (greedy<->sampled, top_p on<->off) compiles each program
    once — four variants max per shape bucket.
    """
    if greedy is None:
        greedy = isinstance(temperature, (int, float)) and float(temperature) <= 0.0
    if use_top_p is None:
        if isinstance(top_p, (int, float)):
            use_top_p = float(top_p) < 1.0
        else:
            use_top_p = True
    return bool(greedy), bool(use_top_p)

# uint32 constants in int32 two's-complement form
_GOLDEN = -1640531527   # 0x9E3779B9
_M1 = -2048144789       # 0x85EBCA6B
_M2 = -1028477387       # 0xC2B2AE35


def _shr(x, n):
    return pltpu.bitcast(pltpu.bitcast(x, jnp.uint32) >> n, jnp.int32)


def _mix(x):
    """murmur3 finalizer (bit-exact mirror: reference_impl.gumbel_noise_ref)."""
    x = x ^ _shr(x, 16)
    x = x * jnp.int32(_M1)
    x = x ^ _shr(x, 13)
    x = x * jnp.int32(_M2)
    x = x ^ _shr(x, 16)
    return x


def gumbel_noise(seed, step, shape):
    """Gumbel(0, 1) f32 noise of `shape` (last dim = vocab slots).

    seed: int32 scalar (single-stream) or [R, 1] vector (one per lane);
    step: traced int32. Row r depends only on (seed_r, step, column).
    """
    v = lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    base = seed + step * jnp.int32(_GOLDEN)
    x = _mix(_mix(v + base * jnp.int32(_M1)) ^ base)
    u = _shr(x, 8).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
    return -jnp.log(-jnp.log(u))


def make_sampler(top_k: int, vocab: int, *, greedy: bool = False,
                 use_top_p: bool = True):
    """sample(logits_f32 [R, V], temp, top_p, seed, step) -> int32 [R, 1].

    Reproduces the decode loop's sampling semantics on-kernel
    (ops/sampling.sample_token): greedy (argmax, first-max tie-break) when
    the static `greedy` flag is set; else temperature scale -> top-k
    threshold (binary search on the value range, ties kept) -> nucleus top-p
    (binary search on the prob threshold, crossing token + ties kept, only
    when `use_top_p`) -> Gumbel-argmax. temp and top_p are traced f32
    scalars (value changes never recompile); top_k and the stage flags are
    static (see sampling_flags); seed scalar or [R, 1].
    """

    def sample(logits, temp, top_p, seed, step):
        if greedy:
            return jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
        l = logits * (1.0 / jnp.maximum(temp, 1e-6))
        if 0 < top_k < vocab:
            lo = jnp.min(l, axis=-1, keepdims=True) - 1.0
            hi = jnp.max(l, axis=-1, keepdims=True)

            def bs(_, lohi):
                lo, hi = lohi
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum((l >= mid).astype(jnp.int32), axis=-1,
                              keepdims=True)
                take = cnt >= top_k
                return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

            lo, hi = lax.fori_loop(0, _BSEARCH_ITERS, bs, (lo, hi))
            l = jnp.where(l >= lo, l, NEG_INF)
        if use_top_p:
            # nucleus: largest prob threshold tau with
            # mass(probs >= tau) >= top_p
            m = jnp.max(l, axis=-1, keepdims=True)
            e = jnp.exp(l - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)

            def bsp(_, lohi):
                lo, hi = lohi
                mid = 0.5 * (lo + hi)
                mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1,
                               keepdims=True)
                take = mass >= top_p
                return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

            plo, _ = lax.fori_loop(
                0, _TOPP_ITERS, bsp,
                (jnp.zeros_like(m), jnp.max(probs, axis=-1, keepdims=True)))
            l = jnp.where(jnp.logical_or(top_p >= 1.0, probs >= plo),
                          l, NEG_INF)
        g = gumbel_noise(seed, step, l.shape)
        return jnp.argmax(l + g, axis=-1, keepdims=True).astype(jnp.int32)

    return sample
