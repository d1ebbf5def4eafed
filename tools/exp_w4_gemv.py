#!/usr/bin/env python
"""Feasibility probe: 4-bit-weight GEMV strategies in Pallas on the real TPU.

Question: can the talker kernel's weight DMA (0.54 ms/step int8 floor) be
halved with 4-bit weights without giving the savings back to unpack cost?

Variants, each a layer-gridded kernel streaming W from HBM (mirrors the
fused talker's structure: grid over L "layers", per-step dot of x[1,K] with
W_l[K,N], accumulate; output the sum so nothing is dead-code-eliminated):
  int8   — baseline: int8 weights, w8a8 dot (the production path today)
  int4   — native jnp.int4 weights; Mosaic converts int4->int8 in-kernel
  packed — int8 bytes holding two nibbles (split-half layout); manual
           mask/shift/sub unpack to int8, two half-K dots
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L, K, N = 28, 1024, 4096  # wqkv-like shape, 28 layers


def make(variant):
    def kernel(x_ref, w_ref, o_ref, acc_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xq = x_ref[...]  # [1, K] int8 (pre-quantized activation)
        if variant == "int8":
            w = w_ref[0]
            acc = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        elif variant == "int4":
            w = w_ref[0].astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        elif variant == "int4dot":
            # int4 weights fed to the MXU directly (no explicit convert)
            w = w_ref[0]
            acc = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:  # packed
            b = w_ref[0].astype(jnp.int32)       # [K//2, N]
            lo = ((b & 15) - 8).astype(jnp.int8)
            hi = (((b >> 4) & 15) - 8).astype(jnp.int8)
            acc = (jax.lax.dot_general(
                       xq[:, :K // 2], lo, (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.int32)
                   + jax.lax.dot_general(
                       xq[:, K // 2:], hi, (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.int32))
        acc_ref[...] += acc

        @pl.when(g == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = acc_ref[...]

    if variant == "int8":
        wdt, wshape = jnp.int8, (L, K, N)
    elif variant in ("int4", "int4dot"):
        wdt, wshape = jnp.int4, (L, K, N)
    else:
        wdt, wshape = jnp.int8, (L, K // 2, N)

    def call(x, w):
        return pl.pallas_call(
            kernel,
            grid=(L,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + wshape[1:], lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, N), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, w)

    ITERS = 50

    @jax.jit
    def run(x, w):
        # chain ITERS kernel calls inside one program so per-dispatch tunnel
        # overhead (~27 ms!) amortizes away; data-depend each iteration on
        # the previous output so XLA cannot CSE them
        def body(i, carry):
            x, acc = carry
            out = call(x, w)
            x = (x ^ out[:, :K].astype(jnp.int8))  # fake dependency
            return x, acc + out
        return jax.lax.fori_loop(0, ITERS, body,
                                 (x, jnp.zeros((1, N), jnp.int32)))

    return run, call, wdt, wshape, ITERS


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (1, K)), jnp.int8)
    wv = rng.integers(-8, 8, (L, K, N)).astype(np.int32)
    packed = ((wv[:, :K // 2] + 8) | ((wv[:, K // 2:] + 8) << 4)).astype(np.uint8)

    print(f"device: {jax.devices()[0]}")
    results = {}
    for variant in ["int8", "packed"]:
        run, call, wdt, wshape, ITERS = make(variant)
        if variant == "packed":
            w = jnp.asarray(packed).view(jnp.int8)
        else:
            w = jnp.asarray(wv).astype(wdt)
        try:
            # correctness: one un-chained call
            out1 = jax.block_until_ready(jax.jit(call)(x, w))
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(x, w))
            print(f"{variant:8s} compile+run {time.perf_counter()-t0:.1f}s "
                  f"w bytes: {w.dtype} {w.nbytes/1e6:.1f} MB")
        except Exception as e:
            print(f"{variant:8s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            continue
        want = np.zeros((1, N), np.int64)
        for l in range(L):
            want += np.asarray(x, np.int64) @ wv[l].astype(np.int64)
        ok = np.array_equal(np.asarray(out1, np.int64), want)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(x, w)
            np.asarray(out[1])
            best = min(best, (time.perf_counter() - t0) / ITERS)
        results[variant] = best
        print(f"{variant:8s} exact={ok}  best {best*1e3:.3f} ms/iter "
              f"({w.nbytes/best/1e9:.0f} GB/s effective)")
    print(results)


if __name__ == "__main__":
    main()
