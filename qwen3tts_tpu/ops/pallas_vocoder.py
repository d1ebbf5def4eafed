"""Fused vocoder residual-block kernel: snake -> dilated k=7 causal conv ->
snake -> k=1 conv -> residual add, one Pallas call gridded over row tiles.

Why: the decoder stack's residual blocks run at long T (up to 491k rows) and
narrow C (96-768). In XLA each op is a separate HBM round trip, and the
conv's single-dot (im2col) form materializes a [T, 7C] intermediate — ~2 GB
of traffic per k=7 conv at the last block against a 0.2 GB optimum. Measured:
the four decoder blocks are 38.6 ms of the 48 ms vocoder forward at 256
frames. Here the whole chain happens on a VMEM-resident window: x is read
once and y written once (plus a 6*dilation-row halo, recomputed per tile).

Mechanics (reference semantics: vocoder._residual_block, which mirrors
src/audio_tokenizer_decoder.cpp:551-579):
  - the window carries ceil(6*dilation/8)*8 halo rows above each R-row tile
    (HBM DMA slices must stay 8-sublane aligned); the first tile's halo is
    zero-filled, which is exactly the causal zero padding because snake is
    zero-preserving (snake(0) = 0).
  - the k=7 dilated conv is a sum of 7 static-offset window slices through
    the MXU ([R, C] @ [C, C] each, f32 accumulation), not an im2col concat.
  - intermediates are cast at the same points as the XLA path (conv output
    -> x.dtype, then bias) so both paths agree within bf16 tolerances.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 32768


def fused_vocoder_enabled() -> bool:
    """Default-ON on TPU as of r5 (QWEN3TTS_FUSED_VOC=0 reverts; =force
    enables on CPU too — interpret mode, for the padded-lane tests).

    History: the r2 measurement called this kernel neutral, but that
    verdict only ever covered the WIDE blocks — fused_res_block_supported
    rejects C % 128 != 0, and the r5 stage profile showed decoder blocks
    2-3 (C=192 at T=163840, C=96 at T=491520) are 38 of the 56 ms vocoder
    forward. With the padded-lane path those blocks route through the
    kernel and the r5 A/B measured: full forward 41.0 vs 48.9 ms
    (-14%); serving path (16-lane lax.map group, f32-pinned XLA baseline)
    68.95 vs 75.84 ms/lane (-9%). The kernel's dots pin
    precision=DEFAULT so the serving path's f32 pin cannot leak in
    (Mosaic rejects fp32-precision bf16 matmuls)."""
    val = os.environ.get("QWEN3TTS_FUSED_VOC", "1")
    if val in ("0", "false", "off", ""):
        return False
    if val == "force":
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _pick_tile(T: int, C: int, tile: int) -> int:
    """Largest tile dividing T, shrunk so the working set (window + f32
    temps + double-buffered output) stays well under VMEM at wide C."""
    R = tile
    while R * C > 2 * 1024 * 1024 and R > 8:
        R //= 2
    while T % R != 0 and R > 1:
        R //= 2
    return R


def fused_res_block_supported(T: int, C: int, dilation: int,
                              tile: int = _TILE) -> bool:
    """True when the lane dim is DMA-able (128-multiple — Mosaic rejects
    HBM->VMEM copies at other widths) and the tile dividing T covers the
    halo."""
    if C % 128 != 0:
        return False
    R = _pick_tile(T, C, tile)
    return T % R == 0 and R >= -(-6 * dilation // 8) * 8


def _snake(x, alpha, beta):
    a = jnp.exp(alpha.astype(jnp.float32))
    ib = jnp.exp(-beta.astype(jnp.float32))
    s = jnp.sin(x.astype(jnp.float32) * a)
    return x.astype(jnp.float32) + ib * s * s


def _make_kernel(R, Hp, C, dilation, dtype):
    """Window DMAs are double-buffered across grid steps: step g waits on the
    copy issued at step g-1 and prefetches step g+1's window behind its own
    compute — the measured sync-DMA stall (~36 us/step issue+wait latency,
    4.3 of 6.0 ms at the last decoder block) disappears."""
    K = 7

    def kernel(x_hbm, w1_ref, b1_ref, a1_ref, be1_ref,
               w2_ref, b2_ref, a2_ref, be2_ref,
               out_ref, win_ref, im_ref, sem):
        g = pl.program_id(0)
        slot = jax.lax.rem(g, 2)

        def dma_for(step, slot_idx):
            off = pl.multiple_of(step * R - Hp, 8)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(off, Hp + R)], win_ref.at[slot_idx],
                sem.at[slot_idx])

        @pl.when(g == 0)
        def _():
            win_ref[0, 0:Hp] = jnp.zeros((Hp, C), dtype)
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, R)], win_ref.at[0, pl.ds(Hp, R)],
                sem.at[0]).start()

        @pl.when(g + 1 < pl.num_programs(0))
        def _():
            dma_for(g + 1, 1 - slot).start()

        @pl.when(g == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, R)], win_ref.at[0, pl.ds(Hp, R)],
                sem.at[0]).wait()

        @pl.when(g > 0)
        def _():
            dma_for(g, slot).wait()

        win = win_ref[slot]
        s1 = _snake(win, a1_ref[0], be1_ref[0]).astype(dtype)
        # im2col in VMEM: 7 shifted stores, then ONE K=7C dot — 7 separate
        # K=C dots cost 7x the MXU passes at poor pipeline depth (measured
        # ~6x off peak at C=128).
        # precision=DEFAULT explicitly: the batched serving path wraps
        # vocoding in jax.default_matmul_precision("float32"), and that
        # ambient pin leaks into pallas dots as contract_precision<fp32>
        # on bf16 vectors, which Mosaic rejects ("Bad lhs type"); the
        # kernel already accumulates in f32 via preferred_element_type.
        base = Hp - 6 * dilation
        for k in range(K):
            off = base + k * dilation
            im_ref[:, k * C:(k + 1) * C] = s1[off:off + R]
        y = jax.lax.dot_general(
            im_ref[...], w1_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT).astype(dtype) + b1_ref[0]

        s2 = _snake(y, a2_ref[0], be2_ref[0]).astype(dtype)
        z = jax.lax.dot_general(
            s2, w2_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT).astype(dtype) + b2_ref[0]
        out_ref[...] = win[Hp:Hp + R] + z

    return kernel


@functools.partial(jax.jit, static_argnames=("dilation", "tile", "interpret"))
def fused_res_block(
    x: jnp.ndarray,            # [T, C]
    w1: jnp.ndarray,           # [7, C, C] dilated-conv weight
    b1: jnp.ndarray,           # [C]
    a1: jnp.ndarray,           # [C] snake1 alpha
    be1: jnp.ndarray,          # [C] snake1 beta
    w2: jnp.ndarray,           # [1, C, C] pointwise-conv weight
    b2: jnp.ndarray,           # [C]
    a2: jnp.ndarray,           # [C] snake2 alpha
    be2: jnp.ndarray,          # [C] snake2 beta
    *,
    dilation: int,
    tile: int = _TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + conv_k1(snake(conv_k7_dilated(snake(x)))) — vocoder residual
    block, one HBM read + one write."""
    if jax.default_backend() == "cpu":
        interpret = True
    T, C = x.shape
    R = _pick_tile(T, C, tile)
    Hp = -(-6 * dilation // 8) * 8
    if R < Hp:
        # a tile smaller than the halo would read before row 0 on tiles > 0;
        # production shapes never hit this (R >= 512 vs Hp <= 56)
        raise ValueError(f"tile {R} smaller than halo {Hp} (T={T}, d={dilation})")
    kernel = _make_kernel(R, Hp, C, dilation, x.dtype)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(T // R,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [vmem] * 8,
        out_specs=pl.BlockSpec((R, C), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Hp + R, C), x.dtype),
            pltpu.VMEM((R, 7 * C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # window + f32 conv temps + weights exceed the default VMEM
            # budget at C=768 (~40 MB); headroom matches the talker kernel
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, w1.reshape(7 * C, C), b1.reshape(1, C), a1.reshape(1, C),
      be1.reshape(1, C),
      w2, b2.reshape(1, C), a2.reshape(1, C), be2.reshape(1, C))
