"""Pallas fused int8-dequant matmul: y = x @ (q_int8 * scale).

The Q8_0-parity serving path stores projection weights as int8 with
per-output-channel scales (ops/quant.py). On the XLA path the int8->bf16
convert fuses into the dot's operand load (measured: int8 weights give 1.51x
on the full decode loop), so this kernel is the explicit hand-scheduled
alternative: int8 tiles stream HBM->VMEM, dequantize on the VPU, and feed the
MXU in bf16 with an f32 accumulator — the scale is folded into the epilogue.

Usage: ops.quantized_matmul.matmul dispatches here when
QWEN3TTS_PALLAS_INT8=1 and shapes tile cleanly; the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512
TILE_K = 512
MIN_SUBLANE = 8


def _int8_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                   # [M, TK] bf16/f32
    w = q_ref[...].astype(x.dtype)                   # [TK, TN] int8 -> compute dtype
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        scale = s_ref[...].astype(jnp.float32)       # [1, TN]
        o_ref[...] = (acc_ref[...] * scale).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul_pallas(
    x: jnp.ndarray,       # [M, K] bf16/f32
    q: jnp.ndarray,       # [K, N] int8
    scale: jnp.ndarray,   # [1, N]
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    _, N = q.shape
    MP = max(MIN_SUBLANE, -(-M // MIN_SUBLANE) * MIN_SUBLANE)
    tile_k = min(TILE_K, K)
    tile_n = min(TILE_N, N)
    assert K % tile_k == 0 and N % tile_n == 0, (K, N)

    x_pad = x if M == MP else jnp.zeros((MP, K), x.dtype).at[:M].set(x)

    out = pl.pallas_call(
        _int8_matmul_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N // tile_n, K // tile_k),
            in_specs=[
                pl.BlockSpec((MP, tile_k), lambda n, k: (0, k)),
                pl.BlockSpec((tile_k, tile_n), lambda n, k: (k, n)),
                pl.BlockSpec((1, tile_n), lambda n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((MP, tile_n), lambda n, k: (0, n)),
            scratch_shapes=[pltpu.VMEM((MP, tile_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((MP, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_pad, q, scale)
    return out[:M]


def pallas_int8_enabled() -> bool:
    import os

    if not os.environ.get("QWEN3TTS_PALLAS_INT8"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
