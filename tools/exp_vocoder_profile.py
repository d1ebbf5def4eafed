#!/usr/bin/env python
"""Stage-level TPU timing of the vocoder at the 256-frame bench shape.

The vocoder is ~2 TFLOP for 256 frames => ~5 ms at the bf16 roofline, but
measures ~200 ms end-to-end. This breaks the forward into stages and times
each chained (fori_loop, constant input with a scalar data dependency so the
loop can't collapse) to find where the 40x goes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qwen3tts_tpu.config import PipelineConfig
from qwen3tts_tpu.models import vocoder as V

cfg = PipelineConfig().vocoder
T = 256
ITERS = 20


def timed(name, stage, x0, params):
    @jax.jit
    def run(params, x0):
        def body(i, s):
            y = stage(params, x0 * (1.0 + 0.0 * s).astype(x0.dtype))
            return jnp.sum(y.astype(jnp.float32)) * 1e-30 + s
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    try:
        jax.block_until_ready(run(params, x0))
    except Exception as e:
        print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:160]}")
        return 0.0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(params, x0)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:28s} {best * 1e3:8.3f} ms")
    return best


def main():
    print(f"device: {jax.devices()[0]}")
    dt = jnp.bfloat16
    params = jax.jit(lambda: V.init_vocoder_params(
        jax.random.PRNGKey(0), cfg, dt))()
    jax.block_until_ready(params.dec0_w)
    key = jax.random.PRNGKey(1)

    chans = cfg.decoder_channels
    total = 0.0

    # stage 1: VQ + pre-conv + pre-transformer + projections (T=256)
    codes = jax.random.randint(key, (T, 16), 0, cfg.codebook_size)

    def s1(p, c):
        c = c.astype(jnp.int32)
        first = p.vq_first_cb[c[:, 0]]
        rest = p.vq_rest_cb[jnp.arange(cfg.n_codebooks - 1), c[:, 1:]]
        latent = first @ p.vq_first_proj + jnp.sum(rest, axis=1) @ p.vq_rest_proj
        x = V.conv1d(latent, p.pre_conv_w, p.pre_conv_b, causal=True)
        x = x @ p.pt_in_w + p.pt_in_b
        x = V._pre_transformer(p, cfg, x, None)
        from qwen3tts_tpu.ops.norms import rms_norm
        x = rms_norm(x, p.pt_norm, cfg.rms_norm_eps)
        return x @ p.pt_out_w + p.pt_out_b
    total += timed("vq+preconv+pretfm (T=256)", s1, codes.astype(jnp.float32), params)

    # stage 2: ConvNeXt x2 (T=256 -> 1024)
    x = jax.random.normal(key, (T, cfg.latent_dim), dt)

    def s2(p, x):
        for i in range(cfg.n_convnext):
            x = V._convnext_block(x, p.convnext, i, "causal")
        return x
    total += timed("convnext x2 (256->1024)", s2, x, params)

    # stage 3: dec0 conv (T=1024)
    x = jax.random.normal(key, (T * 4, cfg.latent_dim), dt)
    total += timed("dec0 k7 1024->1536 (T=1k)",
                   lambda p, x: V.conv1d(x, p.dec0_w, p.dec0_b, causal=True),
                   x, params)

    # stages 4-7: decoder blocks
    t_in = T * 4
    for bi, rate in enumerate(cfg.upsample_rates):
        x = jax.random.normal(key, (t_in, chans[bi]), dt)

        def sblk(p, x, bi=bi, rate=rate):
            return V._decoder_block(x, p.dec_blocks[bi], rate,
                                    cfg.res_dilations, "causal")
        total += timed(
            f"dec blk{bi} r{rate} {chans[bi]}->{chans[bi+1]} (T={t_in})",
            sblk, x, params)
        t_in *= rate

    # stage 8: final snake + conv + tanh (T=491520)
    x = jax.random.normal(key, (t_in, chans[-1]), dt)

    def s8(p, x):
        x = V.snake(x, p.final_alpha, p.final_beta)
        x = V.conv1d(x, p.out_w, p.out_b, causal=True)
        return jnp.tanh(x.astype(jnp.float32))[:, 0]
    total += timed(f"final snake+conv (T={t_in})", s8, x, params)

    print(f"{'sum of stages':28s} {total * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
