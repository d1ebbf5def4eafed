#!/usr/bin/env python
"""Full-size quantization-quality check: prefill-logits cosine of each quant
tier (int8 w8a16; q4 = MIXED attn-int8/ffn-group-affine-u4; q4pure =
all-group-affine-u4) against the bf16 baseline on synthetic weights at the
real 0.6B shapes.

The reference's own accuracy bar is prefill-logits cosine (README.md:259,
0.99999994 for F16). Gates: int8 near-lossless (>0.99); q4 must match the
reference's own Q4_K storage format quality on the same weights — measured
0.9238 for an exact Q4_K roundtrip vs 0.9205 for this build's affine
per-32-group format (docs/performance.md has the full table; no pure 4-bit
scheme reaches 0.99 on iid-Gaussian synthetic weights, the bound is the
format class, not the kernels).

    python tools/check_quant_cosine.py
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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qwen3tts_tpu.config import PipelineConfig
from qwen3tts_tpu.models import talker as talker_model
from qwen3tts_tpu.ops.quant import (
    quantize_block_params, quantize_block_params_mixed, quantize_block_params_w4)


def main() -> int:
    cfg = PipelineConfig().talker
    print(f"device: {jax.devices()[0]}")

    @jax.jit
    def init():
        return talker_model.init_talker_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    params = jax.block_until_ready(init())

    tokens = np.zeros((32,), np.int32)
    tokens[:15] = np.arange(100, 1600, 100)
    args = (jnp.asarray(tokens), jnp.int32(15),
            jnp.zeros((cfg.hidden_size,), jnp.bfloat16), jnp.int32(2050))

    @functools.partial(jax.jit, static_argnames=())
    def prefill_logits(p, tokens, n, spk, lang):
        pf = talker_model.build_prefill(p, cfg, tokens, n, spk, lang)
        kv = talker_model.make_kv_cache(cfg, 64, jnp.bfloat16)
        _, logits, _ = talker_model.talker_prefill(p, cfg, pf.prefill_embd, kv)
        return logits

    t0 = time.time()
    base = np.asarray(prefill_logits(params, *args), np.float64)
    print(f"bf16 baseline logits in {time.time() - t0:.0f}s")

    results = {}
    for name, qfn in (("int8", quantize_block_params),
                      ("q4", quantize_block_params_mixed),
                      ("q4pure", quantize_block_params_w4)):
        qp = params._replace(blocks=qfn(params.blocks))
        t0 = time.time()
        got = np.asarray(prefill_logits(qp, *args), np.float64)
        cos = float(base @ got / (np.linalg.norm(base) * np.linalg.norm(got) + 1e-12))
        results[name] = cos
        print(f"{name}: prefill-logits cosine vs bf16 = {cos:.6f} "
              f"({time.time() - t0:.0f}s)  argmax match: {base.argmax() == got.argmax()}")

    assert results["int8"] > 0.99, results
    # the MIXED tier (attn int8 / ffn u4) must BEAT the reference's own Q4_K
    # storage quality (0.9238 measured here on identical weights), not tie it
    assert results["q4"] > 0.97, f"mixed q4 tier below its 0.97 bar: {results}"
    # Q4_K-parity bar for the all-4-bit tier: the reference format itself
    # measures 0.9238 here
    assert results["q4pure"] > 0.90, f"q4pure below Q4_K-parity bar: {results}"
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
