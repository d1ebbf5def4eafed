#!/usr/bin/env python
"""Dump tensor names/shapes/dtypes of a checkpoint (HF safetensors dir or
GGUF file) and audit them against the configured model shapes.

Counterpart of the reference's scripts/inspect_models.py (component #17,
SURVEY.md §2) whose output is docs/model_inspection.txt.

    python tools/inspect_checkpoint.py <path> [--audit tts|tokenizer]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def iter_tensors(path: str):
    if os.path.isdir(path):
        from qwen3tts_tpu.io.safetensors_io import SafetensorsDir
        sub = os.path.join(path, "speech_tokenizer")
        st = SafetensorsDir(sub if os.path.isdir(sub) else path)
        for name in sorted(st.keys()):
            t = st.tensor(name)
            yield name, t.shape, str(t.dtype)
    elif path.endswith(".gguf"):
        from qwen3tts_tpu.io.gguf import GGUFReader
        r = GGUFReader(path)
        type_names = {0: "f32", 1: "f16", 8: "q8_0"}
        for name in sorted(r.keys()):
            shape, ttype, _ = r.tensors[name]
            yield name, shape, type_names.get(ttype, str(ttype))
    else:
        raise ValueError(f"unsupported checkpoint path: {path}")


def audit(path: str, kind: str) -> int:
    """Load through the real loaders and report parameter counts per stage."""
    import jax
    import jax.numpy as jnp
    from qwen3tts_tpu.config import PipelineConfig
    from qwen3tts_tpu.io import loader as loader_mod

    cfg = PipelineConfig()
    n_bad = 0
    if os.path.isdir(path):
        st = loader_mod.open_checkpoint_dir(path)
    else:
        from qwen3tts_tpu.io.gguf_checkpoint import GGUFCheckpoint
        st = GGUFCheckpoint(path)

    def count(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    if kind == "tts":
        talker = loader_mod.load_talker(st, cfg.talker, jnp.float32)
        cp = loader_mod.load_code_predictor(st, cfg.code_predictor, jnp.float32)
        spk = loader_mod.load_speaker_encoder(st, cfg.speaker_encoder, jnp.float32)
        print(f"talker params:          {count(talker):>12,}")
        print(f"code-predictor params:  {count(cp):>12,}")
        print(f"speaker-encoder params: {count(spk):>12,}")
    else:
        voc = loader_mod.load_vocoder(st, cfg.vocoder, jnp.float32)
        print(f"vocoder params:         {count(voc):>12,}")
    return n_bad


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path")
    ap.add_argument("--audit", choices=["tts", "tokenizer"], default=None)
    args = ap.parse_args()

    total = 0
    n = 0
    for name, shape, dtype in iter_tensors(args.path):
        print(f"{name:<70} {str(tuple(shape)):<24} {dtype}")
        total += int(np.prod(shape)) if shape else 1
        n += 1
    print(f"\n{n} tensors, {total:,} parameters")
    if args.audit:
        return audit(args.path, args.audit)
    return 0


if __name__ == "__main__":
    sys.exit(main())
