"""Load model weights from reference-format GGUF files.

Presents a GGUF model directory (qwen3-tts-0.6b-*.gguf +
qwen3-tts-tokenizer-*.gguf, the reference's on-disk convention,
src/qwen3_tts.cpp:118-119) through the same ``.tensor(hf_name)`` interface as
``SafetensorsDir`` so io/loader.py works unchanged on either format. Uses the
native C++ parser when built, the pure-Python reader otherwise.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from . import tensor_names
from .gguf import GGUFReader


def _open_reader(path: str):
    try:
        from .native import NativeGGUF
        return NativeGGUF(path)
    except Exception:
        return GGUFReader(path)


class GGUFCheckpoint:
    """HF-named tensor access over one or more GGUF files."""

    def __init__(self, *paths: str):
        self._readers = [_open_reader(p) for p in paths]
        self._by_ggml = {}
        for r in self._readers:
            for name in r.keys():
                self._by_ggml[name] = r

    def __contains__(self, hf_name: str) -> bool:
        g = tensor_names.hf_to_ggml(hf_name)
        if g is None:
            return self._is_synthesized(hf_name)
        return g in self._by_ggml

    def _is_synthesized(self, hf_name: str) -> bool:
        # cluster_usage was folded into the codebook at conversion time; the
        # loader divides by it again, so synthesize ones.
        return hf_name.endswith("_codebook.cluster_usage")

    def tensor(self, hf_name: str) -> np.ndarray:
        if self._is_synthesized(hf_name):
            emb_name = hf_name.replace("cluster_usage", "embedding_sum")
            g = tensor_names.hf_to_ggml(emb_name)
            cb = self._by_ggml[g].tensor(g)
            return np.ones((cb.shape[0],), np.float32)
        g = tensor_names.hf_to_ggml(hf_name)
        if g is None or g not in self._by_ggml:
            raise KeyError(f"{hf_name} (ggml: {g}) not present in GGUF checkpoint")
        arr = self._by_ggml[g].tensor(g)
        return np.asarray(arr, np.float32) if arr.dtype == np.float16 else arr


def find_gguf_models(model_dir: str) -> tuple[Optional[str], Optional[str]]:
    """Locate (tts_model.gguf, tokenizer.gguf) in a directory, preferring the
    reference's default filenames."""
    tts = tok = None
    for p in sorted(glob.glob(os.path.join(model_dir, "*.gguf"))):
        base = os.path.basename(p).lower()
        if "tokenizer" in base:
            tok = tok or p
        else:
            tts = tts or p
    return tts, tok
