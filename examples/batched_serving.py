#!/usr/bin/env python
"""Batched multi-utterance synthesis (the production throughput mode:
weight reads amortize across the batch; shard over a "dp" mesh axis for
multi-chip serving)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qwen3tts_tpu.config import SamplingConfig
from qwen3tts_tpu.pipeline import Qwen3TTS, save_wav

ap = argparse.ArgumentParser()
ap.add_argument("--model", default=None)
ap.add_argument("texts", nargs="*", default=["Hello.", "How are you today?"])
args = ap.parse_args()

if args.model:
    tts = Qwen3TTS.from_pretrained(args.model)
else:
    tts = Qwen3TTS()
    assert tts.load_models(synthetic=True)

results = tts.synthesize_batch(args.texts, SamplingConfig(temperature=0.9, top_k=50))
for i, r in enumerate(results):
    assert r.success, r.error_msg
    save_wav(f"batch_{i}.wav", r.audio, r.sample_rate)
    print(f"batch_{i}.wav: {r.audio_seconds:.2f}s")
