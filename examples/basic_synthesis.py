#!/usr/bin/env python
"""Minimal text-to-speech example (counterpart of the reference's README
basic-usage snippet).

    python examples/basic_synthesis.py --model models/ --text "Hello, world!"
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qwen3tts_tpu.config import SamplingConfig
from qwen3tts_tpu.pipeline import Qwen3TTS, save_wav

ap = argparse.ArgumentParser()
ap.add_argument("--model", default=None, help="model dir (omit for synthetic weights)")
ap.add_argument("--text", default="Hello, world!")
ap.add_argument("--output", default="hello.wav")
args = ap.parse_args()

if args.model:
    tts = Qwen3TTS.from_pretrained(args.model)
else:
    tts = Qwen3TTS()
    assert tts.load_models(synthetic=True)

result = tts.synthesize(args.text, SamplingConfig(temperature=0.9, top_k=50))
assert result.success, result.error_msg
save_wav(args.output, result.audio, result.sample_rate)
print(f"wrote {args.output}: {result.audio_seconds:.2f}s "
      f"({result.n_frames} frames)")
result.timings.report(result.audio_seconds)
