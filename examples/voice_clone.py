#!/usr/bin/env python
"""Voice-cloning example: synthesize text in the voice of a reference WAV
(counterpart of the reference's examples/readme_example_clone.wav flow).

    python examples/voice_clone.py --model models/ \
        --reference my_voice.wav --text "Hello in my voice!"
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qwen3tts_tpu.config import SamplingConfig
from qwen3tts_tpu.pipeline import Qwen3TTS, save_wav

ap = argparse.ArgumentParser()
ap.add_argument("--model", required=True)
ap.add_argument("--reference", required=True, help="reference WAV (any sample rate)")
ap.add_argument("--text", default="Hello in my voice!")
ap.add_argument("--output", default="cloned.wav")
args = ap.parse_args()

tts = Qwen3TTS.from_pretrained(args.model)
result = tts.synthesize_with_voice(
    args.text, args.reference,
    SamplingConfig(temperature=0.9, top_k=50, repetition_penalty=1.05))
assert result.success, result.error_msg
save_wav(args.output, result.audio, result.sample_rate)
print(f"wrote {args.output}: {result.audio_seconds:.2f}s")
