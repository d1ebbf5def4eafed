"""End-to-end pipeline + tokenizer + WAV + CLI smoke tests (tiny config)."""

import dataclasses
import os

import numpy as np
import pytest

from qwen3tts_tpu.config import tiny_pipeline_config, SamplingConfig
from qwen3tts_tpu.pipeline import Qwen3TTS
from qwen3tts_tpu.audio.wav import load_wav, save_wav, resample_linear
from qwen3tts_tpu.text.bpe import TextTokenizer, synthetic_tokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def tts():
    t = Qwen3TTS(tiny_pipeline_config())
    assert t.load_models(synthetic=True, seed=3)
    return t


def test_tokenizer_template_structure():
    tok = synthetic_tokenizer()
    ids = tok.encode_for_tts("Hello.")
    # <|im_start|> assistant \n ... <|im_end|> \n <|im_start|> assistant \n
    assert ids[0] == tok.bos_token_id
    assert ids[1] == tok.assistant_token_id
    assert ids[2] == tok.newline_token_id
    assert ids[-5:] == [tok.eos_token_id, tok.newline_token_id,
                        tok.bos_token_id, tok.assistant_token_id, tok.newline_token_id]
    # synthetic merges build "Hello" as a single merged token + "."
    body = ids[3:-5]
    assert len(body) == 2
    assert tok.decode(body) == "Hello."


def test_tokenizer_exact_reference_ids_with_real_vocab_slots():
    """Reconstructs the minimal real-vocab slice needed for the canonical
    expectation of tests/test_tokenizer.cpp:13-15: 'Hello.' ->
    [151644, 77091, 198, 9707, 13, 151645, 198, 151644, 77091, 198]."""
    uni = bytes_to_unicode()
    vocab = {uni[b]: b + 1000 for b in range(256)}  # bytes parked away from target ids
    vocab[uni[ord(".")]] = 13
    merges = [("H", "e"), ("l", "l"), ("He", "ll"), ("Hell", "o")]
    vocab["He"] = 2000
    vocab["ll"] = 2001
    vocab["Hell"] = 2002
    vocab["Hello"] = 9707
    vocab["<|im_start|>"] = 151644
    vocab["<|im_end|>"] = 151645
    vocab["assistant"] = 77091
    vocab[uni[ord("\n")]] = 198
    tok = TextTokenizer(vocab, merges)
    assert tok.encode_for_tts("Hello.") == [151644, 77091, 198, 9707, 13, 151645, 198,
                                            151644, 77091, 198]
    assert tok.decode([9707, 13]) == "Hello."


def test_wav_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "t.wav")
    audio = np.sin(np.linspace(0, 100, 2400)).astype(np.float32) * 0.5
    save_wav(path, audio, 24000)
    loaded, sr = load_wav(path)
    assert sr == 24000
    np.testing.assert_allclose(loaded, audio, atol=1e-4)


def test_resample_halves_length():
    x = np.sin(np.linspace(0, 50, 4800)).astype(np.float32)
    y = resample_linear(x, 48000, 24000)
    assert abs(len(y) - 2400) <= 1
    z = resample_linear(x, 24000, 24000)
    assert z is not x or len(z) == len(x)


def test_synthesize_end_to_end(tts):
    params = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=8)
    result = tts.synthesize("Hello.", params)
    assert result.success, result.error_msg
    assert result.n_frames > 0
    assert len(result.audio) == result.n_frames * 1920
    assert result.sample_rate == 24000
    assert np.abs(result.audio).max() <= 1.0
    assert result.timings.t_generate_ms > 0 and result.timings.t_decode_ms > 0


def test_synthesize_with_voice_end_to_end(tts):
    params = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=8)
    rng = np.random.default_rng(0)
    ref = (rng.normal(size=600) * 0.1).astype(np.float32)
    result = tts.synthesize_with_voice("Hello.", ref, params)
    assert result.success, result.error_msg
    assert result.n_frames > 0
    # the speaker embedding must actually change the output vs default voice
    base = tts.synthesize("Hello.", params)
    assert (result.n_frames != base.n_frames
            or not np.array_equal(result.codes, base.codes))


def test_progress_callback_fires(tts):
    seen = []
    tts.set_progress_callback(lambda f, total: seen.append((f, total)))
    try:
        result = tts.synthesize("Hi.", SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=8))
    finally:
        tts.set_progress_callback(None)
    assert result.success
    assert len(seen) >= result.n_frames


def test_streaming_vocoder_matches_full(tts):
    params = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=16)
    result = tts.synthesize("Hello there.", params)
    assert result.success and result.n_frames >= 4
    full = tts.decode_codes(result.codes)
    # With history covering the whole past, chunked decode must equal the
    # full decode (validates seam indexing exactly). Truncated history is a
    # quality/latency trade-off that only makes sense with real weights —
    # random weights give the causal attention no locality to exploit.
    chunks = list(tts.stream_decode_chunks(result.codes, chunk=4,
                                           history=result.n_frames))
    streamed = np.concatenate(chunks)
    assert streamed.shape == full.shape
    err = np.abs(streamed - full).max()
    assert err < 1e-3, f"streaming seam error {err}"
    # truncated history still produces the right shape
    short = np.concatenate(list(tts.stream_decode_chunks(result.codes, chunk=4, history=4)))
    assert short.shape == full.shape


def test_cli_synthetic(tmp_path):
    from qwen3tts_tpu import cli
    out = os.path.join(tmp_path, "cli.wav")
    # tiny config isn't wired through the CLI; use the real-config CLI on the
    # smallest buckets but cap frames to keep CPU time sane -> skip on CPU.
    # Here we only check the parser surface.
    p = cli.build_parser()
    args = p.parse_args(["-t", "hi", "-o", out, "--temperature", "0", "--top-k", "3",
                         "--max-tokens", "4", "--synthetic", "-l", "en"])
    assert args.synthetic and args.temperature == 0.0 and args.top_k == 3


def test_synthesize_batch(tts):
    from qwen3tts_tpu.config import SamplingConfig
    params = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=6)
    results = tts.synthesize_batch(["Hello.", "Hi there."], params)
    assert all(r.success for r in results), [r.error_msg for r in results]
    single = tts.synthesize("Hello.", params)
    np.testing.assert_array_equal(results[0].codes, single.codes)
    # the batched (vmapped single-dispatch) vocode must match the
    # single-utterance vocode on the same codes and bucket
    assert len(results[0].audio) == results[0].n_frames * 1920
    np.testing.assert_allclose(results[0].audio, single.audio,
                               rtol=2e-3, atol=2e-3)


def test_synthesize_queue_continuous(tts):
    """Continuous-batching queue API: greedy results must equal per-text
    synthesize() exactly (keys are irrelevant under greedy), including the
    vocoded audio, with more requests than lanes forcing mid-flight
    refills."""
    from qwen3tts_tpu.config import SamplingConfig
    params = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=6)
    texts = ["Hello.", "Hi there.", "Good day.", "Yo."]
    results = tts.synthesize_queue(texts, params, lanes=2, chunk_frames=2,
                                   refill_slots=2)
    assert all(r.success for r in results), [r.error_msg for r in results]
    for t, r in zip(texts, results):
        single = tts.synthesize(t, params)
        np.testing.assert_array_equal(r.codes, single.codes)
        assert len(r.audio) == r.n_frames * 1920
        np.testing.assert_allclose(r.audio, single.audio,
                                   rtol=2e-3, atol=2e-3)


def test_synthesize_queue_per_request_budgets(tts):
    """max_audio_tokens_per_request gives each request its own frame
    budget (the serving front-end length-limit knob); each result's codes
    must equal a fresh synthesize() run at that budget."""
    from qwen3tts_tpu.config import SamplingConfig
    params = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=8)
    texts = ["Hello.", "Hi there.", "Good day."]
    budgets = [3, 6, 4]
    results = tts.synthesize_queue(texts, params, lanes=2, chunk_frames=2,
                                   refill_slots=2,
                                   max_audio_tokens_per_request=budgets)
    assert all(r.success for r in results), [r.error_msg for r in results]
    for t, b, r in zip(texts, budgets, results):
        assert r.n_frames == b
        single = tts.synthesize(t, dataclasses.replace(
            params, max_audio_tokens=b))
        np.testing.assert_array_equal(r.codes, single.codes)


def test_synthesize_queue_streaming_audio(tts):
    """Streaming continuous serving: on_audio receives per-request audio
    chunks as generation progresses; with history covering the whole past
    the concatenated stream equals the full decode (seam exactness, as in
    stream_decode_chunks)."""
    from qwen3tts_tpu.config import SamplingConfig
    params = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=6)
    texts = ["Hello.", "Hi there.", "Good day."]
    got = {}
    calls = {}

    def on_audio(idx, chunk, finished):
        got.setdefault(idx, []).append(np.asarray(chunk))
        calls[idx] = calls.get(idx, 0) + 1
        if finished:
            calls[(idx, "fin")] = calls.get((idx, "fin"), 0) + 1

    results = tts.synthesize_queue(
        texts, params, lanes=2, chunk_frames=2, refill_slots=2,
        on_audio=on_audio, stream_history=64, stream_cadence=0)
    assert all(r.success for r in results)
    for i, r in enumerate(results):
        streamed = np.concatenate(got[i])[: r.n_frames * 1920]
        assert calls[i] >= 3, "expected one call per 2-frame chunk"
        assert calls[(i, "fin")] == 1
        np.testing.assert_array_equal(streamed, r.audio)
        full = tts.decode_codes(r.codes)
        np.testing.assert_allclose(streamed, full, rtol=2e-3, atol=2e-3)


def test_synthesize_queue_streaming_cadence(tts):
    """Staggered-cadence streaming (r4 default): first decoded chunk emits
    immediately (TTFA), then fixed cadence-frame segments, remainder at
    finish; concatenation still equals the full decode when history covers
    the whole past. Odd cadence/chunk alignment exercises the segment
    cap/remainder logic."""
    import dataclasses
    from qwen3tts_tpu.config import SamplingConfig
    params = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=9)
    texts = ["Hello.", "Hi there.", "Good day."]
    got, sizes, fins = {}, {}, {}

    def on_audio(idx, chunk, finished):
        got.setdefault(idx, []).append(np.asarray(chunk))
        sizes.setdefault(idx, []).append(len(chunk) // 1920)
        if finished:
            fins[idx] = fins.get(idx, 0) + 1

    results = tts.synthesize_queue(
        texts, params, lanes=2, chunk_frames=2, refill_slots=2,
        on_audio=on_audio, stream_history=64, stream_cadence=3)
    assert all(r.success for r in results)
    for i, r in enumerate(results):
        streamed = np.concatenate(got[i])[: r.n_frames * 1920]
        assert fins[i] == 1
        # first emission is the first decode chunk (<= chunk_frames);
        # steady segments are exactly `cadence` frames except the finish
        # remainder
        assert sizes[i][0] <= 2
        assert all(s == 3 for s in sizes[i][1:-1])
        assert sum(sizes[i]) == r.n_frames
        np.testing.assert_array_equal(streamed, r.audio)
        full = tts.decode_codes(r.codes)
        np.testing.assert_allclose(streamed, full, rtol=2e-3, atol=2e-3)
    # budget-capped request parity under cadence: same codes as a fresh run
    single = tts.synthesize(texts[0], dataclasses.replace(params))
    np.testing.assert_array_equal(results[0].codes, single.codes)


def test_config_from_model_dir_defaults():
    from qwen3tts_tpu.io.config_io import config_from_model_dir
    cfg = config_from_model_dir(None)
    assert cfg.talker.n_layers == 28 and cfg.vocoder.samples_per_frame == 1920


def test_config_from_model_dir_reads_json(tmp_path):
    import json, os
    from qwen3tts_tpu.io.config_io import config_from_model_dir
    sub = tmp_path / "Qwen3-TTS-12Hz-0.6B-Base"
    sub.mkdir()
    (sub / "config.json").write_text(json.dumps({
        "talker_config": {"num_hidden_layers": 4, "hidden_size": 64,
                          "code_predictor_config": {"num_hidden_layers": 2}},
        "speaker_encoder_config": {"enc_dim": 256},
    }))
    tok = tmp_path / "Qwen3-TTS-Tokenizer-12Hz"
    tok.mkdir()
    (tok / "config.json").write_text(json.dumps({
        "decoder_config": {"upsample_rates": [8, 5, 4, 3], "latent_dim": 512},
    }))
    cfg = config_from_model_dir(str(tmp_path))
    assert cfg.talker.n_layers == 4 and cfg.talker.hidden_size == 64
    assert cfg.code_predictor.n_layers == 2 and cfg.code_predictor.hidden_size == 64
    assert cfg.speaker_encoder.embedding_dim == 256
    assert cfg.vocoder.latent_dim == 512


def test_streaming_synthesis_matches_full(tts):
    """Chunked streaming generation must reproduce the non-streaming greedy
    output exactly when the vocoder history spans the whole past."""
    params = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=12, seed=0)
    full = tts.synthesize("Hello there friend.", params)
    assert full.success and full.n_frames > 2

    chunks = list(tts.synthesize_streaming(
        "Hello there friend.", params, chunk_frames=4, history=32))
    streamed = np.concatenate(chunks)
    assert len(streamed) == full.n_frames * 1920
    np.testing.assert_allclose(streamed, full.audio, rtol=1e-3, atol=2e-3)


def test_wav_float32_and_stereo(tmp_path):
    """Reference WAV reader handles PCM16/PCM32/float32 and downmixes
    multi-channel (qwen3_tts.cpp:449-588); ours must too."""
    import struct
    path = os.path.join(tmp_path, "f32stereo.wav")
    sr = 24000
    n = 1000
    left = np.sin(np.linspace(0, 20, n)).astype(np.float32)
    right = np.cos(np.linspace(0, 20, n)).astype(np.float32)
    inter = np.empty(2 * n, np.float32)
    inter[0::2] = left
    inter[1::2] = right
    data = inter.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, sr, sr * 8, 8, 32))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    samples, got_sr = load_wav(path)
    assert got_sr == sr and len(samples) == n
    np.testing.assert_allclose(samples, (left + right) / 2, atol=1e-6)


def test_error_paths():
    t = Qwen3TTS(tiny_pipeline_config())
    r = t.synthesize("hi")
    assert not r.success and "not loaded" in r.error_msg.lower()
    rs = t.synthesize_batch(["hi"])
    assert not rs[0].success
    assert not t.load_models("/nonexistent/path")
    assert t.error_msg


def test_tokenizer_qwen2_regex_mode():
    from qwen3tts_tpu.text.bpe import synthetic_tokenizer, TextTokenizer
    base = synthetic_tokenizer()
    tok = TextTokenizer(base.vocab, list(base.bpe_ranks.keys()), pretokenize="qwen2")
    ids = tok.encode("Hello, the world 123!")
    assert ids, "regex mode must produce tokens"
    assert tok.decode(ids) == "Hello, the world 123!"


def test_low_mem_lifecycle(monkeypatch):
    t = Qwen3TTS(tiny_pipeline_config())
    t.low_mem = True
    assert t.load_models(synthetic=True, seed=3)
    assert t.vocoder_params is None  # deferred in low-mem mode
    r = t.synthesize("Hi.", SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=4))
    assert r.success, r.error_msg
    # both big param sets dropped after synthesis
    assert t.talker_params is None and t.vocoder_params is None
    # and the next call transparently reloads
    r2 = t.synthesize("Hi.", SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=4))
    assert r2.success and np.array_equal(r.codes, r2.codes)


def test_overlong_text_truncates_not_crashes(tts):
    long_text = "hello " * 200
    r = tts.synthesize(long_text, SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=4))
    assert r.success, r.error_msg


def test_single_token_text_works(tts):
    r = tts.synthesize("a", SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=4))
    assert r.success, r.error_msg
    r2 = tts.synthesize("", SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=4))
    assert not r2.success


def test_tokenizer_utf8_roundtrip():
    from qwen3tts_tpu.text.bpe import synthetic_tokenizer
    tok = synthetic_tokenizer()
    for text in ("héllo wörld", "日本語テキスト", "emoji 🙂 test"):
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_fused_dispatch_matches_split():
    """RuntimeConfig.fused_dispatch=True (one jitted program for generation +
    vocoder, runtime/e2e.py) produces the same audio as the split path for a
    greedy run with the same seed."""
    import dataclasses

    import numpy as np

    from qwen3tts_tpu.config import SamplingConfig, tiny_pipeline_config
    from qwen3tts_tpu.pipeline import Qwen3TTS

    cfg = tiny_pipeline_config()
    sp = SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=6, seed=5)

    tts = Qwen3TTS(cfg)
    assert tts.load_models(synthetic=True, seed=11)
    split = tts.synthesize("Hello there.", sp)
    assert split.success, split.error_msg

    cfg2 = dataclasses.replace(
        cfg, runtime=dataclasses.replace(cfg.runtime, fused_dispatch=True))
    tts2 = Qwen3TTS(cfg2)
    assert tts2.load_models(synthetic=True, seed=11)
    fused = tts2.synthesize("Hello there.", sp)
    assert fused.success, fused.error_msg

    assert fused.n_frames == split.n_frames
    np.testing.assert_array_equal(fused.codes, split.codes)
    assert len(fused.audio) == len(split.audio)
    np.testing.assert_allclose(fused.audio, split.audio, rtol=2e-4, atol=2e-4)
