"""IO stack tests: safetensors, HF loader, GGUF roundtrip, native parity,
HF->GGUF converter and GGUF-checkpoint loading."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import tiny_pipeline_config
from qwen3tts_tpu.io import loader as loader_mod
from qwen3tts_tpu.io import tensor_names
from qwen3tts_tpu.io.gguf import (
    GGML_F16, GGML_F32, GGML_Q8_0, GGUFReader, GGUFWriter,
    dequantize_q8_0, quantize_q8_0, T_STR, T_U32,
)
from qwen3tts_tpu.io.gguf_checkpoint import GGUFCheckpoint
from qwen3tts_tpu.io.safetensors_io import SafetensorsDir, write_safetensors
from qwen3tts_tpu.models import talker as T
from qwen3tts_tpu.models import vocoder as V

import hf_fixture

CFG = tiny_pipeline_config()


@pytest.fixture(scope="module")
def hf_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    tts_dir = root / "Qwen3-TTS-12Hz-tiny-Base"
    tok_dir = root / "Qwen3-TTS-Tokenizer-tiny"
    tts_dir.mkdir()
    tok_dir.mkdir()
    write_safetensors(str(tts_dir / "model.safetensors"), hf_fixture.make_tts_checkpoint(CFG))
    write_safetensors(str(tok_dir / "model.safetensors"), hf_fixture.make_tokenizer_checkpoint(CFG))
    return str(tts_dir), str(tok_dir)


def test_safetensors_roundtrip(tmp_path):
    data = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": np.arange(5, dtype=np.int64)}
    path = os.path.join(tmp_path, "x.safetensors")
    write_safetensors(path, data)
    st = SafetensorsDir(str(tmp_path))
    np.testing.assert_array_equal(st.tensor("a"), data["a"])
    np.testing.assert_array_equal(st.tensor("b"), data["b"])


def test_hf_loader_shapes_and_transposes(hf_dirs):
    tts_dir, tok_dir = hf_dirs
    st = loader_mod.open_checkpoint_dir(tts_dir)
    params = loader_mod.load_talker(st, CFG.talker, jnp.float32)
    ref = T.init_talker_params(jax.random.PRNGKey(0), CFG.talker, jnp.float32)
    for got, want in zip(jax.tree.leaves(params), jax.tree.leaves(ref)):
        assert got.shape == want.shape, f"{got.shape} != {want.shape}"
    # transposition: fused wqkv's q slab == HF q_proj [out, in].T
    hf = hf_fixture.make_tts_checkpoint(CFG)
    nq = CFG.talker.n_heads * CFG.talker.head_dim
    np.testing.assert_allclose(
        np.asarray(params.blocks.wqkv[1][:, :nq]),
        hf["talker.model.layers.1.self_attn.q_proj.weight"].T, rtol=1e-6)

    vparams = loader_mod.load_vocoder(loader_mod.open_checkpoint_dir(tok_dir), CFG.vocoder, jnp.float32)
    vref = V.init_vocoder_params(jax.random.PRNGKey(0), CFG.vocoder, jnp.float32)
    for got, want in zip(jax.tree.leaves(vparams), jax.tree.leaves(vref)):
        assert got.shape == want.shape

    sparams = loader_mod.load_speaker_encoder(st, CFG.speaker_encoder, jnp.float32)
    cparams = loader_mod.load_code_predictor(st, CFG.code_predictor, jnp.float32)
    assert cparams.embds.shape == (15, CFG.code_predictor.vocab_size, CFG.code_predictor.hidden_size)
    assert sparams.conv0_w.shape == (5, CFG.speaker_encoder.n_mels, CFG.speaker_encoder.hidden_dim)


def test_q8_0_quant_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    buf = quantize_q8_0(x)
    y = dequantize_q8_0(buf, x.shape)
    err = np.abs(x - y).max() / np.abs(x).max()
    assert err < 0.01  # 8-bit blockwise quantization


def test_gguf_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    w = GGUFWriter("test-arch")
    w.add_meta("test.n", T_U32, 42)
    w.add_meta("test.s", T_STR, "hello")
    a = rng.normal(size=(6, 32)).astype(np.float32)
    b = rng.normal(size=(4, 64)).astype(np.float32)
    c = rng.normal(size=(33,)).astype(np.float32)
    w.add_tensor("a", a, ttype=GGML_F32)
    w.add_tensor("b", b, ttype=GGML_Q8_0)
    w.add_tensor("c.f16", c, ttype=GGML_F16)
    path = os.path.join(tmp_path, "t.gguf")
    w.write(path)

    r = GGUFReader(path)
    assert r.metadata["test.n"] == 42
    assert r.metadata["test.s"] == "hello"
    assert r.metadata["general.architecture"] == "test-arch"
    np.testing.assert_array_equal(r.tensor("a"), a)
    np.testing.assert_allclose(np.asarray(r.tensor("c.f16"), np.float32), c, atol=1e-3)
    np.testing.assert_allclose(r.tensor("b"), b, atol=np.abs(b).max() * 0.01)

    # native C++ reader parity (skipped if toolchain unavailable)
    try:
        from qwen3tts_tpu.io.native import NativeGGUF
        nr = NativeGGUF(path)
    except OSError:
        pytest.skip("native library unavailable")
    assert set(nr.keys()) == {"a", "b", "c.f16"}
    np.testing.assert_array_equal(nr.tensor("a"), a)
    np.testing.assert_allclose(nr.tensor("b"), r.tensor("b"), rtol=1e-6)
    q, d = nr.tensor_q8("b")
    assert q.shape == b.shape and d.shape == (4, 2)


def test_tensor_name_mapping_covers_checkpoints():
    unmapped = [n for n in hf_fixture.make_tts_checkpoint(CFG)
                if tensor_names.hf_to_ggml(n) is None]
    assert unmapped == []
    tok = hf_fixture.make_tokenizer_checkpoint(CFG)
    unmapped = [n for n in tok
                if tensor_names.hf_to_ggml(n) is None and "cluster_usage" not in n]
    assert unmapped == []


def test_convert_and_load_gguf_checkpoint(hf_dirs, tmp_path):
    tts_dir, tok_dir = hf_dirs
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import convert_hf_to_gguf as conv

    tts_gguf = os.path.join(tmp_path, "qwen3-tts-tiny-f16.gguf")
    tok_gguf = os.path.join(tmp_path, "qwen3-tts-tokenizer-tiny-f16.gguf")
    conv.convert(tts_dir, tts_gguf, "f16", "tts")
    conv.convert(tok_dir, tok_gguf, "f16", "tokenizer")

    st = loader_mod.open_checkpoint_dir(tts_dir)
    want_t = loader_mod.load_talker(st, CFG.talker, jnp.float32)
    want_v = loader_mod.load_vocoder(loader_mod.open_checkpoint_dir(tok_dir), CFG.vocoder, jnp.float32)

    ck = GGUFCheckpoint(tts_gguf)
    got_t = loader_mod.load_talker(ck, CFG.talker, jnp.float32)
    for g, w_ in zip(jax.tree.leaves(got_t), jax.tree.leaves(want_t)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=2e-3, rtol=2e-3)

    vk = GGUFCheckpoint(tok_gguf)
    got_v = loader_mod.load_vocoder(vk, CFG.vocoder, jnp.float32)
    for g, w_ in zip(jax.tree.leaves(got_v), jax.tree.leaves(want_v)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=2e-3, rtol=2e-2)

    # q8_0 conversion also loads and stays close on quantized mats
    tts_q8 = os.path.join(tmp_path, "qwen3-tts-tiny-q8_0.gguf")
    conv.convert(tts_dir, tts_q8, "q8_0", "tts")
    got_q = loader_mod.load_talker(GGUFCheckpoint(tts_q8), CFG.talker, jnp.float32)
    scale = float(np.abs(np.asarray(want_t.blocks.wqkv)).max())
    assert np.abs(np.asarray(got_q.blocks.wqkv) - np.asarray(want_t.blocks.wqkv)).max() < 0.02 * scale + 1e-3


def test_pipeline_loads_gguf_model_dir(hf_dirs, tmp_path):
    """Reference on-disk convention: model dir with two .gguf files."""
    import json
    tts_dir, tok_dir = hf_dirs
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import convert_hf_to_gguf as conv

    # give the tts checkpoint a minimal real vocab so the tokenizer embeds
    from qwen3tts_tpu.text.bpe import bytes_to_unicode
    uni = bytes_to_unicode()
    vocab = {uni[b]: b for b in range(256)}
    for i, sp in enumerate(("<|im_start|>", "<|im_end|>", "assistant")):
        vocab[sp] = 256 + i
    with open(os.path.join(tts_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tts_dir, "merges.txt"), "w") as f:
        f.write("H e\n")

    model_dir = os.path.join(tmp_path, "models")
    os.makedirs(model_dir)
    conv.convert(tts_dir, os.path.join(model_dir, "qwen3-tts-tiny-f16.gguf"), "f16", "tts")
    conv.convert(tok_dir, os.path.join(model_dir, "qwen3-tts-tokenizer-tiny-f16.gguf"),
                 "f16", "tokenizer")

    from qwen3tts_tpu.pipeline import Qwen3TTS
    from qwen3tts_tpu.config import tiny_pipeline_config, SamplingConfig
    tts = Qwen3TTS(tiny_pipeline_config())
    assert tts.load_models(model_dir), tts.error_msg
    assert tts.tokenizer.vocab.get("<|im_start|>") == 256  # embedded vocab loaded
    result = tts.synthesize("Hi", SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=4))
    assert result.success, result.error_msg
    assert len(result.audio) == result.n_frames * 1920


def test_from_pretrained_with_config_json(hf_dirs):
    """from_pretrained reads hyperparameters from config.json and loads the
    checkpoint end-to-end."""
    import json
    tts_dir, tok_dir = hf_dirs
    t = CFG.talker
    with open(os.path.join(tts_dir, "config.json"), "w") as f:
        json.dump({
            "talker_config": {
                "text_vocab_size": t.text_vocab_size,
                "text_hidden_size": t.text_embd_dim,
                "hidden_size": t.hidden_size,
                "num_hidden_layers": t.n_layers,
                "num_attention_heads": t.n_heads,
                "num_key_value_heads": t.n_kv_heads,
                "head_dim": t.head_dim,
                "intermediate_size": t.intermediate_size,
                "vocab_size": t.codec_vocab_size,
                "tts_bos_token_id": t.tts_bos_token_id,
                "tts_eos_token_id": t.tts_eos_token_id,
                "tts_pad_token_id": t.tts_pad_token_id,
                "code_predictor_config": {
                    "num_hidden_layers": CFG.code_predictor.n_layers,
                    "num_attention_heads": CFG.code_predictor.n_heads,
                    "num_key_value_heads": CFG.code_predictor.n_kv_heads,
                    "head_dim": CFG.code_predictor.head_dim,
                    "intermediate_size": CFG.code_predictor.intermediate_size,
                },
            },
            "speaker_encoder_config": {"enc_dim": CFG.speaker_encoder.embedding_dim},
        }, f)
    v = CFG.vocoder
    with open(os.path.join(tok_dir, "config.json"), "w") as f:
        json.dump({"decoder_config": {
            "num_quantizers": v.n_codebooks, "codebook_size": v.codebook_size,
            "latent_dim": v.latent_dim, "hidden_size": v.hidden_dim,
            "num_hidden_layers": v.n_pre_tfm_layers,
            "num_attention_heads": v.n_heads,
            "upsample_rates": list(v.upsample_rates),
        }}, f)
    # hf_dirs' parent is the model dir containing both checkpoints
    model_dir = os.path.dirname(tts_dir)
    # vocab.json written by the earlier gguf test may or may not exist; make one
    from qwen3tts_tpu.text.bpe import bytes_to_unicode
    uni = bytes_to_unicode()
    vocab = {uni[b]: b for b in range(256)}
    for i, sp in enumerate(("<|im_start|>", "<|im_end|>", "assistant")):
        vocab[sp] = 256 + i
    with open(os.path.join(tts_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)

    from qwen3tts_tpu.pipeline import Qwen3TTS
    from qwen3tts_tpu.config import SamplingConfig, RuntimeConfig
    import dataclasses
    # note: the fixture's vocoder dims don't match the 0.6B defaults, so the
    # config.json parsing is what makes this load at all
    tts = Qwen3TTS.from_pretrained(model_dir, runtime=dataclasses.replace(
        RuntimeConfig(dtype="float32"),
        prefill_buckets=(16, 32), frame_buckets=(8,), vocoder_buckets=(8, 16)))
    assert tts.config.talker.n_layers == CFG.talker.n_layers
    r = tts.synthesize("Hi", SamplingConfig(temperature=0.0, top_k=0, max_audio_tokens=4))
    assert r.success, r.error_msg


# ---------------------------------------------------------------------------
# Q4_K (k-quant) format
# ---------------------------------------------------------------------------

def test_q4k_roundtrip_error_bound():
    from qwen3tts_tpu.io.gguf import dequantize_q4_k, quantize_q4_k

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 512)).astype(np.float32)
    buf = quantize_q4_k(x)
    assert len(buf) == 8 * 2 * 144          # 144 bytes / 256 values
    y = dequantize_q4_k(buf, x.shape)
    # 4-bit affine per 32 with 6-bit two-level scales: worst-case step is
    # range/15 with 6-bit scale rounding on top
    err = np.abs(y - x)
    step = (x.reshape(-1, 32).max(1) - x.reshape(-1, 32).min(1)) / 15.0
    assert err.max() < 1.8 * step.max(), (err.max(), step.max())
    assert np.abs(y - x).mean() < 0.12


def test_q4k_scale_packing_exact():
    """The 6-bit (scale, min) packing must match ggml's get_scale_min_k4."""
    from qwen3tts_tpu.io.gguf import _pack_scales_q4k, _unpack_scales_q4k

    rng = np.random.default_rng(1)
    ls = rng.integers(0, 64, size=(5, 8)).astype(np.uint8)
    lm = rng.integers(0, 64, size=(5, 8)).astype(np.uint8)
    packed = _pack_scales_q4k(ls, lm)
    ls2, lm2 = _unpack_scales_q4k(packed)
    np.testing.assert_array_equal(ls, ls2)
    np.testing.assert_array_equal(lm, lm2)


def test_q4k_gguf_roundtrip(tmp_path):
    from qwen3tts_tpu.io.gguf import GGML_Q4_K, GGUFReader, GGUFWriter, T_U32

    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 256)).astype(np.float32)
    w = GGUFWriter()
    w.add_meta("qwen3-tts.test", T_U32, 7)
    w.add_tensor("blk.0.w", x, ttype=GGML_Q4_K)
    path = str(tmp_path / "q4k.gguf")
    w.write(path)

    r = GGUFReader(path)
    assert r.tensor_type("blk.0.w") == GGML_Q4_K
    y = r.tensor("blk.0.w")
    assert y.shape == x.shape
    assert np.abs(y - x).mean() < 0.12
    assert r.tensor_q8("blk.0.w") is None   # int8 fast path correctly refuses


def test_q4k_native_matches_python(tmp_path):
    """The C++ fast-path dequant must bit-match the Python reference."""
    pytest.importorskip("ctypes")
    from qwen3tts_tpu.io.gguf import GGML_Q4_K, GGUFReader, GGUFWriter, T_U32
    from qwen3tts_tpu.io.native import NativeGGUF, get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    x = rng.normal(size=(4, 512)).astype(np.float32)
    w = GGUFWriter()
    w.add_meta("t", T_U32, 1)
    w.add_tensor("a", x, ttype=GGML_Q4_K)
    path = str(tmp_path / "q4k_native.gguf")
    w.write(path)
    py = GGUFReader(path).tensor("a").astype(np.float32)
    nat = NativeGGUF(path).tensor("a")
    np.testing.assert_array_equal(py, nat)


def test_is_ffn_projection_predicate():
    assert tensor_names.is_ffn_projection("talker.blk.3.ffn_gate.weight")
    assert tensor_names.is_ffn_projection("code_pred.blk.0.ffn_down.weight")
    assert not tensor_names.is_ffn_projection("talker.blk.3.attn_q.weight")
    assert not tensor_names.is_ffn_projection("talker.blk.3.ffn_norm.weight")


def test_q4k_mixed_converter_policy(hf_dirs, tmp_path):
    """--type q4_k_mixed: FFN projections Q4_K (when 256-aligned), attention
    projections Q8_0, everything else F16/F32 — the storage analog of the
    runtime quant="q4" mixed tier."""
    import dataclasses

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import convert_hf_to_gguf as conv
    from qwen3tts_tpu.io.gguf import GGML_Q4_K

    # intermediate_size=256 so ffn_down's input dim hits Q4_K's 256-wide
    # super-block alignment at otherwise-tiny dims
    cfg = tiny_pipeline_config()
    cfg = dataclasses.replace(
        cfg, talker=dataclasses.replace(cfg.talker, intermediate_size=256))
    tts_dir = os.path.join(tmp_path, "ckpt")
    os.makedirs(tts_dir)
    write_safetensors(os.path.join(tts_dir, "model.safetensors"),
                      hf_fixture.make_tts_checkpoint(cfg))

    out = os.path.join(tmp_path, "mixed.gguf")
    conv.convert(tts_dir, out, "q4_k_mixed", "tts")
    r = GGUFReader(out)
    types = {name: r._raw(name)[2] for name in r.keys()}
    assert types["talker.blk.0.ffn_down.weight"] == GGML_Q4_K
    assert types["talker.blk.0.attn_q.weight"] == GGML_Q8_0
    assert types["talker.blk.0.attn_output.weight"] == GGML_Q8_0
    # non-256-aligned ffn legs fall back to Q8_0 (32-aligned) not F16
    assert types["talker.blk.0.ffn_gate.weight"] == GGML_Q8_0
    # norms/embeddings stay full/half precision
    assert types["talker.blk.0.attn_norm.weight"] in (GGML_F16, GGML_F32)

    # and the file loads back close to the original weights
    st = loader_mod.open_checkpoint_dir(tts_dir)
    want = loader_mod.load_talker(st, cfg.talker, jnp.float32)
    got = loader_mod.load_talker(GGUFCheckpoint(out), cfg.talker, jnp.float32)
    w, g = np.asarray(want.blocks.w_down), np.asarray(got.blocks.w_down)
    scale = np.abs(w).max()
    assert np.abs(g - w).max() < 0.12 * scale  # 4-bit error bound
    wq, gq = np.asarray(want.blocks.wqkv), np.asarray(got.blocks.wqkv)
    assert np.abs(gq - wq).max() < 0.02 * np.abs(wq).max() + 1e-3  # int8 bound
