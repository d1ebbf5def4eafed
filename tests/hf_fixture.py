"""Builds a fake HF checkpoint (all tensor names, tiny-config shapes) for
exercising the loaders and converters without real model files."""

from __future__ import annotations

import numpy as np

from qwen3tts_tpu.config import PipelineConfig


def _rng_tensor(rng, shape, scale=0.1):
    return (rng.normal(size=shape) * scale).astype(np.float32)


def make_tts_checkpoint(cfg: PipelineConfig, seed: int = 0) -> dict:
    """HF-named tensors for the main model (talker + code predictor +
    speaker encoder), shapes per docs/model_inspection.txt conventions."""
    rng = np.random.default_rng(seed)
    t = cfg.talker
    c = cfg.code_predictor
    s = cfg.speaker_encoder
    H, Et = t.hidden_size, t.text_embd_dim
    out = {}

    out["talker.model.text_embedding.weight"] = _rng_tensor(rng, (t.text_vocab_size, Et))
    out["talker.text_projection.linear_fc1.weight"] = _rng_tensor(rng, (Et, Et))
    out["talker.text_projection.linear_fc1.bias"] = _rng_tensor(rng, (Et,))
    out["talker.text_projection.linear_fc2.weight"] = _rng_tensor(rng, (H, Et))
    out["talker.text_projection.linear_fc2.bias"] = _rng_tensor(rng, (H,))
    out["talker.model.codec_embedding.weight"] = _rng_tensor(rng, (t.codec_vocab_size, H))
    out["talker.codec_head.weight"] = _rng_tensor(rng, (t.codec_vocab_size, H))
    out["talker.model.norm.weight"] = np.ones((H,), np.float32)

    def layer(prefix, n_layers, heads, kv_heads, D, F, hidden):
        for i in range(n_layers):
            p = f"{prefix}.layers.{i}"
            out[f"{p}.input_layernorm.weight"] = np.ones((hidden,), np.float32)
            out[f"{p}.self_attn.q_proj.weight"] = _rng_tensor(rng, (heads * D, hidden))
            out[f"{p}.self_attn.k_proj.weight"] = _rng_tensor(rng, (kv_heads * D, hidden))
            out[f"{p}.self_attn.v_proj.weight"] = _rng_tensor(rng, (kv_heads * D, hidden))
            out[f"{p}.self_attn.o_proj.weight"] = _rng_tensor(rng, (hidden, heads * D))
            out[f"{p}.self_attn.q_norm.weight"] = np.ones((D,), np.float32)
            out[f"{p}.self_attn.k_norm.weight"] = np.ones((D,), np.float32)
            out[f"{p}.post_attention_layernorm.weight"] = np.ones((hidden,), np.float32)
            out[f"{p}.mlp.gate_proj.weight"] = _rng_tensor(rng, (F, hidden))
            out[f"{p}.mlp.up_proj.weight"] = _rng_tensor(rng, (F, hidden))
            out[f"{p}.mlp.down_proj.weight"] = _rng_tensor(rng, (hidden, F))

    layer("talker.model", t.n_layers, t.n_heads, t.n_kv_heads, t.head_dim, t.intermediate_size, H)
    layer("talker.code_predictor.model", c.n_layers, c.n_heads, c.n_kv_heads, c.head_dim,
          c.intermediate_size, c.hidden_size)
    out["talker.code_predictor.model.norm.weight"] = np.ones((c.hidden_size,), np.float32)
    for i in range(c.n_steps):
        out[f"talker.code_predictor.model.codec_embedding.{i}.weight"] = \
            _rng_tensor(rng, (c.vocab_size, c.hidden_size))
        out[f"talker.code_predictor.lm_head.{i}.weight"] = \
            _rng_tensor(rng, (c.vocab_size, c.hidden_size))

    C, B, A = s.hidden_dim, s.branch_dim, s.attention_dim
    out["speaker_encoder.blocks.0.conv.weight"] = _rng_tensor(rng, (C, s.n_mels, 5))
    out["speaker_encoder.blocks.0.conv.bias"] = _rng_tensor(rng, (C,))
    for b in range(1, s.n_blocks + 1):
        p = f"speaker_encoder.blocks.{b}"
        out[f"{p}.tdnn1.conv.weight"] = _rng_tensor(rng, (C, C, 1))
        out[f"{p}.tdnn1.conv.bias"] = _rng_tensor(rng, (C,))
        for i in range(s.res2net_scale - 1):
            out[f"{p}.res2net_block.blocks.{i}.conv.weight"] = _rng_tensor(rng, (B, B, 3))
            out[f"{p}.res2net_block.blocks.{i}.conv.bias"] = _rng_tensor(rng, (B,))
        out[f"{p}.tdnn2.conv.weight"] = _rng_tensor(rng, (C, C, 1))
        out[f"{p}.tdnn2.conv.bias"] = _rng_tensor(rng, (C,))
        out[f"{p}.se_block.conv1.weight"] = _rng_tensor(rng, (s.se_dim, C, 1))
        out[f"{p}.se_block.conv1.bias"] = _rng_tensor(rng, (s.se_dim,))
        out[f"{p}.se_block.conv2.weight"] = _rng_tensor(rng, (C, s.se_dim, 1))
        out[f"{p}.se_block.conv2.bias"] = _rng_tensor(rng, (C,))
    M = s.mfa_dim
    out["speaker_encoder.mfa.conv.weight"] = _rng_tensor(rng, (M, M, 1))
    out["speaker_encoder.mfa.conv.bias"] = _rng_tensor(rng, (M,))
    out["speaker_encoder.asp.tdnn.conv.weight"] = _rng_tensor(rng, (A, 3 * M, 1))
    out["speaker_encoder.asp.tdnn.conv.bias"] = _rng_tensor(rng, (A,))
    out["speaker_encoder.asp.conv.weight"] = _rng_tensor(rng, (M, A, 1))
    out["speaker_encoder.asp.conv.bias"] = _rng_tensor(rng, (M,))
    out["speaker_encoder.fc.weight"] = _rng_tensor(rng, (s.embedding_dim, 2 * M, 1))
    out["speaker_encoder.fc.bias"] = _rng_tensor(rng, (s.embedding_dim,))
    return out


def make_tokenizer_checkpoint(cfg: PipelineConfig, seed: int = 1) -> dict:
    """HF-named tensors for the codec tokenizer's decoder (vocoder)."""
    rng = np.random.default_rng(seed)
    v = cfg.vocoder
    out = {}

    out["decoder.quantizer.rvq_first.input_proj.weight"] = \
        _rng_tensor(rng, (v.codebook_dim, v.hidden_dim, 1))
    out["decoder.quantizer.rvq_first.output_proj.weight"] = \
        _rng_tensor(rng, (v.hidden_dim, v.codebook_dim, 1))
    out["decoder.quantizer.rvq_rest.input_proj.weight"] = \
        _rng_tensor(rng, (v.codebook_dim, v.hidden_dim, 1))
    out["decoder.quantizer.rvq_rest.output_proj.weight"] = \
        _rng_tensor(rng, (v.hidden_dim, v.codebook_dim, 1))
    out["decoder.quantizer.rvq_first.vq.layers.0._codebook.embedding_sum"] = \
        _rng_tensor(rng, (v.codebook_size, v.codebook_dim))
    out["decoder.quantizer.rvq_first.vq.layers.0._codebook.cluster_usage"] = \
        np.abs(_rng_tensor(rng, (v.codebook_size,))) + 0.5
    for i in range(v.n_codebooks - 1):
        out[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.embedding_sum"] = \
            _rng_tensor(rng, (v.codebook_size, v.codebook_dim))
        out[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.cluster_usage"] = \
            np.abs(_rng_tensor(rng, (v.codebook_size,))) + 0.5

    out["decoder.pre_conv.conv.weight"] = _rng_tensor(rng, (v.latent_dim, v.hidden_dim, 3))
    out["decoder.pre_conv.conv.bias"] = _rng_tensor(rng, (v.latent_dim,))
    W, Q, F = v.pre_tfm_width, v.pre_tfm_qkv_dim, v.pre_tfm_ffn_dim
    out["decoder.pre_transformer.input_proj.weight"] = _rng_tensor(rng, (W, v.latent_dim))
    out["decoder.pre_transformer.input_proj.bias"] = _rng_tensor(rng, (W,))
    for i in range(v.n_pre_tfm_layers):
        p = f"decoder.pre_transformer.layers.{i}"
        out[f"{p}.input_layernorm.weight"] = np.ones((W,), np.float32)
        out[f"{p}.self_attn.q_proj.weight"] = _rng_tensor(rng, (Q, W))
        out[f"{p}.self_attn.k_proj.weight"] = _rng_tensor(rng, (Q, W))
        out[f"{p}.self_attn.v_proj.weight"] = _rng_tensor(rng, (Q, W))
        out[f"{p}.self_attn.o_proj.weight"] = _rng_tensor(rng, (W, Q))
        out[f"{p}.self_attn_layer_scale.scale"] = np.full((W,), 0.1, np.float32)
        out[f"{p}.post_attention_layernorm.weight"] = np.ones((W,), np.float32)
        out[f"{p}.mlp.gate_proj.weight"] = _rng_tensor(rng, (F, W))
        out[f"{p}.mlp.up_proj.weight"] = _rng_tensor(rng, (F, W))
        out[f"{p}.mlp.down_proj.weight"] = _rng_tensor(rng, (W, F))
        out[f"{p}.mlp_layer_scale.scale"] = np.full((W,), 0.1, np.float32)
    out["decoder.pre_transformer.norm.weight"] = np.ones((W,), np.float32)
    out["decoder.pre_transformer.output_proj.weight"] = _rng_tensor(rng, (v.latent_dim, W))
    out["decoder.pre_transformer.output_proj.bias"] = _rng_tensor(rng, (v.latent_dim,))

    C = v.latent_dim
    for i in range(v.n_convnext):
        p = f"decoder.upsample.{i}"
        out[f"{p}.0.conv.weight"] = _rng_tensor(rng, (C, C, 2))
        out[f"{p}.0.conv.bias"] = _rng_tensor(rng, (C,))
        out[f"{p}.1.dwconv.conv.weight"] = _rng_tensor(rng, (C, 1, 7))
        out[f"{p}.1.dwconv.conv.bias"] = _rng_tensor(rng, (C,))
        out[f"{p}.1.norm.weight"] = np.ones((C,), np.float32)
        out[f"{p}.1.norm.bias"] = np.zeros((C,), np.float32)
        out[f"{p}.1.pwconv1.weight"] = _rng_tensor(rng, (v.convnext_mlp_dim, C))
        out[f"{p}.1.pwconv1.bias"] = _rng_tensor(rng, (v.convnext_mlp_dim,))
        out[f"{p}.1.pwconv2.weight"] = _rng_tensor(rng, (C, v.convnext_mlp_dim))
        out[f"{p}.1.pwconv2.bias"] = _rng_tensor(rng, (C,))
        out[f"{p}.1.gamma"] = np.full((C,), 0.5, np.float32)

    chans = v.decoder_channels
    out["decoder.decoder.0.conv.weight"] = _rng_tensor(rng, (v.decoder_dim, v.latent_dim, 7))
    out["decoder.decoder.0.conv.bias"] = _rng_tensor(rng, (v.decoder_dim,))
    for bi, r in enumerate(v.upsample_rates, start=1):
        cin, cout = chans[bi - 1], chans[bi]
        p = f"decoder.decoder.{bi}.block"
        out[f"{p}.0.alpha"] = _rng_tensor(rng, (cin,), 0.05)
        out[f"{p}.0.beta"] = _rng_tensor(rng, (cin,), 0.05)
        out[f"{p}.1.conv.weight"] = _rng_tensor(rng, (cin, cout, 2 * r))
        out[f"{p}.1.conv.bias"] = _rng_tensor(rng, (cout,))
        for ri in (2, 3, 4):
            out[f"{p}.{ri}.act1.alpha"] = _rng_tensor(rng, (cout,), 0.05)
            out[f"{p}.{ri}.act1.beta"] = _rng_tensor(rng, (cout,), 0.05)
            out[f"{p}.{ri}.conv1.conv.weight"] = _rng_tensor(rng, (cout, cout, 7))
            out[f"{p}.{ri}.conv1.conv.bias"] = _rng_tensor(rng, (cout,))
            out[f"{p}.{ri}.act2.alpha"] = _rng_tensor(rng, (cout,), 0.05)
            out[f"{p}.{ri}.act2.beta"] = _rng_tensor(rng, (cout,), 0.05)
            out[f"{p}.{ri}.conv2.conv.weight"] = _rng_tensor(rng, (cout, cout, 1))
            out[f"{p}.{ri}.conv2.conv.bias"] = _rng_tensor(rng, (cout,))
    out["decoder.decoder.5.alpha"] = _rng_tensor(rng, (chans[-1],), 0.05)
    out["decoder.decoder.5.beta"] = _rng_tensor(rng, (chans[-1],), 0.05)
    out["decoder.decoder.6.conv.weight"] = _rng_tensor(rng, (1, chans[-1], 7))
    out["decoder.decoder.6.conv.bias"] = _rng_tensor(rng, (1,))
    return out
