"""The talker: 28-layer AR codec-token transformer + prefill conditioning.

Covers reference component #5 (SURVEY.md §2): text-embedding projection
(tts_transformer.cpp:917-982), prefill-embedding construction (:984-1122),
prefill/step forwards (:1124-1411, :1831-2108). The prefill-embedding builder
runs fully on-device and is jittable; its 10-position layout is documented by
``reference/det_prefill_token_types.json`` and reproduced exactly:

    pos 0..2   text_projection(im_start, assistant, newline)          "role"
    pos 3..6   tts_pad + codec_embedding(think, think_bos, lang, think_eos)
    pos 7      tts_pad + projected-speaker-embedding (zeros = default voice)
    pos 8      tts_bos + codec_embedding(codec_pad)
    pos 9      text_projection(first_text_token) + codec_embedding(codec_bos)

With language_id < 0 the "nothink" variant is used instead
(tts_transformer.cpp:1025-1030): codec rows (nothink, think_bos, think_eos)
and a 9-position prefill.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TalkerConfig
from ..ops.norms import rms_norm
from .transformer_core import BlockParams, CoreConfig, forward_prefill, forward_step, init_block_params


class TalkerParams(NamedTuple):
    text_embd: jnp.ndarray       # [Vt, Et]
    text_proj_fc1_w: jnp.ndarray  # [Et, Et]
    text_proj_fc1_b: jnp.ndarray  # [Et]
    text_proj_fc2_w: jnp.ndarray  # [Et, H]
    text_proj_fc2_b: jnp.ndarray  # [H]
    codec_embd: jnp.ndarray      # [Vc, H]
    blocks: BlockParams          # stacked x 28
    output_norm: jnp.ndarray     # [H]
    codec_head: jnp.ndarray      # [H, Vc]


def core_config(cfg: TalkerConfig) -> CoreConfig:
    return CoreConfig(
        n_layers=cfg.n_layers,
        n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        unroll=4,  # 28 layers: partial unroll cuts loop overhead without
                   # exploding compile time
    )


def init_talker_params(key: jax.Array, cfg: TalkerConfig, dtype=jnp.bfloat16) -> TalkerParams:
    ks = jax.random.split(key, 6)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(dtype)

    return TalkerParams(
        text_embd=w(ks[0], (cfg.text_vocab_size, cfg.text_embd_dim), cfg.text_embd_dim),
        text_proj_fc1_w=w(ks[1], (cfg.text_embd_dim, cfg.text_embd_dim), cfg.text_embd_dim),
        text_proj_fc1_b=jnp.zeros((cfg.text_embd_dim,), dtype),
        text_proj_fc2_w=w(ks[2], (cfg.text_embd_dim, cfg.hidden_size), cfg.text_embd_dim),
        text_proj_fc2_b=jnp.zeros((cfg.hidden_size,), dtype),
        codec_embd=w(ks[3], (cfg.codec_vocab_size, cfg.hidden_size), cfg.hidden_size),
        blocks=init_block_params(ks[4], core_config(cfg), cfg.hidden_size, cfg.intermediate_size, dtype),
        output_norm=jnp.ones((cfg.hidden_size,), dtype),
        codec_head=w(ks[5], (cfg.hidden_size, cfg.codec_vocab_size), cfg.hidden_size),
    )


def project_text_tokens(params: TalkerParams, tokens: jnp.ndarray) -> jnp.ndarray:
    """text_embedding -> fc1 -> SiLU -> fc2 (tts_transformer.cpp:941-946).

    tokens: int [T]; returns [T, H].
    """
    x = params.text_embd[tokens]
    x = x @ params.text_proj_fc1_w + params.text_proj_fc1_b
    x = jax.nn.silu(x.astype(jnp.float32)).astype(params.text_proj_fc1_w.dtype)
    x = x @ params.text_proj_fc2_w + params.text_proj_fc2_b
    return x


class PrefillInputs(NamedTuple):
    prefill_embd: jnp.ndarray   # [10 (or 9), H]
    trailing: jnp.ndarray       # [Trb, H] padded: text rows, tts_eos, then tts_pad forever
    trailing_len: jnp.ndarray   # scalar (text trailing count + 1 for tts_eos)
    tts_pad_embd: jnp.ndarray   # [H]


def build_prefill(
    params: TalkerParams,
    cfg: TalkerConfig,
    tokens: jnp.ndarray,      # [Tb] padded TTS-formatted token ids
    n_tokens: jnp.ndarray,    # scalar: true token count (>= 10 for the template)
    speaker_embd: jnp.ndarray,  # [H] (zeros = default voice, qwen3_tts.cpp:204-208)
    language_id: jnp.ndarray,   # scalar codec language id
    *,
    nothink: bool = False,
) -> PrefillInputs:
    """Assemble the prefill window and the per-frame trailing-text schedule.

    The prefill window length is fixed (10, or 9 for nothink) regardless of
    text length; only the trailing schedule varies, so this compiles once per
    text-length bucket Tb. Trailing rows beyond the true schedule are
    pre-filled with tts_pad so the decode loop indexes it unconditionally
    (tts_transformer.cpp:2785-2790 semantics without a branch).
    """
    H = cfg.hidden_size
    Tb = tokens.shape[0]
    dtype = params.codec_embd.dtype

    proj_all = project_text_tokens(params, tokens)             # [Tb, H]
    specials = project_text_tokens(
        params,
        jnp.array([cfg.tts_bos_token_id, cfg.tts_eos_token_id, cfg.tts_pad_token_id], jnp.int32),
    )
    tts_bos, tts_eos, tts_pad = specials[0], specials[1], specials[2]

    role = proj_all[0:3]                                       # [3, H]
    first_text = proj_all[3]                                   # [H]

    if nothink:
        codec_prefill_ids = jnp.array([cfg.codec_nothink_id, cfg.codec_think_bos_id, cfg.codec_think_eos_id], jnp.int32)
    else:
        codec_prefill_ids = jnp.stack([
            jnp.int32(cfg.codec_think_id),
            jnp.int32(cfg.codec_think_bos_id),
            language_id.astype(jnp.int32),
            jnp.int32(cfg.codec_think_eos_id),
        ])
    codec_prefill = params.codec_embd[codec_prefill_ids]       # [3 or 4, H]
    codec_pad_row = params.codec_embd[cfg.codec_pad_id]
    codec_bos_row = params.codec_embd[cfg.codec_bos_id]

    # codec input = [prefill rows..., speaker, pad, bos]; overlay tts_pad on
    # all but the pad row which gets tts_bos; bos row pairs with first text.
    overlay_rows = jnp.concatenate([
        codec_prefill + tts_pad[None, :],
        (speaker_embd.astype(dtype) + tts_pad)[None, :],
        (codec_pad_row + tts_bos)[None, :],
    ], axis=0)
    last_row = (first_text + codec_bos_row)[None, :]
    prefill_embd = jnp.concatenate([role, overlay_rows, last_row], axis=0)

    # Trailing text schedule: proj(tokens[4 : n_tokens-5]) ++ [tts_eos], padded
    # with tts_pad. trailing_count = n_tokens - 9 (tts_transformer.cpp:1105).
    trailing_count = n_tokens - 9
    Trb = Tb - 3                                               # room for count + eos row
    idx = jnp.arange(Trb)
    rows = proj_all[jnp.clip(4 + idx, 0, Tb - 1)]
    trailing = jnp.where(
        (idx < trailing_count)[:, None],
        rows,
        jnp.where((idx == trailing_count)[:, None], tts_eos[None, :], tts_pad[None, :]),
    )
    return PrefillInputs(
        prefill_embd=prefill_embd,
        trailing=trailing,
        trailing_len=trailing_count + 1,
        tts_pad_embd=tts_pad,
    )


def talker_prefill(params: TalkerParams, cfg: TalkerConfig, prefill_embd: jnp.ndarray, kv: jnp.ndarray):
    """Prefill forward; returns (last_hidden [H], last_logits [Vc], kv).

    The prefill window is dense (no padding) because its length is fixed.
    """
    P = prefill_embd.shape[0]
    positions = jnp.arange(P, dtype=jnp.int32)
    hidden, kv = forward_prefill(params.blocks, core_config(cfg), prefill_embd, positions, None, kv, 0)
    normed_last = rms_norm(hidden[-1], params.output_norm, cfg.rms_norm_eps)
    logits = (normed_last @ params.codec_head).astype(jnp.float32)
    return normed_last, logits, kv


def talker_prefill_window(params: TalkerParams, cfg: TalkerConfig,
                          prefill_embd: jnp.ndarray, pos0: jnp.ndarray,
                          kv_dtype=jnp.bfloat16):
    """Prefill at absolute positions [pos0, pos0+P) into a standalone window
    cache (no full-capacity cache involved). Returns
    (last_hidden [H], last_logits [Vc], kv_window [L, 2, Hkv, P, D]).

    This is the continuous-batching refill primitive
    (runtime/continuous.py): the caller splices kv_window into a serving
    lane's cache at columns [pos0, pos0+P). Because RoPE is relative
    (rotary shift invariance) and the window attends only to itself, the
    spliced request generates exactly what a fresh run at positions [0, P)
    would."""
    P = prefill_embd.shape[0]
    positions = pos0 + jnp.arange(P, dtype=jnp.int32)
    kv_win = jnp.zeros(
        (cfg.n_layers, 2, cfg.n_kv_heads, P, cfg.head_dim), kv_dtype)
    hidden, kv_win = forward_prefill(
        params.blocks, core_config(cfg), prefill_embd, positions, None,
        kv_win, 0)
    normed_last = rms_norm(hidden[-1], params.output_norm, cfg.rms_norm_eps)
    logits = (normed_last @ params.codec_head).astype(jnp.float32)
    return normed_last, logits, kv_win


def talker_step(params: TalkerParams, cfg: TalkerConfig, step_embd: jnp.ndarray, n_past: jnp.ndarray, kv: jnp.ndarray, strategy: str = "auto", start: jnp.ndarray | None = None):
    """One AR frame step; returns (hidden_norm [H], logits [Vc], kv).
    `start` masks cache entries below a continuous-batching splice point
    (transformer_core.forward_step)."""
    hidden, kv = forward_step(params.blocks, core_config(cfg), step_embd, n_past, kv, strategy, start)
    normed = rms_norm(hidden, params.output_norm, cfg.rms_norm_eps)
    logits = (normed @ params.codec_head).astype(jnp.float32)
    return normed, logits, kv


def make_kv_cache(cfg: TalkerConfig, capacity: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    return jnp.zeros((cfg.n_layers, 2, cfg.n_kv_heads, capacity, cfg.head_dim), dtype)
