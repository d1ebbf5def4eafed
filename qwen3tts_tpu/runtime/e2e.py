"""Single-dispatch synthesis: prefill + frame loop + vocoder in ONE jitted
program.

The split pipeline (generate dispatch -> host codes transfer -> vocoder
dispatch) pays two device round trips; over the remote-TPU tunnel each
dispatch costs a fixed ~27 ms (CLAUDE.md), and even locally the host hop
serializes the stages. Fusing them returns the full padded-bucket waveform
with the frame count, one dispatch end-to-end.

Trade-off: the vocoder runs over the whole max_frames bucket even when EOS
stops generation early (codes rows past n_frames are zero; the audio tail is
sliced off on the host). That's the right trade for serving with tight
max-token budgets and for benchmarks; the default pipeline path keeps the
split so short utterances vocode a smaller bucket
(RuntimeConfig.fused_dispatch opts in).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import vocoder as vocoder_model
from . import decode_loop


@functools.partial(
    jax.jit,
    static_argnames=(
        "talker_cfg", "cp_cfg", "vocoder_cfg", "max_frames", "kv_capacity",
        "temperature", "top_k", "top_p", "repetition_penalty", "nothink",
        "allow_eos", "fused_cp", "fused_talker",
    ),
)
def generate_and_vocode(
    talker_params,
    cp_params,
    vocoder_params,
    tokens: jnp.ndarray,        # [Tb] padded TTS-formatted ids
    n_tokens: jnp.ndarray,      # scalar
    speaker_embd: jnp.ndarray,  # [H]
    language_id: jnp.ndarray,   # scalar
    key: jax.Array,
    *,
    talker_cfg,
    cp_cfg,
    vocoder_cfg,
    max_frames: int,
    kv_capacity: int,
    temperature: float,
    top_k: int,
    top_p: float = 1.0,
    repetition_penalty: float = 1.05,
    nothink: bool = False,
    allow_eos: bool = True,
    fused_cp="auto",
    fused_talker="auto",
):
    """Returns (audio [max_frames * samples_per_frame] f32, GenerateResult).
    Valid audio is the first n_frames * samples_per_frame samples."""
    gen = decode_loop.generate_from_tokens(
        talker_params, cp_params, tokens, n_tokens, speaker_embd, language_id,
        key, talker_cfg=talker_cfg, cp_cfg=cp_cfg, max_frames=max_frames,
        kv_capacity=kv_capacity, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=repetition_penalty, nothink=nothink,
        allow_eos=allow_eos, fused_cp=fused_cp, fused_talker=fused_talker)
    audio = vocoder_model.vocoder_forward(
        vocoder_params, vocoder_cfg, gen.codes, gen.n_frames)
    return audio, gen


@functools.partial(
    jax.jit,
    static_argnames=(
        "talker_cfg", "cp_cfg", "vocoder_cfg", "chunk_frames", "max_frames",
        "kv_capacity", "temperature", "top_k", "top_p", "repetition_penalty",
        "nothink", "allow_eos", "fused_cp", "fused_talker",
    ),
)
def start_and_vocode(
    talker_params,
    cp_params,
    vocoder_params,
    tokens: jnp.ndarray,
    n_tokens: jnp.ndarray,
    speaker_embd: jnp.ndarray,
    language_id: jnp.ndarray,
    key: jax.Array,
    *,
    talker_cfg,
    cp_cfg,
    vocoder_cfg,
    chunk_frames: int,
    max_frames: int,
    kv_capacity: int,
    temperature: float,
    top_k: int,
    top_p: float = 1.0,
    repetition_penalty: float = 1.05,
    nothink: bool = False,
    allow_eos: bool = True,
    fused_cp="auto",
    fused_talker="auto",
):
    """Time-to-first-audio path, one dispatch: prefill + the first
    chunk_frames of generation + vocoder over that chunk. Returns
    (audio [chunk_frames * samples_per_frame] f32, state, prefill); continue
    with decode_loop.generate_chunk + the streaming vocoder."""
    state, prefill = decode_loop.generate_start(
        talker_params, cp_params, tokens, n_tokens, speaker_embd, language_id,
        key, talker_cfg=talker_cfg, cp_cfg=cp_cfg, chunk_frames=chunk_frames,
        max_frames=max_frames, kv_capacity=kv_capacity,
        temperature=temperature, top_k=top_k, top_p=top_p,
        repetition_penalty=repetition_penalty, nothink=nothink,
        allow_eos=allow_eos, fused_cp=fused_cp, fused_talker=fused_talker)
    audio = vocoder_model.vocoder_forward(
        vocoder_params, vocoder_cfg, state.codes[:chunk_frames],
        jnp.minimum(state.frame, chunk_frames))
    return audio, state, prefill
