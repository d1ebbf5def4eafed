"""On-device token sampling.

Reproduces the reference CLI semantics exactly, but entirely inside the jitted
decode loop (no host round-trip):

- greedy when temperature <= 0 (argmax, first-max tie-break)
  (reference src/tts_transformer.cpp:2686-2687)
- temperature scaling -> top-k filter -> softmax -> categorical
  (reference src/tts_transformer.cpp:2689-2721)
- HuggingFace-style repetition penalty over the set of previously generated
  codebook-0 tokens: positive logits divided, negative multiplied
  (reference src/tts_transformer.cpp:2672-2683); the C++ ``unordered_set``
  becomes a fixed-size boolean seen-mask carried through the loop.
- codebook-0 suppression of the top-1024 codec ids except EOS
  (reference src/tts_transformer.cpp:2658,2665-2670)
- top-p (nucleus) filtering: parsed-but-dead in the reference CLI
  (README.md:184); wired for real here. top_p >= 1.0 disables it.

All masking uses a large-negative constant rather than -inf so that fully
masked rows cannot produce NaNs under f32 softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # plain float: no device allocation at import time


def apply_suppression(logits: jnp.ndarray, suppress_start: int, eos_id: int) -> jnp.ndarray:
    """Mask ids in [suppress_start, vocab) except eos_id."""
    vocab = logits.shape[-1]
    ids = jnp.arange(vocab)
    mask = (ids >= suppress_start) & (ids != eos_id)
    return jnp.where(mask, NEG_INF, logits)


def apply_repetition_penalty(logits: jnp.ndarray, seen_mask: jnp.ndarray, penalty: float) -> jnp.ndarray:
    """HF-style penalty on previously seen ids (seen_mask: bool [vocab])."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0.0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, penalized, logits)


def apply_top_k(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep the top-k logits (threshold = k-th largest, ties kept), mask rest.

    Matches the reference's partial_sort threshold semantics
    (src/tts_transformer.cpp:2693-2708): values strictly below the k-th
    largest are masked; equal values survive.
    """
    vocab = logits.shape[-1]
    if top_k <= 0 or top_k >= vocab:
        return logits
    kth = jax.lax.top_k(logits, top_k)[0][..., -1]
    return jnp.where(logits < kth[..., None], NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest prefix of the sorted distribution
    whose cumulative probability reaches top_p (the crossing token is kept)."""
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep tokens whose *preceding* cumulative mass is < top_p.
    keep_sorted = (cum - probs) < top_p
    # Threshold logit = smallest kept logit.
    masked_sorted = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(masked_sorted, axis=-1)
    return jnp.where(logits < threshold[..., None], NEG_INF, logits)


def sample_token(
    key: jax.Array,
    logits: jnp.ndarray,
    *,
    temperature: float,
    top_k: int,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Sample one token id from logits [vocab] (or batched [..., vocab]).

    temperature/top_k/top_p are Python floats/ints (static at trace time),
    matching how the CLI threads them into the reference generate().
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temperature
    scaled = apply_top_k(scaled, top_k)
    scaled = apply_top_p(scaled, top_p)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
