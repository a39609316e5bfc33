"""Vectorized in-graph token sampler.

Replaces the reference's vLLM Sampler + per-step Python logits processor
(reference: components/vllm/hijack.py:25-88): the XTTS repetition penalty
(divide positive / multiply negative logits of every previously-seen token),
temperature, top-k, top-p and greedy fallback — all batched over decode slots
inside the jitted step. The "seen" set is a per-slot boolean mask over the
1026-token mel vocab, which is tiny on TPU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


class SamplingState(NamedTuple):
    """Per-slot sampling configuration + seen-token mask."""

    temperature: jax.Array  # [S] f32
    top_p: jax.Array  # [S] f32
    top_k: jax.Array  # [S] i32 (0 => disabled)
    repetition_penalty: jax.Array  # [S] f32
    do_sample: jax.Array  # [S] bool
    # per-slot new-token cap (0 => config max_audio_tokens). The reference
    # hardcodes 605 per chunk but its vLLM backend exposes max_tokens per
    # request; this is the per-slot equivalent
    max_new: jax.Array  # [S] i32
    seen: jax.Array  # [S, V] bool


def init_sampling_state(num_slots: int, vocab_size: int) -> SamplingState:
    s = num_slots
    return SamplingState(
        temperature=jnp.full((s,), 0.75, jnp.float32),
        top_p=jnp.full((s,), 0.85, jnp.float32),
        top_k=jnp.full((s,), 50, jnp.int32),
        repetition_penalty=jnp.full((s,), 5.0, jnp.float32),
        do_sample=jnp.ones((s,), bool),
        max_new=jnp.zeros((s,), jnp.int32),
        seen=jnp.zeros((s, vocab_size), bool),
    )


def apply_repetition_penalty(
    logits: jax.Array, seen: jax.Array, penalty: jax.Array
) -> jax.Array:
    """XTTS-style penalty: seen & logit>0 -> /p ; seen & logit<0 -> *p."""
    p = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen, penalized, logits)


def sample_tokens(
    logits: jax.Array,  # [S, V] f32
    state: SamplingState,
    rng: jax.Array,
) -> tuple[jax.Array, SamplingState]:
    """Sample the next token for every slot; returns tokens [S] and the state
    with the sampled tokens added to `seen`."""
    s, v = logits.shape
    logits = apply_repetition_penalty(logits, state.seen, state.repetition_penalty)

    greedy = jnp.argmax(logits, axis=-1)

    temp = jnp.maximum(state.temperature, 1e-5)[:, None]
    scaled = logits / temp

    # ONE multi-operand sort yields both the descending values and the
    # permutation (sort + argsort would run the expensive TPU sort network
    # twice over the same keys)
    iota = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32)[None, :], (s, v))
    neg_sorted, order = jax.lax.sort((-scaled, iota), dimension=-1, num_keys=1)
    sorted_logits = -neg_sorted

    rank = jnp.arange(v)[None, :]
    # top-k: keep ranks < k (k<=0 disables)
    k = jnp.where(state.top_k <= 0, v, state.top_k)[:, None]
    keep_k = rank < k
    # top-p: keep the smallest prefix with cumulative prob >= p (always keep rank 0)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < state.top_p[:, None]
    keep = keep_k & keep_p
    keep = keep.at[:, 0].set(True)

    masked = jnp.where(keep, sorted_logits, NEG_INF)
    gumbel = jax.random.gumbel(rng, (s, v), dtype=jnp.float32)
    choice_rank = jnp.argmax(masked + gumbel, axis=-1)
    sampled = jnp.take_along_axis(order, choice_rank[:, None], axis=-1)[:, 0]

    tokens = jnp.where(state.do_sample, sampled, greedy).astype(jnp.int32)
    seen = state.seen.at[jnp.arange(s), tokens].set(True)
    return tokens, state._replace(seen=seen)
