"""Slot-based continuous-batching decode loop.

This is the TPU-native replacement for the reference's vLLM engine
(SURVEY.md §2.1): a fixed-shape `[slots, ...]` decode state stepped under
`jax.jit`, with host-side insertion of prefilled sequences into free slots and
harvesting of finished ones. Latents for the vocoder are accumulated inline
during decode — eliminating the reference's second "logits-only" pass
(XTTSv2.py:617-687) entirely.

Pure functions here; the async host coordinator lives in engine_core.py.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.xttsv2.config import XTTSGPTConfig
from ..models.xttsv2.gpt import (
    KVCache,
    gpt_decode_step,
    gpt_prefill,
    gpt_prefill_batched,
    heads,
    make_kv_cache,
)
from .sampler import SamplingState, init_sampling_state, sample_tokens

PREFILL_BUCKETS = (64, 128, 256, 512)


def _prompt_seen_row(cfg: XTTSGPTConfig) -> jax.Array:
    """Initial seen-mask row for a fresh sequence. With
    cfg.reppen_penalize_prompt_ids (reference parity), ids {1,
    start_audio_token} are penalized from step 0: the reference's processor
    scopes `prompt_token_ids + token_ids` (hijack.py:67-76) and its vLLM
    prompt is `[1]*len(embeds) + [start_audio_token]` (vllm_mm_gpt.py:300)."""
    row = np.zeros((cfg.num_audio_tokens,), bool)
    if cfg.reppen_penalize_prompt_ids:
        row[1] = True
        row[cfg.start_audio_token] = True
    return jnp.asarray(row)


def prefill_bucket(length: int, max_len: int) -> int:
    for b in PREFILL_BUCKETS:
        if length <= b <= max_len:
            return b
    return max_len


class DecodeState(NamedTuple):
    """All device-resident decode state (one pytree, donated every step)."""

    cache: KVCache
    sampling: SamplingState
    seq_lens: jax.Array  # [S] i32 — cache positions filled (prompt + generated-1)
    audio_pos: jax.Array  # [S] i32 — audio position of the next input token
    last_token: jax.Array  # [S] i32 — next input token
    active: jax.Array  # [S] bool — currently decoding
    done: jax.Array  # [S] bool — finished, awaiting harvest
    tokens_buf: jax.Array  # [S, T_audio] i32
    latents_buf: jax.Array  # [S, T_audio, D]
    n_generated: jax.Array  # [S] i32
    rng: jax.Array


def init_decode_state(
    cfg: XTTSGPTConfig, num_slots: int, rng: jax.Array, dtype=jnp.bfloat16
) -> DecodeState:
    assert cfg.max_audio_tokens < (1 << 14), (
        f"max_audio_tokens={cfg.max_audio_tokens} overflows the packed "
        "status word (see pack_status)"
    )
    s, t, d = num_slots, cfg.max_audio_tokens, cfg.hidden_size
    return DecodeState(
        cache=make_kv_cache(cfg, s, dtype=dtype),
        sampling=init_sampling_state(s, cfg.num_audio_tokens),
        seq_lens=jnp.zeros((s,), jnp.int32),
        audio_pos=jnp.zeros((s,), jnp.int32),
        last_token=jnp.zeros((s,), jnp.int32),
        active=jnp.zeros((s,), bool),
        done=jnp.zeros((s,), bool),
        tokens_buf=jnp.zeros((s, t), jnp.int32),
        latents_buf=jnp.zeros((s, t, d), jnp.float32),
        n_generated=jnp.zeros((s,), jnp.int32),
        rng=rng,
    )


def _record_and_advance(
    cfg: XTTSGPTConfig,
    state: DecodeState,
    latent: jax.Array,  # [S, D] — hidden of the current input token
    new_tokens: jax.Array,  # [S] — just sampled
    sampling: SamplingState,
    cache: KVCache,
    was_active: jax.Array,  # [S] bool
    rng: jax.Array,
) -> DecodeState:
    """Shared bookkeeping for prefill-insert and decode-step: store
    (latent, token) at index n_generated, advance counters, flag completion."""
    s = new_tokens.shape[0]
    slot_idx = jnp.arange(s)
    idx = jnp.clip(state.n_generated, 0, cfg.max_audio_tokens - 1)

    lat = jnp.where(
        was_active[:, None], latent.astype(state.latents_buf.dtype),
        state.latents_buf[slot_idx, idx],
    )
    latents_buf = state.latents_buf.at[slot_idx, idx].set(lat)
    tok = jnp.where(was_active, new_tokens, state.tokens_buf[slot_idx, idx])
    tokens_buf = state.tokens_buf.at[slot_idx, idx].set(tok)

    n_generated = state.n_generated + was_active.astype(jnp.int32)
    hit_eos = was_active & (new_tokens == cfg.stop_audio_token)
    # per-slot cap (sampling.max_new, 0 = disabled) composes with the model
    # cap — the per-request max_new_tokens API (vLLM max_tokens parity)
    limit = jnp.where(
        sampling.max_new > 0,
        jnp.minimum(sampling.max_new, cfg.max_audio_tokens),
        cfg.max_audio_tokens,
    )
    hit_max = was_active & (n_generated >= limit)
    newly_done = hit_eos | hit_max

    return DecodeState(
        cache=cache,
        sampling=sampling,
        seq_lens=state.seq_lens + was_active.astype(jnp.int32),
        audio_pos=state.audio_pos + was_active.astype(jnp.int32),
        last_token=jnp.where(was_active, new_tokens, state.last_token),
        active=state.active & ~newly_done,
        done=state.done | newly_done,
        tokens_buf=tokens_buf,
        latents_buf=latents_buf,
        n_generated=n_generated,
        rng=rng,
    )


def _assemble_prompt(
    params: dict,
    cfg: XTTSGPTConfig,
    cond: jax.Array,  # [C, D] voice conditioning latents (device-resident)
    ids: jax.Array,  # [Tb] i32 text token ids incl. bos/eos, zero-padded
    n_ids: jax.Array,  # scalar i32: true id count
) -> jax.Array:
    """In-graph prompt assembly: [cond ⊕ text(ids)+text_wpe ⊕ start-audio]
    -> [C + Tb, D]. Row C + n_ids carries the start-audio embed
    (wte[start] + wpe[0], reference vllm_mm_gpt.py:806-813); rows beyond are
    garbage and masked by gpt_prefill's length mask. This is the transfer-
    thin insert path: the host uploads ~2 KB of ids instead of a 1-2 MB
    embedding matrix per chunk (the conditioning latents live on device,
    uploaded once per voice)."""
    tb = ids.shape[0]
    pos = jnp.arange(tb)
    text = params["text_wte"][ids] + params["text_wpe"][
        jnp.clip(pos, 0, params["text_wpe"].shape[0] - 1)
    ]
    start = params["wte"][cfg.start_audio_token] + params["wpe"][0]
    text = jnp.where(pos[:, None] == n_ids, start[None], text)
    return jnp.concatenate([cond.astype(text.dtype), text], axis=0)


def _insert_body(
    params: dict,
    cfg: XTTSGPTConfig,
    state: DecodeState,
    embeds: jax.Array,  # [T_pad, D] prompt embeddings (cond ⊕ text ⊕ start)
    length: jax.Array,  # scalar i32
    slot: jax.Array,  # scalar i32
    temperature: jax.Array,
    top_p: jax.Array,
    top_k: jax.Array,
    repetition_penalty: jax.Array,
    do_sample: jax.Array,
    max_new: jax.Array = 0,
) -> DecodeState:
    """Prefill a prompt into `slot`, sample its first token, mark it active."""
    s = state.seq_lens.shape[0]
    onehot = jnp.arange(s) == slot

    h_last, cache = gpt_prefill(params, cfg, embeds, length, slot, state.cache)
    logits, latent = heads(params, h_last[None])  # [1, V], [1, D]

    sampling = SamplingState(
        temperature=jnp.where(onehot, temperature, state.sampling.temperature),
        top_p=jnp.where(onehot, top_p, state.sampling.top_p),
        top_k=jnp.where(onehot, top_k, state.sampling.top_k),
        repetition_penalty=jnp.where(
            onehot, repetition_penalty, state.sampling.repetition_penalty
        ),
        do_sample=jnp.where(onehot, do_sample, state.sampling.do_sample),
        max_new=jnp.where(onehot, max_new, state.sampling.max_new),
        seen=jnp.where(
            onehot[:, None], _prompt_seen_row(cfg)[None, :], state.sampling.seen
        ),
    )

    rng, sub = jax.random.split(state.rng)
    logits_s = jnp.where(onehot[:, None], logits, 0.0)
    tokens, sampling = sample_tokens(logits_s, sampling, sub)
    # only `slot`'s sample matters; protect other slots' seen-masks
    sampling = sampling._replace(
        seen=jnp.where(onehot[:, None], sampling.seen, state.sampling.seen)
    )

    # reset the slot's counters, then record its first (latent, token)
    state = DecodeState(
        cache=cache,
        sampling=sampling,
        seq_lens=jnp.where(onehot, length - 1, state.seq_lens),
        audio_pos=jnp.where(onehot, 0, state.audio_pos),
        last_token=state.last_token,
        active=state.active | onehot,
        done=state.done & ~onehot,
        tokens_buf=state.tokens_buf,
        latents_buf=state.latents_buf,
        n_generated=jnp.where(onehot, 0, state.n_generated),
        rng=rng,
    )
    latent_full = jnp.where(onehot[:, None], latent, 0.0)
    return _record_and_advance(cfg, state, latent_full, tokens, sampling, cache, onehot, rng)


insert_sequence = partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("state",)
)(_insert_body)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def insert_sequence_tokens(
    params: dict,
    cfg: XTTSGPTConfig,
    state: DecodeState,
    cond: jax.Array,  # [C, D] device-resident voice latents
    ids: jax.Array,  # [Tb] i32 text ids incl. bos/eos, zero-padded
    n_ids: jax.Array,  # scalar i32
    slot: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    top_k: jax.Array,
    repetition_penalty: jax.Array,
    do_sample: jax.Array,
    max_new: jax.Array = 0,
) -> DecodeState:
    """Transfer-thin insert: assemble the prompt IN-GRAPH from device-cached
    conditioning + uploaded token ids (~2 KB), then prefill. Identical result
    to insert_sequence over host-built embeddings (pinned by test)."""
    embeds = _assemble_prompt(params, cfg, cond, ids, n_ids).astype(
        jnp.bfloat16 if cfg.kv_int8 else state.cache.k.dtype
    )
    length = cond.shape[0] + n_ids + 1
    return _insert_body(
        params, cfg, state, embeds, length, slot,
        temperature, top_p, top_k, repetition_penalty, do_sample, max_new,
    )


def _insert_batch_body(
    params: dict,
    cfg: XTTSGPTConfig,
    state: DecodeState,
    embeds: jax.Array,  # [K, T_pad, D] burst of prompts (zero-padded)
    lengths: jax.Array,  # [K] i32 true lengths; 0 on padding lanes
    slots: jax.Array,  # [K] i32 target slots; num_slots on padding lanes
    temperature: jax.Array,  # [K]
    top_p: jax.Array,  # [K]
    top_k: jax.Array,  # [K]
    repetition_penalty: jax.Array,  # [K]
    do_sample: jax.Array,  # [K]
    max_new: jax.Array = 0,  # [K] i32 (0 = config cap)
) -> DecodeState:
    """Burst insert: prefill K prompts in ONE program (weights stream from
    HBM once, not K times — see gpt_prefill_batched) and activate all K
    slots. Padding lanes carry slot == num_slots: every scatter here uses
    mode="drop", so they touch nothing. Sampling note: one rng split covers
    the whole burst (K sequential inserts would burn K splits), so sampled
    tokens differ from the sequential path — greedy decoding is identical,
    which is what the equality tests pin."""
    s = state.seq_lens.shape[0]
    khot = jnp.zeros((s,), bool).at[slots].set(True, mode="drop")

    h_last, cache = gpt_prefill_batched(
        params, cfg, embeds, lengths, slots, state.cache
    )
    logits, latent = heads(params, h_last)  # [K, V], [K, D]

    sampling = SamplingState(
        temperature=state.sampling.temperature.at[slots].set(
            temperature, mode="drop"
        ),
        top_p=state.sampling.top_p.at[slots].set(top_p, mode="drop"),
        top_k=state.sampling.top_k.at[slots].set(top_k, mode="drop"),
        repetition_penalty=state.sampling.repetition_penalty.at[slots].set(
            repetition_penalty, mode="drop"
        ),
        do_sample=state.sampling.do_sample.at[slots].set(do_sample, mode="drop"),
        max_new=state.sampling.max_new.at[slots].set(max_new, mode="drop"),
        seen=jnp.where(
            khot[:, None], _prompt_seen_row(cfg)[None, :], state.sampling.seen
        ),
    )

    rng, sub = jax.random.split(state.rng)
    logits_s = jnp.zeros((s, logits.shape[-1]), logits.dtype).at[slots].set(
        logits, mode="drop"
    )
    tokens, sampling = sample_tokens(logits_s, sampling, sub)
    # only the inserted slots' samples matter; protect other slots' seen-masks
    sampling = sampling._replace(
        seen=jnp.where(khot[:, None], sampling.seen, state.sampling.seen)
    )

    lengths_s = jnp.zeros((s,), jnp.int32).at[slots].set(lengths, mode="drop")
    state = DecodeState(
        cache=cache,
        sampling=sampling,
        seq_lens=jnp.where(khot, lengths_s - 1, state.seq_lens),
        audio_pos=jnp.where(khot, 0, state.audio_pos),
        last_token=state.last_token,
        active=state.active | khot,
        done=state.done & ~khot,
        tokens_buf=state.tokens_buf,
        latents_buf=state.latents_buf,
        n_generated=jnp.where(khot, 0, state.n_generated),
        rng=rng,
    )
    latent_full = jnp.zeros((s, latent.shape[-1]), latent.dtype).at[slots].set(
        latent, mode="drop"
    )
    return _record_and_advance(cfg, state, latent_full, tokens, sampling, cache, khot, rng)


insert_sequences = partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("state",)
)(_insert_batch_body)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def insert_sequences_tokens(
    params: dict,
    cfg: XTTSGPTConfig,
    state: DecodeState,
    cond: jax.Array,  # [K, C, D] per-lane voice latents (device-resident)
    ids: jax.Array,  # [K, Tb] i32 text ids incl. bos/eos, zero-padded
    n_ids: jax.Array,  # [K] i32 true id counts
    slots: jax.Array,  # [K] i32 target slots; num_slots on padding lanes
    temperature: jax.Array,
    top_p: jax.Array,
    top_k: jax.Array,
    repetition_penalty: jax.Array,
    do_sample: jax.Array,
    max_new: jax.Array = 0,
) -> DecodeState:
    """Transfer-thin burst insert: per-lane in-graph prompt assembly (the
    cond latents are usually the SAME device buffer broadcast across lanes —
    one voice, many chunks), then the batched prefill."""
    dt = jnp.bfloat16 if cfg.kv_int8 else state.cache.k.dtype
    embeds = jax.vmap(
        lambda c, i, n: _assemble_prompt(params, cfg, c, i, n)
    )(cond, ids, n_ids).astype(dt)
    lengths = cond.shape[1] + n_ids + 1
    # padding lanes (slot == num_slots) carry n_ids=0 -> length C+1; their
    # scatters drop, so the value is irrelevant — but zero the length so the
    # attention mask stays all-false exactly like the embeds path
    lengths = jnp.where(slots < state.seq_lens.shape[0], lengths, 0)
    return _insert_batch_body(
        params, cfg, state, embeds, lengths, slots,
        temperature, top_p, top_k, repetition_penalty, do_sample, max_new,
    )


def _slice_state(state: DecodeState, sb: int) -> DecodeState:
    """View of the first `sb` slots. The cache is NOT sliced (its rows are
    position-pinned; gpt_decode_step reads/writes only the first `sb` slot
    rows based on the sliced token vector's length)."""
    return DecodeState(
        cache=state.cache,
        sampling=SamplingState(*(a[:sb] for a in state.sampling)),
        seq_lens=state.seq_lens[:sb],
        audio_pos=state.audio_pos[:sb],
        last_token=state.last_token[:sb],
        active=state.active[:sb],
        done=state.done[:sb],
        tokens_buf=state.tokens_buf[:sb],
        latents_buf=state.latents_buf[:sb],
        n_generated=state.n_generated[:sb],
        rng=state.rng,
    )


def _merge_state(full: DecodeState, sub: DecodeState) -> DecodeState:
    """Write a sliced-state result back into the full state (slices start at
    slot 0, so every merge is a leading dynamic_update_slice — in-place under
    donation)."""

    def put(f, s):
        return lax.dynamic_update_slice(f, s, (0,) * f.ndim)

    return DecodeState(
        cache=sub.cache,
        sampling=SamplingState(*(put(f, s) for f, s in zip(full.sampling, sub.sampling))),
        seq_lens=put(full.seq_lens, sub.seq_lens),
        audio_pos=put(full.audio_pos, sub.audio_pos),
        last_token=put(full.last_token, sub.last_token),
        active=put(full.active, sub.active),
        done=put(full.done, sub.done),
        tokens_buf=put(full.tokens_buf, sub.tokens_buf),
        latents_buf=put(full.latents_buf, sub.latents_buf),
        n_generated=put(full.n_generated, sub.n_generated),
        rng=sub.rng,
    )


def _decode_steps_impl(
    params: dict, cfg: XTTSGPTConfig, state: DecodeState, n_steps: int = 1,
    len_bound: int | None = None, slot_bound: int | None = None,
) -> DecodeState:
    """Run `n_steps` decode iterations over all slots (inactive slots are
    masked out of the bookkeeping; their compute is fixed-shape overhead).
    `len_bound` (static) caps the attention read length; the caller must
    guarantee max(seq_lens) + n_steps < len_bound. `slot_bound` (static)
    restricts the step to the first `slot_bound` slots — the coordinator
    always fills the lowest free slot, so when few sequences are live the
    step skips the dead high slots' KV reads and compute entirely; slots
    >= slot_bound must not be active."""

    def one_step(state: DecodeState) -> DecodeState:
        was_active = state.active
        h, cache = gpt_decode_step(
            params, cfg, state.last_token, state.audio_pos, state.seq_lens, state.cache,
            len_bound=len_bound,
        )
        logits, latent = heads(params, h)
        rng, sub = jax.random.split(state.rng)
        tokens, sampling = sample_tokens(logits, state.sampling, sub)
        sampling = sampling._replace(
            seen=jnp.where(was_active[:, None], sampling.seen, state.sampling.seen)
        )
        return _record_and_advance(cfg, state, latent, tokens, sampling, cache, was_active, rng)

    num_slots = state.seq_lens.shape[0]
    sliced = slot_bound is not None and slot_bound < num_slots
    full = state
    if sliced:
        state = _slice_state(state, slot_bound)
    if n_steps == 1:
        state = one_step(state)
    else:
        state = lax.fori_loop(0, n_steps, lambda _, st: one_step(st), state)
    if sliced:
        state = _merge_state(full, state)
    return state


decode_steps = partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "len_bound", "slot_bound"),
    donate_argnames=("state",),
)(_decode_steps_impl)


def pack_status(state: DecodeState) -> jax.Array:
    """One int32 per slot: n_generated | active<<14 | done<<15 — a single
    small array so one host fetch (one tunnel RTT) carries all step status.
    init_decode_state asserts max_audio_tokens fits the 14-bit field."""
    return (
        state.n_generated
        + (state.active.astype(jnp.int32) << 14)
        + (state.done.astype(jnp.int32) << 15)
    )


def unpack_status(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = packed & 0x3FFF
    active = (packed >> 14) & 1
    done = (packed >> 15) & 1
    return active.astype(bool), done.astype(bool), n


@partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "len_bound", "slot_bound"),
    donate_argnames=("state",),
)
def decode_steps_status(
    params: dict, cfg: XTTSGPTConfig, state: DecodeState, n_steps: int = 1,
    len_bound: int | None = None, slot_bound: int | None = None,
) -> tuple[DecodeState, jax.Array]:
    """decode_steps plus the packed status vector, computed in-graph."""
    state = _decode_steps_impl(params, cfg, state, n_steps, len_bound, slot_bound)
    return state, pack_status(state)


@partial(jax.jit, donate_argnames=("state",))
def migrate_slot(state: DecodeState, src: jax.Array, dst: jax.Array) -> DecodeState:
    """Move slot `src`'s ENTIRE decode state (KV rows + scales, sampling
    config + seen mask, counters, token/latent buffers) into slot `dst`
    (which must be free) and clear `src`.

    Why: insertion is lowest-free, but long-lived sequences strand at high
    indices as their neighbors finish — which pins `slot_bound` at full
    width even when few slots are live. Compaction re-clusters live slots
    low so the decode step can run the narrow slot-bucket program (the KV
    read scales with the bound, not the live count). Cost: ~60 MB of
    device-local copies at production size (~0.1 ms) — trivial next to one
    decode block. Caller contract: src is live, dst is free, src != dst;
    any packed-status vector fetched before the move indexes stale slots."""

    def mv(a, axis=0):
        row = lax.dynamic_slice_in_dim(a, src, 1, axis)
        return lax.dynamic_update_slice_in_dim(a, row, dst, axis)

    cache = state.cache
    new_cache = KVCache(
        mv(cache.k, 1),
        mv(cache.v, 1),
        mv(cache.k_scale, 1) if cache.k_scale is not None else None,
        mv(cache.v_scale, 1) if cache.v_scale is not None else None,
    )
    sampling = SamplingState(*(mv(a) for a in state.sampling))
    clear_src = jnp.arange(state.seq_lens.shape[0]) != src
    return DecodeState(
        cache=new_cache,
        sampling=sampling,
        seq_lens=mv(state.seq_lens),
        audio_pos=mv(state.audio_pos),
        last_token=mv(state.last_token),
        active=mv(state.active) & clear_src,
        done=mv(state.done) & clear_src,
        tokens_buf=mv(state.tokens_buf),
        latents_buf=mv(state.latents_buf),
        n_generated=jnp.where(clear_src, mv(state.n_generated), 0),
        rng=state.rng,
    )


@partial(jax.jit, donate_argnames=("state",))
def release_slot(state: DecodeState, slot: jax.Array) -> DecodeState:
    onehot = jnp.arange(state.seq_lens.shape[0]) == slot
    return state._replace(
        active=state.active & ~onehot,
        done=state.done & ~onehot,
        n_generated=jnp.where(onehot, 0, state.n_generated),
    )


@partial(jax.jit, donate_argnames=("state",))
def release_slots(state: DecodeState, mask: jax.Array) -> DecodeState:
    """Free every slot where mask[s] is True (one dispatch per decode block
    instead of one per finished chunk)."""
    return state._replace(
        active=state.active & ~mask,
        done=state.done & ~mask,
        n_generated=jnp.where(mask, 0, state.n_generated),
    )


def status(state: DecodeState) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Small host transfer: (active, done, n_generated)."""
    active, done, n_gen = jax.device_get((state.active, state.done, state.n_generated))
    return np.asarray(active), np.asarray(done), np.asarray(n_gen)


def harvest(state: DecodeState, slot: int) -> tuple[np.ndarray, np.ndarray]:
    """Fetch a finished slot's (tokens, latents), trimmed to its length.
    The trailing stop token (if any) is dropped from tokens; latents keep the
    step that predicted it (reference slice semantics, XTTSv2.py:685-687)."""
    # fetch full fixed-shape rows (keeps every transfer the same compiled
    # shape) and trim host-side
    n, tokens, latents = jax.device_get(
        (state.n_generated[slot], state.tokens_buf[slot], state.latents_buf[slot])
    )
    n = int(n)
    return np.asarray(tokens)[:n], np.asarray(latents)[:n]


def harvest_tokens(state: DecodeState, slot: int, n: int) -> np.ndarray:
    """Fetch only a finished slot's token row (~2.4 KB — one cheap transfer);
    the [T, D] float latents stay on device (see harvest_latents_device)."""
    tokens = jax.device_get(state.tokens_buf[slot])
    return np.asarray(tokens)[:n]


def harvest_latents_device(state: DecodeState, slot: int) -> jax.Array:
    """Gather a finished slot's full latent row [T_audio, D] into a fresh
    device buffer (no host transfer). The copy is independent of the decode
    state, so the slot can be released and refilled while a downstream
    program (the vocoder) consumes the row; positions >= n hold stale values
    and must be masked by the consumer."""
    return state.latents_buf[slot]
