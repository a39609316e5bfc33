"""insert_sequences (burst prefill): greedy-path equality with sequential
insert_sequence calls, padding-lane no-op via mode=drop scatters, and the
int8-KV variant. The batched program exists so a request burst streams the
GPT weights from HBM once instead of once per chunk (TTFA budget)."""
import dataclasses
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import init_gpt_params
from auralis_tpu.runtime.decode_loop import (
    init_decode_state,
    insert_sequence,
    insert_sequences,
)

GREEDY = dict(
    temperature=jnp.float32(0.75), top_p=jnp.float32(0.85),
    top_k=jnp.int32(50), repetition_penalty=jnp.float32(5.0),
    do_sample=jnp.bool_(False),
)


def _setup(kv_int8=False, slots=4):
    cfg = tiny_test_config().gpt
    if kv_int8:
        cfg = dataclasses.replace(cfg, kv_int8=True)
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    dtype = jnp.int8 if kv_int8 else jnp.float32
    state = init_decode_state(cfg, slots, jax.random.PRNGKey(1), dtype=dtype)
    return cfg, params, state


def _prompts(cfg, k, t_pad=32, seed=7):
    keys = jax.random.split(jax.random.PRNGKey(seed), k)
    embeds = jnp.stack([
        jax.random.normal(keys[i], (t_pad, cfg.hidden_size), jnp.float32)
        for i in range(k)
    ])
    lengths = jnp.asarray([t_pad - 2 - i for i in range(k)], jnp.int32)
    return embeds, lengths


def _state_equal(a, b, atol=0.0):
    np.testing.assert_array_equal(np.asarray(a.seq_lens), np.asarray(b.seq_lens))
    np.testing.assert_array_equal(np.asarray(a.active), np.asarray(b.active))
    np.testing.assert_array_equal(np.asarray(a.n_generated), np.asarray(b.n_generated))
    np.testing.assert_array_equal(np.asarray(a.tokens_buf), np.asarray(b.tokens_buf))
    if atol:
        np.testing.assert_allclose(
            np.asarray(a.cache.k), np.asarray(b.cache.k), atol=atol, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(a.latents_buf), np.asarray(b.latents_buf), atol=atol, rtol=0
        )
    else:
        np.testing.assert_array_equal(np.asarray(a.cache.k), np.asarray(b.cache.k))
        np.testing.assert_array_equal(np.asarray(a.cache.v), np.asarray(b.cache.v))


@pytest.mark.parametrize("kv_int8", [False, True])
def test_batched_matches_sequential_greedy(kv_int8):
    cfg, params, state_a = _setup(kv_int8=kv_int8)
    _, _, state_b = _setup(kv_int8=kv_int8)
    k = 3
    embeds, lengths = _prompts(cfg, k)
    kb = jnp.repeat

    for i in range(k):
        state_a = insert_sequence(
            params, cfg, state_a, embeds[i], lengths[i], jnp.int32(i), **GREEDY
        )
    state_b = insert_sequences(
        params, cfg, state_b, embeds, lengths, jnp.arange(k, dtype=jnp.int32),
        temperature=jnp.full((k,), 0.75, jnp.float32),
        top_p=jnp.full((k,), 0.85, jnp.float32),
        top_k=jnp.full((k,), 50, jnp.int32),
        repetition_penalty=jnp.full((k,), 5.0, jnp.float32),
        do_sample=jnp.zeros((k,), bool),
    )
    # greedy: identical first tokens; caches bit-equal (same math, different
    # batching — XLA may reassociate, so allow tiny float slack on f32)
    _state_equal(state_a, state_b, atol=1e-4 if not kv_int8 else 0.0)


def test_padding_lanes_touch_nothing():
    cfg, params, state = _setup(slots=4)
    k = 2
    embeds, lengths = _prompts(cfg, k)
    # pad the burst to K=4 with slot=num_slots lanes (mode=drop target)
    embeds_p = jnp.concatenate([embeds, jnp.zeros_like(embeds)])
    lengths_p = jnp.concatenate([lengths, jnp.zeros((2,), jnp.int32)])
    slots_p = jnp.asarray([0, 1, 4, 4], jnp.int32)

    out = insert_sequences(
        params, cfg, state, embeds_p, lengths_p, slots_p,
        temperature=jnp.full((4,), 0.75, jnp.float32),
        top_p=jnp.full((4,), 0.85, jnp.float32),
        top_k=jnp.full((4,), 50, jnp.int32),
        repetition_penalty=jnp.full((4,), 5.0, jnp.float32),
        do_sample=jnp.zeros((4,), bool),
    )
    active = np.asarray(out.active)
    assert active[:2].all() and not active[2:].any()
    # untouched slots keep zeroed KV
    assert np.asarray(out.cache.k)[:, 2:].max() == 0


def test_sampled_burst_is_valid():
    """Sampled path: tokens in-vocab, counters advance (token identity with
    the sequential path is NOT expected — one rng split covers the burst)."""
    cfg, params, state = _setup(slots=4)
    k = 4
    embeds, lengths = _prompts(cfg, k)
    out = insert_sequences(
        params, cfg, state, embeds, lengths, jnp.arange(k, dtype=jnp.int32),
        temperature=jnp.full((k,), 0.75, jnp.float32),
        top_p=jnp.full((k,), 0.85, jnp.float32),
        top_k=jnp.full((k,), 50, jnp.int32),
        repetition_penalty=jnp.full((k,), 5.0, jnp.float32),
        do_sample=jnp.ones((k,), bool),
    )
    toks = np.asarray(out.tokens_buf)[:, 0]
    assert ((0 <= toks) & (toks < cfg.num_audio_tokens)).all()
    assert (np.asarray(out.n_generated)[:k] == 1).all()
