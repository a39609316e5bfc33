"""Transfer-thin insert parity: the TokenPrompt path (device cond + ~2 KB of
ids, prompt assembled in-graph) must reproduce the host-built-embeddings path
exactly — greedy tokens bit-equal, latents bit-equal (f32 CPU)."""
import asyncio
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_tokenizer

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import build_prompt_embeds, init_gpt_params
from auralis_tpu.runtime.decode_loop import (
    decode_steps,
    init_decode_state,
    insert_sequence,
    insert_sequence_tokens,
    insert_sequences_tokens,
)
from auralis_tpu.runtime.engine_core import DecodeEngine, SamplingOptions, TokenPrompt


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    return cfg, params


def _sampling_args(greedy=True):
    return (
        jnp.float32(0.75), jnp.float32(0.85), jnp.int32(50),
        jnp.float32(5.0), jnp.bool_(not greedy),
    )


def test_token_insert_matches_embeds_insert(model):
    cfg, params = model
    rng = np.random.default_rng(0)
    cond = rng.standard_normal((cfg.num_cond_latents, cfg.hidden_size)).astype(
        np.float32
    ) * 0.3
    text_ids = [5, 17, 33, 9, 41]
    bos, eos = 2, 3

    # host path: full embeds built by build_prompt_embeds, zero-padded
    emb = np.asarray(build_prompt_embeds(params, cfg, cond, text_ids, bos, eos))
    length = emb.shape[0]
    bucket = 64
    padded = np.zeros((bucket, cfg.hidden_size), np.float32)
    padded[:length] = emb
    s1 = init_decode_state(cfg, 2, jax.random.PRNGKey(1), dtype=jnp.float32)
    s1 = insert_sequence(
        params, cfg, s1, jnp.asarray(padded), jnp.int32(length), jnp.int32(0),
        *_sampling_args(),
    )
    s1 = decode_steps(params, cfg, s1, n_steps=6)

    # tokens path: device cond + padded ids, assembled in-graph
    tb = bucket - cfg.num_cond_latents
    ids_full = np.zeros((tb,), np.int32)
    ids_full[: len(text_ids) + 2] = [bos, *text_ids, eos]
    s2 = init_decode_state(cfg, 2, jax.random.PRNGKey(1), dtype=jnp.float32)
    s2 = insert_sequence_tokens(
        params, cfg, s2, jnp.asarray(cond), jnp.asarray(ids_full),
        jnp.int32(len(text_ids) + 2), jnp.int32(0), *_sampling_args(),
    )
    s2 = decode_steps(params, cfg, s2, n_steps=6)

    n1, n2 = int(s1.n_generated[0]), int(s2.n_generated[0])
    assert n1 == n2
    np.testing.assert_array_equal(
        np.asarray(s1.tokens_buf[0, :n1]), np.asarray(s2.tokens_buf[0, :n2])
    )
    np.testing.assert_allclose(
        np.asarray(s1.latents_buf[0, :n1]), np.asarray(s2.latents_buf[0, :n2]),
        rtol=0, atol=0,
    )


def test_token_burst_matches_sequential(model):
    cfg, params = model
    rng = np.random.default_rng(1)
    cond = rng.standard_normal((cfg.num_cond_latents, cfg.hidden_size)).astype(
        np.float32
    ) * 0.3
    chunks = [[5, 7, 9], [10, 11, 12, 13, 14], [20, 21]]
    bos, eos = 2, 3
    bucket = 64
    tb = bucket - cfg.num_cond_latents
    cond_dev = jnp.asarray(cond)

    def padded_ids(ids):
        row = np.zeros((tb,), np.int32)
        row[: len(ids) + 2] = [bos, *ids, eos]
        return row, len(ids) + 2

    # sequential tokens inserts
    s1 = init_decode_state(cfg, 4, jax.random.PRNGKey(2), dtype=jnp.float32)
    for slot, ids in enumerate(chunks):
        row, n = padded_ids(ids)
        s1 = insert_sequence_tokens(
            params, cfg, s1, cond_dev, jnp.asarray(row), jnp.int32(n),
            jnp.int32(slot), *_sampling_args(),
        )
    s1 = decode_steps(params, cfg, s1, n_steps=5)

    # one burst insert (padded to K bucket 4 with slot=num_slots)
    rows, ns = zip(*(padded_ids(i) for i in chunks))
    k = 4
    ids_mat = np.stack(list(rows) + [np.zeros((tb,), np.int32)])
    n_vec = np.asarray(list(ns) + [0], np.int32)
    slots = np.asarray([0, 1, 2, 4], np.int32)  # 4 == num_slots -> dropped
    s2 = init_decode_state(cfg, 4, jax.random.PRNGKey(2), dtype=jnp.float32)
    s2 = insert_sequences_tokens(
        params, cfg, s2, jnp.stack([cond_dev] * k), jnp.asarray(ids_mat),
        jnp.asarray(n_vec), jnp.asarray(slots),
        jnp.full((k,), 0.75), jnp.full((k,), 0.85),
        jnp.full((k,), 50, jnp.int32), jnp.full((k,), 5.0),
        jnp.zeros((k,), bool),  # greedy
    )
    s2 = decode_steps(params, cfg, s2, n_steps=5)

    for slot in range(3):
        n1, n2 = int(s1.n_generated[slot]), int(s2.n_generated[slot])
        assert n1 == n2, (slot, n1, n2)
        np.testing.assert_array_equal(
            np.asarray(s1.tokens_buf[slot, :n1]),
            np.asarray(s2.tokens_buf[slot, :n2]),
        )
    assert not bool(s2.active[3])  # padding lane touched nothing


def test_engine_accepts_token_prompt(model):
    """DecodeEngine.generate with a TokenPrompt resolves like the embeds
    form (same greedy tokens), through the real runner incl. burst inserts."""
    cfg, params = model
    rng = np.random.default_rng(3)
    cond = rng.standard_normal((cfg.num_cond_latents, cfg.hidden_size)).astype(
        np.float32
    ) * 0.3
    text_ids = [6, 8, 10, 12]
    bos, eos = 2, 3
    emb = np.asarray(build_prompt_embeds(params, cfg, cond, text_ids, bos, eos))
    opts = SamplingOptions(do_sample=False)

    async def run(prompt):
        eng = DecodeEngine(params, cfg, num_slots=4, cache_dtype=jnp.float32)
        try:
            return await eng.generate(prompt, opts)
        finally:
            await eng.shutdown()

    tokens_e, latents_e = asyncio.run(
        run(emb)
    )
    tp = TokenPrompt(
        cond=jnp.asarray(cond),
        ids=np.asarray([bos, *text_ids, eos], np.int32),
    )
    tokens_t, latents_t = asyncio.run(run(tp))
    np.testing.assert_array_equal(tokens_e, tokens_t)
    np.testing.assert_allclose(latents_e, latents_t, rtol=0, atol=0)
