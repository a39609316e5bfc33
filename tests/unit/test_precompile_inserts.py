"""DecodeEngine.precompile_inserts must warm every tokens-path insert
program without observable effect: no live slots afterwards, rng restored
bit-exact, and a subsequent SAMPLED generation identical to an engine that
never precompiled (the burst no-ops ride scatter-drop lanes; the single
insert uses slot 0 and releases it; rng is snapshot/restored).

Motivation (r3 on-chip): warmup traffic cannot form the (prompt bucket x
burst size) program matrix deterministically — 16 concurrent short server
requests formed the first-ever (K=8, bucket 64) insert program mid-window
and stalled every request ~43 s on the remote-compile rig."""
import asyncio
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import init_gpt_params
from auralis_tpu.runtime.engine_core import (
    DecodeEngine,
    SamplingOptions,
    TokenPrompt,
)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    return cfg, params


def _prompt(cfg, seed=5):
    rng = np.random.default_rng(seed)
    cond = rng.standard_normal(
        (cfg.num_cond_latents, cfg.hidden_size)
    ).astype(np.float32) * 0.3
    return TokenPrompt(
        cond=jnp.asarray(cond), ids=np.asarray([2, 7, 9, 11, 3], np.int32)
    )


def test_precompile_inserts_is_observably_noop(model):
    cfg, params = model
    eng = DecodeEngine(params, cfg, num_slots=4, cache_dtype=jnp.float32, seed=3)
    rng_before = np.asarray(jax.device_get(eng.state.rng))
    eng.precompile_inserts(cond_len=cfg.num_cond_latents)
    # slot 0 is released (stale seq_lens is normal for released slots — the
    # next insert resets it, exactly as after a real request drains)
    assert not bool(np.asarray(eng.state.active).any())
    assert not bool(np.asarray(eng.state.done).any())
    assert not eng._slot_owner
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(eng.state.rng)), rng_before
    )


def test_precompile_inserts_preserves_sampled_trajectories(model):
    """SAMPLED generation (rng-dependent) after precompile_inserts equals a
    fresh engine's — the rng snapshot/restore is what this pins."""
    cfg, params = model
    opts = SamplingOptions(do_sample=True, temperature=0.8, top_k=20)

    async def run(precompile: bool):
        eng = DecodeEngine(
            params, cfg, num_slots=4, cache_dtype=jnp.float32, seed=9
        )
        if precompile:
            eng.precompile_inserts(cond_len=cfg.num_cond_latents)
        try:
            return await eng.generate(_prompt(cfg), opts)
        finally:
            await eng.shutdown()

    tokens_a, _ = asyncio.run(run(False))
    tokens_b, _ = asyncio.run(run(True))
    np.testing.assert_array_equal(tokens_a, tokens_b)


def test_precompile_inserts_refuses_live_slots(model):
    """The single-insert program clobbers slot 0's cache rows, so the guard
    must hold whenever any slot is owned or queued."""
    cfg, params = model
    eng = DecodeEngine(params, cfg, num_slots=4, cache_dtype=jnp.float32)
    eng._slot_owner[0] = object()  # simulate a live request
    try:
        with pytest.raises(AssertionError, match="before serving"):
            eng.precompile_inserts(cond_len=cfg.num_cond_latents)
    finally:
        eng._slot_owner.clear()
