"""Slot compaction + slot-bucket stepping.

The decode step's KV read scales with the static slot bound, not the live
count, so low-occupancy phases want the narrow (quarter/half-width) slot
programs. Insertion is lowest-free, but drain stragglers strand at high
indices; `decode_loop.migrate_slot` moves a live slot's ENTIRE state
(KV rows + scales, sampling, counters, token/latent buffers) into a free
low slot, and the runner's `_compact_slots` applies it so `_slot_bucket`
narrows during drains. These tests pin: (1) migration moves everything —
a migrated greedy sequence finishes with results identical to one that
always sat in the destination slot; (2) the runner compacts stranded
survivors and the survivor's output is unchanged.
"""
import asyncio
import sys
import time
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import build_prompt_embeds, init_gpt_params
from auralis_tpu.runtime.decode_loop import (
    decode_steps,
    harvest,
    init_decode_state,
    insert_sequence,
    migrate_slot,
    status,
)
from auralis_tpu.runtime.engine_core import DecodeEngine, SamplingOptions


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    return cfg, params


def _prompt(params, cfg, seed=0, text_len=6):
    rng = np.random.default_rng(seed)
    cond = 0.3 * rng.standard_normal(
        (cfg.num_cond_latents, cfg.hidden_size)
    ).astype(np.float32)
    ids = rng.integers(3, cfg.number_text_tokens - 1, size=text_len)
    return np.asarray(build_prompt_embeds(params, cfg, cond, ids, bos_id=1, eos_id=2))


def _insert_greedy(params, cfg, state, embeds, slot):
    pad = np.zeros((64, cfg.hidden_size), np.float32)
    pad[: embeds.shape[0]] = embeds
    return insert_sequence(
        params, cfg, state, jnp.asarray(pad), jnp.int32(embeds.shape[0]),
        jnp.int32(slot), jnp.float32(1.0), jnp.float32(1.0), jnp.int32(0),
        jnp.float32(1.0), jnp.bool_(False),
    )


def _run_to_done(params, cfg, state, slot, migrate_after=None, dst=0):
    """Greedy-decode until `slot` finishes; optionally migrate slot->dst
    after `migrate_after` blocks and continue at the destination."""
    cur = slot
    blocks = 0
    for _ in range(cfg.max_audio_tokens + 4):
        active, done, n = status(state)
        if done[cur]:
            break
        state = decode_steps(params, cfg, state, n_steps=4, len_bound=128)
        blocks += 1
        if migrate_after is not None and blocks == migrate_after:
            state = migrate_slot(state, jnp.int32(cur), jnp.int32(dst))
            cur = dst
    active, done, n = status(state)
    assert done[cur]
    return harvest(state, cur)


def test_migrate_slot_moves_everything(model):
    """Sequence inserted HIGH, migrated LOW mid-decode == sequence that ran
    at the low slot the whole time (greedy; cache rows, sampling seen-mask,
    counters and buffers must all move or diverge)."""
    cfg, params = model
    embeds = _prompt(params, cfg, seed=3)

    state_a = init_decode_state(cfg, 4, jax.random.PRNGKey(1), dtype=jnp.float32)
    state_a = _insert_greedy(params, cfg, state_a, embeds, slot=0)
    want_tokens, want_latents = _run_to_done(params, cfg, state_a, slot=0)

    state_b = init_decode_state(cfg, 4, jax.random.PRNGKey(1), dtype=jnp.float32)
    state_b = _insert_greedy(params, cfg, state_b, embeds, slot=3)
    got_tokens, got_latents = _run_to_done(
        params, cfg, state_b, slot=3, migrate_after=2, dst=0
    )

    np.testing.assert_array_equal(got_tokens, want_tokens)
    np.testing.assert_allclose(got_latents, want_latents, atol=1e-5)


def test_migrate_clears_source_slot(model):
    cfg, params = model
    embeds = _prompt(params, cfg, seed=5)
    state = init_decode_state(cfg, 4, jax.random.PRNGKey(2), dtype=jnp.float32)
    state = _insert_greedy(params, cfg, state, embeds, slot=2)
    state = decode_steps(params, cfg, state, n_steps=2, len_bound=128)
    state = migrate_slot(state, jnp.int32(2), jnp.int32(0))
    active, done, n = status(state)
    assert active[0] and not active[2] and not done[2]
    assert n[0] >= 3 and n[2] == 0


@pytest.fixture()
def slow_blocks(monkeypatch):
    """Pad each decode-block dispatch by 30 ms so the tiny model is reliably
    mid-decode when the test cancels the low-slot requests."""
    import auralis_tpu.runtime.engine_core as ec

    real = ec.decode_steps_status

    def slow(*args, **kwargs):
        time.sleep(0.03)
        return real(*args, **kwargs)

    monkeypatch.setattr(ec, "decode_steps_status", slow)


def test_runner_compacts_stranded_survivor(model, slow_blocks):
    """Fill slots 0..5, cancel the five low requests mid-decode: the runner
    must migrate the stranded slot-5 survivor down (stats['migrations']),
    step it through a narrow slot bucket, and finish it with exactly the
    tokens a clean single-request engine produces."""
    cfg, params = model
    greedy = SamplingOptions(do_sample=False)
    prompts = [_prompt(params, cfg, seed=10 + i) for i in range(6)]

    async def clean():
        engine = DecodeEngine(params, cfg, cache_dtype=jnp.float32, num_slots=8)
        out = await engine.generate(prompts[5], greedy)
        await engine.shutdown()
        return out

    want_tokens, want_latents = asyncio.run(clean())

    async def with_compaction():
        engine = DecodeEngine(
            params, cfg, cache_dtype=jnp.float32, num_slots=8,
            slot_bucketing=True,
        )
        assert engine._slot_buckets() == (2, 4)
        tasks = [
            asyncio.ensure_future(engine.generate(p, greedy)) for p in prompts
        ]
        # wait until all six own slots (0..5), then cancel the low five
        t0 = time.monotonic()
        while len(engine._slot_owner) < 6:
            if time.monotonic() - t0 > 60:
                raise AssertionError("slots never filled")
            await asyncio.sleep(0.01)
        for t in tasks[:5]:
            t.cancel()
        out = await tasks[5]
        migrations = engine.stats["migrations"]
        await engine.shutdown()
        return out, migrations

    (got_tokens, got_latents), migrations = asyncio.run(with_compaction())
    assert migrations >= 1, "survivor was never compacted"
    np.testing.assert_array_equal(got_tokens, want_tokens)
    np.testing.assert_allclose(got_latents, want_latents, atol=1e-5)


def test_precompile_runs(model):
    """precompile() lowers+compiles the full program set without executing
    anything (state stays untouched) for both bucketing modes."""
    cfg, params = model

    async def go():
        engine = DecodeEngine(
            params, cfg, cache_dtype=jnp.float32, num_slots=8,
            slot_bucketing=True,
        )
        engine.precompile()
        active, done, n = status(engine.state)
        assert not active.any() and not done.any()
        # engine still serves normally afterwards
        out = await engine.generate(
            _prompt(params, cfg, seed=1), SamplingOptions(do_sample=False)
        )
        await engine.shutdown()
        return out

    tokens, latents = asyncio.run(go())
    assert len(tokens) >= 1


def test_streaming_survivor_migrates_cleanly(model, slow_blocks):
    """A STREAMING request that gets compacted mid-stream: snapshots keep
    flowing from its new slot and the final result equals a solo streaming
    run (greedy). Exercises _push_stream_snapshots + harvest across the
    owner-map remap."""
    cfg, params = model
    greedy = SamplingOptions(do_sample=False)
    prompts = [_prompt(params, cfg, seed=40 + i) for i in range(6)]

    async def run(streamed_engine_kwargs, cancel_others):
        engine = DecodeEngine(
            params, cfg, cache_dtype=jnp.float32, num_slots=8,
            **streamed_engine_kwargs,
        )
        q: asyncio.Queue = asyncio.Queue()
        others = []
        if cancel_others:
            # submit the five victims FIRST so the streamer (submitted last)
            # slots at index 5, then cancel them once everyone owns a slot —
            # the stranded streamer must migrate down
            others = [
                asyncio.ensure_future(engine.generate(p, greedy))
                for p in prompts[:5]
            ]
        task = asyncio.ensure_future(
            engine.generate(prompts[5], greedy, stream_queue=q)
        )
        if cancel_others:
            t0 = time.monotonic()
            while len(engine._slot_owner) < 6:
                if time.monotonic() - t0 > 60:
                    raise AssertionError("slots never filled")
                await asyncio.sleep(0.005)
            for t in others:
                t.cancel()
        snapshots = []
        while True:
            row, n, final = await q.get()
            snapshots.append(n)
            if final:
                break
        tokens, latents = await task
        migrations = engine.stats["migrations"]
        await engine.shutdown()
        return tokens, latents, snapshots, migrations

    want_tokens, want_latents, want_snaps, _ = asyncio.run(
        run(dict(), cancel_others=False)
    )
    got_tokens, got_latents, got_snaps, migrations = asyncio.run(
        run(dict(slot_bucketing=True), cancel_others=True)
    )
    assert migrations >= 1, "streamed survivor was never compacted"
    np.testing.assert_array_equal(got_tokens, want_tokens)
    np.testing.assert_allclose(got_latents, want_latents, atol=1e-5)
    # snapshot n-counts are monotonically non-decreasing and end at the total
    assert got_snaps == sorted(got_snaps)
    assert got_snaps[-1] == len(want_tokens) or got_snaps[-1] == len(want_tokens) + 1
