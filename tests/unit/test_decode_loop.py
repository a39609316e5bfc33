"""Decode-loop runtime tests: slot bookkeeping, continuous batching and
latent accumulation, verified against a manual step-by-step loop."""
import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import (
    build_prompt_embeds,
    gpt_decode_step,
    gpt_prefill,
    heads,
    init_gpt_params,
    make_kv_cache,
)
from auralis_tpu.runtime.engine_core import DecodeEngine, SamplingOptions
from auralis_tpu.runtime.sampler import init_sampling_state, sample_tokens


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    return cfg, params


def _manual_greedy(params, cfg, embeds: np.ndarray):
    """Reference loop: single slot, greedy, no engine bookkeeping."""
    cache = make_kv_cache(cfg, 1, dtype=jnp.float32)
    length = embeds.shape[0]
    pad = 64
    padded = np.zeros((pad, cfg.hidden_size), np.float32)
    padded[:length] = embeds
    h, cache = gpt_prefill(params, cfg, jnp.asarray(padded), jnp.int32(length), jnp.int32(0), cache)
    tokens, latents = [], []
    logits, latent = heads(params, h[None])
    seen = np.zeros(cfg.num_audio_tokens, bool)
    if cfg.reppen_penalize_prompt_ids:
        # reference prompt scope: ids {1, start} penalized from step 0
        seen[1] = True
        seen[cfg.start_audio_token] = True

    def greedy_penalized(logits_row):
        row = np.asarray(logits_row, np.float64).copy()
        pen = np.where(row > 0, row / 5.0, row * 5.0)
        row = np.where(seen, pen, row)
        return int(np.argmax(row))

    tok = greedy_penalized(logits[0])
    seen[tok] = True
    tokens.append(tok)
    latents.append(np.asarray(latent[0]))
    seq_len, audio_pos = length, 1
    while tok != cfg.stop_audio_token and len(tokens) < cfg.max_audio_tokens:
        h, cache = gpt_decode_step(
            params, cfg,
            jnp.asarray([tok], jnp.int32),
            jnp.asarray([audio_pos], jnp.int32),
            jnp.asarray([seq_len], jnp.int32),
            cache,
        )
        logits, latent = heads(params, h)
        tok = greedy_penalized(logits[0])
        seen[tok] = True
        tokens.append(tok)
        latents.append(np.asarray(latent[0]))
        seq_len += 1
        audio_pos += 1
    if tokens and tokens[-1] == cfg.stop_audio_token:
        tokens = tokens[:-1]
    else:
        latents = latents[: len(tokens)]
    return np.asarray(tokens), np.stack(latents)


def _prompt(params, cfg, rng, text_len):
    cond = 0.3 * rng.standard_normal((cfg.num_cond_latents, cfg.hidden_size)).astype(np.float32)
    ids = rng.integers(3, cfg.number_text_tokens - 1, size=text_len)
    return np.asarray(build_prompt_embeds(params, cfg, cond, ids, bos_id=1, eos_id=2))


def _run_engine(params, cfg, prompts, **engine_kw):
    async def go():
        engine = DecodeEngine(params, cfg, cache_dtype=jnp.float32, **engine_kw)
        opts = SamplingOptions(do_sample=False, repetition_penalty=5.0)
        results = await asyncio.gather(*(engine.generate(p, opts) for p in prompts))
        await engine.shutdown()
        return results

    return asyncio.run(go())


def test_single_sequence_matches_manual(model):
    cfg, params = model
    rng = np.random.default_rng(0)
    prompt = _prompt(params, cfg, rng, text_len=6)
    want_tokens, want_latents = _manual_greedy(params, cfg, prompt)

    (got_tokens, got_latents), = _run_engine(params, cfg, [prompt], num_slots=4)
    np.testing.assert_array_equal(got_tokens, want_tokens)
    assert got_latents.shape[0] >= len(got_tokens)
    np.testing.assert_allclose(
        got_latents[: want_latents.shape[0]], want_latents, rtol=1e-4, atol=1e-4
    )


def test_concurrent_requests_do_not_cross_contaminate(model):
    cfg, params = model
    rng = np.random.default_rng(1)
    prompts = [_prompt(params, cfg, rng, text_len=n) for n in (4, 7, 10)]
    singles = [_manual_greedy(params, cfg, p) for p in prompts]

    results = _run_engine(params, cfg, prompts, num_slots=4, steps_per_sync=4)
    for (tokens, latents), (want_t, want_l) in zip(results, singles):
        np.testing.assert_array_equal(tokens, want_t)
        np.testing.assert_allclose(latents[: want_l.shape[0]], want_l, rtol=1e-4, atol=1e-4)


def test_more_requests_than_slots(model):
    cfg, params = model
    rng = np.random.default_rng(2)
    prompts = [_prompt(params, cfg, rng, text_len=3 + i) for i in range(5)]
    results = _run_engine(params, cfg, prompts, num_slots=2, steps_per_sync=2)
    assert len(results) == 5
    for tokens, latents in results:
        assert 0 < latents.shape[0] <= cfg.max_audio_tokens
        assert latents.shape[1] == cfg.hidden_size


def test_sampler_properties():
    state = init_sampling_state(3, 50)
    state = state._replace(
        temperature=jnp.asarray([1.0, 1.0, 1.0]),
        top_k=jnp.asarray([1, 0, 5], jnp.int32),
        top_p=jnp.asarray([1.0, 1.0, 1.0]),
        do_sample=jnp.asarray([True, False, True]),
        repetition_penalty=jnp.ones(3),
    )
    logits = jnp.asarray(np.tile(np.linspace(-2, 2, 50), (3, 1)).astype(np.float32))
    tokens, new_state = sample_tokens(logits, state, jax.random.PRNGKey(0))
    assert int(tokens[0]) == 49  # top_k=1 => argmax
    assert int(tokens[1]) == 49  # greedy
    assert int(tokens[2]) >= 45  # top_k=5 restricts to the 5 best
    assert bool(new_state.seen[0, int(tokens[0])])


def test_repetition_penalty_suppresses_seen():
    from auralis_tpu.runtime.sampler import apply_repetition_penalty

    logits = jnp.asarray([[2.0, 1.0, -1.0]])
    seen = jnp.asarray([[True, False, True]])
    pen = apply_repetition_penalty(logits, seen, jnp.asarray([2.0]))
    np.testing.assert_allclose(np.asarray(pen[0]), [1.0, 1.0, -2.0])


def test_slot_bound_matches_full_width():
    """decode_steps with slot_bound must produce bit-identical results for
    the live (low) slots and leave high slots untouched."""
    import jax
    import jax.numpy as jnp
    from auralis_tpu.models.xttsv2.config import tiny_test_config
    from auralis_tpu.models.xttsv2.gpt import init_gpt_params
    from auralis_tpu.runtime.decode_loop import (
        decode_steps, init_decode_state, insert_sequence,
    )

    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    embeds = jnp.asarray(
        0.3 * rng.standard_normal((16, cfg.hidden_size)), jnp.float32
    )

    def build():
        st = init_decode_state(cfg, 4, jax.random.PRNGKey(5), dtype=jnp.float32)
        # one live sequence in slot 0; slots 2-3 stay dead
        return insert_sequence(
            params, cfg, st, embeds, jnp.int32(14), jnp.int32(0),
            jnp.float32(0.75), jnp.float32(0.85), jnp.int32(50),
            jnp.float32(2.0), jnp.bool_(True),
        )

    full = decode_steps(params, cfg, build(), n_steps=4, len_bound=32)
    bounded = decode_steps(
        params, cfg, build(), n_steps=4, len_bound=32, slot_bound=2
    )
    for name in ("last_token", "seq_lens", "n_generated", "active", "done"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full, name)), np.asarray(getattr(bounded, name)), name
        )
    np.testing.assert_allclose(
        np.asarray(full.latents_buf[0]), np.asarray(bounded.latents_buf[0]),
        rtol=0, atol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(full.tokens_buf), np.asarray(bounded.tokens_buf)
    )


def test_unroll_layers_matches_fori():
    """cfg.unroll_layers compiles the layer loop as straight-line code; the
    math must match the lax.fori_loop path exactly (prefill + decode)."""
    import dataclasses

    from auralis_tpu.models.xttsv2.config import tiny_test_config
    from auralis_tpu.models.xttsv2.gpt import (
        gpt_decode_step,
        gpt_prefill,
        heads,
        init_gpt_params,
        make_kv_cache,
    )

    base = tiny_test_config().gpt
    params = init_gpt_params(base, jax.random.PRNGKey(0), dtype=jnp.float32)
    embeds = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((32, base.hidden_size)),
        jnp.float32,
    )
    outs = {}
    for unroll in (False, True):
        cfg = dataclasses.replace(base, unroll_layers=unroll)
        cache = make_kv_cache(cfg, 2, dtype=jnp.float32)
        h, cache = gpt_prefill(
            params, cfg, embeds, jnp.int32(30), jnp.int32(0), cache
        )
        seq_lens = jnp.asarray([29, 0], jnp.int32)
        h2, cache = gpt_decode_step(
            params, cfg, jnp.asarray([5, 0], jnp.int32),
            jnp.asarray([1, 0], jnp.int32), seq_lens, cache, len_bound=64,
        )
        logits, latent = heads(params, h2)
        outs[unroll] = (np.asarray(h), np.asarray(logits), np.asarray(latent))
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_max_new_tokens_caps_generation():
    """Per-request max_new_tokens (vLLM max_tokens parity; the reference
    hardcodes its per-chunk cap): a capped slot stops at exactly the cap
    while an uncapped one runs longer, and the capped prefix is identical
    under greedy decoding."""
    import asyncio

    from auralis_tpu.runtime.engine_core import DecodeEngine, SamplingOptions

    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    embeds = np.asarray(
        0.3 * np.random.default_rng(5).standard_normal((10, cfg.hidden_size)),
        np.float32,
    )

    async def run(max_new):
        de = DecodeEngine(params, cfg, num_slots=2)
        try:
            tokens, _ = await de.generate(
                embeds, SamplingOptions(do_sample=False, max_new_tokens=max_new)
            )
            return list(np.asarray(tokens))
        finally:
            await de.shutdown()

    free = asyncio.run(run(0))
    capped = asyncio.run(run(4))
    assert len(capped) == 4 <= len(free)
    assert free[:4] == capped


def test_max_new_tokens_through_public_api():
    """TTSRequest.max_new_tokens flows through phase 1 into the decode
    runtime: capped audio is shorter than uncapped for the same text."""
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
    from helpers import build_tiny_engine, sine_wav

    from auralis_tpu import TTS, TTSRequest

    import tempfile

    voice = sine_wav(_Path(tempfile.mkdtemp()) / "v.wav")
    engine = build_tiny_engine(max_concurrency=2)
    tts = TTS(scheduler_max_concurrency=2).with_engine(engine)
    try:
        kw = dict(
            text="hello world this is a capping test.",
            speaker_files=[voice], language="en", do_sample=False,
        )
        capped = tts.generate_speech(TTSRequest(**kw, max_new_tokens=6))
        free = tts.generate_speech(TTSRequest(**kw))
        assert len(capped.array) < len(free.array)
    finally:
        tts.loop.run_until_complete(tts.shutdown())
