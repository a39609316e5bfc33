"""True request cancellation: an abandoned stream/request must stop its
decode work instead of burning device time to the stop token.

The reference has no cancellation story at all — an abandoned vLLM generator
keeps decoding its sequence to completion (XTTSv2.py:762-816). Here a
cancelled consumer (client disconnect, closed stream, aborted await) flags
the DecodeEngine pending; the runner drops it from the queue or releases its
slot on the next pass, and the freed slot serves new traffic with results
identical to a clean engine.
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
from helpers import build_tiny_engine, sine_wav

from auralis_tpu import TTS, TTSRequest
from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import build_prompt_embeds, init_gpt_params
from auralis_tpu.runtime.engine_core import DecodeEngine, SamplingOptions


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    return cfg, params


def _prompt(params, cfg, rng, text_len=6):
    cond = 0.3 * rng.standard_normal(
        (cfg.num_cond_latents, cfg.hidden_size)
    ).astype(np.float32)
    ids = rng.integers(3, cfg.number_text_tokens - 1, size=text_len)
    return np.asarray(build_prompt_embeds(params, cfg, cond, ids, bos_id=1, eos_id=2))


async def _wait_until(cond, timeout=60.0, msg="condition"):
    t0 = time.monotonic()
    while not cond():
        if time.monotonic() - t0 > timeout:
            raise AssertionError(f"timed out waiting for {msg}")
        await asyncio.sleep(0.02)


@pytest.fixture()
def slow_blocks(monkeypatch):
    """Pad each decode-block dispatch by 30 ms so the tiny model (which
    otherwise finishes a whole request in a few ms once programs are hot)
    is reliably mid-decode when the test cancels."""
    import auralis_tpu.runtime.engine_core as ec

    real = ec.decode_steps_status

    def slow(*args, **kwargs):
        time.sleep(0.03)
        return real(*args, **kwargs)

    monkeypatch.setattr(ec, "decode_steps_status", slow)


def test_cancel_while_queued_or_sloted_then_survivor_completes(model, slow_blocks):
    """Cancel request B while A runs on a 1-slot engine; A must complete
    with the clean-engine result and B's work must be dropped (queue entry
    removed or slot released — whichever stage the cancel caught it in)."""
    cfg, params = model
    rng = np.random.default_rng(1)
    prompt_a = _prompt(params, cfg, rng)
    prompt_b = _prompt(params, cfg, rng)
    greedy = SamplingOptions(do_sample=False)

    async def clean():
        engine = DecodeEngine(params, cfg, cache_dtype=jnp.float32, num_slots=1)
        out = await engine.generate(prompt_a, greedy)
        await engine.shutdown()
        return out

    want_tokens, want_latents = asyncio.run(clean())

    async def with_cancel():
        engine = DecodeEngine(params, cfg, cache_dtype=jnp.float32, num_slots=1)
        task_a = asyncio.ensure_future(engine.generate(prompt_a, greedy))
        task_b = asyncio.ensure_future(engine.generate(prompt_b, greedy))
        await asyncio.sleep(0.05)  # let the runner start / insert A
        task_b.cancel()
        tokens, latents = await task_a
        assert task_b.cancelled()
        # B must be fully gone: nothing queued, and the runner releases any
        # slot it may have briefly held
        await _wait_until(
            lambda: engine.num_active == 0 and not engine._queue,
            msg="engine quiescence after cancel",
        )
        await engine.shutdown()
        return tokens, latents

    got_tokens, got_latents = asyncio.run(with_cancel())
    np.testing.assert_array_equal(got_tokens, want_tokens)
    np.testing.assert_allclose(got_latents, want_latents, rtol=0, atol=0)


def test_cancel_in_slot_releases_and_slot_reuse_is_clean(model, slow_blocks):
    """Force the slot-release path: both requests hold slots, one is
    cancelled mid-decode. The survivor and a FOLLOW-UP request on the freed
    slot must both match clean-engine greedy results."""
    cfg, params = model
    rng = np.random.default_rng(2)
    prompt_a = _prompt(params, cfg, rng)
    prompt_b = _prompt(params, cfg, rng, text_len=8)
    prompt_c = _prompt(params, cfg, rng, text_len=5)
    greedy = SamplingOptions(do_sample=False)

    async def clean(prompt):
        engine = DecodeEngine(params, cfg, cache_dtype=jnp.float32, num_slots=2)
        out = await engine.generate(prompt, greedy)
        await engine.shutdown()
        return out

    want_a = asyncio.run(clean(prompt_a))
    want_c = asyncio.run(clean(prompt_c))

    async def go():
        engine = DecodeEngine(params, cfg, cache_dtype=jnp.float32, num_slots=2)
        task_a = asyncio.ensure_future(engine.generate(prompt_a, greedy))
        task_b = asyncio.ensure_future(engine.generate(prompt_b, greedy))
        # wait until BOTH occupy slots (A and B decode concurrently)
        await _wait_until(lambda: engine.num_active == 2, msg="both slots live")
        task_b.cancel()
        got_a = await task_a
        assert task_b.cancelled()
        await _wait_until(lambda: engine.num_active == 0, msg="slot release")
        # freed slot must serve new work with bit-identical results
        got_c = await engine.generate(prompt_c, greedy)
        await engine.shutdown()
        return got_a, got_c

    (got_a, got_c) = asyncio.run(go())
    np.testing.assert_array_equal(got_a[0], want_a[0])
    np.testing.assert_allclose(got_a[1], want_a[1], rtol=0, atol=0)
    np.testing.assert_array_equal(got_c[0], want_c[0])
    np.testing.assert_allclose(got_c[1], want_c[1], rtol=0, atol=0)


def test_stream_abandon_stops_decode_and_engine_serves_next(tmp_path):
    """TTS facade: closing a sync streaming generator mid-stream must stop
    the in-flight decode (slots drain instead of running to the stop token)
    and leave the engine fully serviceable."""
    engine = build_tiny_engine(max_concurrency=4)
    tts = TTS(scheduler_max_concurrency=4).with_engine(engine)
    wav_path = sine_wav(tmp_path / "spk.wav")
    long_text = (
        "hello world this is a test of speech. the quick brown fox jumps "
        "over the dog. one two three four five six seven. " * 3
    )
    try:
        stream = tts.generate_speech(
            TTSRequest(
                text=long_text, speaker_files=[wav_path], language="en",
                stream=True,
            )
        )
        first = next(stream)
        assert len(first.array) > 0
        stream.close()  # client walks away

        async def drained():
            await _wait_until(
                lambda: engine.decode_engine.num_active == 0
                and not engine.decode_engine._queue,
                msg="decode drain after stream abandon",
            )

        tts.loop.run_until_complete(drained())

        # the engine must still serve a fresh request end-to-end
        out = tts.generate_speech(
            TTSRequest(
                text="hello world.", speaker_files=[wav_path], language="en"
            )
        )
        assert len(out.array) > 0
    finally:
        if tts.loop is not None and not tts.loop.is_closed():
            tts.loop.run_until_complete(tts.shutdown())


def test_phase1_failure_cancels_already_submitted_chunks(tmp_path):
    """If get_generation_context fails after submitting some chunks, the
    submitted decode futures must be cancelled (the caller never gets the
    handles, so nothing else would ever stop them)."""
    engine = build_tiny_engine(max_concurrency=4)
    wav_path = sine_wav(tmp_path / "spk.wav")
    long_text = (
        "hello world this is a test of speech. the quick brown fox jumps "
        "over the dog. one two three four five six seven. " * 3
    )

    real_build = engine._build_prompt
    calls = {"n": 0}

    def flaky(cond, ids):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("synthetic prompt failure on chunk 2")
        return real_build(cond, ids)

    engine._build_prompt = flaky

    async def go():
        req = TTSRequest(
            text=long_text, speaker_files=[wav_path], language="en"
        )
        with pytest.raises(RuntimeError, match="chunk 2"):
            await engine.get_generation_context(req)
        await _wait_until(
            lambda: engine.decode_engine.num_active == 0
            and not engine.decode_engine._queue,
            msg="submitted chunks cancelled after phase-1 failure",
        )
        await engine.shutdown()

    asyncio.run(go())
    assert calls["n"] >= 2  # the failure actually happened mid-submission


def test_scheduler_fires_cancel_hooks_only_on_abort():
    """Abandoning scheduler.run must invoke each parallel input's `cancel`
    hook (covers chunks whose phase-2 generator never started); normal
    completion must not."""
    from auralis_tpu.common.scheduler import TwoPhaseScheduler

    cancelled: list[int] = []

    def inputs(n):
        return [{"idx": i, "cancel": (lambda i=i: cancelled.append(i))} for i in range(n)]

    def first_phase(par):
        async def fn(_):
            return {"parallel_inputs": par}

        return fn

    async def abort_case():
        sched = TwoPhaseScheduler(second_phase_concurrency=2, generator_concurrency=1)

        async def gen(gi):
            yield gi["idx"]
            await asyncio.Event().wait()  # block forever after first item

        agen = sched.run("in", first_phase(inputs(3)), gen)
        got = await agen.__anext__()
        assert got == 0
        t0 = time.monotonic()
        await agen.aclose()  # consumer walks away
        assert time.monotonic() - t0 < 10.0
        return sorted(set(cancelled))

    assert asyncio.run(abort_case()) == [0, 1, 2]

    cancelled.clear()

    async def complete_case():
        sched = TwoPhaseScheduler(second_phase_concurrency=2)

        async def gen(gi):
            yield gi["idx"]

        out = [x async for x in sched.run("in", first_phase(inputs(2)), gen)]
        return out

    assert asyncio.run(complete_case()) == [0, 1]
    assert cancelled == []


def test_shutdown_cancels_slotted_waiters(model, slow_blocks):
    """shutdown() must cancel futures of requests already IN SLOTS (not just
    queued ones), push the poison sentinel to their stream queues, and
    release the device slots so a reopened engine starts clean."""
    cfg, params = model
    rng = np.random.default_rng(21)
    greedy = SamplingOptions(do_sample=False)

    async def go():
        engine = DecodeEngine(params, cfg, cache_dtype=jnp.float32, num_slots=4)
        q: asyncio.Queue = asyncio.Queue()
        t1 = asyncio.ensure_future(engine.generate(_prompt(params, cfg, rng), greedy))
        t2 = asyncio.ensure_future(
            engine.generate(_prompt(params, cfg, rng), greedy, stream_queue=q)
        )
        await _wait_until(lambda: len(engine._slot_owner) >= 2, msg="slots filled")
        await engine.shutdown()
        with pytest.raises(asyncio.CancelledError):
            await t1
        with pytest.raises(asyncio.CancelledError):
            await t2
        # poison sentinel delivered to the streaming consumer
        row, n, final = q.get_nowait() if not q.empty() else (None, 0, True)
        assert final
        assert not engine._slot_owner and not engine._slot_meta
        # reopened engine serves cleanly after the abandoned slots released
        out = await engine.generate(_prompt(params, cfg, rng), greedy)
        assert len(out[0]) >= 1
        await engine.shutdown()

    asyncio.run(go())


def test_generate_rejects_malformed_prompts(model):
    """Malformed embeds fail ONLY the offending request (clear ValueError at
    submit) instead of crashing the shared runner."""
    cfg, params = model
    rng = np.random.default_rng(22)

    async def go():
        engine = DecodeEngine(params, cfg, cache_dtype=jnp.float32, num_slots=2)
        with pytest.raises(ValueError, match="embeds must be"):
            await engine.generate(np.zeros((16,), np.float32), SamplingOptions())
        with pytest.raises(ValueError, match="embeds must be"):
            await engine.generate(
                np.zeros((16, cfg.hidden_size + 1), np.float32), SamplingOptions()
            )
        with pytest.raises(ValueError, match="prompt length"):
            await engine.generate(
                np.zeros((cfg.max_seq_len + 5, cfg.hidden_size), np.float32),
                SamplingOptions(),
            )
        with pytest.raises(ValueError, match="prompt length"):
            await engine.generate(
                np.zeros((0, cfg.hidden_size), np.float32), SamplingOptions()
            )
        # the engine still serves after the rejects
        out = await engine.generate(
            _prompt(params, cfg, rng), SamplingOptions(do_sample=False)
        )
        assert len(out[0]) >= 1
        await engine.shutdown()

    asyncio.run(go())
