"""Data-parallel replica serving on the virtual 8-device CPU mesh: requests
route across per-device engine clones and produce valid audio end-to-end.
(The v5e-8 default scale-out, parallel/replica.py; the reference's analogue
is external nginx load balancing.)"""
import asyncio
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

from auralis_tpu import TTS, TTSRequest
from auralis_tpu.parallel.replica import ReplicatedTTSEngine

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >= 2 (virtual) devices"
)


@pytest.fixture(scope="module")
def replicated():
    donor = build_tiny_engine(max_concurrency=2)
    engine = ReplicatedTTSEngine.from_engine(donor, devices=jax.devices()[:2])
    tts = TTS(scheduler_max_concurrency=4).with_engine(engine)
    yield tts, engine
    tts.loop.run_until_complete(tts.shutdown())


def _req(wav_path, **kw):
    return TTSRequest(
        text="hello world this is a test", speaker_files=[wav_path],
        language="en", **kw,
    )


def test_replicas_on_distinct_devices(replicated):
    _, engine = replicated
    devs = [
        next(iter(e.params["wte"].devices())) for e in engine.engines
    ]
    assert len(engine.engines) == 2
    assert devs[0] != devs[1]


def test_concurrent_requests_spread_and_complete(replicated, tmp_path):
    tts, engine = replicated
    wav_path = sine_wav(tmp_path / "spk.wav")

    served = []

    orig_route = engine._route

    def spy(request):
        idx = orig_route(request)
        served.append(idx)
        return idx

    engine._route = spy
    try:
        async def run():
            return await asyncio.gather(
                *(tts.generate_speech_async(_req(wav_path)) for _ in range(4))
            )

        outs = tts.loop.run_until_complete(run())
    finally:
        engine._route = orig_route

    assert all(len(o.array) > 0 and np.isfinite(o.array).all() for o in outs)
    assert len(served) == 4
    # least-loaded routing over concurrent requests must touch both replicas
    assert len(set(served)) == 2, f"all requests went to replica(s) {set(served)}"


def test_streaming_through_replicas(replicated, tmp_path):
    tts, _ = replicated
    wav_path = sine_wav(tmp_path / "spk2.wav")
    chunks = list(tts.generate_speech(_req(wav_path, stream=True)))
    assert chunks and all(np.isfinite(c.array).all() for c in chunks)


def test_stream_abandon_through_replicas_stops_decode(replicated, tmp_path):
    """cancel_generation_handle must delegate through the replica tag: an
    abandoned stream drains the owning replica's decode engine."""
    import asyncio
    import time

    tts, engine = replicated
    wav_path = sine_wav(tmp_path / "spk3.wav")
    long_text = (
        "hello world this is a test of speech. the quick brown fox jumps "
        "over the dog. one two three four five six seven. " * 3
    )
    stream = tts.generate_speech(
        TTSRequest(text=long_text, speaker_files=[wav_path], language="en", stream=True)
    )
    first = next(stream)
    assert np.isfinite(first.array).all()
    stream.close()

    async def drained():
        t0 = time.monotonic()
        while any(
            e.decode_engine.num_active or e.decode_engine._queue
            for e in engine.engines
        ):
            if time.monotonic() - t0 > 60:
                raise AssertionError("replica decode did not drain after abandon")
            await asyncio.sleep(0.05)

    tts.loop.run_until_complete(drained())
    # replicas still serve
    out = tts.generate_speech(_req(wav_path))
    assert len(out.array) > 0
