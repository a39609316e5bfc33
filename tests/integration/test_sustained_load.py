"""Integration: sustained sequential + concurrent load on the hermetic tiny
engine (the CPU-runnable analogue of the reference's GPU-only integration
tests, reference tests/integration/test_genearte_audio_sync.py and
test_generate_audio_async.py which need CUDA + HF network access).
"""
import asyncio
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

from auralis_tpu import TTS, TTSRequest


@pytest.fixture(scope="module")
def tts(tmp_path_factory):
    engine = build_tiny_engine(max_concurrency=5)
    tts = TTS(scheduler_max_concurrency=5).with_engine(engine)
    wav_path = sine_wav(tmp_path_factory.mktemp("audio") / "speaker.wav")
    yield tts, wav_path
    tts.loop.run_until_complete(tts.shutdown())


def _req(wav_path, text="Hello world this is a test of speech.", **kw):
    return TTSRequest(text=text, speaker_files=[wav_path], language="en", **kw)


def test_sequential_sync_loop(tts):
    """Repeated sync generations stay valid (reference loops 100 on GPU;
    5 keeps the hermetic CPU run fast while exercising slot reuse)."""
    tts, wav_path = tts
    for i in range(5):
        out = tts.generate_speech(_req(wav_path))
        assert len(out.array) > 0 and np.isfinite(out.array).all(), f"iter {i}"
        assert out.sample_rate == 24000


def test_sequential_sync_streaming_loop(tts):
    tts, wav_path = tts
    for i in range(3):
        chunks = list(tts.generate_speech(_req(wav_path, stream=True)))
        assert chunks, f"iter {i}: no chunks"
        assert all(np.isfinite(c.array).all() for c in chunks)


def test_concurrent_async_mixed(tts):
    """5 streaming + 5 non-streaming requests in flight together
    (reference: test_generate_audio_async.py:11-57)."""
    tts, wav_path = tts

    async def one_stream(i):
        total = 0
        async for chunk in await tts.generate_speech_async(
            _req(wav_path, stream=True)
        ):
            total += len(chunk.array)
        return total

    async def one_full(i):
        out = await tts.generate_speech_async(_req(wav_path))
        return len(out.array)

    async def run():
        return await asyncio.gather(
            *(one_stream(i) for i in range(5)),
            *(one_full(i) for i in range(5)),
        )

    results = tts.loop.run_until_complete(run())
    assert len(results) == 10
    assert all(r > 0 for r in results)


def test_slot_state_isolation_across_iterations(tts):
    """Same request twice must give the same waveform length distribution
    regardless of which slot serves it (slot bleed would change outputs)."""
    tts, wav_path = tts
    a = tts.generate_speech(_req(wav_path, temperature=0.0, do_sample=False))
    b = tts.generate_speech(_req(wav_path, temperature=0.0, do_sample=False))
    assert len(a.array) == len(b.array)
    np.testing.assert_allclose(a.array, b.array, rtol=1e-4, atol=1e-5)
