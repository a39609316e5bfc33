"""End-to-end pipeline tests with a tiny random-weight engine: text ->
tokenize -> conditioning -> continuous-batched decode -> vocoder -> waveform.
This is the hermetic analogue of the reference's GPU integration tests
(reference tests/integration/test_genearte_audio_sync.py and
test_generate_audio_async.py, which require CUDA + network)."""
import asyncio
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

from auralis_tpu import TTS, TTSRequest
from auralis_tpu.common.output import TTSOutput


@pytest.fixture(scope="module")
def tts(tmp_path_factory):
    engine = build_tiny_engine()
    tts = TTS(scheduler_max_concurrency=4).with_engine(engine)
    wav_path = sine_wav(tmp_path_factory.mktemp("audio") / "speaker.wav")
    yield tts, wav_path
    tts.loop.run_until_complete(tts.shutdown())


def _request(wav_path, **kw):
    return TTSRequest(
        text=kw.pop("text", "Hello world. This is a test."),
        speaker_files=[wav_path],
        language="en",
        **kw,
    )


def test_generate_speech_sync(tts):
    tts, wav_path = tts
    out = tts.generate_speech(_request(wav_path))
    assert isinstance(out, TTSOutput)
    assert out.sample_rate == 24000
    assert len(out.array) > 1000
    assert np.isfinite(out.array).all()
    assert np.abs(out.array).max() <= 1.0


def test_generate_speech_streaming_sync(tts):
    tts, wav_path = tts
    chunks = list(tts.generate_speech(_request(wav_path, stream=True)))
    assert len(chunks) >= 1
    for c in chunks:
        assert isinstance(c, TTSOutput) and len(c.array) > 0


def test_generate_speech_async_parallel(tts):
    tts, wav_path = tts

    async def go():
        reqs = [_request(wav_path, text=f"Sentence number {i} goes here.") for i in range(3)]
        outs = await asyncio.gather(*(tts.generate_speech_async(r) for r in reqs))
        return outs

    outs = tts.loop.run_until_complete(go())
    assert len(outs) == 3
    for o in outs:
        assert isinstance(o, TTSOutput) and len(o.array) > 0


def test_generate_speech_async_streaming(tts):
    tts, wav_path = tts

    async def go():
        gen = await tts.generate_speech_async(_request(wav_path, stream=True))
        return [c async for c in gen]

    chunks = tts.loop.run_until_complete(go())
    assert len(chunks) >= 1


def test_long_text_multiple_chunks(tts):
    tts, wav_path = tts
    # force several text chunks through the tokenizer's char-limit splitting
    text = "The quick brown fox jumps over the dog. " * 15
    out = tts.generate_speech(_request(wav_path, text=text))
    assert isinstance(out, TTSOutput)
    assert len(out.array) > 1000


def test_prepare_for_streaming_generation_voice_cache(tts):
    tts, wav_path = tts

    async def go():
        req = _request(wav_path)
        ctx = await tts.prepare_for_streaming_generation(req)
        assert ctx is not None
        req.context_partial_function = ctx
        return await tts.generate_speech_async(req)

    out = tts.loop.run_until_complete(go())
    assert isinstance(out, TTSOutput) and len(out.array) > 0


def test_deterministic_with_greedy(tts):
    tts, wav_path = tts
    a = tts.generate_speech(_request(wav_path, do_sample=False))
    b = tts.generate_speech(_request(wav_path, do_sample=False))
    np.testing.assert_allclose(a.array, b.array, atol=1e-5)
