"""Failure propagation through the serving pipeline: a decode failure must
surface to the caller on every API shape (sync, streaming, async) instead of
hanging the consumer. Regression for the streaming consumer's snapshot
mailbox, which previously waited forever when generate() failed before the
decode runner owned the request (reference analogue: vLLM failures propagate
through AsyncLLMEngine's generator, XTTSv2.py:762-816)."""
import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

from auralis_tpu import TTS, TTSRequest


@pytest.fixture()
def broken_tts(tmp_path):
    engine = build_tiny_engine()

    async def boom(*a, **kw):
        raise RuntimeError("synthetic decode failure")

    engine.decode_engine.generate = boom
    tts = TTS(scheduler_max_concurrency=2).with_engine(engine)
    wav_path = sine_wav(tmp_path / "spk.wav")
    yield tts, wav_path
    if tts.loop is not None and not tts.loop.is_closed():
        tts.loop.run_until_complete(tts.shutdown())


def _req(wav_path, **kw):
    return TTSRequest(
        text="this will fail.", speaker_files=[wav_path], language="en", **kw
    )


def test_sync_error_propagates(broken_tts):
    tts, wav_path = broken_tts
    with pytest.raises(RuntimeError, match="synthetic decode failure"):
        tts.generate_speech(_req(wav_path))


def test_streaming_error_propagates_not_hangs(broken_tts):
    tts, wav_path = broken_tts
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="synthetic decode failure"):
        list(tts.generate_speech(_req(wav_path, stream=True)))
    assert time.monotonic() - t0 < 60, "streaming failure took implausibly long"


def test_async_error_propagates(broken_tts):
    tts, wav_path = broken_tts

    async def go():
        return await tts.generate_speech_async(_req(wav_path))

    with pytest.raises(RuntimeError, match="synthetic decode failure"):
        tts.loop.run_until_complete(go())


def test_empty_text_raises_clear_error():
    """Empty / whitespace-only text must raise a clear ValueError at phase 1
    (not the downstream numpy empty-concatenate crash), on every API shape."""
    import tempfile
    from pathlib import Path

    from helpers import build_tiny_engine, sine_wav

    from auralis_tpu import TTS, TTSRequest

    engine = build_tiny_engine(max_concurrency=2)
    tts = TTS(scheduler_max_concurrency=2).with_engine(engine)
    try:
        with tempfile.TemporaryDirectory() as td:
            wav = sine_wav(Path(td) / "spk.wav")
            for text in ("", "   ", "\n\t"):
                with pytest.raises(ValueError, match="no speakable content"):
                    tts.generate_speech(
                        TTSRequest(text=text, speaker_files=[str(wav)], language="en")
                    )
            # streaming shape: error surfaces when the stream is consumed
            with pytest.raises(ValueError, match="no speakable content"):
                list(tts.generate_speech(TTSRequest(
                    text="", speaker_files=[str(wav)], language="en", stream=True,
                )))
    finally:
        tts.loop.run_until_complete(tts.shutdown())
