"""Flexible TTSRequest.text forms: str | List[str] | iterator | async
generator (reference common/definitions/requests.py:165 declares the union;
reference tokenizer.py:821-869 handles list inputs). The facade materializes
generator inputs to lists before scheduling; list texts chunk per-element."""
import asyncio
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, build_tiny_tokenizer, sine_wav

from auralis_tpu import TTS, TTSRequest
from auralis_tpu.common.output import TTSOutput


@pytest.fixture(scope="module")
def tts(tmp_path_factory):
    engine = build_tiny_engine()
    tts = TTS(scheduler_max_concurrency=4).with_engine(engine)
    wav_path = sine_wav(tmp_path_factory.mktemp("audio") / "speaker.wav")
    yield tts, wav_path
    tts.loop.run_until_complete(tts.shutdown())


def _req(wav_path, text, **kw):
    return TTSRequest(text=text, speaker_files=[wav_path], language="en", **kw)


# --------------------------------------------------------------- tokenizer
def test_encode_with_split_list_matches_concat():
    tok = build_tiny_tokenizer()
    a, b = "hello world again.", "the quick brown fox."
    joined = tok.encode_with_split(a, "en") + tok.encode_with_split(b, "en")
    as_list = tok.encode_with_split([a, b], "en")
    assert as_list == joined


def test_encode_with_split_empty_list():
    tok = build_tiny_tokenizer()
    assert tok.encode_with_split([], "en") == []


# ----------------------------------------------------------------- facade
def test_list_text_sync(tts):
    tts, wav_path = tts
    out = tts.generate_speech(
        _req(wav_path, ["Hello world.", "A second sentence here."])
    )
    assert isinstance(out, TTSOutput)
    assert len(out.array) > 1000 and np.isfinite(out.array).all()


def test_iterator_text_sync(tts):
    tts, wav_path = tts
    out = tts.generate_speech(
        _req(wav_path, iter(["Hello world.", "Another one."]))
    )
    assert isinstance(out, TTSOutput) and len(out.array) > 1000


def test_async_generator_text(tts):
    tts, wav_path = tts

    async def agen():
        for t in ["Hello world.", "Streamed text arrives in pieces."]:
            yield t

    async def go():
        return await tts.generate_speech_async(_req(wav_path, agen()))

    out = tts.loop.run_until_complete(go())
    assert isinstance(out, TTSOutput) and len(out.array) > 1000


def test_list_text_async(tts):
    tts, wav_path = tts

    async def go():
        return await tts.generate_speech_async(
            _req(wav_path, ["Hello world.", "Second element."])
        )

    out = tts.loop.run_until_complete(go())
    assert isinstance(out, TTSOutput) and len(out.array) > 1000


def test_bad_text_type_raises(tts):
    tts, wav_path = tts
    with pytest.raises(TypeError):
        tts.generate_speech(_req(wav_path, 12345))


# -------------------------------------------------------------- requests
def test_language_autodetect_on_list():
    r = TTSRequest(
        text=["Der schnelle braune Fuchs.", "Er springt über den faulen Hund."],
        speaker_files=["/dev/null"],
        language="auto",
    )
    assert r.language == "de"


def test_split_requests_list_per_element(tts):
    tts_obj, _ = tts
    r = TTSRequest(
        text=["one.", "two.", "x" * 150_000],
        speaker_files=["/dev/null"],
        language="en",
    )
    subs = TTS.split_requests(r)
    assert [s.text for s in subs[:2]] == ["one.", "two."]
    # the oversized element splits into 100k + 50k
    assert len(subs) == 4
    assert all(isinstance(s.text, str) for s in subs)
    assert len(set(s.request_id for s in subs)) == len(subs)


def test_copy_does_not_reenhance_and_keeps_prepared_voice(tmp_path):
    """TTSRequest.copy(): speaker files (already enhanced by __post_init__)
    must pass through unchanged — re-running the enhancement chain double-
    filtered every split sub-request's references (the reference's copy()
    has this bug) — and the prepared-voice partial must survive."""
    import numpy as np

    from auralis_tpu.common import audio_io
    from auralis_tpu.common.requests import TTSRequest

    sr = 22050
    p = tmp_path / "v.wav"
    audio_io.write_wav(
        str(p), 0.3 * np.random.default_rng(0).standard_normal(sr).astype(np.float32), sr
    )
    req = TTSRequest(text="hi", speaker_files=[str(p)], language="en",
                     enhance_speech=True)
    enhanced = list(req.speaker_files)
    assert enhanced != [str(p)]  # post_init replaced with enhanced temp wavs
    sentinel = object()
    req.context_partial_function = sentinel
    sub = req.copy()
    assert sub.speaker_files == enhanced  # NOT re-enhanced
    assert sub.enhance_speech is True  # caller intent preserved
    assert sub.context_partial_function is sentinel


def test_async_path_splits_oversized_requests(monkeypatch):
    """generate_speech_async must apply the 100k split like the sync path
    (the HTTP server only uses the async path)."""
    import asyncio

    from auralis_tpu import TTS, TTSRequest
    from auralis_tpu.common.output import TTSOutput
    import numpy as np

    tts = TTS(scheduler_max_concurrency=2)
    seen = []

    async def fake_prepare(req):
        seen.append(len(req.text))
        async def gen(_):
            yield TTSOutput(array=np.zeros(10, np.float32), sample_rate=24000)
        return {"parallel_inputs": [{"generator": None, "speaker_embedding": None,
                                     "multimodal_data": None, "request": req}],
                "request": req}

    async def fake_second(gen_input):
        yield TTSOutput(array=np.zeros(10, np.float32), sample_rate=24000)

    monkeypatch.setattr(tts, "_prepare_generation_context", fake_prepare)
    monkeypatch.setattr(tts, "_second_phase_fn", fake_second)

    req = TTSRequest(text="a" * 250_000, speaker_files=["x.wav"], language="en")
    out = asyncio.run(tts.generate_speech_async(req))
    assert isinstance(out, TTSOutput)
    assert len(seen) == 3 and all(n <= 100_000 for n in seen)
