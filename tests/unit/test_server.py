"""OpenAI-compatible server tests with the tiny random engine (hermetic —
the reference has no server tests at all)."""
import base64
import sys
from pathlib import Path

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

from auralis_tpu import TTS
from auralis_tpu.common import audio_io
from auralis_tpu.server.oai_server import build_app


@pytest.fixture(scope="module")
def voice_b64(tmp_path_factory):
    path = sine_wav(tmp_path_factory.mktemp("srv") / "voice.wav")
    return base64.b64encode(Path(path).read_bytes()).decode()


@pytest.fixture(scope="module")
def shared_tts():
    return TTS(scheduler_max_concurrency=2).with_engine(build_tiny_engine())


@pytest.fixture()
def app(shared_tts):
    # an aiohttp Application freezes on first startup; build one per test
    return build_app(shared_tts)


async def _request(app, method, path, **kw):
    async with TestClient(TestServer(app)) as client:
        resp = await getattr(client, method)(path, **kw)
        body = await resp.read()
        return resp, body


def test_health(app):
    import asyncio

    resp, body = asyncio.run(_request(app, "get", "/health"))
    assert resp.status == 200
    assert b"ok" in body


def test_audio_speech_wav(app, voice_b64):
    import asyncio

    payload = {
        "input": "Hello world from the server.",
        "model": "xttsv2",
        "voice": [voice_b64],
        "response_format": "wav",
        "language": "en",
    }
    resp, body = asyncio.run(_request(app, "post", "/v1/audio/speech", json=payload))
    assert resp.status == 200, body
    audio, sr = audio_io.read_wav(body)
    assert sr == 24000
    assert audio.shape[-1] > 1000


def test_audio_speech_speed_change(app, voice_b64):
    import asyncio

    payload = {
        "input": "Hello world from the server.",
        "model": "xttsv2",
        "voice": [voice_b64],
        "response_format": "wav",
        "language": "en",
        "speed": 1.5,
    }
    resp, body = asyncio.run(_request(app, "post", "/v1/audio/speech", json=payload))
    assert resp.status == 200


def test_audio_speech_flac(app, voice_b64):
    import asyncio

    from auralis_tpu.common import native_audio

    if not native_audio.available():
        import pytest

        pytest.skip("native FLAC codec not built")
    payload = {
        "input": "Hello world from the server.",
        "model": "xttsv2",
        "voice": [voice_b64],
        "response_format": "flac",
        "language": "en",
    }
    resp, body = asyncio.run(_request(app, "post", "/v1/audio/speech", json=payload))
    assert resp.status == 200, body
    assert resp.content_type == "audio/flac"
    assert body[:4] == b"fLaC"
    audio, sr = native_audio.flac_decode(bytes(body))
    assert sr == 24000 and audio.shape[-1] > 1000


def test_audio_speech_invalid_base64(app):
    import asyncio

    payload = {"input": "x", "model": "m", "voice": ["@@not-base64@@"]}
    resp, body = asyncio.run(_request(app, "post", "/v1/audio/speech", json=payload))
    assert resp.status == 400
    assert b"base64" in body


def test_audio_speech_unsupported_format(app, voice_b64):
    import asyncio

    payload = {"input": "hello there", "model": "m", "voice": [voice_b64],
               "response_format": "mp3", "language": "en"}
    resp, body = asyncio.run(_request(app, "post", "/v1/audio/speech", json=payload))
    assert resp.status == 400
    assert b"encoder" in body


def test_chat_completions_requires_url(app, voice_b64):
    import asyncio

    payload = {
        "model": "llm",
        "messages": [{"role": "user", "content": "hi"}],
        "speaker_files": [voice_b64],
    }
    resp, body = asyncio.run(_request(app, "post", "/v1/chat/completions", json=payload))
    assert resp.status == 400
    assert b"url" in body


def test_chat_completions_upstream_error(app, voice_b64):
    import asyncio

    payload = {
        "model": "llm",
        "messages": [{"role": "user", "content": "hi"}],
        "speaker_files": [voice_b64],
        "openai_api_url": "http://127.0.0.1:1/v1",  # unreachable
    }
    resp, body = asyncio.run(_request(app, "post", "/v1/chat/completions", json=payload))
    assert resp.status == 200  # SSE stream with an error event
    assert b"error" in body and b"[DONE]" in body
