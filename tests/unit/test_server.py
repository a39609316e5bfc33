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
    tts = TTS(scheduler_max_concurrency=2).with_engine(build_tiny_engine())
    yield tts
    if tts.loop is not None and not tts.loop.is_closed():
        tts.loop.run_until_complete(tts.shutdown())


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


def test_audio_speech_unregistered_voice_name(app):
    """OpenAI-style voice names ('echo', 'nova') are valid base64 but decode
    to a few garbage bytes: they must get the helpful 400 naming the
    registry, not an opaque 500 deep in audio loading."""
    import asyncio

    payload = {"input": "x", "model": "m", "voice": ["echo"]}
    resp, body = asyncio.run(_request(app, "post", "/v1/audio/speech", json=payload))
    assert resp.status == 400
    assert b"registered voice" in body


def test_audio_speech_unsupported_format(app, voice_b64):
    import asyncio

    payload = {"input": "hello there", "model": "m", "voice": [voice_b64],
               "response_format": "mp3", "language": "en"}
    resp, body = asyncio.run(_request(app, "post", "/v1/audio/speech", json=payload))
    assert resp.status == 400
    assert b"encoder" in body


def test_audio_speech_stream_sse(shared_tts, voice_b64):
    """stream_format="sse": speech.audio.delta events (base64 PCM) as the
    engine synthesizes, terminated by speech.audio.done. The concatenated
    deltas must match the buffered non-streaming synthesis of the same
    greedy request sample-for-sample (segment-wise vocoding differs from
    whole-chunk vocoding by ~1e-4 float, a few int16 LSBs on the wire —
    same tolerance test_streaming_vocoder pins)."""
    import asyncio
    import json as _json

    payload = {
        "input": "The first sentence streams early. The second sentence follows it.",
        "model": "xttsv2",
        "voice": [voice_b64],
        "language": "en",
        "do_sample": False,
        "stream_format": "sse",
    }
    buf_payload = {**payload, "response_format": "pcm"}
    del buf_payload["stream_format"]

    async def run():
        # a fresh app per request: an aiohttp Application binds to the
        # first loop it starts on
        r1 = await _request(build_app(shared_tts), "post", "/v1/audio/speech", json=payload)
        r2 = await _request(build_app(shared_tts), "post", "/v1/audio/speech", json=buf_payload)
        return r1, r2

    (resp, body), (resp2, body2) = asyncio.run(run())
    assert resp.status == 200, body
    assert resp.headers["Content-Type"].startswith("text/event-stream")
    events = [
        _json.loads(line[len("data:"):].strip())
        for line in body.decode().splitlines()
        if line.startswith("data:")
    ]
    deltas = [e for e in events if e.get("type") == "speech.audio.delta"]
    assert deltas, events
    assert events[-1]["type"] == "speech.audio.done"
    assert all(e["sample_rate"] == 24000 for e in deltas)
    streamed = b"".join(base64.b64decode(e["audio"]) for e in deltas)
    pcm = np.frombuffer(streamed, dtype="<i2")
    assert pcm.size > 1000

    assert resp2.status == 200
    buffered = np.frombuffer(body2, dtype="<i2")
    assert pcm.shape == buffered.shape
    assert np.abs(pcm.astype(np.int32) - buffered.astype(np.int32)).max() <= 4


def test_audio_speech_stream_raw_wav(app, voice_b64):
    """stream_format="audio" + wav: a streaming RIFF header (0xFFFFFFFF
    sizes) followed by raw PCM frames."""
    import asyncio
    import struct

    payload = {
        "input": "Raw chunked audio bytes flow here.",
        "model": "xttsv2",
        "voice": [voice_b64],
        "language": "en",
        "do_sample": False,
        "response_format": "wav",
        "stream_format": "audio",
    }
    resp, body = asyncio.run(_request(app, "post", "/v1/audio/speech", json=payload))
    assert resp.status == 200, body
    assert resp.content_type == "audio/wav"
    assert body[:4] == b"RIFF"
    assert struct.unpack("<I", body[4:8])[0] == 0xFFFFFFFF  # streaming size
    assert body[8:12] == b"WAVE"
    assert body[36:40] == b"data"
    assert struct.unpack("<I", body[40:44])[0] == 0xFFFFFFFF  # data size
    fmt = struct.unpack("<IHHIIHH", body[16:36])
    assert fmt[1] == 1 and fmt[2] == 1 and fmt[3] == 24000 and fmt[6] == 16
    pcm = np.frombuffer(body[44:], dtype="<i2")
    assert pcm.size > 1000


def test_audio_speech_stream_rejections(shared_tts, voice_b64):
    """Compressed formats and speed changes cannot stream: clean 400s."""
    import asyncio

    base = {
        "input": "hello there",
        "model": "m",
        "voice": [voice_b64],
        "language": "en",
        "stream_format": "audio",
    }

    async def run():
        r1 = await _request(build_app(shared_tts), "post", "/v1/audio/speech",
                            json={**base, "response_format": "mp3"})
        r2 = await _request(build_app(shared_tts), "post", "/v1/audio/speech",
                            json={**base, "speed": 1.5})
        return r1, r2

    (resp, body), (resp2, body2) = asyncio.run(run())
    assert resp.status == 400 and b"stream" in body
    assert resp2.status == 400 and b"speed" in body2


def test_named_voices_and_metrics(shared_tts, tmp_path):
    """--voices_dir named voices: a registered stem works as `voice` (plain
    string accepted, OpenAI-style), unknown names 400 with the registry
    listed, GET /v1/voices enumerates, and GET /metrics exposes cumulative
    Prometheus counters that grow with traffic."""
    import asyncio

    from auralis_tpu.server.oai_server import scan_voices_dir

    sine_wav(tmp_path / "alloy.wav")
    (tmp_path / "readme.txt").write_text("not audio")
    voices = scan_voices_dir(tmp_path)
    assert list(voices) == ["alloy"]

    payload = {
        "input": "A named voice speaks.",
        "model": "xttsv2",
        "voice": "alloy",
        "language": "en",
        "do_sample": False,
    }

    async def run():
        app = build_app(shared_tts, voices=voices)
        async with TestClient(TestServer(app)) as client:
            r_voices = await client.get("/v1/voices")
            listing = await r_voices.json()
            r_speech = await client.post("/v1/audio/speech", json=payload)
            speech = await r_speech.read()
            r_metrics = await client.get("/metrics")
            metrics_text = await r_metrics.text()
            r_unknown = await client.post(
                "/v1/audio/speech", json={**payload, "voice": "##ghost##"}
            )
            unknown = await r_unknown.read()
        return (
            (r_voices.status, listing),
            (r_speech.status, speech),
            (r_metrics.status, metrics_text),
            (r_unknown.status, unknown),
        )

    (vs, listing), (ss, speech), (ms, mtext), (us, unknown) = asyncio.run(run())
    assert vs == 200 and listing == {"voices": ["alloy"]}
    assert ss == 200, speech
    audio, sr = audio_io.read_wav(speech)
    assert sr == 24000 and audio.shape[-1] > 1000
    assert ms == 200
    counters = {
        line.split()[0]: float(line.split()[1])
        for line in mtext.splitlines()
        if line and not line.startswith("#")
    }
    assert counters["auralis_audio_chunks_total"] >= 1
    assert counters["auralis_audio_seconds_total"] > 0
    assert counters["auralis_mel_tokens_total"] > 0
    assert us == 400
    assert b"alloy" in unknown  # the registry is listed in the error


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


def test_chat_completions_happy_path_interleaves_audio(app, voice_b64):
    """Full SSE interleave with a stubbed upstream LLM (reference behavior:
    entrypoints/oai_server.py:95-222): text deltas are forwarded as chat
    chunks, every N words a base64 `audio.chunk` event is emitted, the tail
    remainder is vocalized, and the stream ends with [DONE]."""
    import asyncio
    import json as _json

    from aiohttp import web

    # "unbe" + "lievable " split one word across deltas: the vocalize
    # boundary must hold the partial word back instead of speaking fragments
    deltas = ["Hello ", "there ", "unbe", "lievable ", "of ", "mine ", "tail"]

    async def stub_chat(request):
        body = await request.json()
        assert body.get("stream") is True
        assert "modalities" not in body  # voice-specific fields stripped
        assert "speaker_files" not in body
        resp = web.StreamResponse(
            status=200, headers={"Content-Type": "text/event-stream"}
        )
        await resp.prepare(request)
        # Azure-style prologue chunk with empty choices (must not kill the
        # stream) and a usage-only chunk at the end
        await resp.write(
            f"data: {_json.dumps({'id': 'chatcmpl-stub', 'object': 'chat.completion.chunk', 'choices': []})}\n\n".encode()
        )
        for i, d in enumerate(deltas):
            chunk = {
                "id": "chatcmpl-stub", "object": "chat.completion.chunk",
                "choices": [{"index": 0, "delta": {"content": d},
                             "finish_reason": None}],
            }
            await resp.write(f"data: {_json.dumps(chunk)}\n\n".encode())
        await resp.write(
            f"data: {_json.dumps({'id': 'chatcmpl-stub', 'object': 'chat.completion.chunk', 'choices': [], 'usage': {'total_tokens': 7}})}\n\n".encode()
        )
        await resp.write(b"data: [DONE]\n\n")
        return resp

    async def run():
        stub_app = web.Application()
        stub_app.router.add_post("/v1/chat/completions", stub_chat)
        async with TestClient(TestServer(stub_app)) as stub_client:
            upstream_url = str(stub_client.make_url("/v1"))
            payload = {
                "model": "llm",
                "messages": [{"role": "user", "content": "hi"}],
                "speaker_files": [voice_b64],
                "openai_api_url": upstream_url,
                "vocalize_at_every_n_words": 2,
                "language": "en",
            }
            async with TestClient(TestServer(app)) as client:
                resp = await client.post("/v1/chat/completions", json=payload)
                assert resp.status == 200
                assert resp.headers["Content-Type"].startswith("text/event-stream")
                raw = await resp.read()
        return raw.decode()

    raw = asyncio.run(run())
    events = [
        _json.loads(line[len("data:"):].strip())
        for line in raw.splitlines()
        if line.startswith("data:") and line[len("data:"):].strip() != "[DONE]"
    ]
    assert raw.rstrip().endswith("data: [DONE]")

    chat_chunks = [e for e in events if e.get("object") == "chat.completion.chunk"]
    audio_chunks = [e for e in events if e.get("object") == "audio.chunk"]
    assert [
        c["choices"][0]["delta"]["content"]
        for c in chat_chunks if c.get("choices")
    ] == deltas
    assert sum(1 for c in chat_chunks if not c.get("choices")) == 2  # relayed intact
    # 6 words at vocalize_at_every_n_words=2 -> >=2 segment events + tail
    assert len(audio_chunks) >= 2
    for a in audio_chunks:
        wav_bytes = base64.b64decode(a["data"])
        audio, sr = audio_io.read_wav(wav_bytes)
        assert sr == 24000 and audio.shape[-1] > 0
    # interleaving: the first audio event arrives before the last chat chunk
    order = [e.get("object") for e in events]
    assert order.index("audio.chunk") < len(order) - 1 - order[::-1].index(
        "chat.completion.chunk"
    )


def test_audio_speech_malformed_bodies(app):
    """Malformed / hostile request bodies must come back as 4xx (or a clean
    5xx for semantically-broken-but-parseable ones) — never hang or crash
    the app. The reference returns HTTP 500 via a blanket except
    (oai_server.py:92-93); here malformed input is rejected up front."""
    import asyncio

    async def go():
        results = []
        async with TestClient(TestServer(app)) as client:
            cases = [
                ("not json at all", {"data": b"\x00\x01binary"}),
                ("empty object", {"json": {}}),
                ("wrong types", {"json": {"model": 3, "input": [1, 2], "voice": 7}}),
                ("empty input text", {"json": {"model": "x", "input": "", "voice": ["AAAA"]}}),
                ("absurd speed", {"json": {"model": "x", "input": "hi",
                                            "voice": ["AAAA"], "speed": -5}}),
                ("null voice", {"json": {"model": "x", "input": "hi", "voice": None}}),
            ]
            for name, kw in cases:
                resp = await client.post("/v1/audio/speech", **kw)
                await resp.read()
                results.append((name, resp.status))
        return results

    for name, status in asyncio.run(go()):
        assert 400 <= status < 600, f"{name}: unexpected status {status}"
        assert status != 200, f"{name}: malformed body was accepted"
