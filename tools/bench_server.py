"""Server load bench — BASELINE.json measurement config 5: the
OpenAI-compatible server under concurrent multilingual voice-clone load with
audio enhancement on. Boots the aiohttp app in-process (no network flakiness
in the numbers), fires N concurrent `/v1/audio/speech` POSTs across
languages/voices, and reports req/s, seconds-of-audio/s, and latency
percentiles.

Usage:
  python tools/bench_server.py --tiny                 # CPU smoke (tiny config)
  python tools/bench_server.py --requests 24          # full size on the chip
"""
from __future__ import annotations

import argparse
import asyncio
import base64
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

TEXTS = {
    "en": "The quick brown fox jumps over the lazy dog near the river bank.",
    "es": "El rápido zorro marrón salta sobre el perro perezoso junto al río.",
    "de": "Der schnelle braune Fuchs springt über den faulen Hund am Fluss.",
    "fr": "Le renard brun rapide saute par-dessus le chien paresseux.",
    "it": "La volpe marrone salta rapidamente sopra il cane pigro vicino al fiume.",
    "zh-cn": "敏捷的棕色狐狸在2024年3月跳过了3只懒狗。",
}


def _speaker_b64(f0: float) -> str:
    from auralis_tpu.common import audio_io
    import io

    sr = 22050
    t = np.arange(sr * 3) / sr
    wav = (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    buf = io.BytesIO()
    audio_io.write_wav(buf, wav, sr)
    return base64.b64encode(buf.getvalue()).decode()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    args = ap.parse_args()

    from aiohttp.test_utils import TestClient, TestServer

    from auralis_tpu import TTS
    from auralis_tpu.server.oai_server import build_app

    if args.tiny:
        # force CPU: this image's site hook pins jax_platforms to the TPU and
        # IGNORES the JAX_PLATFORMS env var — without this a "CPU smoke" run
        # lands on the real chip and contends with whatever it is serving
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
        from helpers import build_tiny_engine

        engine = build_tiny_engine(max_concurrency=args.concurrency)
    else:
        import bench

        bench.CONCURRENCY = args.concurrency
        engine, _ = bench.build_engine()

    tts = TTS(scheduler_max_concurrency=args.concurrency).with_engine(engine)
    voices = [_speaker_b64(f0) for f0 in (180.0, 220.0, 260.0)]
    langs = list(TEXTS)

    async def run() -> None:
        app = build_app(tts)
        client = TestClient(TestServer(app))
        await client.start_server()
        sem = asyncio.Semaphore(args.concurrency)

        async def one(i: int):
            lang = langs[i % len(langs)]
            body = {
                "model": "xttsv2",
                "input": TEXTS[lang],
                "voice": [voices[i % len(voices)]],
                "language": lang,
                "enhance_speech": True,
                "response_format": "wav",
            }
            async with sem:
                t0 = time.perf_counter()
                resp = await client.post("/v1/audio/speech", json=body)
                payload = await resp.read()
                dt = time.perf_counter() - t0
            assert resp.status == 200, payload[:200]
            # wav @ 24 kHz 16-bit mono: audio seconds from payload size
            audio_s = max(0, len(payload) - 44) / 2 / 24000
            return dt, audio_s

        # warmup (compiles) then timed window
        await asyncio.gather(*(one(i) for i in range(min(4, args.requests))))
        t0 = time.perf_counter()
        results = await asyncio.gather(*(one(i) for i in range(args.requests)))
        wall = time.perf_counter() - t0
        await client.close()

        lats = sorted(dt for dt, _ in results)
        audio_total = sum(a for _, a in results)
        print(f"\nrequests: {args.requests} @ concurrency {args.concurrency} "
              f"(languages: {', '.join(langs)}; enhancement ON)")
        print(f"wall: {wall:.2f}s  req/s: {args.requests / wall:.2f}  "
              f"audio: {audio_total:.1f}s  RTF: {wall / max(audio_total, 1e-9):.4f}")
        print(f"latency p50: {statistics.median(lats)*1e3:.0f} ms   "
              f"p95: {lats[max(0, int(len(lats)*0.95) - 1)]*1e3:.0f} ms")

    tts.loop.run_until_complete(run())
    tts.loop.run_until_complete(tts.shutdown())


if __name__ == "__main__":
    main()
    # the axon PJRT client's destructor-time teardown can raise out of a
    # background thread after a TestServer run ("terminate called after
    # throwing an instance of ''", observed r3) — results are already
    # printed, so skip interpreter finalization
    import os
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
