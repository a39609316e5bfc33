"""Time-to-first-audio (TTFA) measurement harness — the TPU build's version
of the reference's tests/integration/stream_ttfb.py. Runs the full-size model
with random weights on the current backend and prints per-request TTFA plus
p50/p95 under concurrent streaming load (BASELINE target: p50 < 300 ms at
concurrency 8).

Usage: python tools/stream_ttfa.py [--concurrency 8] [--requests 16]
"""
from __future__ import annotations

import argparse
import asyncio
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--concurrency", type=int, default=8)
    # default requests == concurrency: TTFA under full load WITHOUT
    # admission queueing. Oversubscribing (e.g. --requests 16) measures the
    # scheduler queue too: requests beyond the concurrency limit wait for a
    # worker (reference semantics), so their "TTFA" includes queue time.
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    ap.add_argument(
        "--decode-slots", type=int, default=None,
        help="decode_slots for the engine (default: bench's throughput "
        "config, 64; a latency deployment at concurrency 8 would run 16 — "
        "4x less dead-slot KV read per young block)",
    )
    args = ap.parse_args()
    import os

    if args.decode_slots is not None:
        os.environ["BENCH_DECODE_SLOTS"] = str(args.decode_slots)

    from auralis_tpu import TTS, TTSRequest
    from auralis_tpu.common import audio_io

    if args.tiny:
        # force CPU: the site hook pins jax_platforms to the TPU and ignores
        # the JAX_PLATFORMS env var — a "CPU smoke" must not land on the chip
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

    sr = 22050
    t = np.arange(sr * 6) / sr
    speaker = (0.5 * np.sin(2 * np.pi * 210 * t)).astype(np.float32)
    audio_io.write_wav("/tmp/ttfa_speaker.wav", speaker, sr)

    text = (
        "the quick brown fox jumps over the lazy dog while voice cloning "
        "speech synthesis runs on tensor processing hardware. "
    ) * 4

    def req():
        return TTSRequest(
            text=text, speaker_files=["/tmp/ttfa_speaker.wav"], language="en",
            stream=True,
        )

    async def one(i: int) -> float:
        t0 = time.perf_counter()
        agen = await tts.generate_speech_async(req())
        async for _first in agen:
            ttfa = time.perf_counter() - t0
            break
        async for _rest in agen:  # drain
            pass
        return ttfa

    async def run() -> list[float]:
        # row-vocoder length buckets the warmup requests don't hit would
        # otherwise compile mid-measurement (production covers this via
        # TTS.warmup -> precompile_vocoder_buckets); run it FIRST so its
        # compiles and queued executions fully drain before timing starts
        precompile = getattr(engine, "precompile_vocoder_buckets", None)
        if precompile is not None:
            await asyncio.to_thread(precompile)
        # warmup (compiles every program): first a SOLO request (compiles the
        # batch-1 seg_first executable when BENCH_SEG_FIRST_BATCH1=1 — a
        # burst would batch its first segments and miss it), then a full-size
        # burst so the batched-insert K buckets the timed burst hits are hot
        await one(0)
        await asyncio.gather(*(one(i) for i in range(max(2, args.concurrency))))
        from auralis_tpu.common.tracing import profile_summary

        profile_summary(reset=True)  # isolate the timed window
        getattr(engine, "decode_engine", None) and engine.decode_engine.stats.update(
            {k: 0 if isinstance(v, int) else 0.0
             for k, v in engine.decode_engine.stats.items()}
        )
        return list(await asyncio.gather(*(one(i) for i in range(args.requests))))

    ttfas = tts.loop.run_until_complete(run())

    # ---- per-stage TTFA budget (means over the timed window) ----------
    from auralis_tpu.common.tracing import profile_summary

    prof = profile_summary()
    print("\nper-stage first-audio budget (mean ms over timed window):")
    for name in (
        "phase1.context",          # tokenize + conditioning + prompt build
        "decode.queue_wait",       # enqueue -> slot insert (incl. prefill wait)
        "decode.young_block",      # young 16-step block dispatch + status RTT
        "phase2.first_snapshot_wait",  # consumer start -> first latent snapshot
        "phase2.vocode_segment",   # seg submit -> audio bytes (batcher + device)
        "vocode.seg_first_device",  # speculative first-seg program (TTFA path)
        "vocode.seg_device",       # of which: device dispatch + fetch
    ):
        rec = prof.get(name)
        if rec:
            print(f"  {name:28s} mean {rec['mean_ms']:7.1f}  max {rec['max_ms']:7.1f}  n={rec['count']}")
    de = getattr(engine, "decode_engine", None)
    if de is not None:
        print(f"  runner stats: {de.stats}")
    tts.loop.run_until_complete(tts.shutdown())

    ttfas_ms = sorted(x * 1e3 for x in ttfas)
    p50 = statistics.median(ttfas_ms)
    p95 = ttfas_ms[min(len(ttfas_ms) - 1, int(0.95 * len(ttfas_ms)))]
    for i, ms in enumerate(ttfas_ms):
        print(f"  request {i:3d}: TTFA {ms:8.1f} ms")
    print(f"p50 TTFA: {p50:.1f} ms   p95 TTFA: {p95:.1f} ms  "
          f"(target: p50 < 300 ms @ concurrency 8)")


if __name__ == "__main__":
    main()
