"""Integration: memory stability under repeated generation (the hermetic
analogue of the reference's tests/integration/memory_leak.py, which watches
torch.cuda.memory_allocated over 100 iterations and asserts <10 MB growth).

Here we watch both the JAX live-buffer count (device-side leaks: slots or
conditioning caches that never release) and process RSS (host-side leaks).
"""
import gc
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

from auralis_tpu import TTS, TTSRequest


def _live_buffers() -> int:
    import jax

    return sum(1 for _ in jax.live_arrays())


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def test_no_buffer_or_rss_growth(tmp_path):
    engine = build_tiny_engine(max_concurrency=2)
    tts = TTS(scheduler_max_concurrency=2).with_engine(engine)
    wav_path = sine_wav(tmp_path / "speaker.wav")
    req = lambda: TTSRequest(
        text="Hello world this is a test.", speaker_files=[wav_path], language="en"
    )

    # warmup compiles everything and fills the conditioning cache
    for _ in range(2):
        out = tts.generate_speech(req())
        assert len(out.array) > 0

    gc.collect()
    buffers_before = _live_buffers()
    rss_before = _rss_mb()

    n_iter = 8  # reference uses 100 on GPU; 8 catches monotonic leaks on CPU
    samples = []
    for _ in range(n_iter):
        out = tts.generate_speech(req())
        del out
        gc.collect()
        samples.append((_live_buffers(), _rss_mb()))

    buffers_after, rss_after = samples[-1]
    # device arrays: steady state (some jitter from async resolution is fine)
    assert buffers_after - buffers_before < 50, (
        f"live JAX buffers grew {buffers_before} -> {buffers_after}: "
        f"trajectory {[b for b, _ in samples]}"
    )
    # host RSS: tracemalloc shows Python-side allocation is flat (KBs); the
    # residual drift is XLA:CPU arena growth, which plateaus but not within
    # a short loop — so this bound is deliberately loose and exists only to
    # catch egregious per-iteration leaks (the strict check is the device
    # buffer count above, the analogue of the reference's
    # torch.cuda.memory_allocated watch)
    assert rss_after - rss_before < 300, (
        f"RSS grew {rss_before:.0f} -> {rss_after:.0f} MB: "
        f"trajectory {[round(r) for _, r in samples]}"
    )

    tts.loop.run_until_complete(tts.shutdown())
