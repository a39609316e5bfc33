"""Reference-audio length quantization: conditioning must only ever see a
bounded set of input shapes (each new shape costs a full XLA compile on TPU),
while keeping sub-quantum clips exact."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

from auralis_tpu.common import audio_io


@pytest.fixture(scope="module")
def engine():
    return build_tiny_engine()


def test_quantize_truncates_to_grid(engine):
    sr = 22050
    audio = np.zeros((1, int(sr * 7.37)), np.float32)
    out = engine._quantize_ref_length(audio, sr)
    assert out.shape[-1] == sr * 7


def test_quantize_keeps_short_clips(engine):
    sr = 22050
    audio = np.zeros((1, int(sr * 0.6)), np.float32)
    out = engine._quantize_ref_length(audio, sr)
    assert out.shape[-1] == audio.shape[-1]  # sub-quantum: untouched


def test_conditioning_shape_set_is_bounded(engine, tmp_path, monkeypatch):
    """Odd-length reference files must all hit the same jit shapes."""
    seen_cond, seen_spk = set(), set()
    orig_cond, orig_spk = engine._cond_fn, engine._speaker_fn

    def spy_cond(n):
        seen_cond.add(n)
        return orig_cond(n)

    def spy_spk(n):
        seen_spk.add(n)
        return orig_spk(n)

    monkeypatch.setattr(engine, "_cond_fn", spy_cond)
    monkeypatch.setattr(engine, "_speaker_fn", spy_spk)

    import asyncio

    for seconds in (1.93, 1.51, 1.77):  # all truncate to 1 s
        path = sine_wav(tmp_path / f"s{seconds}.wav", seconds=seconds)
        asyncio.run(engine.get_audio_conditioning([path]))
    assert len(seen_cond) == 1, seen_cond
    assert len(seen_spk) == 1, seen_spk


def test_quantum_zero_disables(engine):
    sr = 22050
    audio = np.zeros((1, 12345), np.float32)
    old = engine.ref_length_quantum_s
    try:
        engine.ref_length_quantum_s = 0
        assert engine._quantize_ref_length(audio, sr).shape[-1] == 12345
    finally:
        engine.ref_length_quantum_s = old


def test_cond_cache_is_lru_not_fifo(tmp_path):
    """A continuously-hit voice must survive eviction pressure (hits refresh
    recency; plain FIFO evicted the hottest entry first)."""
    import asyncio

    import numpy as np

    from auralis_tpu.common import audio_io
    from helpers import build_tiny_engine

    engine = build_tiny_engine(max_concurrency=1)
    sr = 22050
    rng = np.random.default_rng(0)

    def wav(i):
        p = tmp_path / f"v{i}.wav"
        audio_io.write_wav(str(p), 0.3 * rng.standard_normal(sr * 3).astype(np.float32), sr)
        return str(p)

    hot = wav(0)

    async def go():
        await engine.get_audio_conditioning([hot])
        hot_key = next(iter(engine._cond_cache))
        # 40 cold voices > cache capacity (32), hot voice re-hit in between
        for i in range(1, 41):
            await engine.get_audio_conditioning([wav(i)])
            await engine.get_audio_conditioning([hot])  # refresh
        assert hot_key in engine._cond_cache, "hot voice was evicted (FIFO)"
        await engine.shutdown()

    asyncio.run(go())


def test_trim_db_changes_cache_key_and_trims(tmp_path):
    import asyncio

    import numpy as np

    from auralis_tpu.common import audio_io
    from helpers import build_tiny_engine

    engine = build_tiny_engine(max_concurrency=1)
    sr = 22050
    t = np.arange(sr * 2) / sr
    tone = 0.4 * np.sin(2 * np.pi * 300 * t[: sr]).astype(np.float32)
    sig = np.concatenate([np.zeros(sr, np.float32), tone, np.zeros(sr, np.float32)])
    p = tmp_path / "padded.wav"
    audio_io.write_wav(str(p), sig, sr)

    async def go():
        a = await engine.get_audio_conditioning([str(p)])
        b = await engine.get_audio_conditioning([str(p)], librosa_trim_db=40.0)
        # different params -> different cache entries (2 total)
        assert len(engine._cond_cache) == 2
        # trimming changes the conditioning input, so latents differ
        assert not np.allclose(a[0], b[0])
        await engine.shutdown()

    asyncio.run(go())
