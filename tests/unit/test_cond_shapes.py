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
