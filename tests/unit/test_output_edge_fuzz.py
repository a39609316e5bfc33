"""TTSOutput edge fuzz: the public post-processing surface (speed change,
resample, combine, byte encoding — reference output.py:40-187) must handle
degenerate waveforms and extreme parameters without crashing: empty and
single-sample arrays, extreme speed factors, unusual target rates."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.common.output import TTSOutput


def _out(n, sr=24000):
    t = np.arange(n) / max(sr, 1)
    return TTSOutput(array=(0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
                     sample_rate=sr)


@pytest.mark.parametrize("n", [1, 7, 255, 24000])
@pytest.mark.parametrize("speed", [0.1, 0.5, 1.0, 1.5, 4.0, 10.0])
def test_change_speed_extremes(n, speed):
    out = _out(n).change_speed(speed)
    assert out.sample_rate == 24000
    assert out.array.size >= 1
    assert np.isfinite(out.array).all()


@pytest.mark.parametrize("n", [1, 100, 24000])
@pytest.mark.parametrize("rate", [4000, 8000, 22050, 24000, 44100, 48000])
def test_resample_rates(n, rate):
    out = _out(n).resample(rate)
    assert out.sample_rate == rate
    assert np.isfinite(out.array).all()


def test_combine_mixed_rates():
    a, b = _out(2400, 24000), _out(2205, 22050)
    combined = TTSOutput.combine_outputs([a, b])
    assert combined.sample_rate == 24000
    assert np.isfinite(combined.array).all()
    assert combined.array.size > a.array.size  # b was resampled + appended


@pytest.mark.parametrize("fmt", ["wav", "pcm"])
@pytest.mark.parametrize("n", [1, 100])
def test_to_bytes_tiny(fmt, n):
    payload = _out(n).to_bytes(format=fmt)
    assert isinstance(payload, bytes) and len(payload) > 0


def test_roundtrip_file(tmp_path):
    p = tmp_path / "t.wav"
    _out(512).save(p)
    back = TTSOutput.from_file(p)
    assert back.sample_rate == 24000
    assert abs(back.array.size - 512) <= 1
