"""Audio-frontend edge fuzz: degenerate reference audio must never crash the
enhancement / conditioning path (the reference passes user-uploaded speaker
files straight into librosa/pyloudnorm, requests.py:213-248; a server sees
truncated uploads, silence, DC, clipped and denormal content).

Contract: EnhancedAudioProcessor.process returns finite float32 for any
finite input (any length >= 1, silence included), and the engine's speaker
conditioning survives extreme-but-valid references end to end."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

from auralis_tpu.common.enhancer import AudioPreprocessingConfig, EnhancedAudioProcessor


CASES = {
    "one_sample": np.zeros(1, np.float32),
    "sixteen_samples": np.full(16, 0.5, np.float32),
    "pure_silence": np.zeros(22050, np.float32),
    "dc_offset": np.full(22050, 0.7, np.float32),
    "full_clip": np.sign(np.sin(np.arange(22050) * 0.3)).astype(np.float32),
    "denormal_quiet": (np.random.default_rng(0).standard_normal(22050) * 1e-30).astype(np.float32),
    "alternating_extremes": np.tile(np.asarray([1.0, -1.0], np.float32), 11025),
    "short_burst": np.r_[np.zeros(100, np.float32), np.ones(50, np.float32), np.zeros(8000, np.float32)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_enhancer_survives_degenerate_audio(name):
    proc = EnhancedAudioProcessor(AudioPreprocessingConfig(
        normalize=True, trim_silence=True, remove_noise=True,
        enhance_speech=True,
    ))
    out = proc.process(CASES[name].copy())
    assert isinstance(out, np.ndarray)
    assert out.dtype == np.float32
    assert out.size >= 1
    assert np.isfinite(out).all(), f"{name}: non-finite samples in output"


def test_enhancer_actually_processes_normal_audio():
    """Regression pin: the degenerate-input guards must NOT bypass
    processing for ordinary lengths (the istft roundtrip is legitimately up
    to hop-1 samples shorter than the input — a length-based guard silently
    disabled spectral gating + clarity for all real audio)."""
    rng = np.random.default_rng(3)
    audio = (0.3 * np.sin(np.arange(22050) / 15.0)
             + 0.05 * rng.standard_normal(22050)).astype(np.float32)
    proc = EnhancedAudioProcessor(AudioPreprocessingConfig())
    gated = proc.spectral_gating(audio)
    boosted = proc.enhance_clarity(audio)
    n = min(len(gated), len(audio))
    assert n > 21000
    assert not np.allclose(gated[:n], audio[:n], atol=1e-6), "gating was a no-op"
    m = min(len(boosted), len(audio))
    assert not np.allclose(boosted[:m], audio[:m], atol=1e-6), "clarity was a no-op"


def test_engine_conditioning_survives_silent_reference(tmp_path):
    """A silent (but valid) speaker wav through the full pipeline."""
    from auralis_tpu import TTS, TTSRequest
    from auralis_tpu.common import audio_io

    path = tmp_path / "silent.wav"
    audio_io.write_wav(path, np.zeros(22050, np.float32), 22050)
    tts = TTS(scheduler_max_concurrency=2).with_engine(build_tiny_engine())
    try:
        out = tts.generate_speech(TTSRequest(
            text="hello world.", speaker_files=[str(path)], language="en",
            max_new_tokens=8,
        ))
        assert len(out.array) > 0 and np.isfinite(out.array).all()
    finally:
        tts.loop.run_until_complete(tts.shutdown())
