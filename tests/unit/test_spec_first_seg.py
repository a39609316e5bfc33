"""Speculative first-segment vocode (engine.py _SpecFirstSeg + the runner's
dispatch-side hook in engine_core.py): the first streaming segment's vocode
launches before the status round-trip. These tests pin (a) the hook actually
fires and its wave is consumed, (b) the stream is bit-identical to the
normal (non-speculative) path, and (c) an invalid claim (early stop) is
discarded and the consumer falls back to normal emission."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

import auralis_tpu.models.xttsv2.engine as em
from auralis_tpu import TTS, TTSRequest

TEXT = (
    "Streaming verification sentence, reasonably long to produce several "
    "segments of audio output."
)


def _run_stream(engine, text=TEXT, wav_path=None):
    tts = TTS(scheduler_max_concurrency=2).with_engine(engine)
    chunks = list(
        tts.generate_speech(
            TTSRequest(text=text, speaker_files=[wav_path], stream=True)
        )
    )
    tts.loop.run_until_complete(tts.shutdown())
    return np.concatenate([c.array for c in chunks]), chunks


def test_spec_fires_and_matches_normal_path(tmp_path, monkeypatch):
    wav = sine_wav(tmp_path / "v.wav")

    fired = {"launched": 0}
    orig_hook = em._SpecFirstSeg.hook

    def counting_hook(self, row, n):
        r = orig_hook(self, row, n)
        fired["launched"] += int(r)
        return r

    monkeypatch.setattr(em._SpecFirstSeg, "hook", counting_hook)
    spec_wave, spec_chunks = _run_stream(build_tiny_engine(max_concurrency=2), wav_path=wav)
    assert fired["launched"] >= 1, "speculative first-segment never launched"

    # suppress the speculation entirely (hook claims done without launching)
    monkeypatch.setattr(em._SpecFirstSeg, "hook", lambda self, row, n: True)
    normal_wave, normal_chunks = _run_stream(build_tiny_engine(max_concurrency=2), wav_path=wav)

    # same engine seed -> same tokens; the speculative path must reproduce
    # the normal streaming waveform exactly (concatenation is the contract —
    # the spec path may cut the FIRST chunk smaller on purpose: it emits
    # exactly FIRST_SEG_PF through the small seg_first program)
    assert spec_wave.shape == normal_wave.shape
    np.testing.assert_array_equal(spec_wave, normal_wave)
    assert len(spec_chunks[0].array) <= len(normal_chunks[0].array)


def test_invalid_claim_discarded(tmp_path, monkeypatch):
    """A claim the status can never confirm (inflated n) must be discarded on
    the final snapshot and the stream still completes correctly."""
    wav = sine_wav(tmp_path / "v.wav")
    orig_hook = em._SpecFirstSeg.hook

    def inflating_hook(self, row, n):
        return orig_hook(self, row, n + 10_000)  # claim unreachable n

    monkeypatch.setattr(em._SpecFirstSeg, "hook", inflating_hook)
    inflated_wave, _ = _run_stream(build_tiny_engine(max_concurrency=2), wav_path=wav)

    monkeypatch.setattr(em._SpecFirstSeg, "hook", lambda self, row, n: True)
    normal_wave, _ = _run_stream(build_tiny_engine(max_concurrency=2), wav_path=wav)

    np.testing.assert_array_equal(inflated_wave, normal_wave)
