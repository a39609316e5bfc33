"""Tests for the first-party C++ host audio runtime (native/):
FLAC codec round-trips, stream spec compliance (magic, STREAMINFO, MD5
signature), PCM conversions, and resampler parity with the numpy reference.

The reference has no first-party native code to test (it delegates to
ffmpeg/torchaudio); these are the TPU build's equivalents.
"""
import hashlib
import io
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.common import audio_io, native_audio
from auralis_tpu.common.output import TTSOutput

pytestmark = pytest.mark.skipif(
    not native_audio.available(), reason="native library failed to build"
)


def _tone(n=24000, sr=24000, f=440.0, amp=0.4):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


# ------------------------------------------------------------------- FLAC

def test_flac_roundtrip_mono():
    wav = _tone() + 0.1 * np.sin(2 * np.pi * 881 * np.arange(24000) / 24000).astype(
        np.float32
    )
    blob = native_audio.flac_encode(wav, 24000)
    dec, sr = native_audio.flac_decode(blob)
    assert sr == 24000 and dec.shape == wav.shape
    # exact up to 16-bit quantization
    assert np.abs(dec - wav).max() < 1.5 / 32767
    # must actually compress a tone
    assert len(blob) < 2 * len(wav) * 0.6


def test_flac_roundtrip_stereo():
    wav = np.stack([_tone(), -_tone()], axis=1)
    blob = native_audio.flac_encode(wav, 22050)
    dec, sr = native_audio.flac_decode(blob)
    assert sr == 22050 and dec.shape == wav.shape
    assert np.abs(dec - wav).max() < 1.5 / 32767


def test_flac_roundtrip_noise_and_odd_length():
    # white noise is near-incompressible: exercises verbatim/escape paths;
    # odd length exercises the short final frame
    rng = np.random.default_rng(7)
    wav = rng.uniform(-0.99, 0.99, 10007).astype(np.float32)
    blob = native_audio.flac_encode(wav, 16000)
    dec, sr = native_audio.flac_decode(blob)
    assert sr == 16000 and dec.shape == wav.shape
    assert np.abs(dec - wav).max() < 1.5 / 32767


def test_flac_silence_compresses_to_constant_subframes():
    blob = native_audio.flac_encode(np.zeros(48000, np.float32), 24000)
    assert len(blob) < 400  # ~dozen frames of constant subframes


def test_flac_24bit():
    wav = _tone(8192)
    blob = native_audio.flac_encode(wav, 24000, bits_per_sample=24)
    dec, sr = native_audio.flac_decode(blob)
    assert np.abs(dec - wav).max() < 1.5 / 8388607


def test_flac_stream_structure_and_md5():
    wav = np.random.default_rng(1).uniform(-0.9, 0.9, 13337).astype(np.float32)
    blob = native_audio.flac_encode(wav, 22050)
    assert blob[:4] == b"fLaC"
    # STREAMINFO: last-metadata flag + type 0, length 34
    assert blob[4] == 0x80 and blob[5:8] == b"\x00\x00\x22"
    # sample rate (20 bits starting at byte 18 of STREAMINFO)
    si = blob[8:42]
    sr = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    assert sr == 22050
    total = ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big")
    assert total == len(wav)
    # MD5 of the unencoded PCM (half-away-from-zero rounding, little-endian)
    q = wav.astype(np.float64) * 32767.0
    pcm = np.trunc(q + np.sign(q) * 0.5).astype("<i2").tobytes()
    assert si[18:34] == hashlib.md5(pcm).digest()


def test_flac_rejects_garbage():
    with pytest.raises(ValueError):
        native_audio.flac_decode(b"not a flac stream at all------")


# ----------------------------------------------------- TTSOutput integration

def test_ttsoutput_flac_bytes_and_file(tmp_path):
    out = TTSOutput(array=_tone(), sample_rate=24000)
    blob = out.to_bytes("flac")
    assert blob[:4] == b"fLaC"
    path = tmp_path / "x.flac"
    out.save(path)
    loaded = TTSOutput.from_file(path)
    assert loaded.sample_rate == 24000
    assert np.abs(loaded.array - out.array).max() < 1.5 / 32767


def test_audio_io_reads_flac(tmp_path):
    wav = _tone(22050, sr=22050)
    (tmp_path / "ref.flac").write_bytes(native_audio.flac_encode(wav, 22050))
    audio, sr = audio_io.read_wav(tmp_path / "ref.flac")
    assert sr == 22050 and audio.shape == (1, 22050)
    # load_audio path (what TTSRequest speaker_files go through)
    mono = audio_io.load_audio(tmp_path / "ref.flac", 22050)
    assert mono.shape[-1] == 22050


# ------------------------------------------------------------- conversions

def test_pcm_conversions_roundtrip():
    wav = _tone(5000)
    i16 = native_audio.f32_to_i16(wav)
    assert i16.dtype == np.int16
    back = native_audio.i16_to_f32(i16)
    assert np.abs(back - wav).max() < 1.0 / 32000


# --------------------------------------------------------------- resampler

@pytest.mark.parametrize("pair", [(22050, 16000), (24000, 22050), (16000, 24000)])
def test_native_resample_matches_numpy(pair):
    from auralis_tpu.ops.resample import resample_np

    a, b = pair
    x = np.random.default_rng(0).standard_normal(9000).astype(np.float32)
    ref = resample_np(x[None], a, b)[0]
    got = native_audio.resample(x, a, b)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-4
