"""Common-layer tests: audio I/O, TTSOutput, enhancer, LUFS meter, requests."""
import io

import numpy as np
import pytest

from auralis_tpu.common import audio_io
from auralis_tpu.common.dsp_np import integrated_loudness, istft_np, stft_np
from auralis_tpu.common.enhancer import AudioPreprocessingConfig, EnhancedAudioProcessor
from auralis_tpu.common.output import TTSOutput
from auralis_tpu.common.requests import TTSRequest


def _sine(sr=22050, seconds=1.0, f0=440.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


# ---------------------------------------------------------------- audio I/O
@pytest.mark.parametrize("width", [2, 4])
def test_wav_roundtrip(tmp_path, width):
    wav = _sine()
    path = tmp_path / "test.wav"
    audio_io.write_wav(path, wav, 22050, sample_width=width)
    loaded, sr = audio_io.read_wav(path)
    assert sr == 22050
    assert loaded.shape == (1, len(wav))
    tol = 1e-4 if width == 2 else 1e-7
    np.testing.assert_allclose(loaded[0], wav, atol=tol)


def test_wav_stereo_to_mono(tmp_path):
    wav = np.stack([_sine(f0=440), _sine(f0=880)])
    path = tmp_path / "stereo.wav"
    audio_io.write_wav(path, wav, 22050)
    mono = audio_io.load_audio(path, 22050)
    assert mono.shape == (1, wav.shape[1])


def test_load_audio_resamples(tmp_path):
    wav = _sine(sr=44100, seconds=0.5)
    path = tmp_path / "hi.wav"
    audio_io.write_wav(path, wav, 44100)
    out = audio_io.load_audio(path, 22050)
    assert abs(out.shape[1] - 11025) <= 1


def test_non_wav_rejected():
    with pytest.raises(audio_io.UnsupportedAudioFormat):
        audio_io.read_wav(b"ID3\x04...not really audio")


# ---------------------------------------------------------------- TTSOutput
def test_output_combine_and_info():
    a = TTSOutput(array=_sine(seconds=0.5))
    b = TTSOutput(array=_sine(seconds=0.25))
    c = TTSOutput.combine_outputs([a, b])
    n, sr, dur = c.get_info()
    assert n == len(a.array) + len(b.array)
    assert sr == 24000


def test_output_bytes_and_file(tmp_path):
    out = TTSOutput(array=_sine(sr=24000), sample_rate=24000)
    blob = out.to_bytes("wav")
    arr, sr = audio_io.read_wav(blob)
    assert sr == 24000
    pcm = out.to_bytes("pcm")
    assert len(pcm) == 2 * len(out.array)
    from auralis_tpu.common import ffmpeg_codec

    if not ffmpeg_codec.available():
        with pytest.raises(ValueError):
            out.to_bytes("mp3")
    with pytest.raises(ValueError):
        out.to_bytes("notacodec")
    path = tmp_path / "o.wav"
    out.save(path)
    again = TTSOutput.from_file(path)
    assert abs(len(again.array) - len(out.array)) == 0


def test_output_from_int16_bytes():
    pcm = (np.ones(1000) * 16384).astype("<i2").tobytes()
    out = TTSOutput(array=pcm)
    assert out.array.dtype == np.float32
    assert out.array[0] == 0.0  # fade-in starts at zero
    assert abs(out.array[500] - 0.5) < 1e-3


def test_output_change_speed():
    out = TTSOutput(array=_sine(sr=24000, seconds=1.0), sample_rate=24000)
    fast = out.change_speed(2.0)
    assert abs(len(fast.array) - len(out.array) / 2) < 2048


def test_output_resample():
    out = TTSOutput(array=_sine(sr=24000, seconds=1.0), sample_rate=24000)
    res = out.resample(16000)
    assert abs(len(res.array) - 16000) <= 1


# ----------------------------------------------------------------- enhancer
def test_stft_istft_roundtrip():
    x = _sine(seconds=0.7)
    y = istft_np(stft_np(x))
    n = min(len(x), len(y))  # istft reconstructs up to the last full frame
    assert n > len(x) - 1024
    np.testing.assert_allclose(y[:n], x[:n], atol=1e-4)


def test_lufs_sine_reference():
    # A full-scale 997 Hz sine measures ~ -3.01 LUFS per BS.1770
    sr = 48000
    t = np.arange(sr * 3) / sr
    x = np.sin(2 * np.pi * 997.0 * t)
    lufs = integrated_loudness(x, sr)
    assert abs(lufs - (-3.01)) < 0.3


def test_enhancer_pipeline_runs():
    cfg = AudioPreprocessingConfig()
    proc = EnhancedAudioProcessor(cfg)
    x = _sine(seconds=1.5) + 0.01 * np.random.default_rng(0).standard_normal(33075).astype(np.float32)
    out = proc.process(x)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    assert len(out) == pytest.approx(len(x), abs=2048)
    # loudness normalization should land near the target
    lufs = integrated_loudness(out, cfg.sample_rate)
    assert abs(lufs - cfg.target_lufs) < 3.0


# ----------------------------------------------------------------- requests
def test_request_language_detection():
    req = TTSRequest(text="Hello there, how are you today my friend?", speaker_files="x.wav")
    assert req.language == "en"


def test_request_invalid_language():
    with pytest.raises(ValueError):
        TTSRequest(text="hi", speaker_files="x.wav", language="xx")


def test_request_copy_preserves_params():
    req = TTSRequest(text="hello world", speaker_files="x.wav", temperature=0.5, top_k=7)
    dup = req.copy()
    assert dup.temperature == 0.5 and dup.top_k == 7 and dup.request_id == req.request_id


def test_request_enhancement(tmp_path):
    wav_path = tmp_path / "ref.wav"
    audio_io.write_wav(wav_path, _sine(seconds=1.2), 22050)
    req = TTSRequest(
        text="hello world how are you", speaker_files=str(wav_path), enhance_speech=True
    )
    assert isinstance(req.speaker_files, list)
    processed = req.speaker_files[0]
    assert processed != str(wav_path)
    arr, sr = audio_io.read_wav(processed)
    assert sr == 22050


# ------------------------------------------------------------- ffmpeg bridge
def test_ffmpeg_routing_without_binary(monkeypatch):
    """When no ffmpeg is on PATH, mp3/opus/aac raise with guidance and
    load_audio rejects compressed inputs with a clear message."""
    from auralis_tpu.common import ffmpeg_codec

    monkeypatch.setattr(ffmpeg_codec, "ffmpeg_path", lambda: None)
    out = TTSOutput(array=_sine(sr=24000), sample_rate=24000)
    for fmt in ("mp3", "opus", "aac"):
        with pytest.raises(ValueError, match="ffmpeg"):
            out.to_bytes(fmt)
    with pytest.raises(audio_io.UnsupportedAudioFormat, match="ffmpeg"):
        audio_io.load_audio(b"ID3\x04 not really audio" + b"\x00" * 64, 22050)


def test_ffmpeg_routing_with_fake_binary(monkeypatch, tmp_path):
    """to_bytes routes compressed formats through ffmpeg_codec.encode with
    the waveform, sample rate and configured bit rate."""
    from auralis_tpu.common import ffmpeg_codec

    calls = {}

    def fake_encode(wav, sample_rate, format, bitrate_kbps=None):
        calls.update(n=len(wav), sr=sample_rate, fmt=format, kbps=bitrate_kbps)
        return b"ENCODED"

    monkeypatch.setattr(ffmpeg_codec, "available", lambda: True)
    monkeypatch.setattr(ffmpeg_codec, "encode", fake_encode)
    out = TTSOutput(array=_sine(sr=24000), sample_rate=24000, bit_rate=96)
    assert out.to_bytes("mp3") == b"ENCODED"
    assert calls == {"n": len(out.array), "sr": 24000, "fmt": "mp3", "kbps": 96}


@pytest.mark.skipif(
    __import__("shutil").which("ffmpeg") is None,
    reason="no ffmpeg binary in this image (deployment image installs one)",
)
@pytest.mark.parametrize("fmt", ["mp3", "opus", "aac"])
def test_ffmpeg_real_roundtrip(fmt):
    from auralis_tpu.common import ffmpeg_codec

    out = TTSOutput(array=_sine(sr=24000, seconds=0.5), sample_rate=24000)
    blob = out.to_bytes(fmt)
    assert len(blob) > 100
    wav, sr = ffmpeg_codec.decode(blob)
    assert wav.size > 0 and sr > 0


def test_hash_params_stable_and_distinct():
    from auralis_tpu.common.requests import hash_params

    a = hash_params("x", 1, k=2)
    assert a == hash_params("x", 1, k=2)
    assert a != hash_params("x", 2, k=2)
    assert len(a) == 32  # md5 hex


def test_get_language_module_api():
    from auralis_tpu.common.requests import get_language

    assert get_language("the quick brown fox jumps over the lazy dog") == "en"
    # zh maps to the serving code zh-cn (reference requests.py:110-112)
    assert get_language("今天天气很好我们一起去公园散步吧") == "zh-cn"


def test_trim_silence_db():
    """First-party librosa.effects.trim equivalent: leading/trailing silence
    below top_db relative to the peak frame is cut; interior content kept."""
    from auralis_tpu.common.dsp_np import trim_silence_db

    sr = 22050
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    sig = np.concatenate([np.zeros(sr, np.float32), tone, np.zeros(sr, np.float32)])
    out = trim_silence_db(sig[None, :], top_db=40.0)
    # trimmed to roughly the tone (frame granularity: one 2048-frame margin)
    assert sr * 0.8 <= out.shape[-1] <= sr + 3 * 2048
    assert np.abs(out).max() == np.abs(sig).max()
    # all-silence input returns unchanged
    silent = np.zeros((1, sr), np.float32)
    assert trim_silence_db(silent, top_db=40.0).shape == silent.shape
    # short input (sub-frame) unchanged
    short = np.ones((1, 100), np.float32)
    assert trim_silence_db(short).shape == short.shape
