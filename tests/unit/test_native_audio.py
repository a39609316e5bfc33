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


# --------------------------------------------- real-world FLAC intake (LPC,
# stereo decorrelation): libFLAC's default output uses both, so these are
# hand-built conforming streams (RFC 9639) the first-party encoder never
# emits — decode-side coverage for user-supplied voice files.

class _FlacBits:
    """Minimal MSB-first bit writer for hand-building FLAC test streams."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_signed(self, value: int, nbits: int):
        self.put(value & ((1 << nbits) - 1), nbits)

    def put_unary(self, q: int):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _flac_stream(channels: int, n: int, build_frame) -> bytes:
    """fLaC magic + STREAMINFO + one hand-built frame (CRCs are zeros:
    the decoder reads, not verifies, them)."""
    bw = _FlacBits()
    bw.put(0x664C6143, 32)
    bw.put(1, 1)  # last metadata block
    bw.put(0, 7)  # STREAMINFO
    bw.put(34, 24)
    bw.put(n, 16)
    bw.put(n, 16)
    bw.put(0, 24)
    bw.put(0, 24)
    bw.put(16000, 20)
    bw.put(channels - 1, 3)
    bw.put(16 - 1, 5)
    bw.put(n, 36)
    for _ in range(16):
        bw.put(0, 8)  # MD5 (unverified)
    build_frame(bw)
    return bw.bytes()


def _frame_header(bw: _FlacBits, ch_code: int, n: int):
    bw.put(0b11111111111110, 14)
    bw.put(0, 1)  # reserved
    bw.put(0, 1)  # fixed blocksize
    bw.put(7, 4)  # blocksize: 16-bit follow
    bw.put(0, 4)  # sample rate from STREAMINFO
    bw.put(ch_code, 4)
    bw.put(0b100, 3)  # 16-bit samples
    bw.put(0, 1)
    bw.put(0, 8)  # frame number 0 (UTF-8 coded)
    bw.put(n - 1, 16)
    bw.put(0, 8)  # header CRC-8 (unverified)


def _verbatim_subframe(bw: _FlacBits, x, bits: int):
    bw.put(0, 1)
    bw.put(1, 6)  # verbatim
    bw.put(0, 1)  # no wasted bits
    for v in x:
        bw.put_signed(int(v), bits)


def _finish_frame(bw: _FlacBits):
    bw.align()
    bw.put(0, 16)  # frame CRC-16 (unverified)


def _i16(dec: np.ndarray) -> np.ndarray:
    return np.round(np.asarray(dec, np.float64) * 32767.0).astype(np.int64)


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_flac_decodes_stereo_decorrelation(ch_code):
    rng = np.random.default_rng(ch_code)
    n = 64
    left = rng.integers(-3000, 3000, n).astype(np.int64)
    right = rng.integers(-3000, 3000, n).astype(np.int64)
    side = left - right  # needs 17 bits

    def build(bw):
        _frame_header(bw, ch_code, n)
        if ch_code == 8:  # left/side
            _verbatim_subframe(bw, left, 16)
            _verbatim_subframe(bw, side, 17)
        elif ch_code == 9:  # side/right
            _verbatim_subframe(bw, side, 17)
            _verbatim_subframe(bw, right, 16)
        else:  # mid/side
            _verbatim_subframe(bw, (left + right) >> 1, 16)
            _verbatim_subframe(bw, side, 17)
        _finish_frame(bw)

    dec, sr = native_audio.flac_decode(_flac_stream(2, n, build))
    assert sr == 16000 and dec.shape == (n, 2)
    got = _i16(dec)
    np.testing.assert_array_equal(got[:, 0], left)
    np.testing.assert_array_equal(got[:, 1], right)


def test_flac_decodes_lpc_subframe():
    """Order-2 LPC with quantized coefficients and shift: residuals are
    derived from the signal so reconstruction must be bit-exact."""
    rng = np.random.default_rng(3)
    n = 96
    x = np.cumsum(rng.integers(-40, 40, n)).astype(np.int64) + 500
    order, prec, shift = 2, 12, 5
    coef = [50, -22]  # within 12-bit signed

    res = []
    for i in range(order, n):
        pred = (coef[0] * x[i - 1] + coef[1] * x[i - 2]) >> shift
        res.append(int(x[i] - pred))

    def build(bw):
        _frame_header(bw, 0, n)
        bw.put(0, 1)
        bw.put(0b100000 | (order - 1), 6)  # LPC, order 2
        bw.put(0, 1)  # no wasted bits
        for i in range(order):
            bw.put_signed(int(x[i]), 16)
        bw.put(prec - 1, 4)
        bw.put_signed(shift, 5)
        for c in coef:
            bw.put_signed(c, prec)
        bw.put(0, 2)  # 4-bit Rice method
        bw.put(0, 4)  # partition order 0
        k = 6
        bw.put(k, 4)
        for r in res:
            zz = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
            bw.put_unary(zz >> k)
            bw.put(zz & ((1 << k) - 1), k)
        _finish_frame(bw)

    dec, sr = native_audio.flac_decode(_flac_stream(1, n, build))
    assert sr == 16000 and dec.shape == (n,)
    np.testing.assert_array_equal(_i16(dec), x)


def test_flac_decodes_lpc_high_order_partitioned():
    """Order-8 LPC with Rice partition order 2 (what libFLAC -8 emits for
    tonal content): partition boundaries and per-partition k must line up."""
    rng = np.random.default_rng(11)
    n = 64
    x = np.cumsum(rng.integers(-25, 25, n)).astype(np.int64)
    order, prec, shift = 8, 11, 6
    coef = [30, -12, 8, -5, 3, -2, 1, 1]
    res = []
    for i in range(order, n):
        pred = sum(coef[j] * x[i - 1 - j] for j in range(order)) >> shift
        res.append(int(x[i] - pred))

    def build(bw):
        _frame_header(bw, 0, n)
        bw.put(0, 1)
        bw.put(0b100000 | (order - 1), 6)
        bw.put(0, 1)
        for i in range(order):
            bw.put_signed(int(x[i]), 16)
        bw.put(prec - 1, 4)
        bw.put_signed(shift, 5)
        for c in coef:
            bw.put_signed(c, prec)
        bw.put(0, 2)  # 4-bit Rice
        porder = 2  # 4 partitions of 16; first holds 16-8 residuals
        bw.put(porder, 4)
        idx = 0
        for p in range(1 << porder):
            cnt = (n >> porder) - (order if p == 0 else 0)
            k = 4 + p  # different parameter per partition
            bw.put(k, 4)
            for r in res[idx : idx + cnt]:
                zz = (abs(r) << 1) - (1 if r < 0 else 0)
                bw.put_unary(zz >> k)
                bw.put(zz & ((1 << k) - 1), k)
            idx += cnt
        _finish_frame(bw)

    dec, _ = native_audio.flac_decode(_flac_stream(1, n, build))
    np.testing.assert_array_equal(_i16(dec), x)


def test_flac_decodes_lpc_stereo_combined():
    """LPC on the left channel + verbatim side channel under left/side
    decorrelation: the combination libFLAC actually emits."""
    n = 64
    t = np.arange(n)
    left = (2000 * np.sin(2 * np.pi * 3 * t / n)).astype(np.int64)
    right = (left * 3) // 4
    side = left - right
    order, prec, shift = 1, 10, 4
    coef = [15]
    res = [int(left[i] - ((coef[0] * left[i - 1]) >> shift)) for i in range(order, n)]

    def build(bw):
        _frame_header(bw, 8, n)
        bw.put(0, 1)
        bw.put(0b100000 | (order - 1), 6)
        bw.put(0, 1)
        bw.put_signed(int(left[0]), 16)
        bw.put(prec - 1, 4)
        bw.put_signed(shift, 5)
        bw.put_signed(coef[0], prec)
        bw.put(0, 2)
        bw.put(0, 4)
        k = 7
        bw.put(k, 4)
        for r in res:
            zz = (abs(r) << 1) - (1 if r < 0 else 0)
            bw.put_unary(zz >> k)
            bw.put(zz & ((1 << k) - 1), k)
        _verbatim_subframe(bw, side, 17)
        _finish_frame(bw)

    dec, _ = native_audio.flac_decode(_flac_stream(2, n, build))
    got = _i16(dec)
    np.testing.assert_array_equal(got[:, 0], left)
    np.testing.assert_array_equal(got[:, 1], right)


def test_load_audio_flac_falls_back_to_ffmpeg(monkeypatch, tmp_path):
    """A FLAC stream the first-party decoder rejects must route through
    ffmpeg when available instead of hard-failing (reference loads any
    torchaudio-decodable file, common/utilities.py:74-98)."""
    from auralis_tpu.common import ffmpeg_codec

    bad = b"fLaC" + b"\x00" * 16  # truncated: native decode raises
    path = tmp_path / "voice.flac"
    path.write_bytes(bad)

    calls = {}

    def fake_decode(data, target_sample_rate=None):
        calls["sr"] = target_sample_rate
        return _tone(2000, sr=target_sample_rate), target_sample_rate

    monkeypatch.setattr(ffmpeg_codec, "available", lambda: True)
    monkeypatch.setattr(ffmpeg_codec, "decode", fake_decode)
    mono = audio_io.load_audio(path, 22050)
    assert calls["sr"] == 22050 and mono.shape == (1, 2000)

    monkeypatch.setattr(ffmpeg_codec, "available", lambda: False)
    with pytest.raises(audio_io.UnsupportedAudioFormat, match="ffmpeg"):
        audio_io.load_audio(path, 22050)


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


def test_flac_decoder_survives_bit_flips():
    """Mutation fuzz on the C++ decoder: single-byte corruptions of a valid
    stream must either decode (harmless flip) or raise ValueError — never
    crash the process (a decoder segfault would take the whole server down;
    user-uploaded voice files are attacker-controlled input)."""
    rng = np.random.default_rng(11)
    wav = (0.4 * np.sin(np.arange(4096) / 20.0)).astype(np.float32)
    data = bytearray(native_audio.flac_encode(wav, 22050))
    for _ in range(200):
        mutated = bytearray(data)
        # corrupt 1-4 bytes anywhere in the stream (header, frame, CRC)
        for _ in range(rng.integers(1, 5)):
            mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
        try:
            out, sr = native_audio.flac_decode(bytes(mutated))
            assert np.isfinite(np.asarray(out)).all()
        except ValueError:
            pass  # rejected cleanly


def test_flac_decoder_survives_truncation():
    """Truncated uploads at every length prefix must raise, not crash."""
    wav = (0.2 * np.sin(np.arange(2048) / 9.0)).astype(np.float32)
    data = native_audio.flac_encode(wav, 22050)
    for cut in list(range(0, min(len(data), 64))) + [len(data) // 2, len(data) - 1]:
        try:
            native_audio.flac_decode(data[:cut])
        except ValueError:
            pass
