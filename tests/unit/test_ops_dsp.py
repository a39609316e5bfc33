"""DSP op parity tests against torch-CPU oracles."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from auralis_tpu.ops.mel import (
    hann_window,
    hamming_window,
    mel_filterbank,
    stft_mag,
    mel_spectrogram,
    preemphasis,
)
from auralis_tpu.ops.interpolate import interp_linear_scale
from auralis_tpu.ops.resample import resample_np, resample_jax


def test_windows_match_torch():
    np.testing.assert_allclose(hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        hamming_window(400), torch.hamming_window(400).numpy(), atol=1e-6
    )


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 256, 1024), (2048, 256, 1024), (512, 160, 400)])
def test_stft_matches_torch(rng, n_fft, hop, win):
    x = rng.standard_normal(8000).astype(np.float32)
    got = np.asarray(stft_mag(jnp.asarray(x), n_fft, hop, win, power=2.0))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    ref = ref.abs().pow(2.0).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(1025, 80, 22050, 0.0, 8000.0, norm="slaney", mel_scale="htk")
    assert fb.shape == (1025, 80)
    assert (fb >= 0).all()
    # every filter has support and peaks within (f_min, f_max)
    assert (fb.sum(axis=0) > 0).all()
    # bins above f_max have no weight
    freqs = np.linspace(0, 22050 // 2, 1025)
    assert fb[freqs > 8001].sum() == 0
    # slaney norm: each filter area ~ constant in hz domain
    unnormed = mel_filterbank(1025, 80, 22050, 0.0, 8000.0, norm=None, mel_scale="htk")
    assert not np.allclose(fb, unnormed)


def test_mel_spectrogram_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32))
    mel = mel_spectrogram(x, 22050, 2048, 256, 1024, 80, 0, 8000, norm="slaney")
    assert mel.shape == (2, 80, 22050 // 256 + 1)


def test_preemphasis_matches_torch(rng):
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    got = np.asarray(preemphasis(jnp.asarray(x), 0.97))
    xt = torch.from_numpy(x).unsqueeze(1)
    filt = torch.tensor([-0.97, 1.0]).view(1, 1, 2)
    ref = torch.nn.functional.conv1d(
        torch.nn.functional.pad(xt, (1, 0), "reflect"), filt
    ).squeeze(1)
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-6)


@pytest.mark.parametrize("scale", [1024 / 256, 24000 / 22050, 0.5])
def test_interp_linear_matches_torch(rng, scale):
    x = rng.standard_normal((1, 4, 37)).astype(np.float32)
    got = np.asarray(interp_linear_scale(jnp.asarray(x), scale))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=scale, mode="linear", align_corners=False
    ).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("orig,new", [(22050, 16000), (44100, 22050), (24000, 22050)])
def test_resample_preserves_tone(orig, new):
    t = np.arange(orig) / orig  # 1 second
    f0 = 440.0
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample_np(x[None], orig, new)[0]
    assert abs(y.shape[-1] - new) <= 1
    # dominant FFT bin should still be 440 Hz
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * new / len(y)
    assert abs(peak_hz - f0) < 2.0
    # amplitude roughly preserved in the steady-state middle
    mid = y[len(y) // 4 : -len(y) // 4]
    assert 0.95 < np.abs(mid).max() < 1.05


def test_resample_jax_matches_np(rng):
    x = rng.standard_normal((2, 22050)).astype(np.float32)
    a = resample_np(x, 22050, 16000)
    b = np.asarray(resample_jax(jnp.asarray(x), 22050, 16000))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
