"""1-D linear interpolation matching torch.nn.functional.interpolate semantics.

The reference HiFi-GAN path stretches GPT latents twice before vocoding
(hifigan_decoder.py:787-800): scale 1024/256 then 24000/22050, mode="linear",
align_corners=False, called with scale_factor (torch then uses the *given*
scale in the source-index computation, with output length floor(T*scale)).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def interp_linear_scale(x: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """x: [..., T] -> [..., floor(T*scale)] (torch align_corners=False)."""
    t_in = x.shape[-1]
    t_out = int(math.floor(t_in * scale_factor))
    # torch area_pixel_compute_source_index with the provided scale:
    src = (np.arange(t_out, dtype=np.float64) + 0.5) / scale_factor - 0.5
    src = np.clip(src, 0.0, None)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, t_in - 1)
    hi = np.minimum(lo + 1, t_in - 1)
    w_hi = (src - lo).astype(np.float32)
    w_hi = np.where(lo == hi, 0.0, w_hi)
    w_lo = 1.0 - w_hi
    return x[..., lo] * jnp.asarray(w_lo) + x[..., hi] * jnp.asarray(w_hi)
