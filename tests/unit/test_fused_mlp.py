"""Parity for the fused W8A8 MLP Pallas kernel (ops/experimental/fused_mlp.py)
against (a) the exact f32 MLP and (b) the production XLA W8A8 composition.

The kernel re-quantizes the gelu output per (row, inner-tile) instead of per
full row, so (b) agrees only to quantization noise — the assertion is SNR
bounds, not bit equality."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auralis_tpu.models.xttsv2.gpt import quantize_decode_weights
from auralis_tpu.ops.experimental.fused_mlp import fused_mlp_w8, mlp_w8_reference

D, I = 256, 1024  # tiny-config shapes; same tiling structure as 1024/4096


def _snr_db(ref, got):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(got, np.float64) - ref
    return 10 * np.log10(np.sum(ref**2) / max(np.sum(err**2), 1e-30))


@pytest.fixture(scope="module")
def weights():
    k = jax.random.split(jax.random.PRNGKey(7), 5)
    fc_w = 0.02 * jax.random.normal(k[0], (1, D, I), jnp.float32)
    proj_w = 0.02 * jax.random.normal(k[1], (1, I, D), jnp.float32)
    q8 = quantize_decode_weights(
        {"attn_w": fc_w, "attn_proj_w": proj_w, "fc_w": fc_w, "fc_proj_w": proj_w}
    )
    fc_b = 0.01 * jax.random.normal(k[2], (I,), jnp.float32)
    proj_b = 0.01 * jax.random.normal(k[3], (D,), jnp.float32)
    x = jax.random.normal(k[4], (8, D), jnp.float32)
    return dict(
        x=x,
        fc_wq=q8["fc_w_q"][0], fc_ws=q8["fc_w_s"][0], fc_b=fc_b,
        proj_wq=q8["fc_proj_w_q"][0], proj_ws=q8["fc_proj_w_s"][0],
        proj_b=proj_b, fc_w=fc_w[0], proj_w=proj_w[0],
    )


def _exact_f32(w):
    y = w["x"] @ w["fc_w"] + w["fc_b"]
    g = jax.nn.gelu(y, approximate=False)
    return g @ w["proj_w"] + w["proj_b"]


def test_fused_mlp_matches_f32_to_quant_noise(weights):
    ref = _exact_f32(weights)
    got = fused_mlp_w8(
        weights["x"], weights["fc_wq"], weights["fc_ws"], weights["fc_b"],
        weights["proj_wq"], weights["proj_ws"], weights["proj_b"],
        tile_i=256, interpret=True,
    )
    assert _snr_db(ref, got) > 30.0  # W8A8 quantization-noise floor


def test_fused_mlp_close_to_xla_w8a8(weights):
    xla = mlp_w8_reference(
        weights["x"], weights["fc_wq"], weights["fc_ws"], weights["fc_b"],
        weights["proj_wq"], weights["proj_ws"], weights["proj_b"],
    )
    got = fused_mlp_w8(
        weights["x"], weights["fc_wq"], weights["fc_ws"], weights["fc_b"],
        weights["proj_wq"], weights["proj_ws"], weights["proj_b"],
        tile_i=256, interpret=True,
    )
    # same recipe, finer gelu-requant granularity: they agree to the shared
    # quantization-noise scale, against each other and against f32
    assert _snr_db(xla, got) > 28.0


def test_fused_mlp_tile_count_invariance(weights):
    a = fused_mlp_w8(
        weights["x"], weights["fc_wq"], weights["fc_ws"], weights["fc_b"],
        weights["proj_wq"], weights["proj_ws"], weights["proj_b"],
        tile_i=1024, interpret=True,  # single tile == per-full-row requant
    )
    xla = mlp_w8_reference(
        weights["x"], weights["fc_wq"], weights["fc_ws"], weights["fc_b"],
        weights["proj_wq"], weights["proj_ws"], weights["proj_b"],
    )
    # one tile spanning all of I is EXACTLY the production recipe
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(xla, np.float32),
        rtol=0, atol=2e-5,
    )
