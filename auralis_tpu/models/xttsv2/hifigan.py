"""HiFi-GAN waveform decoder in pure-functional JAX.

Capability parity with the reference generator (hifigan_decoder.py:145-260,
692-802): conv_pre(k7) -> 4x [ConvTranspose1d upsample + speaker-conditioning
1x1 + MRF of 3 ResBlock1 averaged] -> leaky_relu -> conv_post(k7) -> tanh,
with the d-vector injected at the input and at every upsample stage, and the
two linear interpolations (x4 latent stretch, 22.05->24 kHz) up front.

TPU-first details: feature-last [B, T, C] layout (channels on the lane dim),
weight-norm folded into plain kernels at load time, transposed convs lowered
to lhs-dilated convolutions, whole decoder is one jitted program over bucketed
latent lengths.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.interpolate import interp_linear_scale

LRELU_SLOPE = 0.1

# generator hyperparams (reference HifiDecoder defaults, hifigan_decoder.py:700-723)
UPSAMPLE_RATES = (8, 8, 2, 2)
UPSAMPLE_KERNELS = (16, 16, 4, 4)
UPSAMPLE_INITIAL = 512
RESBLOCK_KERNELS = (3, 7, 11)
RESBLOCK_DILATIONS = (1, 3, 5)


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
            stride: int = 1, padding: int = 0, dilation: int = 1) -> jax.Array:
    """x [B, T, C], w [K, I, O]."""
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + b if b is not None else y


def _conv_transpose1d(x: jax.Array, w: jax.Array, b: jax.Array,
                      stride: int, kernel: int, padding: int) -> jax.Array:
    """torch ConvTranspose1d(stride, padding) == lhs-dilated conv with the
    kernel flipped; w here is already stored flipped as [K, I, O]."""
    y = lax.conv_general_dilated(
        x, w, window_strides=(1,),
        padding=[(kernel - 1 - padding, kernel - 1 - padding)],
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + b


def _resblock1(p: dict, x: jax.Array, kernel: int) -> jax.Array:
    """ResBlock1: 3 x [lrelu -> dilated conv -> lrelu -> conv] with residuals
    (reference hifigan_decoder.py:27-97)."""
    for conv1, conv2, dilation in zip(p["convs1"], p["convs2"], RESBLOCK_DILATIONS):
        h = jax.nn.leaky_relu(x, LRELU_SLOPE)
        h = _conv1d(h, conv1["w"], conv1["b"], padding=(kernel * dilation - dilation) // 2,
                    dilation=dilation)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        h = _conv1d(h, conv2["w"], conv2["b"], padding=(kernel - 1) // 2)
        x = x + h
    return x


def hifigan_generator(params: dict, x: jax.Array, g: jax.Array,
                      packed_resblocks=None, packed_stages=None) -> jax.Array:
    """x [B, T, C_in], g [B, d_vector] -> waveform [B, T * prod(rates)].

    `packed_resblocks` (a list of ops.mrf.PackedResblock, prepared host-side
    from concrete weights) routes the MRF through the fused Pallas kernel;
    None keeps the XLA conv path (CPU / parity tests). `packed_stages`
    (optional list of 4, entries ops.mrf.PackedMRFStage or None) upgrades a
    whole stage to the merged three-blocks-in-one-kernel form where its
    weights fit VMEM — bit-identical output, one x read instead of three."""
    dtype = params["conv_pre_w"].dtype
    x = x.astype(dtype)
    g = g.astype(dtype)
    h = _conv1d(x, params["conv_pre_w"], params["conv_pre_b"], padding=3)
    h = h + jnp.einsum("bd,do->bo", g, params["cond_w"])[:, None, :] + params["cond_b"]
    for i, (rate, kernel) in enumerate(zip(UPSAMPLE_RATES, UPSAMPLE_KERNELS)):
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        up = params["ups"][i]
        # NOTE: a polyphase decomposition of this transposed conv (one dense
        # [T_in, n*C_in] @ [n*C_in, stride*C_out] matmul instead of the
        # zero-stuffed lhs-dilated conv) was measured perf-neutral on v5e —
        # XLA already skips the stuffed zeros — so the simpler form stays.
        h = _conv_transpose1d(h, up["w"], up["b"], stride=rate, kernel=kernel,
                              padding=(kernel - rate) // 2)
        cond = params["conds"][i]
        h = h + jnp.einsum("bd,do->bo", g, cond["w"])[:, None, :] + cond["b"]
        if packed_stages is not None and packed_stages[i] is not None:
            h = packed_stages[i](h).astype(x.dtype)
        else:
            acc = None
            for j, rk in enumerate(RESBLOCK_KERNELS):
                idx = i * len(RESBLOCK_KERNELS) + j
                if packed_resblocks is not None:
                    z = packed_resblocks[idx](h)
                else:
                    z = _resblock1(params["resblocks"][idx], h, rk)
                acc = z.astype(jnp.float32) if acc is None else acc + z.astype(jnp.float32)
            h = (acc / len(RESBLOCK_KERNELS)).astype(x.dtype)
    h = jax.nn.leaky_relu(h, 0.01)  # final lrelu uses the torch default slope
    h = _conv1d(h, params["conv_post_w"], padding=3)  # no bias (conv_post_bias=False)
    return jnp.tanh(h)[..., 0]


def hifi_decoder(
    params: dict,
    latents: jax.Array,  # [B, T, D] GPT latents
    g: jax.Array,  # [B, d_vector]
    *,
    ar_mel_length_compression: int = 1024,
    output_hop_length: int = 256,
    input_sample_rate: int = 22050,
    output_sample_rate: int = 24000,
    packed_resblocks=None,
    packed_stages=None,
) -> jax.Array:
    """Latents -> 24 kHz waveform (reference HifiDecoder.forward,
    hifigan_decoder.py:776-802)."""
    z = jnp.swapaxes(latents, 1, 2)  # [B, D, T]
    z = interp_linear_scale(z, ar_mel_length_compression / output_hop_length)
    if output_sample_rate != input_sample_rate:
        z = interp_linear_scale(z, output_sample_rate / input_sample_rate)
    return hifigan_generator(params, jnp.swapaxes(z, 1, 2), g,
                             packed_resblocks=packed_resblocks,
                             packed_stages=packed_stages)


# ----------------------------------------------------------------- init


def init_hifigan_params(
    key: jax.Array,
    in_channels: int = 1024,
    cond_channels: int = 512,
    upsample_initial: int = UPSAMPLE_INITIAL,
    dtype=jnp.float32,
) -> dict:
    """Random init (for tests / random engines); real weights come from the
    checkpoint loader with weight-norm folded."""
    ks = iter(jax.random.split(key, 256))
    n = lambda shape, scale=0.02: (scale * jax.random.normal(next(ks), shape)).astype(dtype)

    params = {
        "conv_pre_w": n((7, in_channels, upsample_initial)),
        "conv_pre_b": jnp.zeros((upsample_initial,), dtype),
        "cond_w": n((cond_channels, upsample_initial)),
        "cond_b": jnp.zeros((upsample_initial,), dtype),
        "ups": [],
        "conds": [],
        "resblocks": [],
    }
    ch = upsample_initial
    for i, (rate, kernel) in enumerate(zip(UPSAMPLE_RATES, UPSAMPLE_KERNELS)):
        out_ch = upsample_initial // (2 ** (i + 1))
        params["ups"].append({"w": n((kernel, ch, out_ch)), "b": jnp.zeros((out_ch,), dtype)})
        params["conds"].append({"w": n((cond_channels, out_ch)), "b": jnp.zeros((out_ch,), dtype)})
        for rk in RESBLOCK_KERNELS:
            params["resblocks"].append(
                {
                    "convs1": [
                        {"w": n((rk, out_ch, out_ch)), "b": jnp.zeros((out_ch,), dtype)}
                        for _ in RESBLOCK_DILATIONS
                    ],
                    "convs2": [
                        {"w": n((rk, out_ch, out_ch)), "b": jnp.zeros((out_ch,), dtype)}
                        for _ in RESBLOCK_DILATIONS
                    ],
                }
            )
        ch = out_ch
    params["conv_post_w"] = n((7, ch, 1))
    return params
