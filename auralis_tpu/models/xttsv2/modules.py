"""Conditioning neural modules in pure-functional JAX.

Covers the reference's eager-torch conditioning stack with identical math:
- ConditioningEncoder: 1x1 conv 80->D + 6 tortoise-style QKV attention blocks
  (reference: components/tts/layers/xtts/latent_encoder.py:209-253)
- PerceiverResampler: 32 learned latents cross-attending (queries included in
  context), depth 2, GEGLU FF, RMSNorm (reference: perceiver_encoder.py:363-485)
- ResNetSpeakerEncoder: SE-ResNet(3,4,6,3) + attentive stat pooling -> 512-d
  d-vector (reference: hifigan_decoder.py:485-646)

Layout is feature-last ([B, T, C] / [B, H, W, C]) so channels ride the TPU
lane dimension; BatchNorm is folded to scale/shift at weight-load time.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.mel import speaker_encoder_mel


# ----------------------------------------------------------- building blocks
def group_norm_32(x: jax.Array, scale: jax.Array, bias: jax.Array, groups: int,
                  eps: float = 1e-5) -> jax.Array:
    """GroupNorm over (group-channels, time), computed in f32
    (reference GroupNorm32, latent_encoder.py:10-27). x: [B, T, C]."""
    b, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    y = ((xf - mu) * lax.rsqrt(var + eps)).reshape(b, t, c)
    return (y * scale + bias).astype(x.dtype)


def norm_groups(channels: int) -> int:
    """Group count heuristic shared with the reference (latent_encoder.py:53-73)."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups //= 2
    assert groups > 2
    return groups


def qkv_attention(qkv: jax.Array, n_heads: int) -> jax.Array:
    """Tortoise QKV attention over time. qkv: [B, T, 3C] -> [B, T, C].
    Uses the double-sqrt scaling of the reference (latent_encoder.py:122)."""
    b, t, w = qkv.shape
    c = w // 3
    ch = c // n_heads
    # channel layout is head-major: [H, (q|k|v), ch] (latent_encoder.py:121)
    qkv = qkv.reshape(b, t, n_heads, 3, ch)
    q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]  # [B, T, H, ch]
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhts,bshc->bthc", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(b, t, c).astype(qkv.dtype)


def attention_block(params: dict, x: jax.Array, n_heads: int) -> jax.Array:
    """norm -> 1x1 qkv -> attention -> zero-init 1x1 proj -> residual.
    x: [B, T, C]."""
    c = x.shape[-1]
    h = group_norm_32(x, params["norm_scale"], params["norm_bias"], norm_groups(c))
    qkv = jnp.einsum("btc,cd->btd", h, params["qkv_w"]) + params["qkv_b"]
    a = qkv_attention(qkv, n_heads)
    a = jnp.einsum("btc,cd->btd", a, params["proj_w"]) + params["proj_b"]
    return h + a  # x_proj is Identity -> residual from the normed input


def conditioning_encoder(params: dict, mel: jax.Array, n_heads: int) -> jax.Array:
    """mel [B, T, n_mels] -> [B, T, D]."""
    h = jnp.einsum("btm,md->btd", mel, params["init_w"]) + params["init_b"]
    for blk in params["blocks"]:
        h = attention_block(blk, h, n_heads)
    return h


# -------------------------------------------------------- perceiver resampler
def rms_norm(x: jax.Array, gamma: jax.Array) -> jax.Array:
    """F.normalize(x, dim=-1) * sqrt(D) * gamma (reference RMSNorm,
    perceiver_encoder.py:243-284)."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    normed = xf * lax.rsqrt(jnp.maximum(jnp.sum(xf * xf, -1, keepdims=True), 1e-24))
    return (normed * math.sqrt(d) * gamma).astype(x.dtype)


def _perceiver_attention(p: dict, latents: jax.Array, ctx: jax.Array, heads: int) -> jax.Array:
    """Cross-attention where the queries are prepended to the context
    (reference Attention, perceiver_encoder.py:445-485)."""
    full_ctx = jnp.concatenate([latents, ctx], axis=1)
    q = jnp.einsum("bnd,de->bne", latents, p["to_q"])
    kv = jnp.einsum("bnd,de->bne", full_ctx, p["to_kv"])
    k, v = jnp.split(kv, 2, axis=-1)
    b, n, e = q.shape
    dh = e // heads
    q = q.reshape(b, n, heads, dh)
    k = k.reshape(b, -1, heads, dh)
    v = v.reshape(b, -1, heads, dh)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(dh)
    probs = jax.nn.softmax(logits, axis=-1).astype(latents.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v, preferred_element_type=jnp.float32)
    out = out.reshape(b, n, e).astype(latents.dtype)
    return jnp.einsum("bne,ed->bnd", out, p["to_out"])


def _geglu_ff(p: dict, x: jax.Array) -> jax.Array:
    h = jnp.einsum("bnd,de->bne", x, p["w1"]) + p["b1"]
    a, gate = jnp.split(h, 2, axis=-1)
    h = jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype) * a
    return jnp.einsum("bne,ed->bnd", h, p["w2"]) + p["b2"]


def perceiver_resampler(params: dict, x: jax.Array, heads: int = 8) -> jax.Array:
    """x [B, T, D] -> [B, num_latents, D]."""
    b = x.shape[0]
    latents = jnp.broadcast_to(params["latents"], (b, *params["latents"].shape))
    latents = latents.astype(x.dtype)
    for layer in params["layers"]:
        latents = _perceiver_attention(layer["attn"], latents, x, heads) + latents
        latents = _geglu_ff(layer["ff"], latents) + latents
    return rms_norm(latents, params["norm_gamma"])


# ------------------------------------------------------------------- init


def init_conditioning_encoder_params(
    key: jax.Array, spec_dim: int = 80, embed_dim: int = 1024, attn_blocks: int = 6,
    dtype=jnp.float32,
) -> dict:
    ks = iter(jax.random.split(key, 2 + 2 * attn_blocks))
    n = lambda shape: (0.02 * jax.random.normal(next(ks), shape)).astype(dtype)
    blocks = []
    for _ in range(attn_blocks):
        blocks.append(
            {
                "norm_scale": jnp.ones((embed_dim,), dtype),
                "norm_bias": jnp.zeros((embed_dim,), dtype),
                "qkv_w": n((embed_dim, 3 * embed_dim)),
                "qkv_b": jnp.zeros((3 * embed_dim,), dtype),
                # reference zero-inits proj_out (latent_encoder.py:178)
                "proj_w": jnp.zeros((embed_dim, embed_dim), dtype),
                "proj_b": jnp.zeros((embed_dim,), dtype),
            }
        )
    return {"init_w": n((spec_dim, embed_dim)), "init_b": jnp.zeros((embed_dim,), dtype),
            "blocks": blocks}


def init_perceiver_params(
    key: jax.Array, dim: int = 1024, depth: int = 2, num_latents: int = 32,
    dim_head: int = 64, heads: int = 8, ff_mult: int = 4, dtype=jnp.float32,
) -> dict:
    ks = iter(jax.random.split(key, 2 + 8 * depth))
    n = lambda shape: (0.02 * jax.random.normal(next(ks), shape)).astype(dtype)
    inner = dim_head * heads
    ff_inner = int(dim * ff_mult * 2 / 3)
    layers = []
    for _ in range(depth):
        layers.append(
            {
                "attn": {"to_q": n((dim, inner)), "to_kv": n((dim, inner * 2)),
                         "to_out": n((inner, dim))},
                "ff": {"w1": n((dim, ff_inner * 2)), "b1": jnp.zeros((ff_inner * 2,), dtype),
                       "w2": n((ff_inner, dim)), "b2": jnp.zeros((dim,), dtype)},
            }
        )
    return {"latents": n((num_latents, dim)), "layers": layers,
            "norm_gamma": jnp.ones((dim,), dtype)}


def init_speaker_encoder_params(key: jax.Array, dtype=jnp.float32) -> dict:
    """Random init with the reference topology: filters (32,64,128,256),
    layers (3,4,6,3), proj 512, input 64 mels."""
    ks = iter(jax.random.split(key, 256))
    n = lambda shape, scale=0.05: (scale * jax.random.normal(next(ks), shape)).astype(dtype)
    filters = [32, 64, 128, 256]
    layer_sizes = [3, 4, 6, 3]

    def se(ch):
        r = ch // 8
        return {"fc1_w": n((ch, r)), "fc1_b": jnp.zeros((r,), dtype),
                "fc2_w": n((r, ch)), "fc2_b": jnp.zeros((ch,), dtype)}

    def block(in_ch, ch, downsample):
        p = {
            "conv1_w": n((3, 3, in_ch, ch)),
            "bn1_scale": jnp.ones((ch,), dtype), "bn1_shift": jnp.zeros((ch,), dtype),
            "conv2_w": n((3, 3, ch, ch)),
            "bn2_scale": jnp.ones((ch,), dtype), "bn2_shift": jnp.zeros((ch,), dtype),
            "se": se(ch),
        }
        if downsample:
            p["down_w"] = n((1, 1, in_ch, ch))
            p["down_bn_scale"] = jnp.ones((ch,), dtype)
            p["down_bn_shift"] = jnp.zeros((ch,), dtype)
        return p

    params = {
        "conv1_w": n((3, 3, 1, filters[0])), "conv1_b": jnp.zeros((filters[0],), dtype),
        "bn1_scale": jnp.ones((filters[0],), dtype), "bn1_shift": jnp.zeros((filters[0],), dtype),
    }
    in_ch = filters[0]
    for li, (ch, blocks) in enumerate(zip(filters, layer_sizes)):
        layer = []
        for j in range(blocks):
            downsample = j == 0 and (li > 0 or in_ch != ch)
            layer.append(block(in_ch if j == 0 else ch, ch, downsample))
        params[f"layer{li + 1}"] = layer
        in_ch = ch
    feat = filters[3] * (64 // 8)  # 2048
    params.update(
        {
            "att1_w": n((feat, 128)), "att1_b": jnp.zeros((128,), dtype),
            "att_bn_scale": jnp.ones((128,), dtype), "att_bn_shift": jnp.zeros((128,), dtype),
            "att2_w": n((128, feat)), "att2_b": jnp.zeros((feat,), dtype),
            "fc_w": n((feat * 2, 512)), "fc_b": jnp.zeros((512,), dtype),
        }
    )
    return params


# ------------------------------------------------------------ speaker encoder
def _conv2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
            stride: tuple[int, int] = (1, 1), padding: int = 1) -> jax.Array:
    """x [B,H,W,C], w [kh,kw,I,O]."""
    y = lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b if b is not None else y


def _se_layer(p: dict, x: jax.Array) -> jax.Array:
    """Squeeze-excitation over [B,H,W,C]."""
    s = jnp.mean(x, axis=(1, 2))  # [B, C]
    s = jax.nn.relu(s @ p["fc1_w"] + p["fc1_b"])
    s = jax.nn.sigmoid(s @ p["fc2_w"] + p["fc2_b"])
    return x * s[:, None, None, :]


def _se_block(p: dict, x: jax.Array, stride: tuple[int, int]) -> jax.Array:
    """SEBasicBlock with the reference's conv->relu->bn ordering
    (hifigan_decoder.py:407-431). BN is pre-folded to scale/shift."""
    res = x
    h = _conv2d(x, p["conv1_w"], stride=stride)
    h = jax.nn.relu(h)
    h = h * p["bn1_scale"] + p["bn1_shift"]
    h = _conv2d(h, p["conv2_w"])
    h = h * p["bn2_scale"] + p["bn2_shift"]
    h = _se_layer(p["se"], h)
    if "down_w" in p:
        res = lax.conv_general_dilated(
            x, p["down_w"], window_strides=stride, padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        res = res * p["down_bn_scale"] + p["down_bn_shift"]
    return jax.nn.relu(h + res)


def speaker_encoder(params: dict, wav_16k: jax.Array, l2_norm: bool = True) -> jax.Array:
    """wav [B, T] at 16 kHz -> d-vector [B, 512]."""
    mel = speaker_encoder_mel(wav_16k)  # log-mel [B, 64, frames]
    return speaker_encoder_from_features(params, mel, l2_norm=l2_norm)


def speaker_encoder_from_features(
    params: dict, feats: jax.Array, l2_norm: bool = True
) -> jax.Array:
    """feats [B, 64, frames] (pre-instance-norm) -> d-vector [B, 512]."""
    # InstanceNorm1d(affine=False): per-channel normalization over time
    mu = jnp.mean(feats, axis=-1, keepdims=True)
    var = jnp.var(feats, axis=-1, keepdims=True)
    x = (feats - mu) * lax.rsqrt(var + 1e-5)
    # torch layout is [B, 1, n_mels, frames] -> NHWC [B, H=n_mels, W=frames, C=1]
    x = x[..., None].astype(params["conv1_w"].dtype)

    h = _conv2d(x, params["conv1_w"], params["conv1_b"])
    h = jax.nn.relu(h)
    h = h * params["bn1_scale"] + params["bn1_shift"]
    for i, layer in enumerate(("layer1", "layer2", "layer3", "layer4")):
        for j, blk in enumerate(params[layer]):
            stride = (2, 2) if (i > 0 and j == 0) else (1, 1)
            h = _se_block(blk, h, stride)
    # h: [B, 8, T', 256] (mel-axis downsampled 64->8) -> [B, T', 2048]
    b, hh, tt, cc = h.shape
    feats = jnp.transpose(h, (0, 2, 3, 1)).reshape(b, tt, cc * hh)
    # NOTE: torch reshape is x.reshape(B, C*H, T) with channel-major order —
    # flatten (C, H) with C slower: [B, T, C*H] where index = c*H + h_idx.

    w = jnp.einsum("btf,fk->btk", feats, params["att1_w"]) + params["att1_b"]
    w = jax.nn.relu(w)
    w = w * params["att_bn_scale"] + params["att_bn_shift"]
    w = jnp.einsum("btk,kf->btf", w, params["att2_w"]) + params["att2_b"]
    w = jax.nn.softmax(w, axis=1)  # over time

    mu = jnp.sum(feats * w, axis=1)
    sg = jnp.sqrt(jnp.clip(jnp.sum(feats**2 * w, axis=1) - mu**2, 1e-5, None))
    stats = jnp.concatenate([mu, sg], axis=-1)  # [B, 4096]
    out = stats @ params["fc_w"] + params["fc_b"]
    if l2_norm:
        out = out * lax.rsqrt(jnp.maximum(jnp.sum(out * out, -1, keepdims=True), 1e-24))
    return out
