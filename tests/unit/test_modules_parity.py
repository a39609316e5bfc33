"""Numerical parity of the JAX conditioning/vocoder modules against the
reference torch implementations (loaded from /root/reference as test oracles;
skipped when the reference tree isn't mounted). No reference code is imported
into the package itself — this is a test-only oracle.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = Path("/root/reference/src/auralis/models/xttsv2/components/tts/layers/xtts")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_hifigan_module():
    """hifigan_decoder.py imports torchaudio + a package-relative helper; stub
    both (neither is used by the generator forward path)."""
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.transforms = types.SimpleNamespace(MelSpectrogram=lambda **kw: torch.nn.Identity())
        ta.functional = types.SimpleNamespace()
        sys.modules["torchaudio"] = ta
    src = (REF / "hifigan_decoder.py").read_text()
    src = src.replace("from .......common.utilities import load_fsspec", "load_fsspec = None")
    mod = types.ModuleType("ref_hifigan")
    mod.__dict__["__file__"] = str(REF / "hifigan_decoder.py")
    exec(compile(src, str(REF / "hifigan_decoder.py"), "exec"), mod.__dict__)
    return mod


def t2n(x):
    return x.detach().numpy()


# ------------------------------------------------------- conditioning encoder
def test_conditioning_encoder_parity():
    from auralis_tpu.models.xttsv2.modules import conditioning_encoder

    ref_mod = _load_module("ref_latent_encoder", REF / "latent_encoder.py")
    torch.manual_seed(0)
    spec_dim, embed, heads, blocks = 80, 128, 4, 3
    ref = ref_mod.ConditioningEncoder(spec_dim, embed, attn_blocks=blocks, num_attn_heads=heads)
    ref.eval()
    # the reference zero-inits proj_out; randomize it so parity is non-trivial
    with torch.no_grad():
        for m in ref.attn:
            m.proj_out.weight.normal_(0, 0.02)
            m.proj_out.bias.normal_(0, 0.02)

    params = {
        "init_w": jnp.asarray(t2n(ref.init.weight)[:, :, 0].T),
        "init_b": jnp.asarray(t2n(ref.init.bias)),
        "blocks": [],
    }
    for m in ref.attn:
        params["blocks"].append(
            {
                "norm_scale": jnp.asarray(t2n(m.norm.weight)),
                "norm_bias": jnp.asarray(t2n(m.norm.bias)),
                "qkv_w": jnp.asarray(t2n(m.qkv.weight)[:, :, 0].T),
                "qkv_b": jnp.asarray(t2n(m.qkv.bias)),
                "proj_w": jnp.asarray(t2n(m.proj_out.weight)[:, :, 0].T),
                "proj_b": jnp.asarray(t2n(m.proj_out.bias)),
            }
        )

    x = np.random.default_rng(0).standard_normal((2, spec_dim, 50)).astype(np.float32)
    with torch.no_grad():
        ref_out = t2n(ref(torch.from_numpy(x)))  # [B, embed, T]
    ours = np.asarray(conditioning_encoder(params, jnp.asarray(x.transpose(0, 2, 1)), heads))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref_out, rtol=2e-4, atol=2e-4)


# ------------------------------------------------------------------ perceiver
def test_perceiver_parity():
    from auralis_tpu.models.xttsv2.modules import perceiver_resampler

    ref_mod = _load_module("ref_perceiver", REF / "perceiver_encoder.py")
    torch.manual_seed(0)
    dim, heads, dim_head, latents_n = 64, 4, 16, 8
    ref = ref_mod.PerceiverResampler(
        dim=dim, depth=2, dim_context=dim, num_latents=latents_n,
        dim_head=dim_head, heads=heads, ff_mult=4, use_flash_attn=False,
    )
    ref.eval()

    layers = []
    for attn, ff in ref.layers:
        layers.append(
            {
                "attn": {
                    "to_q": jnp.asarray(t2n(attn.to_q.weight).T),
                    "to_kv": jnp.asarray(t2n(attn.to_kv.weight).T),
                    "to_out": jnp.asarray(t2n(attn.to_out.weight).T),
                },
                "ff": {
                    "w1": jnp.asarray(t2n(ff[0].weight).T),
                    "b1": jnp.asarray(t2n(ff[0].bias)),
                    "w2": jnp.asarray(t2n(ff[2].weight).T),
                    "b2": jnp.asarray(t2n(ff[2].bias)),
                },
            }
        )
    params = {
        "latents": jnp.asarray(t2n(ref.latents)),
        "layers": layers,
        "norm_gamma": jnp.asarray(t2n(ref.norm.gamma)),
    }

    x = np.random.default_rng(1).standard_normal((2, 30, dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = t2n(ref(torch.from_numpy(x)))
    ours = np.asarray(perceiver_resampler(params, jnp.asarray(x), heads=heads))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)


# ------------------------------------------------------------------ hifigan
def _fold_weight_norm(module):
    """Materialize weight-norm parametrizations into plain tensors."""
    w = module.weight  # parametrized access computes g * v/||v||
    return w.detach()


def test_hifigan_generator_parity():
    from auralis_tpu.models.xttsv2.hifigan import hifigan_generator

    ref_mod = _load_hifigan_module()
    torch.manual_seed(0)
    ref = ref_mod.HifiganGenerator(
        in_channels=32,
        out_channels=1,
        resblock_type="1",
        resblock_dilation_sizes=[[1, 3, 5]] * 3,
        resblock_kernel_sizes=[3, 7, 11],
        upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=64,
        upsample_factors=[8, 8, 2, 2],
        inference_padding=0,
        cond_channels=16,
        conv_pre_weight_norm=False,
        conv_post_weight_norm=False,
        conv_post_bias=False,
        cond_in_each_up_layer=True,
    )
    ref.eval()

    def conv_w(m):  # torch conv1d [O, I, K] -> ours [K, I, O]
        return jnp.asarray(_fold_weight_norm(m).numpy().transpose(2, 1, 0))

    def convT_w(m):  # torch convT [I, O, K] -> flipped [K, I, O]
        w = _fold_weight_norm(m).numpy()[:, :, ::-1]  # flip kernel
        return jnp.asarray(np.ascontiguousarray(w.transpose(2, 0, 1)))

    params = {
        "conv_pre_w": conv_w(ref.conv_pre),
        "conv_pre_b": jnp.asarray(t2n(ref.conv_pre.bias)),
        "cond_w": jnp.asarray(t2n(ref.cond_layer.weight)[:, :, 0].T),
        "cond_b": jnp.asarray(t2n(ref.cond_layer.bias)),
        "ups": [{"w": convT_w(u), "b": jnp.asarray(t2n(u.bias))} for u in ref.ups],
        "conds": [
            {"w": jnp.asarray(t2n(c.weight)[:, :, 0].T), "b": jnp.asarray(t2n(c.bias))}
            for c in ref.conds
        ],
        "resblocks": [
            {
                "convs1": [{"w": conv_w(c), "b": jnp.asarray(t2n(c.bias))} for c in rb.convs1],
                "convs2": [{"w": conv_w(c), "b": jnp.asarray(t2n(c.bias))} for c in rb.convs2],
            }
            for rb in ref.resblocks
        ],
        "conv_post_w": conv_w(ref.conv_post),
    }

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 32, 19)).astype(np.float32)  # [B, C, T]
    g = rng.standard_normal((1, 16, 1)).astype(np.float32)
    with torch.no_grad():
        # reference forward does conv_pre(x).unsqueeze(0) (expects unbatched 2D)
        ref_out = ref(torch.from_numpy(x[0]), g=torch.from_numpy(g)).numpy()
    ours = np.asarray(
        hifigan_generator(params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(g[:, :, 0]))
    )
    assert ours.shape[-1] == ref_out.shape[-1]
    np.testing.assert_allclose(ours[0], ref_out.reshape(-1), rtol=5e-4, atol=5e-4)


# ----------------------------------------------------------- speaker encoder
def _fold_bn(bn):
    scale = bn.weight / torch.sqrt(bn.running_var + bn.eps)
    shift = bn.bias - bn.running_mean * scale
    return jnp.asarray(t2n(scale)), jnp.asarray(t2n(shift))


def test_speaker_encoder_parity():
    from auralis_tpu.models.xttsv2.modules import speaker_encoder_from_features

    ref_mod = _load_hifigan_module()
    torch.manual_seed(3)
    ref = ref_mod.ResNetSpeakerEncoder(
        input_dim=64, proj_dim=512, log_input=False, use_torch_spec=False
    )
    ref.eval()
    # randomize BN running stats so folding is actually exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    def conv2_w(m):  # [O, I, kh, kw] -> [kh, kw, I, O]
        return jnp.asarray(t2n(m.weight).transpose(2, 3, 1, 0))

    def block_params(blk):
        p = {
            "conv1_w": conv2_w(blk.conv1),
            "conv2_w": conv2_w(blk.conv2),
            "se": {
                "fc1_w": jnp.asarray(t2n(blk.se.fc[0].weight).T),
                "fc1_b": jnp.asarray(t2n(blk.se.fc[0].bias)),
                "fc2_w": jnp.asarray(t2n(blk.se.fc[2].weight).T),
                "fc2_b": jnp.asarray(t2n(blk.se.fc[2].bias)),
            },
        }
        p["bn1_scale"], p["bn1_shift"] = _fold_bn(blk.bn1)
        p["bn2_scale"], p["bn2_shift"] = _fold_bn(blk.bn2)
        if blk.downsample is not None:
            p["down_w"] = conv2_w(blk.downsample[0])
            p["down_bn_scale"], p["down_bn_shift"] = _fold_bn(blk.downsample[1])
        return p

    params = {
        "conv1_w": conv2_w(ref.conv1),
        "conv1_b": jnp.asarray(t2n(ref.conv1.bias)),
        "att1_w": jnp.asarray(t2n(ref.attention[0].weight)[:, :, 0].T),
        "att1_b": jnp.asarray(t2n(ref.attention[0].bias)),
        "att2_w": jnp.asarray(t2n(ref.attention[3].weight)[:, :, 0].T),
        "att2_b": jnp.asarray(t2n(ref.attention[3].bias)),
        "fc_w": jnp.asarray(t2n(ref.fc.weight).T),
        "fc_b": jnp.asarray(t2n(ref.fc.bias)),
    }
    params["bn1_scale"], params["bn1_shift"] = _fold_bn(ref.bn1)
    params["att_bn_scale"], params["att_bn_shift"] = _fold_bn(ref.attention[2])
    for li in range(1, 5):
        params[f"layer{li}"] = [block_params(b) for b in getattr(ref, f"layer{li}")]

    x = np.random.default_rng(4).standard_normal((2, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref_out = t2n(ref(torch.from_numpy(x.copy()), l2_norm=True))
    ours = np.asarray(speaker_encoder_from_features(params, jnp.asarray(x), l2_norm=True))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-3)
