"""Checkpoint-loader tests: reference-format state dicts (exact key names,
Conv1D orientation, weight-norm parametrizations, BatchNorm running stats)
must load into JAX pytrees that reproduce the torch modules' outputs.
Mirrors the reference's only hermetic test (test_checkpoint_converter.py),
but goes further: it validates numerics, not just key mapping."""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.weights import (
    infer_architecture,
    load_core_params,
    load_gpt_params,
    split_coqui_state,
)

REF = Path("/root/reference/src/auralis/models/xttsv2/components/tts/layers/xtts")


def _np_state(module: torch.nn.Module, prefix: str = "") -> dict:
    return {
        (f"{prefix}{k}"): v.detach().numpy()
        for k, v in module.state_dict().items()
    }


# ------------------------------------------------------------------ GPT side
def test_load_gpt_params_reproduces_hf():
    from transformers import GPT2Config, GPT2Model
    from auralis_tpu.models.xttsv2.gpt import (
        gpt_prefill, layer_norm, make_kv_cache,
    )

    cfg = tiny_test_config().gpt
    torch.manual_seed(0)
    hf = GPT2Model(
        GPT2Config(
            vocab_size=cfg.num_audio_tokens,
            n_positions=cfg.audio_position_table,
            n_embd=cfg.hidden_size,
            n_layer=cfg.num_hidden_layers,
            n_head=cfg.num_attention_heads,
            n_inner=cfg.n_inner,
            activation_function="gelu",
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
    )
    hf.eval()
    # zero a wpe row so we can emulate "no position" prompt-embeds in HF
    with torch.no_grad():
        hf.wpe.weight[cfg.audio_position_table - 1].zero_()

    # assemble the reference gpt2_model.safetensors key layout
    state = {}
    for k, v in hf.state_dict().items():
        if k.startswith("h.") or k.startswith("ln_f."):
            state[f"gpt.{k}"] = v.numpy()
    state["gpt.wte.weight"] = hf.wte.weight.detach().numpy()
    state["gpt.wpe.emb.weight"] = hf.wpe.weight.detach().numpy()
    state["mel_head.weight"] = np.random.default_rng(0).standard_normal(
        (cfg.num_audio_tokens, cfg.hidden_size)
    ).astype(np.float32)
    state["mel_head.bias"] = np.zeros(cfg.num_audio_tokens, np.float32)
    state["final_norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    state["final_norm.bias"] = np.zeros(cfg.hidden_size, np.float32)
    # drop torch's non-parameter extras
    state = {
        k: v for k, v in state.items()
        if not k.endswith(".attn.bias") and "masked_bias" not in k
    }

    params = load_gpt_params(state, cfg, dtype=jnp.float32)
    params["text_wte"] = jnp.zeros((4, cfg.hidden_size))
    params["text_wpe"] = jnp.zeros((4, cfg.hidden_size))

    rng = np.random.default_rng(1)
    t_len = 9
    prompt = 0.3 * rng.standard_normal((t_len, cfg.hidden_size)).astype(np.float32)
    with torch.no_grad():
        want = hf(
            inputs_embeds=torch.from_numpy(prompt)[None],
            position_ids=torch.full((1, t_len), cfg.audio_position_table - 1),
        ).last_hidden_state[0, -1].numpy()

    cache = make_kv_cache(cfg, 1, dtype=jnp.float32)
    pad = np.zeros((16, cfg.hidden_size), np.float32)
    pad[:t_len] = prompt
    h, _ = gpt_prefill(params, cfg, jnp.asarray(pad), jnp.int32(t_len), jnp.int32(0), cache)
    got = np.asarray(layer_norm(h, params["ln_f_scale"], params["ln_f_bias"]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ----------------------------------------------------------------- core side
@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_load_core_params_reproduces_torch():
    """Build a reference-shaped core artifact (hifigan with live weight-norm
    parametrizations + speaker encoder with random BN stats + perceiver +
    conditioning encoder), load it, and compare module outputs."""
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.transforms = types.SimpleNamespace(MelSpectrogram=lambda **kw: torch.nn.Identity())
        sys.modules["torchaudio"] = ta

    def load_module(name, path, patch=None):
        src = Path(path).read_text()
        if patch:
            src = src.replace(*patch)
        mod = types.ModuleType(name)
        exec(compile(src, str(path), "exec"), mod.__dict__)
        return mod

    lat = load_module("ref_lat2", REF / "latent_encoder.py")
    per = load_module("ref_per2", REF / "perceiver_encoder.py")
    hifi = load_module(
        "ref_hifi2", REF / "hifigan_decoder.py",
        patch=("from .......common.utilities import load_fsspec", "load_fsspec = None"),
    )

    torch.manual_seed(0)
    cfg = tiny_test_config()
    g = cfg.gpt
    d = g.hidden_size

    class Container(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("mel_stats", torch.rand(80) + 0.5)
            self.conditioning_encoder = lat.ConditioningEncoder(80, d, attn_blocks=2, num_attn_heads=4)
            self.text_embedding = torch.nn.Embedding(g.number_text_tokens, d)
            self.text_pos_embedding = torch.nn.Module()
            self.text_pos_embedding.emb = torch.nn.Embedding(g.text_position_table, d)
            self.conditioning_perceiver = per.PerceiverResampler(
                dim=d, depth=2, dim_context=d, num_latents=g.num_cond_latents,
                dim_head=16, heads=4, ff_mult=4, use_flash_attn=False,
            )
            self.hifigan_decoder = torch.nn.Module()
            self.hifigan_decoder.waveform_decoder = hifi.HifiganGenerator(
                d, 1, "1", [[1, 3, 5]] * 3, [3, 7, 11], [16, 16, 4, 4], 64,
                [8, 8, 2, 2], inference_padding=0, cond_channels=512,
                conv_pre_weight_norm=False, conv_post_weight_norm=False,
                conv_post_bias=False, cond_in_each_up_layer=True,
            )
            self.hifigan_decoder.speaker_encoder = hifi.ResNetSpeakerEncoder(
                input_dim=64, proj_dim=512, log_input=False, use_torch_spec=False
            )
            self.final_norm = torch.nn.LayerNorm(d)

    container = Container()
    container.eval()
    with torch.no_grad():
        for m in container.conditioning_encoder.attn:
            m.proj_out.weight.normal_(0, 0.02)
        for m in container.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.6, 1.5)

    state = _np_state(container)
    core = load_core_params(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    from auralis_tpu.models.xttsv2.modules import (
        conditioning_encoder, perceiver_resampler, speaker_encoder_from_features,
    )
    from auralis_tpu.models.xttsv2.hifigan import hifigan_generator

    # conditioning encoder + perceiver
    mel = rng.standard_normal((1, 80, 30)).astype(np.float32)
    with torch.no_grad():
        ref_h = container.conditioning_encoder(torch.from_numpy(mel))
        ref_lat = container.conditioning_perceiver(ref_h.permute(0, 2, 1)).numpy()
    got_h = conditioning_encoder(core["cond_encoder"], jnp.asarray(mel.transpose(0, 2, 1)), 4)
    got_lat = np.asarray(perceiver_resampler(core["perceiver"], got_h, heads=4))
    np.testing.assert_allclose(got_lat, ref_lat, rtol=3e-4, atol=3e-4)

    # speaker encoder
    feats = rng.standard_normal((1, 64, 40)).astype(np.float32)
    with torch.no_grad():
        ref_emb = container.hifigan_decoder.speaker_encoder(
            torch.from_numpy(feats.copy()), l2_norm=True
        ).numpy()
    got_emb = np.asarray(
        speaker_encoder_from_features(core["speaker_encoder"], jnp.asarray(feats))
    )
    np.testing.assert_allclose(got_emb, ref_emb, rtol=1e-3, atol=1e-3)

    # hifigan generator (weight-norm folding through the real parametrized keys)
    x = rng.standard_normal((1, d, 11)).astype(np.float32)
    gvec = rng.standard_normal((1, 512, 1)).astype(np.float32)
    with torch.no_grad():
        ref_wav = container.hifigan_decoder.waveform_decoder(
            torch.from_numpy(x[0]), g=torch.from_numpy(gvec)
        ).numpy().reshape(-1)
    got_wav = np.asarray(
        hifigan_generator(core["hifigan"], jnp.asarray(x.transpose(0, 2, 1)),
                          jnp.asarray(gvec[:, :, 0]))
    )[0]
    np.testing.assert_allclose(got_wav, ref_wav, rtol=1e-3, atol=1e-3)

    np.testing.assert_allclose(np.asarray(core["mel_stats"]), state["mel_stats"], atol=1e-6)


# ------------------------------------------------------------ coqui converter
def test_split_coqui_state_and_architecture():
    d, layers, vocab = 32, 2, 20
    rng = np.random.default_rng(0)
    state = {
        "xtts.gpt.mel_embedding.weight": rng.standard_normal((vocab, d)),
        "xtts.gpt.mel_pos_embedding.emb.weight": rng.standard_normal((11, d)),
        "xtts.gpt.mel_head.weight": rng.standard_normal((vocab, d)),
        "xtts.gpt.mel_head.bias": rng.standard_normal(vocab),
        "xtts.gpt.final_norm.weight": np.ones(d),
        "xtts.gpt.final_norm.bias": np.zeros(d),
        "xtts.gpt.text_embedding.weight": rng.standard_normal((50, d)),
        "xtts.hifigan_decoder.waveform_decoder.conv_pre.weight": rng.standard_normal((8, d, 7)),
        "xtts.dvae.codebook.weight": rng.standard_normal((4, 4)),  # dropped
    }
    for i in range(layers):
        for suffix, shape in [
            ("ln_1.weight", (d,)), ("ln_1.bias", (d,)),
            ("attn.c_attn.weight", (d, 3 * d)), ("attn.c_attn.bias", (3 * d,)),
            ("attn.c_proj.weight", (d, d)), ("attn.c_proj.bias", (d,)),
            ("ln_2.weight", (d,)), ("ln_2.bias", (d,)),
            ("mlp.c_fc.weight", (d, 4 * d)), ("mlp.c_fc.bias", (4 * d,)),
            ("mlp.c_proj.weight", (4 * d, d)), ("mlp.c_proj.bias", (d,)),
        ]:
            state[f"xtts.gpt.gpt.h.{i}.{suffix}"] = rng.standard_normal(shape)
    state["xtts.gpt.gpt.ln_f.weight"] = np.ones(d)
    state["xtts.gpt.gpt.ln_f.bias"] = np.zeros(d)

    gpt_state, core_state = split_coqui_state(state)
    assert "gpt.wte.weight" in gpt_state
    assert "gpt.wpe.emb.weight" in gpt_state
    assert "gpt.h.0.attn.c_attn.weight" in gpt_state
    assert "gpt.ln_f.weight" in gpt_state
    assert "mel_head.weight" in gpt_state
    assert "final_norm.weight" in gpt_state and "final_norm.weight" in core_state
    assert "text_embedding.weight" in core_state
    assert "hifigan_decoder.waveform_decoder.conv_pre.weight" in core_state
    assert not any("dvae" in k for k in list(gpt_state) + list(core_state))

    arch = infer_architecture(gpt_state)
    assert arch["num_hidden_layers"] == layers
    assert arch["num_audio_tokens"] == vocab
    assert arch["hidden_size"] == d
    assert arch["max_audio_tokens"] == 11 - 3
    assert arch["n_inner"] == 4 * d
