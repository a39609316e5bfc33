"""GPT numerical parity vs HuggingFace GPT-2 (torch CPU oracle).

Builds a tiny config, copies identical random weights into both
implementations, and checks that (a) prefill over prompt embeddings and
(b) incremental KV-cached decode reproduce the HF full-sequence forward.
This validates the exact reference semantics: no positional embedding on the
prompt embeds, audio wpe on generated tokens, ln_f at the stack output.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import (
    KVCache,
    gpt_decode_step,
    gpt_prefill,
    heads,
    init_gpt_params,
    layer_norm,
    make_kv_cache,
    text_embeddings,
)

import jax


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    # zero the "no position" row we use to emulate prompt-embeds in HF
    P = cfg.audio_position_table
    params["wpe"] = params["wpe"].at[P - 1].set(0.0)

    from transformers import GPT2Config, GPT2Model

    hf_cfg = GPT2Config(
        vocab_size=cfg.num_audio_tokens,
        n_positions=P,
        n_embd=cfg.hidden_size,
        n_layer=cfg.num_hidden_layers,
        n_head=cfg.num_attention_heads,
        n_inner=cfg.n_inner,
        activation_function="gelu",
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        layer_norm_epsilon=cfg.layer_norm_epsilon,
    )
    hf = GPT2Model(hf_cfg)
    hf.eval()

    def t(x):
        return torch.from_numpy(np.asarray(x))

    with torch.no_grad():
        hf.wte.weight.copy_(t(params["wte"]))
        hf.wpe.weight.copy_(t(params["wpe"]))
        hf.ln_f.weight.copy_(t(params["ln_f_scale"]))
        hf.ln_f.bias.copy_(t(params["ln_f_bias"]))
        b = params["blocks"]
        for l, block in enumerate(hf.h):
            block.ln_1.weight.copy_(t(b["ln1_scale"][l]))
            block.ln_1.bias.copy_(t(b["ln1_bias"][l]))
            block.attn.c_attn.weight.copy_(t(b["attn_w"][l]))  # Conv1D is [in,out]
            block.attn.c_attn.bias.copy_(t(b["attn_b"][l]))
            block.attn.c_proj.weight.copy_(t(b["attn_proj_w"][l]))
            block.attn.c_proj.bias.copy_(t(b["attn_proj_b"][l]))
            block.ln_2.weight.copy_(t(b["ln2_scale"][l]))
            block.ln_2.bias.copy_(t(b["ln2_bias"][l]))
            block.mlp.c_fc.weight.copy_(t(b["fc_w"][l]))
            block.mlp.c_fc.bias.copy_(t(b["fc_b"][l]))
            block.mlp.c_proj.weight.copy_(t(b["fc_proj_w"][l]))
            block.mlp.c_proj.bias.copy_(t(b["fc_proj_b"][l]))
    return cfg, params, hf


def test_prefill_and_decode_match_hf(setup):
    cfg, params, hf = setup
    rng = np.random.default_rng(1)
    P = cfg.audio_position_table
    t_prompt, n_decode = 10, 5
    d = cfg.hidden_size

    prompt = rng.standard_normal((t_prompt, d)).astype(np.float32) * 0.3
    tokens = rng.integers(0, cfg.num_audio_tokens - 2, size=n_decode).astype(np.int32)
    audio_pos = np.arange(1, n_decode + 1, dtype=np.int32)

    # ---- HF oracle: one full-sequence forward
    wte = np.asarray(params["wte"])
    full_embeds = np.concatenate([prompt, wte[tokens]], axis=0)
    position_ids = np.concatenate([np.full(t_prompt, P - 1), audio_pos])
    with torch.no_grad():
        out = hf(
            inputs_embeds=torch.from_numpy(full_embeds)[None],
            position_ids=torch.from_numpy(position_ids)[None],
        ).last_hidden_state[0].numpy()  # post ln_f

    # ---- ours: prefill + incremental decode
    num_slots, pad = 4, 16
    cache = make_kv_cache(cfg, num_slots, dtype=jnp.float32)
    embeds_pad = np.zeros((pad, d), np.float32)
    embeds_pad[:t_prompt] = prompt
    h_last, cache = gpt_prefill(
        params, cfg, jnp.asarray(embeds_pad), jnp.int32(t_prompt), jnp.int32(1), cache
    )
    ours_prefill = np.asarray(
        layer_norm(h_last, params["ln_f_scale"], params["ln_f_bias"])
    )
    np.testing.assert_allclose(ours_prefill, out[t_prompt - 1], rtol=2e-4, atol=2e-4)

    seq_lens = jnp.zeros(num_slots, jnp.int32)
    toks = jnp.zeros(num_slots, jnp.int32)
    poss = jnp.zeros(num_slots, jnp.int32)
    for i in range(n_decode):
        seq_lens = seq_lens.at[1].set(t_prompt + i)
        toks = toks.at[1].set(int(tokens[i]))
        poss = poss.at[1].set(int(audio_pos[i]))
        h, cache = gpt_decode_step(params, cfg, toks, poss, seq_lens, cache)
        ours = np.asarray(layer_norm(h[1], params["ln_f_scale"], params["ln_f_bias"]))
        np.testing.assert_allclose(ours, out[t_prompt + i], rtol=2e-4, atol=2e-4)


def test_heads_shapes(setup):
    cfg, params, _ = setup
    h = jnp.ones((3, cfg.hidden_size))
    logits, latent = heads(params, h)
    assert logits.shape == (3, cfg.num_audio_tokens)
    assert latent.shape == (3, cfg.hidden_size)
    # latent applies final_norm twice — so it differs from pre-head activations
    g = layer_norm(h, params["ln_f_scale"], params["ln_f_bias"])
    f1 = layer_norm(g, params["final_norm_scale"], params["final_norm_bias"])
    f2 = layer_norm(f1, params["final_norm_scale"], params["final_norm_bias"])
    np.testing.assert_allclose(np.asarray(latent), np.asarray(f2), atol=1e-6)


def test_text_embeddings(setup):
    cfg, params, _ = setup
    ids = jnp.asarray([1, 2, 3], jnp.int32)
    emb = text_embeddings(params, ids)
    ref = np.asarray(params["text_wte"])[np.array([1, 2, 3])] + np.asarray(
        params["text_wpe"]
    )[:3]
    np.testing.assert_allclose(np.asarray(emb), ref, atol=1e-6)
