"""int8 KV cache: layout, and numerical fidelity vs the full-precision path.

The int8 cache stores per-(layer, slot, token) scales and runs scores as
int8 MXU matmuls (gpt.py gpt_decode_step); these tests check the quantized
decode tracks the f32 reference closely enough that sampled audio tokens and
vocoder latents are interchangeable.
"""
import dataclasses
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import (
    KVCache,
    build_prompt_embeds,
    gpt_decode_step,
    gpt_prefill,
    heads,
    init_gpt_params,
    make_kv_cache,
)


def _cfg(kv_int8: bool):
    cfg = tiny_test_config().gpt
    cfg.kv_int8 = kv_int8
    return cfg


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    err = np.linalg.norm(ref - test)
    if err == 0:
        return np.inf
    return 20 * np.log10(np.linalg.norm(ref) / err)


def test_int8_cache_layout():
    cfg = _cfg(True)
    cache = make_kv_cache(cfg, 3)
    assert cache.k.dtype == jnp.int8 and cache.v.dtype == jnp.int8
    assert cache.quantized
    assert cache.k_scale.shape == cache.k.shape[:3]
    assert cache.k_scale.dtype == jnp.float32
    bf = make_kv_cache(_cfg(False), 3)
    assert not bf.quantized and bf.k_scale is None


def test_teacher_forced_decode_tracks_f32():
    """Prefill + 12 teacher-forced decode steps: the int8 path's logits and
    latents must track the f32 path (same params, same forced tokens)."""
    cfg_f = _cfg(False)
    cfg_q = _cfg(True)
    key = jax.random.PRNGKey(0)
    params = init_gpt_params(cfg_f, key, dtype=jnp.float32)

    text_ids = np.arange(5, 15)
    cond = 0.3 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (cfg_f.num_cond_latents, cfg_f.hidden_size))
    )
    embeds = build_prompt_embeds(params, cfg_f, cond, text_ids, bos_id=261, eos_id=262)
    t = embeds.shape[0]
    pad = np.zeros((64, cfg_f.hidden_size), np.float32)
    pad[:t] = np.asarray(embeds)
    forced = np.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (12,), 0, cfg_f.num_audio_tokens - 2)
    )

    outs = {}
    for name, cfg in (("f32", cfg_f), ("int8", cfg_q)):
        cache = make_kv_cache(cfg, 2, dtype=jnp.float32)
        h, cache = gpt_prefill(
            params, cfg, jnp.asarray(pad), jnp.int32(t), jnp.int32(0), cache
        )
        logits_list, latents_list = [], []
        logits, latent = heads(params, h[None])
        logits_list.append(np.asarray(logits[0]))
        latents_list.append(np.asarray(latent[0]))
        seq_lens = jnp.asarray([t - 1, 0], jnp.int32)
        audio_pos = jnp.asarray([1, 0], jnp.int32)
        for i, tok in enumerate(forced):
            tokens = jnp.asarray([tok, 0], jnp.int32)
            h, cache = gpt_decode_step(
                params, cfg, tokens, audio_pos, seq_lens, cache, len_bound=128
            )
            logits, latent = heads(params, h)
            logits_list.append(np.asarray(logits[0]))
            latents_list.append(np.asarray(latent[0]))
            seq_lens = seq_lens + jnp.asarray([1, 0], jnp.int32)
            audio_pos = audio_pos + jnp.asarray([1, 0], jnp.int32)
        outs[name] = (np.stack(logits_list), np.stack(latents_list))

    logits_f, latents_f = outs["f32"]
    logits_q, latents_q = outs["int8"]
    # step 0 is pure prefill output — identical paths, must match to f32 noise
    np.testing.assert_allclose(logits_q[0], logits_f[0], atol=1e-4)

    s_logits = snr_db(logits_f, logits_q)
    s_latents = snr_db(latents_f, latents_q)
    assert s_logits > 40, f"logits SNR {s_logits:.1f} dB"
    assert s_latents > 40, f"latents SNR {s_latents:.1f} dB"
    # greedy choices survive quantization on every step where the f32 top-1
    # leads by more than the quantization noise floor (random-init models
    # produce near-ties with gaps < 1e-3 where a flip carries no signal;
    # measured int8 logit error is ~3e-3 absolute)
    sorted_logits = np.sort(logits_f, axis=-1)
    margin = sorted_logits[:, -1] - sorted_logits[:, -2]
    decisive = margin > 0.01
    assert decisive.sum() >= 8  # the comparison must actually test something
    match = logits_f.argmax(-1) == logits_q.argmax(-1)
    assert match[decisive].all(), (
        f"greedy flip on decisive steps: {np.where(decisive & ~match)[0]}"
    )


def test_decode_loop_runs_int8_end_to_end():
    """The slot runtime produces finished sequences with an int8 cache."""
    from auralis_tpu.runtime.decode_loop import (
        decode_steps,
        init_decode_state,
        insert_sequence,
        status,
    )

    cfg = _cfg(True)
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    state = init_decode_state(cfg, 2, jax.random.PRNGKey(3), dtype=jnp.float32)
    assert state.cache.k.dtype == jnp.int8

    embeds = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((16, cfg.hidden_size)),
        jnp.float32,
    )
    state = insert_sequence(
        params, cfg, state, embeds, jnp.int32(14), jnp.int32(0),
        jnp.float32(0.75), jnp.float32(0.85), jnp.int32(50),
        jnp.float32(2.0), jnp.bool_(True),
    )
    for _ in range(cfg.max_audio_tokens):
        active, done, n = status(state)
        if done[0]:
            break
        state = decode_steps(params, cfg, state, n_steps=1, len_bound=64)
    active, done, n = status(state)
    assert done[0] and n[0] >= 1
