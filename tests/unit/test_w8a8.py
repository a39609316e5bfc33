"""int8 decode weights (W8A8): layout and numerical fidelity vs full precision.

cfg.decode_w8a8 stores the four block matmul weights int8 with per-(layer,
output-channel) scales and quantizes activations per slot row at each matmul
(gpt.py quantize_decode_weights / _dot_w8a8). These tests check the quantized
decode tracks the f32 reference closely enough that sampled audio tokens and
vocoder latents are interchangeable — same contract as the int8 KV cache
(test_kv_int8.py), which it composes with (the serving default is both).
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import (
    build_prompt_embeds,
    gpt_decode_step,
    gpt_prefill,
    heads,
    init_gpt_params,
    make_kv_cache,
    quantize_decode_weights,
)


def _cfg(decode_w8a8: bool, kv_int8: bool = False):
    cfg = tiny_test_config().gpt
    cfg.decode_w8a8 = decode_w8a8
    cfg.kv_int8 = kv_int8
    return cfg


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    err = np.linalg.norm(ref - test)
    if err == 0:
        return np.inf
    return 20 * np.log10(np.linalg.norm(ref) / err)


def test_quantized_weights_layout():
    cfg = _cfg(True)
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q8 = quantize_decode_weights(params["blocks"])
    l = cfg.num_hidden_layers
    d, i = cfg.hidden_size, cfg.n_inner
    assert q8["attn_w_q"].shape == (l, d, 3 * d) and q8["attn_w_q"].dtype == jnp.int8
    assert q8["attn_w_s"].shape == (l, 3 * d) and q8["attn_w_s"].dtype == jnp.float32
    assert q8["fc_w_q"].shape == (l, d, i)
    assert q8["fc_proj_w_q"].shape == (l, i, d)
    # dequantized weights reconstruct the originals to within half a quantum
    w = np.asarray(params["blocks"]["fc_w"], np.float32)
    deq = np.asarray(q8["fc_w_q"], np.float32) * np.asarray(q8["fc_w_s"])[:, None, :]
    assert np.max(np.abs(w - deq)) <= 0.5 * np.asarray(q8["fc_w_s"]).max() + 1e-8


def _teacher_forced(cfg, params, forced, pad, t):
    cache = make_kv_cache(cfg, 2, dtype=jnp.float32)
    h, cache = gpt_prefill(params, cfg, jnp.asarray(pad), jnp.int32(t), jnp.int32(0), cache)
    logits_list, latents_list = [], []
    logits, latent = heads(params, h[None])
    logits_list.append(np.asarray(logits[0]))
    latents_list.append(np.asarray(latent[0]))
    seq_lens = jnp.asarray([t - 1, 0], jnp.int32)
    audio_pos = jnp.asarray([1, 0], jnp.int32)
    for tok in forced:
        tokens = jnp.asarray([tok, 0], jnp.int32)
        h, cache = gpt_decode_step(
            params, cfg, tokens, audio_pos, seq_lens, cache, len_bound=128
        )
        logits, latent = heads(params, h)
        logits_list.append(np.asarray(logits[0]))
        latents_list.append(np.asarray(latent[0]))
        seq_lens = seq_lens + jnp.asarray([1, 0], jnp.int32)
        audio_pos = audio_pos + jnp.asarray([1, 0], jnp.int32)
    return np.stack(logits_list), np.stack(latents_list)


def test_teacher_forced_decode_tracks_f32():
    """Prefill + 12 teacher-forced decode steps: W8A8 alone AND the serving
    combo (W8A8 + int8 KV) must track the f32 path."""
    cfg_f = _cfg(False)
    key = jax.random.PRNGKey(0)
    params = init_gpt_params(cfg_f, key, dtype=jnp.float32)
    params_q = dict(params)
    params_q["blocks_q8"] = quantize_decode_weights(params["blocks"])

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

    logits_f, latents_f = _teacher_forced(cfg_f, params, forced, pad, t)
    for kv_int8 in (False, True):
        cfg_q = _cfg(True, kv_int8=kv_int8)
        logits_q, latents_q = _teacher_forced(cfg_q, params_q, forced, pad, t)

        # step 0 is pure prefill output — the W8A8 flag doesn't touch prefill
        np.testing.assert_allclose(logits_q[0], logits_f[0], atol=1e-4)

        s_logits = snr_db(logits_f, logits_q)
        s_latents = snr_db(latents_f, latents_q)
        assert s_logits > 30, f"kv_int8={kv_int8}: logits SNR {s_logits:.1f} dB"
        assert s_latents > 30, f"kv_int8={kv_int8}: latents SNR {s_latents:.1f} dB"
        # greedy choices survive quantization on decisive steps (see
        # test_kv_int8.py for the margin rationale; W8A8 noise is larger
        # than KV-only, so the decisive margin is wider)
        sorted_logits = np.sort(logits_f, axis=-1)
        margin = sorted_logits[:, -1] - sorted_logits[:, -2]
        decisive = margin > 0.03
        assert decisive.sum() >= 6
        match = logits_f.argmax(-1) == logits_q.argmax(-1)
        assert match[decisive].all(), (
            f"kv_int8={kv_int8}: greedy flip on decisive steps: "
            f"{np.where(decisive & ~match)[0]}"
        )


def test_decode_loop_runs_w8a8_end_to_end():
    """The slot runtime finishes sequences with W8A8 + int8 KV (the TPU
    serving default combination)."""
    from auralis_tpu.runtime.decode_loop import (
        decode_steps,
        init_decode_state,
        insert_sequence,
        status,
    )

    cfg = _cfg(True, kv_int8=True)
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params["blocks_q8"] = quantize_decode_weights(params["blocks"])
    state = init_decode_state(cfg, 2, jax.random.PRNGKey(3), dtype=jnp.float32)

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


def test_per_program_w8a8_policy_picks_cfg_variant():
    """DecodeEngine with a w8a8_policy selects the quantized config for
    exactly the (len_bound, slot_bound) cells the policy approves — each
    decode executable keys on the static cfg, so the serving default
    (weight-bound small shapes quantized, KV-bound full shapes bf16) costs
    no extra programs."""
    from auralis_tpu.runtime.engine_core import DecodeEngine

    cfg = _cfg(False, kv_int8=False)
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = dict(params)
    params["blocks_q8"] = quantize_decode_weights(params["blocks"])
    de = DecodeEngine(
        params, cfg, num_slots=4,
        w8a8_policy=lambda lb, sb: lb <= 32 or sb <= 2,
    )
    assert de._cfg_for(32, 4).decode_w8a8 is True
    assert de._cfg_for(64, 2).decode_w8a8 is True
    assert de._cfg_for(64, 4).decode_w8a8 is False
    # None normalizes to full extents
    assert de._cfg_for(None, None).decode_w8a8 is (
        cfg.max_seq_len <= 32
    )
    # without blocks_q8 the policy is disarmed regardless
    de2 = DecodeEngine(
        init_gpt_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32),
        cfg, num_slots=4, w8a8_policy=lambda lb, sb: True,
    )
    assert de2._cfg_for(16, 2).decode_w8a8 is False


def test_policy_engine_generates_same_as_forced_w8a8():
    """A policy that always approves must produce the same greedy tokens as
    the global decode_w8a8=True config (the per-program path changes WHICH
    executable runs, never the math inside it)."""
    import asyncio

    from auralis_tpu.runtime.engine_core import DecodeEngine, SamplingOptions

    cfg = _cfg(True, kv_int8=False)
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = dict(params)
    params["blocks_q8"] = quantize_decode_weights(params["blocks"])
    embeds = np.asarray(
        0.3 * np.random.default_rng(0).standard_normal((12, cfg.hidden_size)),
        np.float32,
    )
    opts = SamplingOptions(do_sample=False)

    async def run(de):
        try:
            tokens, _latents = await de.generate(embeds, opts)
            return list(np.asarray(tokens))
        finally:
            await de.shutdown()

    forced = asyncio.run(run(DecodeEngine(params, cfg, num_slots=2)))
    base_cfg = _cfg(False, kv_int8=False)
    policy = asyncio.run(
        run(
            DecodeEngine(
                params, base_cfg, num_slots=2,
                w8a8_policy=lambda lb, sb: True,
            )
        )
    )
    assert forced == policy, (forced, policy)


def test_engine_builds_quantized_weights_when_flagged():
    """XTTSv2Engine.random_init(decode_w8a8=True) adds blocks_q8 and flips
    the config copy, leaving the caller's config untouched."""
    from auralis_tpu.models.xttsv2.engine import XTTSv2Engine

    import asyncio

    cfg = tiny_test_config()
    engine = XTTSv2Engine.random_init(cfg, decode_w8a8=True, max_concurrency=1)
    try:
        assert engine.gpt_config.decode_w8a8
        assert "blocks_q8" in engine.params
        assert engine.params["blocks_q8"]["fc_w_q"].dtype == jnp.int8
        assert not cfg.gpt.decode_w8a8  # caller's config not mutated
    finally:
        asyncio.run(engine.shutdown())
