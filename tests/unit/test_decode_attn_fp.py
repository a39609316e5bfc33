"""decode_attn_fp: the small-shape int8-KV attention variant (bf16 probs /
converted-V context matmul instead of the prob-requantize chain).

Measured r5 on v5e (tools/bisect_decode.py repattnnq, 30-layer chain device
ms): wins the small cells (s8/b256 0.475->0.429, s16/b256 0.762->0.715) and
loses saturated ones (s64/b1024 6.59->6.77), so the engine arms it per
decode program inside the measured region only (engine_core._cfg_for,
sb*lb <= 16*256). Quality strictly improves over the requantize chain (one
quantization step removed); these tests pin numerical closeness and the
policy's program selection.
"""
import dataclasses
import math
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import (
    gpt_decode_step,
    heads,
    init_gpt_params,
    make_kv_cache,
    gpt_prefill,
)


@pytest.fixture(scope="module")
def model():
    cfg = dataclasses.replace(tiny_test_config().gpt, kv_int8=True)
    params = init_gpt_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    return cfg, params


def _decode_once(cfg, params, seed=0, steps=4):
    """Prefill one slot then run a few decode steps; returns stacked hidden
    states so the whole int8-KV attention body is exercised."""
    rng = np.random.default_rng(seed)
    s = 2
    cache = make_kv_cache(cfg, s, dtype=jnp.float32)
    pad = 16
    embeds = jnp.asarray(
        0.3 * rng.standard_normal((pad, cfg.hidden_size)), jnp.bfloat16
    )
    h, cache = gpt_prefill(params, cfg, embeds, jnp.int32(12), jnp.int32(0), cache)
    outs = [np.asarray(h, np.float32)]
    seq_lens = jnp.asarray([11, 0], jnp.int32)
    audio_pos = jnp.asarray([1, 0], jnp.int32)
    tok = jnp.asarray([3, 0], jnp.int32)
    for i in range(steps):
        h, cache = gpt_decode_step(
            params, cfg, tok, audio_pos, seq_lens, cache, len_bound=32
        )
        outs.append(np.asarray(h[0], np.float32))
        seq_lens = seq_lens + jnp.asarray([1, 0], jnp.int32)
        audio_pos = audio_pos + jnp.asarray([1, 0], jnp.int32)
        tok = jnp.asarray([(3 + i) % cfg.num_audio_tokens, 0], jnp.int32)
    return np.stack([o.reshape(-1) for o in outs])


def test_attn_fp_matches_requant_chain(model):
    cfg, params = model
    base = _decode_once(cfg, params)
    fp = _decode_once(dataclasses.replace(cfg, decode_attn_fp=True), params)
    # both are approximations of the same f32 attention; they must agree to
    # bf16-level tolerance (the variant removes one quantization step)
    rel = np.linalg.norm(base - fp) / max(np.linalg.norm(base), 1e-9)
    assert rel < 2e-2, f"decode_attn_fp diverged from the requant chain: rel={rel}"
    assert np.isfinite(fp).all()


def test_policy_arms_only_small_programs(model):
    cfg, params = model
    from auralis_tpu.models.xttsv2.gpt import quantize_decode_weights
    from auralis_tpu.runtime.engine_core import DecodeEngine

    p = dict(params)
    p["blocks_q8"] = quantize_decode_weights(params["blocks"])
    engine = DecodeEngine(
        p, cfg, num_slots=4, cache_dtype=jnp.float32,
        w8a8_policy=lambda lb, sb: True,  # always-w8a8 so the fp gate decides
    )
    small = engine._cfg_for(256, 8)
    large = engine._cfg_for(1024, 64)
    assert small.decode_attn_fp and small.decode_w8a8
    assert not large.decode_attn_fp and large.decode_w8a8
    # policy off -> plain cfg regardless of bounds
    engine2 = DecodeEngine(p, cfg, num_slots=4, cache_dtype=jnp.float32)
    assert not engine2._cfg_for(256, 8).decode_attn_fp
