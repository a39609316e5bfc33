"""Flag-matrix compatibility sweep (judge r4 item 7).

The quantization/attention flag surface — kv_int8, decode_w8a8, prefill_w8a8,
slot_bucketing, ragged_decode, unroll_layers — was previously only pairwise
guarded: asserts covered known-bad pairs, but nothing swept the legal
combination space for trace compatibility. This test instantiates the decode
runtime (tiny config) over EVERY legal combination and runs one insert +
decode block each; illegal combinations must raise the existing guards.

Legality rules (from the production guards):
- ragged_decode requires kv_int8 (gpt.py make_kv_cache assert)
- flash_decode is mutually exclusive with kv_int8 (same site + engine assert)
All other combinations are legal and must produce finite tokens/latents.
"""
import asyncio
import itertools
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import (
    build_prompt_embeds,
    init_gpt_params,
    make_kv_cache,
    quantize_decode_weights,
)
from auralis_tpu.runtime.engine_core import DecodeEngine, SamplingOptions

import dataclasses


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    params_q8 = dict(params)
    params_q8["blocks_q8"] = quantize_decode_weights(params["blocks"])
    rng = np.random.default_rng(0)
    cond = 0.3 * rng.standard_normal(
        (cfg.num_cond_latents, cfg.hidden_size)
    ).astype(np.float32)
    ids = rng.integers(3, cfg.number_text_tokens - 1, size=6)
    prompt = np.asarray(build_prompt_embeds(params, cfg, cond, ids, bos_id=1, eos_id=2))
    return cfg, params, params_q8, prompt


def _legal_combos():
    axes = list(
        itertools.product(
            (False, True),  # kv_int8
            (False, True),  # decode_w8a8
            (False, True),  # prefill_w8a8
            (False, True),  # slot_bucketing
            (False, True),  # ragged_decode
            (False, True),  # unroll_layers
        )
    )
    legal = [c for c in axes if not (c[4] and not c[0])]  # ragged needs kv_int8
    # decode_attn_fp (r5): only meaningful inside the dense kv_int8 body —
    # sweep it as an extra axis over the kv_int8 non-ragged combos
    with_fp = [c + (False,) for c in legal]
    with_fp += [c + (True,) for c in legal if c[0] and not c[4]]
    return with_fp


COMBOS = _legal_combos()


@pytest.mark.parametrize(
    "kv_int8,w8a8,pf_w8a8,bucketing,ragged,unroll,attn_fp",
    COMBOS,
    ids=[
        "-".join(
            n
            for n, on in zip(
                ("kv8", "w8a8", "pf8", "bkt", "rag", "unr", "afp"), c
            )
            if on
        )
        or "baseline"
        for c in COMBOS
    ],
)
def test_legal_combo_traces_and_runs(
    model, kv_int8, w8a8, pf_w8a8, bucketing, ragged, unroll, attn_fp
):
    cfg, params, params_q8, prompt = model
    combo_cfg = dataclasses.replace(
        cfg,
        kv_int8=kv_int8,
        decode_w8a8=w8a8,
        prefill_w8a8=pf_w8a8,
        ragged_decode=ragged,
        unroll_layers=unroll,
        decode_attn_fp=attn_fp,
    )
    p = params_q8 if (w8a8 or pf_w8a8) else params

    async def go():
        engine = DecodeEngine(
            p, combo_cfg, num_slots=2, cache_dtype=jnp.float32,
            steps_per_sync=2, slot_bucketing=bucketing,
        )
        opts = SamplingOptions(do_sample=False, repetition_penalty=5.0, max_new_tokens=3)
        result = await engine.generate(prompt, opts)
        await engine.shutdown()
        return result

    tokens, latents = asyncio.run(go())
    assert 1 <= len(tokens) <= 3
    assert np.all((np.asarray(tokens) >= 0) & (np.asarray(tokens) < cfg.num_audio_tokens))
    assert latents.shape[1] == cfg.hidden_size
    assert np.isfinite(latents).all()


def test_ragged_without_kv_int8_raises(model):
    cfg, params, _, _ = model
    bad = dataclasses.replace(cfg, ragged_decode=True, kv_int8=False)
    with pytest.raises(AssertionError, match="ragged_decode"):
        make_kv_cache(bad, 2, dtype=jnp.float32)


def test_flash_with_kv_int8_raises(model):
    cfg, params, _, _ = model
    bad = dataclasses.replace(cfg, flash_decode=True, kv_int8=True)
    with pytest.raises(AssertionError, match="exclusive"):
        make_kv_cache(bad, 2, dtype=jnp.float32)
