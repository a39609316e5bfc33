"""int8 prefill weights (cfg.prefill_w8a8): fidelity and gating.

The prompt pass reuses decode's blocks_q8 tensors (quantize_decode_weights),
so quantization noise enters BOTH the returned last-hidden state and the K/V
rows written into the cache — these tests bound that noise against the f32
prefill and pin the batched path to the single path lane-for-lane.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import (
    gpt_prefill,
    gpt_prefill_batched,
    init_gpt_params,
    make_kv_cache,
    quantize_decode_weights,
)


def _cfg(prefill_w8a8: bool, kv_int8: bool = True):
    cfg = tiny_test_config().gpt
    cfg.prefill_w8a8 = prefill_w8a8
    cfg.kv_int8 = kv_int8
    return cfg


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    denom = np.linalg.norm(err)
    return np.inf if denom == 0 else 20 * np.log10(np.linalg.norm(ref) / denom)


def _params(cfg):
    params = dict(init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32))
    params["blocks_q8"] = quantize_decode_weights(params["blocks"])
    return params


def _dequant_cache(cache, layer, slot, t):
    k = np.asarray(cache.k[layer, slot, :t], np.float32)
    if cache.k_scale is not None:
        k = k * np.asarray(cache.k_scale[layer, slot, :t], np.float32)[:, None]
    return k


def test_prefill_w8a8_tracks_f32():
    cfg8, cfg32 = _cfg(True), _cfg(False)
    params = _params(cfg8)
    t, d = 24, cfg8.hidden_size
    embeds = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (t, d), jnp.float32)
    length, slot = jnp.int32(t - 4), jnp.int32(0)

    h8, c8 = gpt_prefill(params, cfg8, embeds, length, slot, make_kv_cache(cfg8, 2, jnp.float32))
    h32, c32 = gpt_prefill(params, cfg32, embeds, length, slot, make_kv_cache(cfg32, 2, jnp.float32))

    assert snr_db(h32, h8) > 25.0  # W8A8 noise floor on a 2-layer stack
    k8 = _dequant_cache(c8, 1, 0, t - 4)
    k32 = _dequant_cache(c32, 1, 0, t - 4)
    assert snr_db(k32, k8) > 25.0


def test_prefill_w8a8_off_is_inert():
    """blocks_q8 present but flag off -> bit-identical to the no-q8 params
    (the gate is the config flag, not the pytree key)."""
    cfg = _cfg(False)
    params = _params(cfg)
    t, d = 16, cfg.hidden_size
    embeds = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (t, d), jnp.float32)
    args = (embeds, jnp.int32(t - 2), jnp.int32(0))

    h_with, _ = gpt_prefill(params, cfg, *args, make_kv_cache(cfg, 1, jnp.float32))
    bare = {k: v for k, v in params.items() if k != "blocks_q8"}
    h_without, _ = gpt_prefill(bare, cfg, *args, make_kv_cache(cfg, 1, jnp.float32))
    np.testing.assert_array_equal(np.asarray(h_with), np.asarray(h_without))


def test_prefill_w8a8_batched_matches_single():
    cfg = _cfg(True)
    params = _params(cfg)
    kb, t, d = 3, 20, cfg.hidden_size
    embeds = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (kb, t, d), jnp.float32)
    lengths = jnp.array([t - 1, t - 5, t - 9], jnp.int32)
    slots = jnp.arange(kb, dtype=jnp.int32)

    hb, cb = gpt_prefill_batched(
        params, cfg, embeds, lengths, slots, make_kv_cache(cfg, kb, jnp.float32)
    )
    for i in range(kb):
        hi, ci = gpt_prefill(
            params, cfg, embeds[i], lengths[i], jnp.int32(i),
            make_kv_cache(cfg, kb, jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(hb[i], np.float32), np.asarray(hi, np.float32),
            rtol=0, atol=1e-5,
        )
        got = _dequant_cache(cb, 0, i, int(lengths[i]))
        want = _dequant_cache(ci, 0, i, int(lengths[i]))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
