"""Pallas fused append + flash-decode attention: interpret-mode correctness
vs the dense masked-XLA reference, including ragged per-slot lengths, the
aligned read-modify-write append, and decode-step equivalence."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from auralis_tpu.ops.experimental.attention import CHUNK, flash_decode_append_attention


def _reference(q, k_cache, v_cache, k_new, v_new, layer, write_pos):
    """Dense softmax over cache[:write_pos] plus the appended (k_new, v_new).
    Caches/new rows use the flat [.., H*D] layout (see gpt.py KVCache)."""
    s, h, d = q.shape
    t = k_cache.shape[2]
    k = np.array(k_cache[layer])  # [S, T, H*D]
    v = np.array(v_cache[layer])
    for i in range(s):
        k[i, write_pos[i]] = k_new[i]
        v[i, write_pos[i]] = v_new[i]
    kh = k.reshape(s, t, h, d)
    vh = v.reshape(s, t, h, d)
    scores = np.einsum("shd,sthd->sht", q, kh) / math.sqrt(d)
    mask = np.arange(t)[None, :] <= write_pos[:, None]
    scores = np.where(mask[:, None, :], scores, -np.inf)
    scores = scores - scores.max(axis=-1, keepdims=True)
    probs = np.exp(scores)
    probs = probs / probs.sum(axis=-1, keepdims=True)
    return np.einsum("sht,sthd->shd", probs, vh), k, v


@pytest.mark.parametrize("write_pos", [
    [0, 7, 8, CHUNK - 1],             # RMW-window and chunk boundaries
    [CHUNK, 2 * CHUNK - 9, 120, 200],
])
def test_flash_append_matches_dense(write_pos):
    rng = np.random.default_rng(0)
    s, h, d, l, t = 4, 4, 64, 2, 2 * CHUNK
    q = rng.standard_normal((s, h, d)).astype(np.float32)
    k_new = rng.standard_normal((s, h * d)).astype(np.float32) * 0.3
    v_new = rng.standard_normal((s, h * d)).astype(np.float32) * 0.3
    k_cache = rng.standard_normal((l, s, t, h * d)).astype(np.float32) * 0.3
    v_cache = rng.standard_normal((l, s, t, h * d)).astype(np.float32) * 0.3
    write_pos = np.asarray(write_pos, np.int32)

    for layer in range(l):
        want_ctx, want_k, want_v = _reference(
            q, k_cache, v_cache, k_new, v_new, layer, write_pos
        )
        ctx, k_out, v_out = flash_decode_append_attention(
            jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(k_cache), jnp.asarray(v_cache),
            jnp.int32(layer), jnp.asarray(write_pos), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ctx), want_ctx, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(k_out[layer]), want_k, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v_out[layer]), want_v, atol=1e-6)
        # other layers untouched
        other = 1 - layer
        np.testing.assert_allclose(np.asarray(k_out[other]), k_cache[other], atol=1e-6)


def test_decode_step_flash_matches_dense():
    from auralis_tpu.models.xttsv2.config import tiny_test_config
    from auralis_tpu.models.xttsv2.gpt import (
        KVCache, gpt_decode_step, init_gpt_params, make_kv_cache,
    )
    import auralis_tpu.ops.experimental.attention as attn_mod

    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    shape = make_kv_cache(cfg, 4, dtype=jnp.float32).k.shape
    rng = np.random.default_rng(1)
    k0 = rng.standard_normal(shape).astype(np.float32) * 0.2
    v0 = rng.standard_normal(shape).astype(np.float32) * 0.2

    def fresh_cache():
        return KVCache(jnp.asarray(k0), jnp.asarray(v0))

    tokens = jnp.asarray([3, 5, 7, 9], jnp.int32)
    pos = jnp.asarray([1, 2, 3, 4], jnp.int32)
    lens = jnp.asarray([10, 20, 30, 40], jnp.int32)

    h_dense, cache_dense = gpt_decode_step(params, cfg, tokens, pos, lens, fresh_cache())

    orig = attn_mod.flash_decode_append_attention

    def interpreted(q, kn, vn, ck, cv, layer, wp, interpret=False):
        return orig(q, kn, vn, ck, cv, layer, wp, interpret=True)

    attn_mod.flash_decode_append_attention = interpreted
    try:
        cfg.flash_decode = True
        h_flash, cache_flash = gpt_decode_step(params, cfg, tokens, pos, lens, fresh_cache())
    finally:
        cfg.flash_decode = False
        attn_mod.flash_decode_append_attention = orig

    np.testing.assert_allclose(
        np.asarray(h_flash), np.asarray(h_dense), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_flash.k), np.asarray(cache_dense.k), rtol=5e-4, atol=5e-4
    )
