"""Parity: Pallas fused prefill attention vs the dense masked-XLA math in
gpt_prefill (models/xttsv2/gpt.py:200-218). Runs in interpret mode so the
suite stays hermetic on CPU; the same kernel compiles on-chip unchanged."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.ops.prefill_attention import prefill_flash_attention


def _dense_reference(q, k, v, length):
    t, h, d = q.shape
    scale = 1.0 / np.sqrt(d)
    pos = jnp.arange(t)
    mask = (pos[None, :] <= pos[:, None]) & (pos[None, :] < length)
    scores = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask[None], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("hqk,khd->qhd", probs, v, preferred_element_type=jnp.float32)


@pytest.mark.parametrize("t,h,d,length", [(128, 4, 64, 100), (256, 16, 64, 256), (128, 2, 64, 1)])
def test_prefill_flash_matches_dense(t, h, d, length):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (t, h, d), jnp.float32)
    k = jax.random.normal(kk, (t, h, d), jnp.float32)
    v = jax.random.normal(kv, (t, h, d), jnp.float32)
    want = _dense_reference(q, k, v, jnp.int32(length))
    got = prefill_flash_attention(q, k, v, jnp.int32(length), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_prefill_flash_bf16_inputs():
    """bf16 Q/K/V (the serving dtype) still computes in f32 and agrees with
    the dense path run on the same bf16 inputs."""
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    t, h, d = 128, 4, 64
    q = jax.random.normal(kq, (t, h, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (t, h, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (t, h, d), jnp.float32).astype(jnp.bfloat16)
    want = _dense_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), jnp.int32(90)
    )
    got = prefill_flash_attention(q, k, v, jnp.int32(90), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_gpt_prefill_flash_matches_dense_path():
    """Full gpt_prefill with prefill_flash=True agrees with the default dense
    path: same last-hidden and same KV cache writes (the kernel only replaces
    the context computation)."""
    import dataclasses

    from auralis_tpu.models.xttsv2.config import tiny_test_config
    from auralis_tpu.models.xttsv2.gpt import (
        gpt_prefill, init_gpt_params, make_kv_cache,
    )

    cfg = tiny_test_config().gpt
    cfg_flash = dataclasses.replace(cfg, prefill_flash=True)
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    t_pad = 64
    embeds = jax.random.normal(
        jax.random.PRNGKey(3), (t_pad, cfg.hidden_size), jnp.float32
    )
    length, slot = jnp.int32(50), jnp.int32(0)

    h_dense, cache_dense = gpt_prefill(
        params, cfg, embeds, length, slot, make_kv_cache(cfg, 2, jnp.float32)
    )
    h_flash, cache_flash = gpt_prefill(
        params, cfg_flash, embeds, length, slot, make_kv_cache(cfg, 2, jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(h_flash), np.asarray(h_dense), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_flash.k), np.asarray(cache_dense.k), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_flash.v), np.asarray(cache_dense.v), rtol=1e-4, atol=1e-4
    )


def test_gpt_prefill_flash_composes_with_kv_int8():
    """prefill_flash only replaces the context computation; the int8 KV
    quantize/write path must be untouched (claim in config.py docstring)."""
    import dataclasses

    from auralis_tpu.models.xttsv2.config import tiny_test_config
    from auralis_tpu.models.xttsv2.gpt import (
        gpt_prefill, init_gpt_params, make_kv_cache,
    )

    base = dataclasses.replace(tiny_test_config().gpt, kv_int8=True)
    cfg_flash = dataclasses.replace(base, prefill_flash=True)
    params = init_gpt_params(base, jax.random.PRNGKey(0), dtype=jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(4), (64, base.hidden_size), jnp.float32)

    h_a, cache_a = gpt_prefill(
        params, base, embeds, jnp.int32(40), jnp.int32(0),
        make_kv_cache(base, 2, jnp.int8),
    )
    h_b, cache_b = gpt_prefill(
        params, cfg_flash, embeds, jnp.int32(40), jnp.int32(0),
        make_kv_cache(base, 2, jnp.int8),
    )
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_a), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(cache_b.k), np.asarray(cache_a.k))
    np.testing.assert_array_equal(np.asarray(cache_b.v), np.asarray(cache_a.v))
    np.testing.assert_allclose(
        np.asarray(cache_b.k_scale), np.asarray(cache_a.k_scale), rtol=1e-6, atol=0
    )


def test_padding_rows_do_not_affect_real_rows():
    """Garbage K/V beyond `length` must not leak into any real row's output
    (the length mask is the correctness boundary for bucket padding)."""
    key = jax.random.PRNGKey(2)
    t, h, d, length = 128, 2, 64, 64
    q = jax.random.normal(key, (t, h, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (t, h, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (t, h, d), jnp.float32)
    base = prefill_flash_attention(q, k, v, jnp.int32(length), interpret=True)
    k2 = k.at[length:].set(1e6)
    v2 = v.at[length:].set(-1e6)
    poisoned = prefill_flash_attention(q, k2, v2, jnp.int32(length), interpret=True)
    np.testing.assert_array_equal(
        np.asarray(base[:length]), np.asarray(poisoned[:length])
    )
