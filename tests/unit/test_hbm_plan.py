"""HBM accounting: the static weights+KV plan (the TPU analogue of the
reference's empirical VRAM curve, reference XTTSv2.py:152-171 and
base.py:160-177) and the slot clamp that enforces it at engine boot."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine


@pytest.fixture(scope="module")
def engine():
    return build_tiny_engine()


def test_plan_math_matches_config(engine):
    cfg = engine.gpt_config
    weight_bytes, slot_bytes = engine._hbm_plan_bytes()

    expect_weights = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for tree in (engine.params, engine.core)
        for x in jax.tree.leaves(tree)
        if hasattr(x, "shape")
    )
    assert weight_bytes == expect_weights

    if cfg.kv_int8:
        per_token = 2 * cfg.hidden_size + 8
    else:
        per_token = 2 * cfg.hidden_size * jnp.dtype(engine.cache_dtype).itemsize
    expect_slot = cfg.num_hidden_layers * cfg.max_seq_len * per_token
    expect_slot += cfg.max_audio_tokens * cfg.hidden_size * 4
    assert slot_bytes == expect_slot


def test_memory_usage_curve_logs_total(engine):
    weight_bytes, slot_bytes = engine._hbm_plan_bytes()
    total_gib = engine.get_memory_usage_curve()
    expect = (weight_bytes + slot_bytes * engine.decode_slots) / 1024**3
    assert total_gib == pytest.approx(expect)
    assert engine.max_gb_for_model == total_gib


def _with_fake_limit(monkeypatch, limit_bytes):
    class _Dev:
        def memory_stats(self):
            return {"bytes_limit": limit_bytes}

    monkeypatch.setattr(jax, "local_devices", lambda: [_Dev()])


def test_fit_clamps_when_kv_exceeds_hbm(engine, monkeypatch):
    weight_bytes, slot_bytes = engine._hbm_plan_bytes()
    # limit that fits the weights plus exactly 3 slots (after 8% headroom)
    limit = int((weight_bytes + 3 * slot_bytes) / 0.92) + 1
    _with_fake_limit(monkeypatch, limit)
    assert engine._fit_slots_to_hbm(16, slots_explicit=False) == 3
    # a request that already fits is untouched
    assert engine._fit_slots_to_hbm(2, slots_explicit=True) == 2


def test_fit_raises_when_weights_dont_fit(engine, monkeypatch):
    weight_bytes, _ = engine._hbm_plan_bytes()
    _with_fake_limit(monkeypatch, weight_bytes)  # no room for any KV slots
    with pytest.raises(RuntimeError, match="cannot serve"):
        engine._fit_slots_to_hbm(4, slots_explicit=False)


def test_fit_noop_without_memory_stats(engine, monkeypatch):
    class _Dev:
        def memory_stats(self):
            return None

    monkeypatch.setattr(jax, "local_devices", lambda: [_Dev()])
    assert engine._fit_slots_to_hbm(64, slots_explicit=False) == 64


def test_ctor_does_not_mutate_caller_config():
    """kv_int8 is applied on a copy (dataclasses.replace), never by mutating
    the caller's config object, which may be shared across replicas."""
    from auralis_tpu.models.xttsv2.config import tiny_test_config
    from auralis_tpu.models.xttsv2.engine import XTTSv2Engine
    from helpers import build_tiny_tokenizer

    cfg = tiny_test_config()
    assert not cfg.gpt.kv_int8
    eng = XTTSv2Engine.random_init(
        config=cfg, tokenizer=build_tiny_tokenizer(), kv_int8=True,
        max_concurrency=2,
    )
    assert eng.gpt_config.kv_int8
    assert not cfg.gpt.kv_int8  # caller-visible config unchanged
