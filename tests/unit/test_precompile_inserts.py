"""DecodeEngine.precompile_inserts must warm every tokens-path insert
program without observable effect: no live slots afterwards, rng restored
bit-exact, and a subsequent SAMPLED generation identical to an engine that
never precompiled (the burst no-ops ride scatter-drop lanes; the single
insert uses slot 0 and releases it; rng is snapshot/restored).

Motivation (r3 on-chip): warmup traffic cannot form the (prompt bucket x
burst size) program matrix deterministically — 16 concurrent short server
requests formed the first-ever (K=8, bucket 64) insert program mid-window
and stalled every request ~43 s on the remote-compile rig."""
import asyncio
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import init_gpt_params
from auralis_tpu.runtime.engine_core import (
    DecodeEngine,
    SamplingOptions,
    TokenPrompt,
)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    return cfg, params


def _prompt(cfg, seed=5):
    rng = np.random.default_rng(seed)
    cond = rng.standard_normal(
        (cfg.num_cond_latents, cfg.hidden_size)
    ).astype(np.float32) * 0.3
    return TokenPrompt(
        cond=jnp.asarray(cond), ids=np.asarray([2, 7, 9, 11, 3], np.int32)
    )


def test_precompile_inserts_is_observably_noop(model):
    cfg, params = model
    eng = DecodeEngine(params, cfg, num_slots=4, cache_dtype=jnp.float32, seed=3)
    rng_before = np.asarray(jax.device_get(eng.state.rng))
    eng.precompile_inserts(cond_len=cfg.num_cond_latents)
    # slot 0 is released (stale seq_lens is normal for released slots — the
    # next insert resets it, exactly as after a real request drains)
    assert not bool(np.asarray(eng.state.active).any())
    assert not bool(np.asarray(eng.state.done).any())
    assert not eng._slot_owner
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(eng.state.rng)), rng_before
    )


def test_precompile_inserts_preserves_sampled_trajectories(model):
    """SAMPLED generation (rng-dependent) after precompile_inserts equals a
    fresh engine's — the rng snapshot/restore is what this pins."""
    cfg, params = model
    opts = SamplingOptions(do_sample=True, temperature=0.8, top_k=20)

    async def run(precompile: bool):
        eng = DecodeEngine(
            params, cfg, num_slots=4, cache_dtype=jnp.float32, seed=9
        )
        if precompile:
            eng.precompile_inserts(cond_len=cfg.num_cond_latents)
        try:
            return await eng.generate(_prompt(cfg), opts)
        finally:
            await eng.shutdown()

    tokens_a, _ = asyncio.run(run(False))
    tokens_b, _ = asyncio.run(run(True))
    np.testing.assert_array_equal(tokens_a, tokens_b)


def test_precompile_inserts_refuses_live_slots(model):
    """The single-insert program clobbers slot 0's cache rows, so the guard
    must hold whenever any slot is owned or queued."""
    cfg, params = model
    eng = DecodeEngine(params, cfg, num_slots=4, cache_dtype=jnp.float32)
    eng._slot_owner[0] = object()  # simulate a live request
    try:
        with pytest.raises(AssertionError, match="before serving"):
            eng.precompile_inserts(cond_len=cfg.num_cond_latents)
    finally:
        eng._slot_owner.clear()




def test_precompile_inserts_warms_meshed_programs(model):
    """Under a tp mesh the jit/XLA caches key on input SHARDING: serving
    conds arrive mesh-replicated (engine._cond_device), so precompile must
    warm with replicated conds or every warmed executable misses and the
    first real insert pays a full XLA compile mid-serving — exactly the
    stall precompile exists to prevent. Pinned by capturing jax's
    log_compiles stream: after precompile, a serving-shaped single insert
    and burst insert must trigger ZERO 'Compiling jit(insert_*' events
    (a cheap re-trace that hits the lowering cache is acceptable; an XLA
    compile is not)."""
    import logging

    from auralis_tpu.parallel.mesh import make_mesh, replicate
    from auralis_tpu.runtime.decode_loop import (
        PREFILL_BUCKETS,
        insert_sequences_tokens,
    )

    cfg, params = model
    mesh = make_mesh(data=1, model=4)
    eng = DecodeEngine(
        params, cfg, num_slots=4, cache_dtype=jnp.float32, seed=3, mesh=mesh
    )
    eng.precompile_inserts(cond_len=cfg.num_cond_latents)

    class _Capture(logging.Handler):
        def __init__(self):
            super().__init__()
            self.msgs = []

        def emit(self, record):
            self.msgs.append(record.getMessage())

    cap = _Capture()
    pxla_logger = logging.getLogger("jax._src.interpreters.pxla")
    pxla_logger.addHandler(cap)
    prev = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    try:
        # a real request: cond replicated like engine._cond_device does
        tp = _prompt(cfg)
        tp = TokenPrompt(cond=replicate(tp.cond, mesh), ids=tp.ids)

        async def run():
            try:
                return await eng.generate(tp, SamplingOptions(do_sample=False))
            finally:
                await eng.shutdown()

        tokens, latents = asyncio.run(run())
        assert len(tokens) > 0 and np.isfinite(np.asarray(latents)).all()

        # the serving burst builds jnp.stack(conds) from replicated [C,D]
        # rows; the same construction must hit the warmed burst executable
        k = DecodeEngine._INSERT_K_BUCKETS[0]
        bucket = next(b for b in PREFILL_BUCKETS if b <= cfg.max_seq_len)
        tb = bucket - cfg.num_cond_latents
        eng2 = DecodeEngine(
            params, cfg, num_slots=4, cache_dtype=jnp.float32, seed=4, mesh=mesh
        )
        eng2.precompile_inserts(cond_len=cfg.num_cond_latents)
        conds = [
            replicate(jnp.asarray(_prompt(cfg, seed=i).cond), mesh)
            for i in range(k)
        ]
        eng2.state = insert_sequences_tokens(
            eng2.params, cfg, eng2.state,
            jnp.stack(conds),
            jnp.zeros((k, tb), jnp.int32),
            jnp.zeros((k,), jnp.int32),
            jnp.full((k,), eng2.num_slots, jnp.int32),
            jnp.ones((k,), jnp.float32),
            jnp.ones((k,), jnp.float32),
            jnp.ones((k,), jnp.int32),
            jnp.ones((k,), jnp.float32),
            jnp.zeros((k,), bool),
            jnp.zeros((k,), jnp.int32),
        )
    finally:
        jax.config.update("jax_log_compiles", prev)
        pxla_logger.removeHandler(cap)

    compiled_inserts = [
        m for m in cap.msgs
        if m.startswith("Compiling jit(insert_sequence")
    ]
    assert not compiled_inserts, (
        "insert program XLA-compiled mid-serving: precompiled cond "
        f"sharding != serving's ({len(compiled_inserts)} events)"
    )


def test_warmup_no_precompile_skips_aot_sets():
    """TTS.warmup(precompile=False) (--no_precompile development boots) runs
    only the traffic pass: the AOT program sets must not be invoked."""
    from helpers import build_tiny_engine

    from auralis_tpu import TTS

    engine = build_tiny_engine(max_concurrency=2)
    calls = {"vocoder": 0, "decode": 0}
    engine.precompile_vocoder_buckets = lambda *a, **k: calls.__setitem__(
        "vocoder", calls["vocoder"] + 1
    )
    engine.precompile_decode_programs = lambda *a, **k: calls.__setitem__(
        "decode", calls["decode"] + 1
    )
    tts = TTS(scheduler_max_concurrency=2).with_engine(engine)
    try:
        tts.warmup(
            text="hello[SPACE]world this is a warmup test of speech. " * 3,
            precompile=False,
        )
        assert calls == {"vocoder": 0, "decode": 0}
        tts.warmup(
            text="hello[SPACE]world this is a warmup test of speech. " * 3,
        )
        assert calls == {"vocoder": 1, "decode": 1}
    finally:
        tts.loop.run_until_complete(tts.shutdown())


def test_insert_staging_avals_match_precompile(model):
    """The batched insert staging (r5: ids + sampling scalars in ONE
    jax.device_put, engine_core._insert) must produce avals byte-identical
    to the jnp-constructed arguments precompile_inserts warms with —
    otherwise every insert would silently recompile its executable at
    serving time. Guards the numpy-dtype <-> jnp-dtype correspondence."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    staged = jax.device_put((
        np.zeros((8,), np.int32), np.int32(3), np.int32(0),
        np.float32(0.75), np.float32(0.85), np.int32(50),
        np.float32(5.0), np.bool_(True), np.int32(0),
    ))
    warmed = (
        jnp.zeros((8,), jnp.int32), jnp.int32(3), jnp.int32(0),
        jnp.float32(0.75), jnp.float32(0.85), jnp.int32(50),
        jnp.float32(5.0), jnp.bool_(True), jnp.int32(0),
    )
    for i, (s, w) in enumerate(zip(staged, warmed)):
        assert s.aval == w.aval and s.dtype == w.dtype, (
            f"arg {i}: staged aval {s.aval}/{s.dtype} != warmed {w.aval}/{w.dtype}"
        )
