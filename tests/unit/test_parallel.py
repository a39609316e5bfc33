"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the decode
step must produce the same tokens whether it runs replicated on one device or
sharded (data x model) across eight."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from auralis_tpu.models.xttsv2.config import tiny_test_config
from auralis_tpu.models.xttsv2.gpt import init_gpt_params
from auralis_tpu.parallel.mesh import (
    make_mesh,
    shard_decode_state,
    shard_gpt_params,
)
from auralis_tpu.runtime.decode_loop import (
    decode_steps,
    init_decode_state,
    insert_sequence,
    status,
    harvest,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _run(params, cfg, state, prompt, n_steps=6):
    state = insert_sequence(
        params, cfg, state,
        jnp.asarray(prompt), jnp.int32(prompt.shape[0]), jnp.int32(1),
        jnp.float32(1.0), jnp.float32(1.0), jnp.int32(0), jnp.float32(1.0),
        jnp.bool_(False),  # greedy
    )
    state = decode_steps(params, cfg, state, n_steps=n_steps)
    return state


def test_sharded_matches_single_device():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = 0.3 * rng.standard_normal((16, cfg.hidden_size)).astype(np.float32)

    # single-device baseline
    state1 = init_decode_state(cfg, 8, jax.random.PRNGKey(1), dtype=jnp.float32)
    state1 = _run(params, cfg, state1, prompt)
    tokens1 = np.asarray(jax.device_get(state1.tokens_buf[1]))

    # 2x4 (data x model) mesh
    mesh = make_mesh(data=2, model=4)
    params_s = shard_gpt_params(params, mesh)
    state2 = init_decode_state(cfg, 8, jax.random.PRNGKey(1), dtype=jnp.float32)
    state2 = shard_decode_state(state2, mesh)
    state2 = _run(params_s, cfg, state2, prompt)
    tokens2 = np.asarray(jax.device_get(state2.tokens_buf[1]))

    np.testing.assert_array_equal(tokens1, tokens2)
    active, done, n_gen = status(state2)
    assert active[1] or done[1]
    assert n_gen[1] == 7  # first token from prefill + 6 decode steps


def test_int8_kv_sharded_matches_single_device():
    """kv_int8 under a (data x model) mesh: _quantize_rows reduces over the
    model-sharded lane axis and the block-diagonal int8 einsums contract over
    the sharded dim — GSPMD must insert the collectives that keep this exact.
    (Serving defaults int8 OFF under tp for latency; this pins correctness
    for operators who opt in.)"""
    import dataclasses

    cfg = dataclasses.replace(tiny_test_config().gpt, kv_int8=True)
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompt = 0.3 * rng.standard_normal((14, cfg.hidden_size)).astype(np.float32)

    state1 = init_decode_state(cfg, 8, jax.random.PRNGKey(1), dtype=jnp.float32)
    state1 = _run(params, cfg, state1, prompt)
    tokens1 = np.asarray(jax.device_get(state1.tokens_buf[1]))

    mesh = make_mesh(data=2, model=4)
    params_s = shard_gpt_params(params, mesh)
    state2 = init_decode_state(cfg, 8, jax.random.PRNGKey(1), dtype=jnp.float32)
    state2 = shard_decode_state(state2, mesh)
    assert state2.cache.k.dtype == jnp.int8
    state2 = _run(params_s, cfg, state2, prompt)
    tokens2 = np.asarray(jax.device_get(state2.tokens_buf[1]))

    np.testing.assert_array_equal(tokens1, tokens2)
    _, lat1 = harvest(state1, 1)
    _, lat2 = harvest(state2, 1)
    np.testing.assert_allclose(np.asarray(lat1), np.asarray(lat2), atol=1e-5)


def test_pure_tp_mesh():
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompt = 0.3 * rng.standard_normal((12, cfg.hidden_size)).astype(np.float32)

    mesh = make_mesh(data=1, model=4)
    params_s = shard_gpt_params(params, mesh)
    state = shard_decode_state(
        init_decode_state(cfg, 4, jax.random.PRNGKey(2), dtype=jnp.float32), mesh
    )
    state = _run(params_s, cfg, state, prompt, n_steps=4)
    tokens, latents = harvest(state, 1)
    assert latents.shape == (5, cfg.hidden_size)
    assert np.isfinite(latents).all()


def test_tensor_parallel_serving_end_to_end():
    """tensor_parallel_size=2 builds a (1, tp) mesh inside the engine and
    the FULL public path (tokenize -> conditioning -> mesh-sharded decode ->
    replicated vocoder) produces audio (reference: tensor_parallel_size
    passthrough to vLLM, XTTSv2.py:214)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from helpers import build_tiny_tokenizer, sine_wav

    from auralis_tpu import TTS, TTSRequest
    from auralis_tpu.models.xttsv2.engine import XTTSv2Engine

    eng = XTTSv2Engine.random_init(
        tokenizer=build_tiny_tokenizer(), seed=0, max_concurrency=2,
        tensor_parallel_size=2,
    )
    assert eng.mesh is not None and eng.mesh.shape["model"] == 2
    # GPT block weights actually sharded over the model axis
    qkv = eng.decode_engine.params["blocks"]["attn_w"]
    assert "model" in str(qkv.sharding.spec)

    tts = TTS(scheduler_max_concurrency=2).with_engine(eng)
    try:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            wav = sine_wav(Path(td) / "spk.wav")
            out = tts.generate_speech(TTSRequest(
                text="Tensor parallel serving test.", speaker_files=[wav],
                language="en",
            ))
        arr = np.asarray(out.array)
        assert arr.size > 500 and np.isfinite(arr).all()
    finally:
        tts.loop.run_until_complete(tts.shutdown())


def test_tensor_parallel_rejects_bad_degree():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from helpers import build_tiny_tokenizer

    from auralis_tpu.models.xttsv2.engine import XTTSv2Engine

    with pytest.raises(ValueError, match="must divide"):
        XTTSv2Engine.random_init(
            tokenizer=build_tiny_tokenizer(), seed=0, tensor_parallel_size=3,
        )


def test_hybrid_dcn_mesh_matches_single_device():
    """Simulated 2-host hybrid mesh (dcn=2 x data=2 x model=2): slots shard
    over ("dcn", "data"), tp stays inside a slice — greedy tokens must match
    the single-device run bit-for-bit."""
    cfg = tiny_test_config().gpt
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = 0.3 * rng.standard_normal((16, cfg.hidden_size)).astype(np.float32)

    state1 = init_decode_state(cfg, 8, jax.random.PRNGKey(1), dtype=jnp.float32)
    state1 = _run(params, cfg, state1, prompt)
    tokens1 = np.asarray(jax.device_get(state1.tokens_buf[1]))

    mesh = make_mesh(dcn_data=2, data=2, model=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    params_s = shard_gpt_params(params, mesh)
    state2 = init_decode_state(cfg, 8, jax.random.PRNGKey(1), dtype=jnp.float32)
    state2 = shard_decode_state(state2, mesh)
    # slots must actually shard over both dcn and data (4-way)
    assert "dcn" in str(state2.cache.k.sharding.spec), state2.cache.k.sharding
    state2 = _run(params_s, cfg, state2, prompt)
    tokens2 = np.asarray(jax.device_get(state2.tokens_buf[1]))

    np.testing.assert_array_equal(tokens1, tokens2)


def test_initialize_distributed_noop_single_process(monkeypatch):
    from auralis_tpu.parallel.mesh import initialize_distributed

    monkeypatch.delenv("AURALIS_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False  # no coordinator handshake
