"""Golden loader->engine loop: a miniature Coqui-style `.pth` is synthesized
in-test (torch tensor layouts, original checkpoint key names), run through
`convert_coqui_checkpoint` into the dual-safetensors layout, loaded back via
the public `TTS.from_pretrained`, and driven to a waveform.

This closes the loop the reference covers only with its (network+GPU-bound)
checkpoint_converter tests (reference checkpoint_converter.py:225-305): every
layout transform in weights.py is proven to invert bit-exactly, and the
end-to-end waveform from converted artifacts is deterministic across engine
instances. A literal hardcoded waveform hash is deliberately NOT pinned:
float results shift across XLA/BLAS builds, so the golden property asserted
is param-exactness + cross-instance determinism, which is invariant."""
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_tokenizer, export_coqui_state, sine_wav

from auralis_tpu.models.xttsv2.config import XTTSGPTConfig, tiny_test_config
from auralis_tpu.models.xttsv2.engine import XTTSv2Engine
from auralis_tpu.models.xttsv2.gpt import init_gpt_params
from auralis_tpu.models.xttsv2.weights import (
    convert_coqui_checkpoint,
    find_artifact,
    load_core_params,
    load_gpt_params,
    load_safetensors,
)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    """(original_params, original_core, gpt_dir, core_dir)."""
    torch = pytest.importorskip("torch")
    tmp = tmp_path_factory.mktemp("ckpt")

    cfg = tiny_test_config()
    g = cfg.gpt
    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    params = init_gpt_params(g, keys[0], dtype=jnp.float32)
    from auralis_tpu.models.xttsv2.hifigan import init_hifigan_params
    from auralis_tpu.models.xttsv2.modules import (
        init_conditioning_encoder_params,
        init_perceiver_params,
        init_speaker_encoder_params,
    )

    core = {
        "cond_encoder": init_conditioning_encoder_params(
            keys[1], spec_dim=80, embed_dim=g.hidden_size, attn_blocks=2
        ),
        "perceiver": init_perceiver_params(
            keys[2], dim=g.hidden_size, num_latents=g.num_cond_latents
        ),
        "speaker_encoder": init_speaker_encoder_params(keys[3]),
        "hifigan": init_hifigan_params(
            keys[4], in_channels=g.hidden_size, cond_channels=cfg.d_vector_dim,
            upsample_initial=64,
        ),
        "mel_stats": jnp.full((80,), 1.5, jnp.float32),
    }

    state = export_coqui_state(params, core)
    pth = tmp / "model.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in state.items()}}, pth)

    gpt_dir, core_dir = convert_coqui_checkpoint(str(pth), str(tmp / "out"))
    build_tiny_tokenizer().save(str(Path(gpt_dir) / "tokenizer.json"))
    return params, core, gpt_dir, core_dir


def _tree_allclose(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: keys {set(a) ^ set(b)}"
        for k in a:
            _tree_allclose(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_allclose(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-6, atol=1e-7, err_msg=path,
        )


def test_gpt_params_roundtrip_exact(converted):
    params, _, gpt_dir, _ = converted
    gpt_state = load_safetensors(find_artifact(gpt_dir, ("gpt2_model.safetensors",)))
    with open(Path(gpt_dir) / "config.json") as f:
        arch = XTTSGPTConfig.from_dict(json.load(f))
    loaded = load_gpt_params(gpt_state, arch, dtype=jnp.float32)
    ref = {k: v for k, v in params.items() if k not in ("text_wte", "text_wpe")}
    _tree_allclose(ref, loaded)


def test_core_params_roundtrip_exact(converted):
    params, core, _, core_dir = converted
    core_state = load_safetensors(find_artifact(core_dir, ("xtts-v2.safetensors",)))
    loaded = load_core_params(core_state, tiny_test_config(), dtype=jnp.float32)
    _tree_allclose(core, {k: loaded[k] for k in core})
    # text/final-norm tensors travel through the core artifact too
    np.testing.assert_array_equal(np.asarray(loaded["text_wte"]), np.asarray(params["text_wte"]))
    np.testing.assert_array_equal(np.asarray(loaded["text_wpe"]), np.asarray(params["text_wpe"]))


def test_inferred_architecture_matches_source_config(converted):
    _, _, gpt_dir, _ = converted
    with open(Path(gpt_dir) / "config.json") as f:
        arch = json.load(f)
    g = tiny_test_config().gpt
    assert arch["hidden_size"] == g.hidden_size
    assert arch["num_hidden_layers"] == g.num_hidden_layers
    assert arch["num_audio_tokens"] == g.num_audio_tokens
    assert arch["start_audio_token"] == g.start_audio_token
    assert arch["stop_audio_token"] == g.stop_audio_token
    assert arch["max_audio_tokens"] == g.max_audio_tokens
    assert arch["n_inner"] == g.n_inner


def test_hub_seam_local_dir_passthrough(converted):
    from auralis_tpu import TTS

    _, _, _, core_dir = converted
    assert TTS._resolve_model_source(core_dir) == core_dir


def test_hub_seam_downloads_via_monkeypatched_hub(converted, monkeypatch, tmp_path):
    """A non-local id goes through huggingface_hub.snapshot_download
    (reference: hf_hub_download fallback in core/tts.py:72-81); with the
    downloader monkeypatched to return the converted artifact dir, the full
    load works without network."""
    import huggingface_hub

    from auralis_tpu import TTS, TTSRequest

    _, _, gpt_dir, core_dir = converted
    calls = []

    def fake_snapshot_download(repo_id):
        calls.append(repo_id)
        return {"acme/xtts-tiny": core_dir, "acme/xtts-tiny-gpt": gpt_dir}[repo_id]

    monkeypatch.setattr(huggingface_hub, "snapshot_download", fake_snapshot_download)
    tts = TTS(scheduler_max_concurrency=2).from_pretrained(
        "acme/xtts-tiny", gpt_model="acme/xtts-tiny-gpt", dtype=jnp.float32
    )
    try:
        wav_path = sine_wav(tmp_path / "spk.wav")
        out = tts.generate_speech(TTSRequest(
            text="Hub seam test.", speaker_files=[str(wav_path)], language="en",
        ))
        assert np.asarray(out.array).size > 500
    finally:
        tts.loop.run_until_complete(tts.shutdown())
    assert calls == ["acme/xtts-tiny", "acme/xtts-tiny-gpt"]


def test_hub_seam_offline_raises_value_error(monkeypatch):
    import huggingface_hub

    from auralis_tpu import TTS

    def fail(repo_id):
        raise OSError("offline")

    monkeypatch.setattr(huggingface_hub, "snapshot_download", fail)
    with pytest.raises(ValueError, match="neither locally nor from the Hub"):
        TTS()._resolve_model_source("acme/does-not-exist")


def test_e2e_from_converted_checkpoint_deterministic(converted, tmp_path):
    """Public path over converted artifacts -> audio; two independent engine
    instances produce bit-identical waveforms (the reproducible 'golden')."""
    from auralis_tpu import TTS, TTSRequest

    _, _, gpt_dir, core_dir = converted
    wav_path = sine_wav(tmp_path / "spk.wav")

    def speak():
        tts = TTS(scheduler_max_concurrency=2).from_pretrained(
            core_dir, gpt_model=gpt_dir, dtype=jnp.float32
        )
        try:
            out = tts.generate_speech(TTSRequest(
                text="Hello world.", speaker_files=[str(wav_path)], language="en",
            ))
            return np.asarray(out.array)
        finally:
            tts.loop.run_until_complete(tts.shutdown())

    a = speak()
    assert a.size > 500 and np.isfinite(a).all() and np.abs(a).max() <= 1.0
    b = speak()
    np.testing.assert_array_equal(a, b)
