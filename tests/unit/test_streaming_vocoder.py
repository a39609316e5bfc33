"""Intra-chunk streaming vocoder: segment outputs must reproduce the
full-row vocoder exactly (the segment program interps and masks the same
padded row and slices with >= receptive-field context; see engine.py
SEG_PF/PAD_PF). The reference cannot stream inside a chunk at all
(reference XTTSv2.py:762-816 vocodes only complete chunks).
"""
import asyncio
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine, sine_wav

from auralis_tpu import TTS, TTSRequest
from auralis_tpu.models.xttsv2.engine import FIRST_SEG_PF, SEG_PF


@pytest.fixture(scope="module")
def engine():
    return build_tiny_engine(max_concurrency=2)


def test_segment_assembly_matches_full_row(engine):
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    t_max = engine.gpt_config.max_audio_tokens
    d = engine.gpt_config.hidden_size
    n = t_max - 5
    row_np = rng.standard_normal((t_max, d)).astype(np.float32)
    row = jnp.asarray(row_np)
    g = rng.standard_normal((1, 512)).astype(np.float32)

    full = engine.vocode_device_row(row, n, g)

    total_pf = engine._total_pf(n)
    assert total_pf * 256 == len(full)

    pieces, start = [], 0
    sizes = [FIRST_SEG_PF, SEG_PF, SEG_PF, SEG_PF]
    for size in sizes:
        if start >= total_pf:
            break
        emit = min(size, total_pf - start)
        pieces.append(engine._vocode_segment(row, n, start, emit, g))
        start += emit
    assembled = np.concatenate(pieces)
    assert assembled.shape == full.shape
    np.testing.assert_allclose(assembled, full, rtol=1e-5, atol=1e-5)


def test_streaming_concat_equals_nonstreaming(engine, tmp_path):
    """End-to-end: greedy decode, streamed segments concatenated must equal
    the non-streaming waveform."""
    tts = TTS(scheduler_max_concurrency=2).with_engine(engine)
    wav_path = sine_wav(tmp_path / "spk.wav")

    def req(stream):
        return TTSRequest(
            text="hello world this is a test of speech",
            speaker_files=[wav_path], language="en",
            stream=stream, do_sample=False, temperature=1.0,
        )

    try:
        full = tts.generate_speech(req(stream=False))
        chunks = list(tts.generate_speech(req(stream=True)))
    finally:
        tts.loop.run_until_complete(tts.shutdown())
    assert len(chunks) >= 1
    streamed = np.concatenate([c.array for c in chunks])
    assert streamed.shape == full.array.shape
    np.testing.assert_allclose(streamed, full.array, rtol=1e-4, atol=1e-4)


def test_streaming_yields_multiple_segments(engine, tmp_path):
    """A chunk long enough to cross FIRST_SEG_PF must produce >1 output
    (i.e. audio starts flowing before the chunk finishes decoding)."""
    tts = TTS(scheduler_max_concurrency=2).with_engine(engine)
    wav_path = sine_wav(tmp_path / "spk2.wav")
    req = TTSRequest(
        text="one two three four five six seven hello world",
        speaker_files=[wav_path], language="en", stream=True,
        do_sample=False, temperature=1.0,
    )
    try:
        chunks = list(tts.generate_speech(req))
    finally:
        tts.loop.run_until_complete(tts.shutdown())
    # tiny config: 32 tokens -> 139 post-interp frames -> FIRST(64) + rest
    total_pf = sum(len(c.array) for c in chunks) // 256
    if total_pf > FIRST_SEG_PF:
        assert len(chunks) >= 2, (
            f"expected multiple streamed segments, got {len(chunks)} "
            f"covering {total_pf} frames"
        )


def test_bucketed_row_vocode_matches_full_bucket(engine):
    """The length-bucketed row-vocoder program (rows sliced in-graph to the
    bucket) must reproduce the full-bucket program's trimmed waveform: the
    interp index map is length-independent and the slice margin exceeds the
    generator's receptive field."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    t_max = engine.gpt_config.max_audio_tokens
    d = engine.gpt_config.hidden_size
    g = rng.standard_normal((1, 512)).astype(np.float32)
    gs = jnp.asarray(np.repeat(g, 2, axis=0))

    rows = jnp.asarray(rng.standard_normal((2, t_max, d)).astype(np.float32))
    ns_np = [t_max // 2 - 4, t_max // 3]
    ns = jnp.asarray(ns_np, jnp.int32)

    full_fn = engine._vocode_row_fn()  # full bucket (>= t_max)
    # a genuinely SLICED bucket: smallest multiple of 4 covering max(n)+4
    small = max(ns_np) + 4
    small_fn = engine._vocode_row_fn(small)

    full = np.asarray(full_fn(engine.core["hifigan"], rows, ns, gs))
    part = np.asarray(small_fn(engine.core["hifigan"], rows, ns, gs))
    for b, n in enumerate(ns_np):
        L = engine._true_wav_len(n)
        np.testing.assert_array_equal(part[b, :L], full[b, :L])


def test_row_bucket_selection(engine):
    from auralis_tpu.models.xttsv2.engine import VOCODER_LATENT_BUCKETS

    t_max = engine.gpt_config.max_audio_tokens
    # tiny config: t_max < smallest bucket -> always the smallest bucket
    assert engine.row_bucket(1) == VOCODER_LATENT_BUCKETS[0]
    assert engine.row_bucket(t_max) == VOCODER_LATENT_BUCKETS[0]


def test_serving_row_bucket_cold_fallback(engine):
    """serving_row_bucket must never pick a cold program when a hot larger
    bucket exists, and must kick a background warm for the ideal bucket."""
    import time as _time

    from auralis_tpu.models.xttsv2.engine import VOCODER_LATENT_BUCKETS

    ideal = engine.row_bucket(1)  # smallest bucket (tiny t_max < 256)
    top = engine.row_bucket(engine.gpt_config.max_audio_tokens)

    with engine._row_warm_lock:
        engine._hot_row_buckets.clear()
        engine._row_warming.clear()
    # nothing hot: serving falls back to the TOP bucket (compile-once path)
    assert engine.serving_row_bucket(1) == top

    # with a hot larger bucket, serving uses it while ideal warms
    bigger = VOCODER_LATENT_BUCKETS[-1]
    with engine._row_warm_lock:
        engine._hot_row_buckets.clear()
        engine._hot_row_buckets.add(bigger)
    assert engine.serving_row_bucket(1) == bigger

    # once the ideal bucket is hot it wins outright
    with engine._row_warm_lock:
        engine._hot_row_buckets.add(ideal)
    assert engine.serving_row_bucket(1) == ideal

    # the background warm eventually marks the ideal bucket hot (tiny
    # config: the compile is fast on CPU)
    with engine._row_warm_lock:
        engine._hot_row_buckets.clear()
    engine.serving_row_bucket(1)
    deadline = _time.time() + 120
    while _time.time() < deadline:
        with engine._row_warm_lock:
            if ideal in engine._hot_row_buckets:
                break
        _time.sleep(0.25)
    with engine._row_warm_lock:
        assert ideal in engine._hot_row_buckets
