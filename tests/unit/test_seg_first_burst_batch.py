"""A concurrency-8 burst of speculative first segments must fly as ONE
batch-8 program (seg_first is weight-stream-bound: batch 8 measured the same
device time as batch 4 on-chip, 33.6 vs 34.6 ms — two serialized flights
would add a full flight to the second wave's time-to-first-audio), and the
batch-8 lanes must reproduce the single-submit outputs."""
import asyncio
import sys
from pathlib import Path

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_engine

from auralis_tpu.models.xttsv2.engine import FIRST_SEG_PF, _VocodeBatcher


def _items(engine, n):
    rng = np.random.default_rng(0)
    t_max = engine.gpt_config.max_audio_tokens
    d = engine.gpt_config.hidden_size
    gdim = engine.hifi_config.d_vector_dim
    out = []
    for i in range(n):
        row = jnp.asarray(
            rng.standard_normal((t_max, d)).astype(np.float32) * 0.1
        )
        g = rng.standard_normal((1, gdim)).astype(np.float32)
        out.append((row, min(8 + i, t_max), g))
    return out

def test_burst_of_six_flies_as_one_batch():
    engine = build_tiny_engine()
    items = _items(engine, 6)

    flights: list[int] = []
    orig = _VocodeBatcher._run_batch

    def recording(self, kind, batch_items):
        flights.append(len(batch_items))
        return orig(self, kind, batch_items)

    _VocodeBatcher._run_batch = recording
    try:
        async def burst():
            b = engine._vocode_batcher
            return await asyncio.gather(
                *(b.submit("seg_first", it) for it in items)
            )

        burst_wavs = asyncio.run(burst())
    finally:
        _VocodeBatcher._run_batch = orig

    assert flights == [6], f"expected one 6-item flight (cap 8), got {flights}"

    async def solo(it):
        return await engine._vocode_batcher.submit("seg_first", it)

    for it, got in zip(items, burst_wavs):
        ref = asyncio.run(solo(it))
        assert got.shape == (FIRST_SEG_PF * 256,) == ref.shape
        np.testing.assert_array_equal(got, ref)
