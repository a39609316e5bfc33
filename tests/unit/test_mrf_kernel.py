"""Fused Pallas MRF resblock (ops/mrf.py) vs the XLA reference
(_resblock1), in interpret mode: all kernel sizes, the folded narrow-channel
path (C=64 -> fold 2, C=32 -> fold 4), tile boundaries, and sequence-edge
zero-pad semantics."""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.models.xttsv2.hifigan import _resblock1
from auralis_tpu.ops.mrf import PackedResblock, _fold_one_conv


def _params(rng, k, c, scale=0.1):
    mk = lambda: {
        "w": jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32)) * scale,
        "b": jnp.asarray(rng.standard_normal(c).astype(np.float32)) * scale,
    }
    return {"convs1": [mk() for _ in range(3)], "convs2": [mk() for _ in range(3)]}


@pytest.mark.parametrize(
    "k,c,t",
    [
        (3, 128, 300),    # unfolded, multiple tiles (t_tile=256 below)
        (7, 128, 700),
        (11, 256, 520),
        (3, 64, 413),     # fold 2, odd length
        (11, 64, 700),
        (3, 32, 333),     # fold 4
        (7, 32, 600),
        (11, 32, 1030),
    ],
)
def test_fused_matches_xla(k, c, t):
    rng = np.random.default_rng(k * 1000 + c)
    p = _params(rng, k, c)
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    want = np.asarray(_resblock1(p, x, k))
    rb = PackedResblock(p, k, c)
    got = np.asarray(rb(x, t_tile=256, interpret=True))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    rel = np.abs(got - want).max() / scale
    assert rel < 1e-5, f"relative diff {rel:.2e}"


def test_fold_one_conv_matches_unfolded():
    """The block-Toeplitz folded conv must reproduce the original conv."""
    from auralis_tpu.models.xttsv2.hifigan import _conv1d

    rng = np.random.default_rng(0)
    k, c, fold, t = 7, 32, 4, 160
    w = rng.standard_normal((k, c, c)).astype(np.float32) * 0.2
    b = rng.standard_normal(c).astype(np.float32) * 0.2
    d = 3
    x = rng.standard_normal((1, t, c)).astype(np.float32)

    want = np.asarray(
        _conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                padding=(k * d - d) // 2, dilation=d)
    )

    offs, wf, bf = _fold_one_conv(w, b, d, fold)
    xf = x.reshape(1, t // fold, fold * c)
    # apply the folded conv naively in numpy: out'[q] = sum_dt X'[q+dt] W'[dt]
    n_taps = len(offs)
    wf3 = np.asarray(wf, np.float32).reshape(n_taps, fold * c, fold * c)
    qn = t // fold
    out = np.zeros((1, qn, fold * c), np.float32)
    for i, dt in enumerate(offs):
        for q in range(qn):
            src = q + dt
            if 0 <= src < qn:
                out[0, q] += xf[0, src] @ wf3[i]
    out += np.asarray(bf, np.float32)
    got = out.reshape(1, t, c)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sequence_edge_zero_padding_exact():
    """First/last receptive-field rows must match XLA (per-conv boundary
    zero-padding is re-applied inside the fused chain)."""
    rng = np.random.default_rng(5)
    k, c, t = 11, 128, 280
    p = _params(rng, k, c, scale=0.15)
    x = jnp.asarray(rng.standard_normal((1, t, c)).astype(np.float32))
    want = np.asarray(_resblock1(p, x, k))
    got = np.asarray(PackedResblock(p, k, c)(x, t_tile=128, interpret=True))
    scale = max(np.abs(want).max(), 1e-6)
    # check edges specifically
    for sl in (slice(0, 70), slice(-70, None)):
        rel = np.abs(got[:, sl] - want[:, sl]).max() / scale
        assert rel < 1e-5, f"edge {sl} rel diff {rel:.2e}"


# ------------------------------------------------- merged MRF stage kernel


def _mrf_mean_xla(blocks, x, kernels):
    acc = None
    for p, k in zip(blocks, kernels):
        z = _resblock1(p, x, k).astype(jnp.float32)
        acc = z if acc is None else acc + z
    return (acc / len(blocks)).astype(x.dtype)


@pytest.mark.parametrize(
    "c,t",
    [
        (128, 300),   # unfolded, tile boundaries at t_tile=256
        (256, 520),
        (64, 413),    # fold 2, odd length
        (32, 333),    # fold 4
    ],
)
def test_merged_stage_matches_xla_mean(c, t):
    from auralis_tpu.ops.mrf import PackedMRFStage

    kernels = (3, 7, 11)
    rng = np.random.default_rng(c * 7 + t)
    blocks = [_params(rng, k, c) for k in kernels]
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    want = np.asarray(_mrf_mean_xla(blocks, x, kernels))
    stage = PackedMRFStage(blocks, kernels, c)
    got = np.asarray(stage(x, t_tile=256, interpret=True))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    rel = np.abs(got - want).max() / scale
    assert rel < 1e-5, f"relative diff {rel:.2e}"


def test_merged_stage_bit_identical_to_three_calls_bf16():
    """In bf16 (the serving dtype), the merged kernel must be BIT-identical
    to [three PackedResblock calls -> f32 mean -> bf16]: each chain result
    is cast to the block dtype before the mean inside the kernel."""
    from auralis_tpu.ops.mrf import PackedMRFStage

    kernels = (3, 7, 11)
    c, t = 64, 300
    rng = np.random.default_rng(9)
    blocks = [_params(rng, k, c) for k in kernels]
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    acc = None
    for p, k in zip(blocks, kernels):
        z = PackedResblock(p, k, c, dtype=jnp.bfloat16)(
            x, t_tile=256, interpret=True
        ).astype(jnp.float32)
        acc = z if acc is None else acc + z
    want = np.asarray((acc / len(blocks)).astype(jnp.bfloat16))
    stage = PackedMRFStage(blocks, kernels, c, dtype=jnp.bfloat16)
    got = np.asarray(stage(x, t_tile=256, interpret=True))
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


def test_merged_stage_vmem_accounting():
    from auralis_tpu.ops.mrf import PackedMRFStage

    kernels = (3, 7, 11)
    rng = np.random.default_rng(1)
    # stage 0 of the production generator: C=256 — must report over-budget
    big = PackedMRFStage([_params(rng, k, 256) for k in kernels], kernels, 256)
    assert big.vmem_bytes(t_tile=512) > 16 * 2**20
    # stage 1 (C=128) fits
    small = PackedMRFStage([_params(rng, k, 128) for k in kernels], kernels, 128)
    assert small.vmem_bytes(t_tile=512) < 16 * 2**20


def test_split_stage_bit_identical_to_three_calls_bf16():
    """PackedMRFStageSplit (merged prefix emitting an exact f32 sum + tail
    per-block kernels + XLA mean) must be BIT-identical to [three
    PackedResblock calls -> f32 mean -> bf16] — same association order."""
    from auralis_tpu.ops.mrf import PackedMRFStageSplit

    kernels = (3, 7, 11)
    c, t = 128, 300
    rng = np.random.default_rng(11)
    blocks = [_params(rng, k, c) for k in kernels]
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    acc = None
    for p, k in zip(blocks, kernels):
        z = PackedResblock(p, k, c, dtype=jnp.bfloat16)(
            x, interpret=True
        ).astype(jnp.float32)
        acc = z if acc is None else acc + z
    want = np.asarray((acc / len(blocks)).astype(jnp.bfloat16))

    split = PackedMRFStageSplit(blocks, kernels, c, dtype=jnp.bfloat16)
    assert split.viable and split.n_merged == 2
    got = np.asarray(split(x, interpret=True))
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


def test_pack_hifigan_mrf_stage0_gets_split():
    """The production generator's stage 0 (C=256) exceeds full-merge VMEM
    but must come back as a viable 2+1 split; stages 1-3 merge fully."""
    from auralis_tpu.ops.mrf import (
        PackedMRFStage,
        PackedMRFStageSplit,
        pack_hifigan_mrf,
    )

    rng = np.random.default_rng(2)
    kernels = (3, 7, 11)
    resblocks = []
    for c in (256, 128, 64, 32):
        for k in kernels:
            resblocks.append(_params(rng, k, c))
    packed, stages = pack_hifigan_mrf(resblocks, kernels)
    assert len(packed) == 12 and len(stages) == 4
    assert isinstance(stages[0], PackedMRFStageSplit) and stages[0].n_merged == 2
    assert all(isinstance(s, PackedMRFStage) for s in stages[1:])
