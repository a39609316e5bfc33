"""Pallas fused W8A8 decode MLP: fc -> gelu -> fc_proj in ONE kernel with
double-buffered weight streaming (judge r4 experiment: decode-step small-shape
overhead, the s8/bound-256 cell at ~39% of its memory roofline).

Why a kernel: the decode step at small slot counts is weight-stream-bound —
each layer's MLP reads 8 MB of int8 weights (fc [1024, 4096] + fc_proj
[4096, 1024]) while the MXU holds only `slots` rows. The XLA path
(`_dot_w8a8` x2, gpt.py:130-137) emits two dots with a gelu+quantize chain
between them; this kernel instead tiles the inner dimension (I = 4096) on a
1-D grid so each grid step loads one fc column tile and one fc_proj row tile
— Pallas double-buffers consecutive grid blocks, so tile t+1's weight DMA
overlaps tile t's compute with no scheduler guesswork — and the [S, TI]
intermediate activation never exists outside VMEM.

Numerics vs the XLA path: identical recipe (per-row activation int8 quantize,
int8 x int8 -> int32 MXU dots, per-output-channel weight scales, f32 gelu)
EXCEPT the gelu output re-quantizes per (row, inner tile) instead of per row
over the full 4096 — finer-grained scales, so results differ from
`_dot_w8a8` at the same ~1e-2 quantization-noise level (pinned by
tests/unit/test_fused_mlp.py against the f32 reference).

Reference context: the reference's MLP runs inside vLLM's GPT2Block (CUDA);
this is a TPU-roofline experiment, wired only through tools/bisect_decode.py
until an on-chip A/B earns it a config flag.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, fcw_ref, fcs_ref, fcb_ref, pjw_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    xf = x_ref[:].astype(jnp.float32)  # [S, D]
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)

    y = jnp.dot(xq, fcw_ref[:], preferred_element_type=jnp.int32)  # [S, TI]
    yf = y.astype(jnp.float32) * xs * fcs_ref[:] + fcb_ref[:]
    # exact gelu: Mosaic's TC lowering implements neither erf nor erfc, so
    # erf comes from the Abramowitz-Stegun 7.1.26 polynomial (max abs error
    # 1.5e-7 — two decades below this kernel's int8 requantization noise)
    z = yf * (2.0**-0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    erf_az = 1.0 - poly * jnp.exp(-az * az)
    erf_z = jnp.where(z >= 0.0, erf_az, -erf_az)
    g = yf * 0.5 * (1.0 + erf_z)

    gs = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True), 1e-20) / 127.0
    gq = jnp.round(g / gs).astype(jnp.int8)
    p = jnp.dot(gq, pjw_ref[:], preferred_element_type=jnp.int32)  # [S, D]
    out_ref[:] += p.astype(jnp.float32) * gs


@functools.partial(jax.jit, static_argnames=("tile_i", "interpret"))
def fused_mlp_w8(
    x: jax.Array,  # [S, D] bf16/f32 — post-ln2 activations
    fc_wq: jax.Array,  # [D, I] int8
    fc_ws: jax.Array,  # [I] f32 per-output-channel scales
    fc_b: jax.Array,  # [I]
    proj_wq: jax.Array,  # [I, D] int8
    proj_ws: jax.Array,  # [D] f32
    proj_b: jax.Array,  # [D]
    *,
    tile_i: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """gelu-MLP with both weight matrices streamed once through VMEM.
    Returns [S, D] in x.dtype (the caller adds the residual)."""
    s, d = x.shape
    i = fc_wq.shape[1]
    assert i % tile_i == 0, (i, tile_i)
    grid = (i // tile_i,)
    acc = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, d), lambda t: (0, 0)),
            pl.BlockSpec((d, tile_i), lambda t: (0, t)),
            pl.BlockSpec((1, tile_i), lambda t: (0, t)),
            pl.BlockSpec((1, tile_i), lambda t: (0, t)),
            pl.BlockSpec((tile_i, d), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((s, d), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((s, d), jnp.float32),
        interpret=interpret,
    )(
        x,
        fc_wq,
        fc_ws.astype(jnp.float32).reshape(1, i),
        fc_b.astype(jnp.float32).reshape(1, i),
        proj_wq,
    )
    out = acc * proj_ws.astype(jnp.float32)[None, :] + proj_b.astype(jnp.float32)[None, :]
    return out.astype(x.dtype)


def mlp_w8_reference(x, fc_wq, fc_ws, fc_b, proj_wq, proj_ws, proj_b):
    """The production XLA composition (gpt.py `_dot_w8a8` x2 around gelu),
    inlined here so the test pins kernel-vs-XLA drift without importing the
    model module."""
    from ...models.xttsv2.gpt import _dot_w8a8

    y = _dot_w8a8(x, fc_wq, fc_ws, fc_b)
    g = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
    return _dot_w8a8(g, proj_wq, proj_ws, proj_b)
