"""Pallas TPU fused causal attention for the prefill pass.

The XLA prefill path (models/xttsv2/gpt.py gpt_prefill) materializes the
[H, T, T] score tensor in HBM every layer (f32, ~16 MB at T=512) and reads it
back through the softmax — two HBM round-trips of pure intermediate. This
kernel runs ONE HEAD per grid program with the head's full Q/K/V resident in
VMEM (T<=1024, D=64: K+V = 256 KB bf16 — trivially resident), so scores and
probabilities never touch HBM:

    scores = Q K^T * scale  ->  causal+length mask  ->  softmax  ->  P V

At XTTSv2's prefill bucket ceiling (512) a blocked online-softmax brings
nothing — the whole score matrix fits VMEM — so this is deliberately the
simple one-shot formulation (same "fits-on-chip beats streaming" reasoning
as the decode-kernel verdict in ARCHITECTURE.md). D=64 pads to 128 lanes
inside the MXU matmuls; that halves MXU occupancy on the QK^T/PV contractions
but prefill is bandwidth-bound on the score round-trips, not FLOPs-bound.

Replaces: vLLM's prefill flash-attention backend (SURVEY.md §2.1 "Fused
attention during prefill"; reference touches it only through vllm).
Numerics: exact same masked-softmax math as gpt.py:200-218 in f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q/k/v blocks: [1, T, D] — one head's full sequence in VMEM
    q = q_ref[0].astype(jnp.float32)  # [T, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    t = q.shape[0]
    length = len_ref[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [T, T]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    mask = (kpos <= qpos) & (kpos < length)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask, scores, neg)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    ctx = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [T, D]
    o_ref[0] = ctx.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def prefill_flash_attention(
    q: jax.Array,  # [T, H, D]
    k: jax.Array,  # [T, H, D]
    v: jax.Array,  # [T, H, D]
    length: jax.Array,  # scalar int32: true prompt length (keys masked beyond)
    interpret: bool = False,
) -> jax.Array:
    """Causal masked attention, one fused program per head; returns [T, H, D]
    f32 context (same dtype contract as the XLA path's einsum output)."""
    t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    # head-major so each grid program reads one contiguous [T, D] slab
    qh = jnp.transpose(q, (1, 0, 2))  # [H, T, D]
    kh = jnp.transpose(k, (1, 0, 2))
    vh = jnp.transpose(v, (1, 0, 2))
    ctx = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, t, d), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(length, jnp.int32).reshape(1), qh, kh, vh)
    return jnp.transpose(ctx, (1, 0, 2))  # [T, H, D]
