"""Pallas TPU flash-decode attention for the slot-batched KV cache.

The XLA fallback in gpt.py scatter-appends and then reads (and materializes)
the full [S, T_max] cache slice per layer per step. This kernel instead:
- reads the caches through aliased pass-through outputs (no operand copies
  around the custom call — the caches stay in place across the layer loop),
- DMAs each slot's cached K/V from HBM in CHUNK-row tiles, double-buffered,
- stops at the slot's true key count (per-slot early exit — the dense cache
  behaves like a length-aware paged cache without block tables),
- keeps the online-softmax state in f32 registers.

Per step it moves only sum(seq_lens) KV rows instead of S * T_max — the
decode bandwidth bound (SURVEY.md §2.1 "paged flash-decode" equivalent).

Layout: everything stays in the flat head layout [T, H*D] (lane-aligned);
per-head reductions are MXU matmuls against a block-diagonal Q matrix
[H*D, H], and per-head broadcasts are matmuls against its 0/1 transpose
[H, H*D]. No reshapes/relayouts inside the chunk loop.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256  # KV rows per DMA tile; cache T dim must be a multiple


def _kernel(
    # scalar prefetch
    layer_ref,  # [1] i32
    pos_ref,  # [S] i32 — cache write position (keys already in cache)
    # inputs
    qmat_ref,  # [1, HD, H] f32 block: block-diagonal scaled q for this slot
    k_new_ref,  # [1, 1, HD] block: this step's key (appended in-kernel)
    v_new_ref,  # [1, 1, HD] block: this step's value
    expand_ref,  # [H, HD] f32: 0/1 head->lane expansion matrix (shared)
    k_hbm,  # [L, S, T, HD] in HBM/ANY (aliased to k_out)
    v_hbm,  # [L, S, T, HD] (aliased to v_out)
    # outputs
    ctx_ref,  # [1, 1, HD] block — attention context
    k_out,  # aliased k_hbm
    v_out,  # aliased v_hbm
    # scratch
    k_buf,  # [2, CHUNK, HD] VMEM
    v_buf,  # [2, CHUNK, HD]
    win_k,  # [8, HD] VMEM — aligned read-modify-write window for the append
    win_v,  # [8, HD]
    sem_k,
    sem_v,
    sem_w,
):
    s = pl.program_id(0)
    layer = layer_ref[0]
    n_cache = pos_ref[s]
    n_keys = n_cache + 1  # attention includes the row appended below
    n_chunks = pl.cdiv(n_keys, CHUNK)

    qmat = qmat_ref[0]  # [HD, H] (already scaled by 1/sqrt(d))
    expand = expand_ref[:]  # [H, HD]
    h = qmat.shape[1]
    hd = qmat.shape[0]

    # ---- append via aligned 8-row read-modify-write (DMA tiling requires
    # 8-row sublane slices; single-row writes are not expressible)
    win_start = (n_cache // 8) * 8
    row_in_win = n_cache - win_start
    rk = pltpu.make_async_copy(k_hbm.at[layer, s, pl.ds(win_start, 8)], win_k, sem_w.at[0])
    rv = pltpu.make_async_copy(v_hbm.at[layer, s, pl.ds(win_start, 8)], win_v, sem_w.at[1])
    # (the RMW read uses the input refs: in interpret mode the output copy of
    # OTHER slots' rows is already correct since outputs start as input copies)
    rk.start()
    rv.start()
    rk.wait()
    rv.wait()
    row_sel = lax.broadcasted_iota(jnp.int32, (8, hd), 0) == row_in_win
    win_k[:] = jnp.where(row_sel, jnp.broadcast_to(k_new_ref[0], (8, hd)), win_k[:])
    win_v[:] = jnp.where(row_sel, jnp.broadcast_to(v_new_ref[0], (8, hd)), win_v[:])
    wk = pltpu.make_async_copy(win_k, k_out.at[layer, s, pl.ds(win_start, 8)], sem_w.at[0])
    wv = pltpu.make_async_copy(win_v, v_out.at[layer, s, pl.ds(win_start, 8)], sem_w.at[1])
    wk.start()
    wv.start()
    # the chunk reads below may cover the appended row — wait for the writes
    wk.wait()
    wv.wait()

    # all reads go through the aliased OUTPUT refs so interpret mode (which
    # copies instead of aliasing) stays consistent; on TPU they are the same
    # HBM buffers as k_hbm/v_hbm
    def dma_k(slot, chunk):
        return pltpu.make_async_copy(
            k_out.at[layer, s, pl.ds(chunk * CHUNK, CHUNK)], k_buf.at[slot], sem_k.at[slot]
        )

    def dma_v(slot, chunk):
        return pltpu.make_async_copy(
            v_out.at[layer, s, pl.ds(chunk * CHUNK, CHUNK)], v_buf.at[slot], sem_v.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_k(0, 0).start()
        dma_v(0, 0).start()

    neg = jnp.float32(-1e30)

    def body(c, carry):
        m, l, acc = carry  # [1, H], [1, H], [1, HD] f32
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            dma_k((c + 1) % 2, c + 1).start()
            dma_v((c + 1) % 2, c + 1).start()

        dma_k(slot, c).wait()
        dma_v(slot, c).wait()

        k = k_buf[slot].astype(jnp.float32)  # [CHUNK, HD]
        v = v_buf[slot].astype(jnp.float32)
        logits = jnp.dot(k, qmat, preferred_element_type=jnp.float32)  # [CHUNK, H]
        kpos = c * CHUNK + lax.broadcasted_iota(jnp.int32, (CHUNK, h), 0)
        logits = jnp.where(kpos < n_keys, logits, neg)

        m_new = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))  # [1, H]
        p = jnp.exp(logits - m_new)  # [CHUNK, H]
        corr = jnp.exp(m - m_new)  # [1, H]
        l_new = l * corr + jnp.sum(p, axis=0, keepdims=True)
        p_lanes = jnp.dot(p, expand, preferred_element_type=jnp.float32)  # [CHUNK, HD]
        pv = jnp.sum(p_lanes * v, axis=0, keepdims=True)  # [1, HD]
        corr_lanes = jnp.dot(corr, expand, preferred_element_type=jnp.float32)
        return m_new, l_new, acc * corr_lanes + pv

    m0 = jnp.full((1, h), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((1, h), jnp.float32)
    acc0 = jnp.zeros((1, hd), jnp.float32)

    m, l, acc = lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))
    l_lanes = jnp.dot(
        jnp.maximum(l, 1e-9), expand, preferred_element_type=jnp.float32
    )  # [1, HD]
    ctx_ref[0] = (acc / l_lanes).astype(ctx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(3, 4))
def flash_decode_append_attention(
    q: jax.Array,  # [S, H, D]
    k_new: jax.Array,  # [S, H*D] flat — this step's key, appended in-kernel
    v_new: jax.Array,  # [S, H*D] flat
    k_cache: jax.Array,  # [L, S, T, H*D] flat — T % CHUNK == 0; donated/aliased
    v_cache: jax.Array,
    layer: jax.Array,  # scalar i32
    write_pos: jax.Array,  # [S] i32 — keys already cached (= append index)
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused append + length-aware flash attention over the slot cache.
    Returns (context [S,H,D], k_cache, v_cache); the caches are updated
    in-kernel and pass through aliased — no copies around the custom call.
    Caches and new K/V use the flat [.., H*D] layout (lane-aligned, no tile
    padding — see models/xttsv2/gpt.py KVCache)."""
    s, h, d = q.shape
    l, _, t, hd = k_cache.shape
    assert t % CHUNK == 0, f"cache T dim ({t}) must be a multiple of {CHUNK}"
    assert hd == h * d
    scale = 1.0 / math.sqrt(d)

    # block-diagonal scaled Q: qmat[s, j, head] = q[s, j] * scale where lane j
    # belongs to `head`; expand = its 0/1 pattern for head->lane broadcasts
    lane_head = jnp.arange(hd, dtype=jnp.int32) // d  # [HD]
    onehot = (lane_head[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]).astype(
        jnp.float32
    )  # [HD, H]
    qmat = q.reshape(s, hd).astype(jnp.float32)[:, :, None] * onehot[None] * scale
    expand = onehot.T  # [H, HD]

    k_flat = k_cache
    v_flat = v_cache
    k_new_flat = k_new.reshape(s, 1, hd).astype(k_cache.dtype)
    v_new_flat = v_new.reshape(s, 1, hd).astype(v_cache.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, hd, h), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, hd), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, hd), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, hd), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, hd), k_cache.dtype),
            pltpu.VMEM((2, CHUNK, hd), v_cache.dtype),
            pltpu.VMEM((8, hd), k_cache.dtype),
            pltpu.VMEM((8, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    ctx, k_out, v_out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((s, 1, hd), q.dtype),
            jax.ShapeDtypeStruct(k_flat.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_flat.shape, v_cache.dtype),
        ),
        # alias caches through the kernel (indices include the scalar-prefetch
        # args: layer=0, pos=1, qmat=2, k_new=3, v_new=4, expand=5, k=6, v=7)
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.asarray([layer], jnp.int32) if jnp.ndim(layer) == 0 else layer.reshape(1),
        write_pos.astype(jnp.int32),
        qmat,
        k_new_flat,
        v_new_flat,
        expand,
        k_flat,
        v_flat,
    )
    return ctx.reshape(s, h, d), k_out, v_out
