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


# ---------------------------------------------------------------------------
# Ragged int8 flash-decode: per-slot live-length KV reads
# ---------------------------------------------------------------------------

RAGGED_SLOTS_PER_PROGRAM = 16  # B — VMEM budget ~9 MB at CHUNK=256


def _ragged_kernel(
    # scalar prefetch
    layer_ref,  # [1] i32
    pos_ref,  # [S] i32 — keys already cached (= append index)
    kns_ref,  # [S] f32 — new K row scales (SMEM scalars)
    vns_ref,  # [S] f32
    # inputs (blocked per program unless noted)
    qmat_ref,  # [B, HD, H] i8 — per-slot block-diagonal quantized q
    qs_ref,  # [B, H] f32 — per-(slot, head) q dequant scale × 1/sqrt(d)
    k_new_ref,  # [B, 1, HD] i8
    v_new_ref,  # [B, 1, HD] i8
    onehot_ref,  # [HD, H] i8 — lane->head membership (shared)
    k_hbm,  # [L, S, T, HD] i8 ANY (aliased)
    v_hbm,
    ks_hbm,  # [L, S, T] f32 ANY (aliased)
    vs_hbm,
    # outputs
    ctx_ref,  # [B, 1, HD] f32
    k_out,
    v_out,
    ks_out,
    vs_out,
    # scratch
    k_buf,  # [2, CHUNK, HD] i8
    v_buf,
    kss,  # [B, T] f32
    vss,
    kss_t,  # [T, B] f32
    vss_t,
    win_k,  # [B, 32, HD] i8
    win_v,
    sem_kv,  # DMA sems [2, 2] (buffer parity x {k, v})
    sem_win,  # DMA sems [B, 4]
    sem_s,  # DMA sems [4]
):
    i = pl.program_id(0)
    b_slots = win_k.shape[0]
    t_pad = kss.shape[1]
    hd = k_buf.shape[2]
    h = qs_ref.shape[1]
    s0 = i * b_slots
    layer = layer_ref[0]

    # ---- per-slot scalars (static python loop over the slot group)
    n_keys = [pos_ref[s0 + b] + 1 for b in range(b_slots)]
    n_chunks = [pl.cdiv(n, CHUNK) for n in n_keys]
    prefix = [jnp.int32(0)]
    for b in range(b_slots):
        prefix.append(prefix[-1] + n_chunks[b])

    # ---- start scale-row reads for the whole slot group (one [B, T] tile)
    rs_k = pltpu.make_async_copy(ks_hbm.at[layer, pl.ds(s0, b_slots)], kss, sem_s.at[0])
    rs_v = pltpu.make_async_copy(vs_hbm.at[layer, pl.ds(s0, b_slots)], vss, sem_s.at[1])
    rs_k.start()
    rs_v.start()

    # ---- append: 32-row aligned read-modify-write windows, all slots in
    # flight together (serial RMWs would stack DMA latencies)
    win_starts = [(n_keys[b] - 1) // 32 * 32 for b in range(b_slots)]
    for b in range(b_slots):
        pltpu.make_async_copy(
            k_hbm.at[layer, s0 + b, pl.ds(win_starts[b], 32)], win_k.at[b], sem_win.at[b, 0]
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[layer, s0 + b, pl.ds(win_starts[b], 32)], win_v.at[b], sem_win.at[b, 1]
        ).start()
    for b in range(b_slots):
        pltpu.make_async_copy(
            k_hbm.at[layer, s0 + b, pl.ds(win_starts[b], 32)], win_k.at[b], sem_win.at[b, 0]
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[layer, s0 + b, pl.ds(win_starts[b], 32)], win_v.at[b], sem_win.at[b, 1]
        ).wait()
        row_sel = lax.broadcasted_iota(jnp.int32, (32, hd), 0) == (n_keys[b] - 1 - win_starts[b])
        win_k[b] = jnp.where(row_sel, jnp.broadcast_to(k_new_ref[b], (32, hd)), win_k[b])
        win_v[b] = jnp.where(row_sel, jnp.broadcast_to(v_new_ref[b], (32, hd)), win_v[b])
        pltpu.make_async_copy(
            win_k.at[b], k_out.at[layer, s0 + b, pl.ds(win_starts[b], 32)], sem_win.at[b, 2]
        ).start()
        pltpu.make_async_copy(
            win_v.at[b], v_out.at[layer, s0 + b, pl.ds(win_starts[b], 32)], sem_win.at[b, 3]
        ).start()

    # ---- scales: transpose to [T, B] (scale selection then slices the
    # sublane dim — lane-dim dynamic slicing is not expressible), patch the
    # appended rows' scales in arithmetic, transpose back, write back
    rs_k.wait()
    rs_v.wait()
    kss_t[:] = jnp.swapaxes(kss[:], 0, 1)
    vss_t[:] = jnp.swapaxes(vss[:], 0, 1)
    t_iota = lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
    for b in range(b_slots):
        sel = t_iota == (n_keys[b] - 1)
        kss_t[:, b : b + 1] = jnp.where(sel, kns_ref[s0 + b], kss_t[:, b : b + 1])
        vss_t[:, b : b + 1] = jnp.where(sel, vns_ref[s0 + b], vss_t[:, b : b + 1])
    kss[:] = jnp.swapaxes(kss_t[:], 0, 1)
    vss[:] = jnp.swapaxes(vss_t[:], 0, 1)
    ws_k = pltpu.make_async_copy(kss, ks_out.at[layer, pl.ds(s0, b_slots)], sem_s.at[2])
    ws_v = pltpu.make_async_copy(vss, vs_out.at[layer, pl.ds(s0, b_slots)], sem_s.at[3])
    ws_k.start()
    ws_v.start()

    # ---- the chunk reads below may cover appended rows: wait for the writes
    for b in range(b_slots):
        pltpu.make_async_copy(
            win_k.at[b], k_out.at[layer, s0 + b, pl.ds(win_starts[b], 32)], sem_win.at[b, 2]
        ).wait()
        pltpu.make_async_copy(
            win_v.at[b], v_out.at[layer, s0 + b, pl.ds(win_starts[b], 32)], sem_win.at[b, 3]
        ).wait()

    def dma_kv(parity, b, chunk):
        return (
            pltpu.make_async_copy(
                k_out.at[layer, s0 + b, pl.ds(chunk * CHUNK, CHUNK)],
                k_buf.at[parity], sem_kv.at[parity, 0],
            ),
            pltpu.make_async_copy(
                v_out.at[layer, s0 + b, pl.ds(chunk * CHUNK, CHUNK)],
                v_buf.at[parity], sem_kv.at[parity, 1],
            ),
        )

    # first item: (slot 0, chunk 0), parity 0 (every slot has >= 1 chunk)
    for dma in dma_kv(0, 0, 0):
        dma.start()

    expand = onehot_ref[:].astype(jnp.float32).T  # [H, HD] 0/1
    neg = jnp.float32(-1e30)

    # ---- ragged main loop: slots statically unrolled, chunks dynamic
    for b in range(b_slots):
        qmat = qmat_ref[b]  # [HD, H] i8 block-diagonal
        qs_row = qs_ref[b : b + 1, :]  # [1, H] f32

        def body(c, carry, b=b):
            m, l, acc = carry
            parity = (prefix[b] + c) % 2

            # prefetch the next item (next chunk, or the next slot's chunk 0)
            @pl.when(c + 1 < n_chunks[b])
            def _():
                for dma in dma_kv((prefix[b] + c + 1) % 2, b, c + 1):
                    dma.start()

            if b + 1 < b_slots:
                @pl.when(c + 1 == n_chunks[b])
                def _():
                    for dma in dma_kv(prefix[b + 1] % 2, b + 1, 0):
                        dma.start()

            for dma in dma_kv(parity, b, c):
                dma.wait()

            k_i8 = k_buf[parity]  # [CHUNK, HD]
            v_i8 = v_buf[parity]
            logits_i = jax.lax.dot_general(
                k_i8, qmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [CHUNK, H]
            ks_col = kss_t[pl.ds(c * CHUNK, CHUNK), b : b + 1]  # [CHUNK, 1]
            logits = logits_i.astype(jnp.float32) * ks_col * qs_row
            kpos = c * CHUNK + lax.broadcasted_iota(jnp.int32, (CHUNK, h), 0)
            logits = jnp.where(kpos < n_keys[b], logits, neg)

            m_new = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))  # [1, H]
            p = jnp.exp(logits - m_new)  # [CHUNK, H]
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=0, keepdims=True)
            vs_col = vss_t[pl.ds(c * CHUNK, CHUNK), b : b + 1]  # [CHUNK, 1]
            p_lanes = jnp.dot(p * vs_col, expand, preferred_element_type=jnp.float32)
            pv = jnp.sum(p_lanes * v_i8.astype(jnp.float32), axis=0, keepdims=True)
            corr_lanes = jnp.dot(corr, expand, preferred_element_type=jnp.float32)
            return m_new, l_new, acc * corr_lanes + pv

        m0 = jnp.full((1, h), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((1, h), jnp.float32)
        acc0 = jnp.zeros((1, hd), jnp.float32)
        m, l, acc = lax.fori_loop(0, n_chunks[b], body, (m0, l0, acc0))
        l_lanes = jnp.dot(
            jnp.maximum(l, 1e-9), expand, preferred_element_type=jnp.float32
        )
        ctx_ref[b] = (acc / l_lanes).astype(ctx_ref.dtype)

    ws_k.wait()
    ws_v.wait()


@functools.partial(
    jax.jit, static_argnames=("interpret",), donate_argnums=(6, 7, 8, 9)
)
def ragged_decode_attention(
    q: jax.Array,  # [S, H, D] f32/bf16 — this step's queries
    k_new: jax.Array,  # [S, H*D] — this step's keys (pre-quantization)
    v_new: jax.Array,  # [S, H*D]
    attn_scale: float,
    layer: jax.Array,  # scalar i32
    write_pos: jax.Array,  # [S] i32 — keys already cached (= append index)
    k_cache: jax.Array,  # [L, S, T, H*D] int8 (donated/aliased)
    v_cache: jax.Array,
    k_scale: jax.Array,  # [L, S, T] f32 (donated/aliased)
    v_scale: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused int8 append + RAGGED flash decode: per step each slot reads only
    its LIVE KV rows (sum(seq_lens) traffic) instead of the shared
    length-bucket bound — the dense-XLA path's residual 30-40% overhead when
    slot ages are mixed. int8 rows dequantize in-kernel via per-token scales;
    scores run on the int8 MXU. Quantization (new rows + per-slot-head q)
    happens here, outside the kernel, so the kernel sees only int8 + scales.
    Returns (context [S, H*D] f32, k_cache, v_cache, k_scale, v_scale) with
    caches and scale rows updated in-kernel (aliased pass-through)."""
    s, h, d = q.shape
    l, _, t, hd = k_cache.shape
    assert k_cache.dtype == jnp.int8
    assert t % CHUNK == 0, f"cache T dim ({t}) must be a multiple of {CHUNK}"
    assert hd == h * d
    # slots per program: the largest power-of-two divisor of s up to the
    # VMEM-budgeted default (small slot-bucketed views pass s < 16)
    b = RAGGED_SLOTS_PER_PROGRAM
    while s % b:
        b //= 2
    assert b >= 1

    def quant_rows(x):
        xf = x.astype(jnp.float32)
        sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
        return jnp.round(xf / sc[..., None]).astype(jnp.int8), sc

    k_q, k_s = quant_rows(k_new)  # [S, HD] i8, [S]
    v_q, v_s = quant_rows(v_new)
    q_f = q.astype(jnp.float32).reshape(s, h, d)
    q_sc = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1), 1e-8) / 127.0  # [S, H]
    q_i8 = jnp.round(q_f / q_sc[..., None]).astype(jnp.int8).reshape(s, hd)

    lane_head = jnp.arange(hd, dtype=jnp.int32) // d
    onehot_i8 = (lane_head[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]).astype(
        jnp.int8
    )  # [HD, H]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(s // b,),
        in_specs=[
            pl.BlockSpec((b, hd, h), lambda i, *_: (i, 0, 0)),  # qmat
            pl.BlockSpec((b, h), lambda i, *_: (i, 0)),  # qs
            pl.BlockSpec((b, 1, hd), lambda i, *_: (i, 0, 0)),  # k_new
            pl.BlockSpec((b, 1, hd), lambda i, *_: (i, 0, 0)),  # v_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # onehot
            pl.BlockSpec(memory_space=pl.ANY),  # k_hbm
            pl.BlockSpec(memory_space=pl.ANY),  # v_hbm
            pl.BlockSpec(memory_space=pl.ANY),  # ks_hbm
            pl.BlockSpec(memory_space=pl.ANY),  # vs_hbm
        ],
        out_specs=(
            pl.BlockSpec((b, 1, hd), lambda i, *_: (i, 0, 0)),  # ctx
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, hd), jnp.int8),
            pltpu.VMEM((2, CHUNK, hd), jnp.int8),
            pltpu.VMEM((b, t), jnp.float32),
            pltpu.VMEM((b, t), jnp.float32),
            pltpu.VMEM((t, b), jnp.float32),
            pltpu.VMEM((t, b), jnp.float32),
            pltpu.VMEM((b, 32, hd), jnp.int8),
            pltpu.VMEM((b, 32, hd), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((b, 4)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    # input indices incl. scalar prefetch: layer=0, pos=1, kns=2, vns=3,
    # qmat=4, qs=5, k_new=6, v_new=7, onehot=8, k=9, v=10, ks=11, vs=12
    ctx, k_out, v_out, ks_out, vs_out = pl.pallas_call(
        _ragged_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((s, 1, hd), jnp.float32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ),
        input_output_aliases={9: 1, 10: 2, 11: 3, 12: 4},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.asarray([layer], jnp.int32) if jnp.ndim(layer) == 0 else layer.reshape(1),
        write_pos.astype(jnp.int32),
        k_s.astype(jnp.float32),  # [S] SMEM
        v_s.astype(jnp.float32),  # [S] SMEM
        q_i8[:, :, None] * onehot_i8[None],  # [S, HD, H] block-diagonal
        (q_sc * attn_scale).astype(jnp.float32),  # [S, H]
        k_q.reshape(s, 1, hd),
        v_q.reshape(s, 1, hd),
        onehot_i8,
        k_cache,
        v_cache,
        k_scale,
        v_scale,
    )
    return ctx.reshape(s, hd), k_out, v_out, ks_out, vs_out
