"""The XTTS audio-token GPT as pure-functional JAX.

Replaces the reference's vLLM-hosted GPT-2 (reference:
models/xttsv2/components/vllm_mm_gpt.py). Same math, TPU-first execution:

- Params are a flat pytree with per-layer tensors stacked on a leading [L]
  axis; layers run under `lax.fori_loop` so the program contains ONE block
  (fast compiles, weight reads stream from HBM per layer — the natural
  memory-bound decode pattern).
- Decode is slot-batched over a dense per-slot KV cache
  `[L, S, T_max, H, Dh]`; the 1047-token sequence ceiling (config.max_seq_len)
  makes dense-and-masked attention cheaper than paged indirection on TPU.
- Sequence semantics match the reference exactly (see ARCHITECTURE.md):
  prompt is precomputed embeddings `[cond ⊕ text] + embed(start_audio)`;
  generated token i gets `wte[tok] + wpe[i]`; logits =
  `mel_head(final_norm(ln_f(h)))`; vocoder latent =
  `final_norm(final_norm(ln_f(h)))` (the reference's double final_norm —
  compute_logits at vllm_mm_gpt.py:671 plus XTTSv2.py:687).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .config import XTTSGPTConfig


class KVCache(NamedTuple):
    """Dense slot-batched KV cache: k/v are [L, S, T_max, H*Dh].

    Heads stay FLAT in the minor dimension: H*Dh = hidden_size (1024) tiles
    cleanly onto the TPU's (8, 128) layout, whereas a trailing [H=16, Dh=64]
    pair pads 64 -> 128 lanes and silently DOUBLES both the cache's HBM
    footprint and every read's bandwidth. Attention reshapes views per use.

    With cfg.kv_int8 the k/v arrays are int8 and `k_scale`/`v_scale` hold
    per-(layer, slot, token) f32 dequantization scales [L, S, T_max] —
    a [.., T] last-dim layout so the per-step scale write is the same cheap
    row scatter as the cache write (a [.., T, H] or head-indexed layout
    lowers to a catastrophically slow multi-dim scatter; see
    tools/bench_decode_variants.py). Scale reads are ~0.4% of the int8 KV
    read, so the full bandwidth halving survives.
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None

    @property
    def num_slots(self) -> int:
        return self.k.shape[1]

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def make_kv_cache(cfg: XTTSGPTConfig, num_slots: int, dtype=jnp.bfloat16) -> KVCache:
    # T is rounded up to the flash-decode DMA chunk so the Pallas kernel can
    # tile it; the XLA path masks the padding.
    from ...ops.experimental.attention import CHUNK

    t_pad = -(-cfg.max_seq_len // CHUNK) * CHUNK
    shape = (
        cfg.num_hidden_layers,
        num_slots,
        t_pad,
        cfg.num_attention_heads * cfg.head_dim,
    )
    if cfg.ragged_decode:
        assert cfg.kv_int8, "ragged_decode composes with (requires) kv_int8"
    if cfg.kv_int8:
        assert not cfg.flash_decode, "kv_int8 and flash_decode are exclusive"
        scale_shape = shape[:3]
        return KVCache(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.ones(scale_shape, jnp.float32),
            jnp.ones(scale_shape, jnp.float32),
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 row quantization over the last axis.
    x [..., D] -> (int8 [..., D], f32 scale [...]) with x ≈ int8 * scale."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s


# ------------------------------------------------- int8 decode weights (W8A8)


def quantize_decode_weights(blocks: dict) -> dict:
    """Per-(layer, output-channel) symmetric int8 quantization of the four
    decode matmul weights. Returns the `blocks_q8` pytree consumed by
    `gpt_decode_step` when cfg.decode_w8a8 is set.

    Why: the decode step is weight-stream-bound on its matmul side — every
    step reads all ~720 MB of block weights from HBM while the MXU sits at
    M=num_slots rows. Storing the weights int8 halves that stream; the dot
    runs as int8 x int8 -> int32 on the MXU (same reasoning as the int8 KV
    path: a mixed-dtype dot would materialize a bf16 copy of the whole
    weight read). Activations are quantized per (slot) row at each matmul
    (see `_dot_w8a8`), so accuracy rests on per-output-channel weight scales
    + per-row activation scales — the standard W8A8 recipe.
    """
    out = {}
    for name in ("attn_w", "attn_proj_w", "fc_w", "fc_proj_w"):
        w = blocks[name].astype(jnp.float32)  # [L, Din, Dout]
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=1), 1e-8) / 127.0  # [L, Dout]
        out[name + "_q"] = jnp.round(w / s[:, None, :]).astype(jnp.int8)
        out[name + "_s"] = s
    return out


def _dot_w8a8(x: jax.Array, wq: jax.Array, ws: jax.Array, b: jax.Array) -> jax.Array:
    """x [S, Din] (bf16/f32) @ int8 weight [Din, Dout] with per-output-channel
    scales [Dout]: per-row activation quantize, int8 MXU dot, rescale.
    2-D only BY DESIGN: ND callers reshape to [prod(batch), Din] first —
    keeping this jaxpr byte-stable preserves every cached decode executable
    (the persistent compile cache keys on the traced HLO)."""
    xq, xs = _quantize_rows(x)
    y = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * xs[:, None] * ws[None, :]
    yf = yf + b.astype(jnp.float32)
    return yf.astype(x.dtype)


# ------------------------------------------------------------------ params


def init_gpt_params(cfg: XTTSGPTConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-init parameter pytree (normal(0.02), GPT-2 convention)."""
    d, i, l = cfg.hidden_size, cfg.n_inner, cfg.num_hidden_layers
    ks = iter(jax.random.split(key, 16))
    n = lambda k, shape: (0.02 * jax.random.normal(k, shape)).astype(dtype)
    return {
        "wte": n(next(ks), (cfg.num_audio_tokens, d)),
        "wpe": n(next(ks), (cfg.audio_position_table, d)),
        "text_wte": n(next(ks), (cfg.number_text_tokens, d)),
        "text_wpe": n(next(ks), (cfg.text_position_table, d)),
        "blocks": {
            "ln1_scale": jnp.ones((l, d), dtype),
            "ln1_bias": jnp.zeros((l, d), dtype),
            "attn_w": n(next(ks), (l, d, 3 * d)),
            "attn_b": jnp.zeros((l, 3 * d), dtype),
            "attn_proj_w": n(next(ks), (l, d, d)),
            "attn_proj_b": jnp.zeros((l, d), dtype),
            "ln2_scale": jnp.ones((l, d), dtype),
            "ln2_bias": jnp.zeros((l, d), dtype),
            "fc_w": n(next(ks), (l, d, i)),
            "fc_b": jnp.zeros((l, i), dtype),
            "fc_proj_w": n(next(ks), (l, i, d)),
            "fc_proj_b": jnp.zeros((l, d), dtype),
        },
        "ln_f_scale": jnp.ones((d,), dtype),
        "ln_f_bias": jnp.zeros((d,), dtype),
        "final_norm_scale": jnp.ones((d,), dtype),
        "final_norm_bias": jnp.zeros((d,), dtype),
        "mel_head_w": n(next(ks), (d, cfg.num_audio_tokens)),
        "mel_head_b": jnp.zeros((cfg.num_audio_tokens,), dtype),
    }


# -------------------------------------------------------------------- math


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm computed in f32 regardless of activation dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _dot(x, w, b=None):
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _block_params(blocks: dict, layer: jax.Array) -> dict:
    return jax.tree.map(lambda a: a[layer], blocks)


def text_embeddings(params: dict, token_ids: jax.Array) -> jax.Array:
    """[T] -> [T, D]: text wte + learned text positions (reference:
    XTTSv2.py:524-531)."""
    t = token_ids.shape[0]
    return params["text_wte"][token_ids] + params["text_wpe"][jnp.arange(t)]


def start_audio_embedding(params: dict, cfg: XTTSGPTConfig) -> jax.Array:
    """embed(start_audio) = wte[start] + wpe[0] (reference:
    vllm_mm_gpt.py:806-813)."""
    return params["wte"][cfg.start_audio_token] + params["wpe"][0]


def heads(params: dict, h: jax.Array) -> tuple[jax.Array, jax.Array]:
    """h (pre-ln_f) -> (mel logits, vocoder latent)."""
    g = layer_norm(h, params["ln_f_scale"], params["ln_f_bias"])
    f1 = layer_norm(g, params["final_norm_scale"], params["final_norm_bias"])
    logits = _dot(f1, params["mel_head_w"], params["mel_head_b"]).astype(jnp.float32)
    latent = layer_norm(f1, params["final_norm_scale"], params["final_norm_bias"])
    return logits, latent


# ----------------------------------------------------------------- prefill


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def gpt_prefill(
    params: dict,
    cfg: XTTSGPTConfig,
    embeds: jax.Array,  # [T_pad, D] — cond ⊕ text ⊕ start-audio, zero-padded
    length: jax.Array,  # scalar int32: true prompt length
    slot: jax.Array,  # scalar int32: cache slot to fill
    cache: KVCache,
) -> tuple[jax.Array, KVCache]:
    """Run the prompt through all layers, write K/V into `cache[slot]`,
    return the last real position's hidden state (pre-ln_f) [D]."""
    t_pad, d = embeds.shape
    h_heads, head_dim = cfg.num_attention_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(head_dim)

    pos = jnp.arange(t_pad)
    # causal AND key within the real prompt
    mask = (pos[None, :] <= pos[:, None]) & (pos[None, :] < length)
    neg = jnp.finfo(jnp.float32).min
    w8 = cfg.prefill_w8a8 and "blocks_q8" in params

    def body(layer, carry):
        x, cache = carry
        bp = _block_params(params["blocks"], layer)
        bq = _block_params(params["blocks_q8"], layer) if w8 else None

        def mm(t, name):  # [T, Din] @ blocks[name] — w8a8 when armed
            if w8:
                return _dot_w8a8(t, bq[name + "_q"], bq[name + "_s"], bp[name[:-2] + "_b"])
            return _dot(t, bp[name], bp[name[:-2] + "_b"])

        xn = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
        qkv = mm(xn, "attn_w")  # [T, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(t_pad, h_heads, head_dim)
        k = k.reshape(t_pad, h_heads, head_dim)
        v = v.reshape(t_pad, h_heads, head_dim)
        if cfg.prefill_flash:
            from ...ops.prefill_attention import prefill_flash_attention

            # fused per-head VMEM attention: no [H, T, T] HBM round-trip.
            # Off-chip (CPU tests) the same kernel runs interpreted, so the
            # flag stays testable hermetically.
            ctx = prefill_flash_attention(
                q, k, v, length, interpret=jax.default_backend() != "tpu"
            )
        else:
            scores = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            scores = jnp.where(mask[None], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx = jnp.einsum("hqk,khd->qhd", probs, v, preferred_element_type=jnp.float32)
        ctx = ctx.reshape(t_pad, d).astype(x.dtype)
        x = x + mm(ctx, "attn_proj_w")
        xn = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
        y = mm(xn, "fc_w")
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = x + mm(y, "fc_proj_w")

        k_flat = k.reshape(t_pad, d)
        v_flat = v.reshape(t_pad, d)
        if cfg.kv_int8:
            k_q, k_s = _quantize_rows(k_flat)
            v_q, v_s = _quantize_rows(v_flat)
            cache = KVCache(
                lax.dynamic_update_slice(cache.k, k_q[None, None], (layer, slot, 0, 0)),
                lax.dynamic_update_slice(cache.v, v_q[None, None], (layer, slot, 0, 0)),
                lax.dynamic_update_slice(cache.k_scale, k_s[None, None], (layer, slot, 0)),
                lax.dynamic_update_slice(cache.v_scale, v_s[None, None], (layer, slot, 0)),
            )
        else:
            cache = KVCache(
                lax.dynamic_update_slice(
                    cache.k, k_flat.astype(cache.k.dtype)[None, None], (layer, slot, 0, 0)
                ),
                lax.dynamic_update_slice(
                    cache.v, v_flat.astype(cache.v.dtype)[None, None], (layer, slot, 0, 0)
                ),
            )
        return x, cache

    if cfg.unroll_layers:
        x, cache = embeds, cache
        for layer in range(cfg.num_hidden_layers):
            x, cache = body(layer, (x, cache))
    else:
        x, cache = lax.fori_loop(0, cfg.num_hidden_layers, body, (embeds, cache))
    h_last = x[length - 1]
    return h_last, cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def gpt_prefill_batched(
    params: dict,
    cfg: XTTSGPTConfig,
    embeds: jax.Array,  # [K, T_pad, D] — a BURST of prompts, zero-padded
    lengths: jax.Array,  # [K] int32 true prompt lengths (0 = padding lane)
    slots: jax.Array,  # [K] int32 target cache slots; >= num_slots = dropped
    cache: KVCache,
) -> tuple[jax.Array, KVCache]:
    """Burst prefill: K prompts through all layers in ONE program, so the
    0.86 GiB of weights stream from HBM once instead of K times (a 16-chunk
    burst was spending ~100 ms of pure repeated weight reads before its
    first decode block — the dominant unexplained term in the measured
    time-to-first-audio budget). Cache writes scatter to `slots` with
    out-of-bounds lanes dropped, so callers pad a burst to the program's K
    bucket with slot=num_slots. Returns last real hidden states [K, D]."""
    kb, t_pad, d = embeds.shape
    h_heads, head_dim = cfg.num_attention_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(head_dim)

    pos = jnp.arange(t_pad)
    # [K, T, T]: causal AND key within each prompt's real length
    mask = (pos[None, None, :] <= pos[None, :, None]) & (
        pos[None, None, :] < lengths[:, None, None]
    )
    neg = jnp.finfo(jnp.float32).min

    w8 = cfg.prefill_w8a8 and "blocks_q8" in params

    def body(layer, carry):
        x, cache = carry  # x [K, T, D]
        bp = _block_params(params["blocks"], layer)
        bq = _block_params(params["blocks_q8"], layer) if w8 else None

        def mm(t, name):  # [K, T, Din] @ blocks[name] — w8a8 when armed
            if w8:
                flat = _dot_w8a8(
                    t.reshape(-1, t.shape[-1]),
                    bq[name + "_q"], bq[name + "_s"], bp[name[:-2] + "_b"],
                )
                return flat.reshape(*t.shape[:-1], flat.shape[-1])
            return _dot(t, bp[name], bp[name[:-2] + "_b"])

        xn = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
        qkv = mm(xn, "attn_w")  # [K, T, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(kb, t_pad, h_heads, head_dim)
        k = k.reshape(kb, t_pad, h_heads, head_dim)
        v = v.reshape(kb, t_pad, h_heads, head_dim)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.where(mask[:, None], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        )
        ctx = ctx.reshape(kb, t_pad, d).astype(x.dtype)
        x = x + mm(ctx, "attn_proj_w")
        xn = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
        y = mm(xn, "fc_w")
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = x + mm(y, "fc_proj_w")

        k_flat = k.reshape(kb, t_pad, d)
        v_flat = v.reshape(kb, t_pad, d)

        # K static dynamic_update_slice's, NOT one generalized scatter: a
        # slot-indexed scatter on the [L, S, T, D] cache lowers to a slow
        # general scatter (measured ~7% e-book RTF), while per-lane row
        # update-slices are the same cheap writes the single-slot prefill
        # uses. Padding lanes (slot >= num_slots) clamp to their target and
        # write back what was already there (read-modify-write no-op).
        num_slots = cache.k.shape[1]

        def write_rows(buf, rows_b, lane_shape_prefix=()):
            for i in range(kb):
                tgt = jnp.minimum(slots[i], num_slots - 1)
                valid = slots[i] < num_slots
                start = (layer, tgt) + (0,) * (buf.ndim - 2)
                cur = lax.dynamic_slice(
                    buf, start, (1, 1) + rows_b.shape[1:]
                )
                upd = jnp.where(valid, rows_b[i][None, None], cur)
                buf = lax.dynamic_update_slice(buf, upd, start)
            return buf

        if cfg.kv_int8:
            k_q, k_s = _quantize_rows(k_flat)
            v_q, v_s = _quantize_rows(v_flat)
            cache = KVCache(
                write_rows(cache.k, k_q),
                write_rows(cache.v, v_q),
                write_rows(cache.k_scale, k_s),
                write_rows(cache.v_scale, v_s),
            )
        else:
            cache = KVCache(
                write_rows(cache.k, k_flat.astype(cache.k.dtype)),
                write_rows(cache.v, v_flat.astype(cache.v.dtype)),
            )
        return x, cache

    if cfg.unroll_layers:
        x, cache = embeds, cache
        for layer in range(cfg.num_hidden_layers):
            x, cache = body(layer, (x, cache))
    else:
        x, cache = lax.fori_loop(0, cfg.num_hidden_layers, body, (embeds, cache))
    h_last = jnp.take_along_axis(
        x, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1
    )[:, 0]
    return h_last, cache


# ------------------------------------------------------------- decode step


def gpt_decode_step(
    params: dict,
    cfg: XTTSGPTConfig,
    tokens: jax.Array,  # [S] int32 — last sampled token per slot
    audio_pos: jax.Array,  # [S] int32 — audio position of that token
    seq_lens: jax.Array,  # [S] int32 — positions already in cache
    cache: KVCache,
    len_bound: int | None = None,  # static upper bound on seq_lens+1; the
    # dense path reads only cache[:, :len_bound] (bandwidth ∝ bound)
) -> tuple[jax.Array, KVCache]:
    """One decode step for every slot. Returns hidden (pre-ln_f) [S, D] and
    the cache with this step's K/V appended at `seq_lens`."""
    s = tokens.shape[0]
    d = cfg.hidden_size
    h_heads, head_dim = cfg.num_attention_heads, cfg.head_dim
    t_max = cache.max_len
    bound = min(len_bound or t_max, t_max)
    scale = 1.0 / math.sqrt(head_dim)
    slot_idx = jnp.arange(s)
    # [HD, H] 0/1 head-membership matrix (trace-time constant) for the
    # flat-layout attention below
    head_onehot = jnp.asarray(
        (np.arange(d) // head_dim)[:, None] == np.arange(h_heads)[None, :],
        jnp.float32,
    )

    x = params["wte"][tokens] + params["wpe"][jnp.clip(audio_pos, 0, cfg.audio_position_table - 1)]
    x = x.astype(jnp.bfloat16 if cfg.kv_int8 else cache.k.dtype)

    key_pos = jnp.arange(bound)
    att_mask = key_pos[None, :] <= seq_lens[:, None]  # include current position
    neg = jnp.finfo(jnp.float32).min

    w8 = cfg.decode_w8a8 and "blocks_q8" in params

    def body(layer, carry):
        x, cache = carry
        bp = _block_params(params["blocks"], layer)
        bq = _block_params(params["blocks_q8"], layer) if w8 else None
        xn = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
        if w8:
            qkv = _dot_w8a8(xn, bq["attn_w_q"], bq["attn_w_s"], bp["attn_b"])
        else:
            qkv = _dot(xn, bp["attn_w"], bp["attn_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each [S, D] flat
        if cfg.flash_decode:
            from ...ops.experimental.attention import flash_decode_append_attention

            # fused in-kernel append + length-aware flash attention; the
            # caches pass through the kernel aliased (no scatter, no copies)
            ctx, ck, cv = flash_decode_append_attention(
                q.reshape(s, h_heads, head_dim), k.astype(cache.k.dtype),
                v.astype(cache.v.dtype), cache.k, cache.v, layer, seq_lens,
            )
            cache = KVCache(ck, cv)
        elif cfg.kv_int8 and cfg.ragged_decode:
            from ...ops.experimental.attention import ragged_decode_attention

            # ragged Pallas kernel: fused int8 append + per-slot LIVE-length
            # KV reads (sum(seq_lens) traffic instead of slots x len_bound);
            # int8 rows dequantize in-kernel via the per-token scale rows.
            # Caches pass through aliased — requires the unrolled layer body.
            ctx, ck, cv, ks, vs = ragged_decode_attention(
                q.reshape(s, h_heads, head_dim), k, v, scale, layer,
                seq_lens, cache.k, cache.v, cache.k_scale, cache.v_scale,
                interpret=jax.default_backend() != "tpu",
            )
            cache = KVCache(ck, cv, ks, vs)
        elif cfg.kv_int8:
            # int8 storage with per-token scales. Scores run as an int8x
            # int8 -> int32 MXU matmul so the cache is read directly in its
            # storage dtype (a mixed-dtype dot would materialize a bf16 copy
            # of the whole read — dots don't accept fused converts).
            k_q, k_s = _quantize_rows(k)
            v_q, v_s = _quantize_rows(v)
            cache = KVCache(
                cache.k.at[layer, slot_idx, seq_lens].set(k_q),
                cache.v.at[layer, slot_idx, seq_lens].set(v_q),
                # scale arrays are [L, S, T] so this is the same cheap row
                # scatter as the cache write (head-indexed layouts lower to
                # a pathologically slow scatter; see bench_decode_variants)
                cache.k_scale.at[layer, slot_idx, seq_lens].set(k_s),
                cache.v_scale.at[layer, slot_idx, seq_lens].set(v_s),
            )
            # read only the first s slot rows: callers may pass a SLICED
            # slot view (tokens[:slot_bound]) so tail-of-workload steps with
            # few live slots skip dead rows entirely (slots cluster low —
            # the coordinator always inserts into the lowest free slot)
            k_all = cache.k[layer, :s, :bound]  # [s, bound, HD] int8
            v_all = cache.v[layer, :s, :bound]
            k_sc = cache.k_scale[layer, :s, :bound]  # [s, bound]
            v_sc = cache.v_scale[layer, :s, :bound]
            # quantize q per (slot, head): per-head max keeps the head with
            # the smallest keys from losing precision to the loudest one
            q_f = q.astype(jnp.float32).reshape(s, h_heads, head_dim)
            q_s = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8) / 127.0
            q_i8 = jnp.round(q_f / q_s).astype(jnp.int8).reshape(s, d)
            qmat = q_i8[:, :, None] * head_onehot.astype(jnp.int8)[None]  # [S, HD, H]
            scores_i = jnp.einsum(
                "stc,sch->sht", k_all, qmat, preferred_element_type=jnp.int32
            )
            scores = (
                scores_i.astype(jnp.float32)
                * k_sc[:, None, :]
                * (q_s.reshape(s, h_heads, 1) * scale)
            )
            scores = jnp.where(att_mask[:, None, :], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1)
            if cfg.decode_attn_fp:
                # small-shape variant (r5 A/B, see config): fold V's dequant
                # scales into the probs and run the context matmul in bf16
                # against a converted V — skips the prob requantize chain,
                # whose VPU work at tiny row counts costs more than the
                # bf16 copy of the V read (0.475 -> 0.429 ms/chain s8/b256)
                pf = (probs * v_sc[:, None, :]).astype(jnp.bfloat16)
                ctx_f = jnp.einsum(
                    "sht,stc->shc", pf, v_all.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )  # [S, H, HD] f32
            else:
                # fold V's per-token dequant scales into the probabilities,
                # then quantize the folded probs per (slot, head) row and run
                # the context reduction as an int8 [H, T] x [T, HD] MXU
                # matmul per slot: V is read ONCE in its storage dtype and no
                # broadcast intermediate exists. (The previous broadcast-back
                # formulation materialized a [S, bound, HD] bf16 tensor per
                # layer — written and re-read through HBM, it was ~half the
                # step's bandwidth.)
                pf = probs * v_sc[:, None, :]  # [S, H, T] f32
                p_s = jnp.maximum(jnp.max(pf, axis=-1, keepdims=True), 1e-20) / 127.0
                p_i8 = jnp.round(pf / p_s).astype(jnp.int8)
                ctx_full = jnp.einsum(
                    "sht,stc->shc", p_i8, v_all, preferred_element_type=jnp.int32
                )  # every head against every lane block; FLOPs are free here
                ctx_f = ctx_full.astype(jnp.float32) * p_s  # [S, H, HD]
            # keep each head's own lane block: ctx[s, c] = ctx_f[s, head(c), c]
            ctx = jnp.sum(ctx_f * head_onehot.T[None], axis=1)
        else:
            ck = cache.k.at[layer, slot_idx, seq_lens].set(k.astype(cache.k.dtype))
            cv = cache.v.at[layer, slot_idx, seq_lens].set(v.astype(cache.v.dtype))
            cache = KVCache(ck, cv)
            # Attention entirely in the flat [T, H*Dh] lane layout: a
            # reshape to [.., H, Dh=64] would force a 2x-padded relayout
            # copy of the whole cache read (Dh < the 128-lane tile).
            # Per-head reductions are instead matmuls against a
            # block-diagonal Q ([HD, H]) and per-head broadcasts matmuls
            # against its 0/1 transpose — same trick as the Pallas kernel.
            k_all = ck[layer, :s, :bound]  # [s, bound, HD] — no relayout
            v_all = cv[layer, :s, :bound]
            # keep cache operands in their storage dtype (bf16) and let the
            # MXU accumulate in f32 — an .astype(f32) here would halve the
            # matmul rate AND materialize a 2x-sized copy of every read
            qmat = (q.astype(jnp.float32) * scale)[:, :, None] * head_onehot[None]
            scores = jnp.einsum(
                "stc,sch->sht", k_all, qmat.astype(k_all.dtype),
                preferred_element_type=jnp.float32,
            )
            scores = jnp.where(att_mask[:, None, :], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1)
            # context as a per-slot [H, T] x [T, HD] matmul against the flat
            # V read (f32 MXU accumulation), then keep each head's own lane
            # block — no [S, bound, HD] broadcast intermediate (the previous
            # broadcast-back formulation wrote + re-read one through HBM
            # every layer, doubling the attention traffic)
            ctx_full = jnp.einsum(
                "sht,stc->shc", probs.astype(v_all.dtype), v_all,
                preferred_element_type=jnp.float32,
            )  # [S, H, HD]
            ctx = jnp.sum(ctx_full * head_onehot.T[None], axis=1)
        ctx = ctx.reshape(s, d).astype(x.dtype)
        if w8:
            x = x + _dot_w8a8(ctx, bq["attn_proj_w_q"], bq["attn_proj_w_s"], bp["attn_proj_b"])
            xn = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
            y = _dot_w8a8(xn, bq["fc_w_q"], bq["fc_w_s"], bp["fc_b"])
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
            x = x + _dot_w8a8(y, bq["fc_proj_w_q"], bq["fc_proj_w_s"], bp["fc_proj_b"])
        else:
            x = x + _dot(ctx, bp["attn_proj_w"], bp["attn_proj_b"])
            xn = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
            y = _dot(xn, bp["fc_w"], bp["fc_b"])
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
            x = x + _dot(y, bp["fc_proj_w"], bp["fc_proj_b"])
        return x, cache

    if cfg.flash_decode or cfg.ragged_decode or cfg.unroll_layers:
        # unroll layers: straight-line pallas calls keep the cache aliasing
        # in-place (a fori-carried cache forces per-call copies); for the
        # XLA paths (cfg.unroll_layers) straight-line code lets the
        # scheduler overlap layer l+1's weight loads with layer l's compute
        for layer in range(cfg.num_hidden_layers):
            x, cache = body(layer, (x, cache))
        return x, cache
    x, cache = lax.fori_loop(0, cfg.num_hidden_layers, body, (x, cache))
    return x, cache


# --------------------------------------------------- reference-shape prompt


def build_prompt_embeds(
    params: dict,
    cfg: XTTSGPTConfig,
    cond_latents: np.ndarray | jax.Array,  # [C, D] perceiver output
    text_ids: list[int] | np.ndarray,  # WITHOUT bos/eos
    bos_id: int,
    eos_id: int,
) -> jax.Array:
    """Assemble the full prompt embedding sequence
    `[cond ⊕ text(bos..eos) ⊕ start_audio]` -> [C+T+1, D]."""
    ids = jnp.asarray([bos_id, *list(map(int, text_ids)), eos_id], dtype=jnp.int32)
    text = text_embeddings(params, ids)
    start = start_audio_embedding(params, cfg)[None]
    return jnp.concatenate([jnp.asarray(cond_latents, text.dtype), text, start], axis=0)
