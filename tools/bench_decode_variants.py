"""Microbenchmark of decode-step attention variants at serving shapes.

Times the full 30-layer decode step (matmuls + attention + bookkeeping-free)
for candidate KV-cache designs:
  xla      — current production path: bf16 flat-lane cache, block-diag Q matmul
  shc      — bf16 cache, V-side computed as einsum("sht,stc->shc") + block-diag
             select (no [S,T,C] p_lanes intermediate)
  int8     — int8 KV cache with per-(token, head) scales; K scores via int8
             MXU matmul (q quantized per-(slot, head)), V via fused
             dequant-multiply-reduce

Usage: python tools/bench_decode_variants.py [--slots 64] [--steps 32]
"""
from __future__ import annotations

import argparse
import math
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from auralis_tpu.models.xttsv2.config import XTTSGPTConfig
from auralis_tpu.models.xttsv2.gpt import _block_params, _dot, layer_norm


def time_steps(fn, state, n_timed=3):
    """fn: state -> state (jitted, donating). Forces completion by fetching a
    scalar from the result each round."""
    state = fn(state)  # compile
    _ = jax.device_get(jax.tree.leaves(state)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n_timed):
        state = fn(state)
    _ = jax.device_get(jax.tree.leaves(state)[0].ravel()[0])
    return (time.perf_counter() - t0) / n_timed, state


def make_variant(cfg: XTTSGPTConfig, variant: str, bound: int, n_steps: int):
    d = cfg.hidden_size
    h_heads, head_dim = cfg.num_attention_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(head_dim)

    def attn_xla(q, ck, cv, layer, att_mask, extras):
        s = q.shape[0]
        head_onehot = jnp.asarray(
            (np.arange(d) // head_dim)[:, None] == np.arange(h_heads)[None, :],
            jnp.float32,
        )
        k_all = ck[layer, :, :bound]
        v_all = cv[layer, :, :bound]
        neg = jnp.finfo(jnp.float32).min
        qmat = (q.astype(jnp.float32) * scale)[:, :, None] * head_onehot[None]
        scores = jnp.einsum("stc,sch->sht", k_all, qmat.astype(k_all.dtype),
                            preferred_element_type=jnp.float32)
        scores = jnp.where(att_mask[:, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        p_lanes = jnp.einsum("sht,hc->stc", probs.astype(v_all.dtype),
                             head_onehot.T.astype(v_all.dtype),
                             preferred_element_type=jnp.float32).astype(v_all.dtype)
        return jnp.sum((p_lanes * v_all).astype(jnp.float32), axis=1)

    def attn_shc(q, ck, cv, layer, att_mask, extras):
        s = q.shape[0]
        head_onehot = jnp.asarray(
            (np.arange(d) // head_dim)[:, None] == np.arange(h_heads)[None, :],
            jnp.float32,
        )
        k_all = ck[layer, :, :bound]
        v_all = cv[layer, :, :bound]
        neg = jnp.finfo(jnp.float32).min
        qmat = (q.astype(jnp.float32) * scale)[:, :, None] * head_onehot[None]
        scores = jnp.einsum("stc,sch->sht", k_all, qmat.astype(k_all.dtype),
                            preferred_element_type=jnp.float32)
        scores = jnp.where(att_mask[:, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
        out = jnp.einsum("sht,stc->shc", probs, v_all,
                         preferred_element_type=jnp.float32)  # [S, H, HD]
        out = out.reshape(s, h_heads, h_heads, head_dim)
        ctx = jnp.einsum("shgd,hg->shd", out,
                         jnp.eye(h_heads, dtype=jnp.float32))
        return ctx.reshape(s, d)

    def attn_int8(q, ck, cv, layer, att_mask, extras):
        """int8 cache with per-(layer, slot, token) scales [L, S, T]."""
        ks_all, vs_all = extras
        s = q.shape[0]
        head_onehot_i8 = jnp.asarray(
            (np.arange(d) // head_dim)[:, None] == np.arange(h_heads)[None, :],
            jnp.int8,
        )
        k_all = ck[layer, :, :bound]  # [S, bound, HD] int8
        v_all = cv[layer, :, :bound]
        kscale = ks_all[layer, :, :bound]  # [S, bound]
        vscale = vs_all[layer, :, :bound]
        # quantize q per (slot, head)
        qf = q.astype(jnp.float32).reshape(s, h_heads, head_dim)
        qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
        qs = jnp.maximum(qmax, 1e-8) / 127.0
        q_i8 = jnp.round(qf / qs).astype(jnp.int8).reshape(s, d)
        qmat = q_i8[:, :, None] * head_onehot_i8[None]  # [S, HD, H] int8
        scores_i = jnp.einsum("stc,sch->sht", k_all, qmat,
                              preferred_element_type=jnp.int32)
        scores = (
            scores_i.astype(jnp.float32)
            * kscale[:, None, :]
            * (qs.reshape(s, h_heads, 1) * scale)
        )
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(att_mask[:, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = probs * vscale[:, None, :]  # fold v scales into probs
        head_onehot = jnp.asarray(
            (np.arange(d) // head_dim)[:, None] == np.arange(h_heads)[None, :],
            jnp.float32,
        )
        p_lanes = jnp.einsum("sht,hc->stc", probs.astype(jnp.bfloat16),
                             head_onehot.T.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.sum(
            (p_lanes * v_all.astype(jnp.bfloat16)).astype(jnp.float32), axis=1
        )

    attn = {"xla": attn_xla, "shc": attn_shc, "int8": attn_int8}[variant]
    int8 = variant.startswith("int8")

    @partial(jax.jit, donate_argnames=("state",))
    def run(params, state):
        def one_step(_, state):
            x, ck, cv, seq_lens, extras = state
            s = x.shape[0]
            key_pos = jnp.arange(bound)
            att_mask = key_pos[None, :] <= seq_lens[:, None]
            slot_idx = jnp.arange(s)

            def body(layer, carry):
                x, ck, cv, extras = carry
                bp = _block_params(params["blocks"], layer)
                xn = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
                qkv = _dot(xn, bp["attn_w"], bp["attn_b"])
                q, k, v = jnp.split(qkv, 3, axis=-1)
                if int8:
                    ks_all, vs_all = extras
                    kf = k.astype(jnp.float32)
                    vf = v.astype(jnp.float32)
                    kmax = jnp.maximum(jnp.max(jnp.abs(kf), -1), 1e-8) / 127.0
                    vmax = jnp.maximum(jnp.max(jnp.abs(vf), -1), 1e-8) / 127.0
                    k_i8 = jnp.round(kf / kmax[:, None]).astype(jnp.int8)
                    v_i8 = jnp.round(vf / vmax[:, None]).astype(jnp.int8)
                    ck = ck.at[layer, slot_idx, seq_lens].set(k_i8)
                    cv = cv.at[layer, slot_idx, seq_lens].set(v_i8)
                    ks_all = ks_all.at[layer, slot_idx, seq_lens].set(kmax)
                    vs_all = vs_all.at[layer, slot_idx, seq_lens].set(vmax)
                    extras = (ks_all, vs_all)
                else:
                    ck = ck.at[layer, slot_idx, seq_lens].set(k.astype(ck.dtype))
                    cv = cv.at[layer, slot_idx, seq_lens].set(v.astype(cv.dtype))
                ctx = attn(q, ck, cv, layer, att_mask, extras)
                ctx = ctx.reshape(s, d).astype(x.dtype)
                x = x + _dot(ctx, bp["attn_proj_w"], bp["attn_proj_b"])
                xn = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
                y = _dot(xn, bp["fc_w"], bp["fc_b"])
                y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
                x = x + _dot(y, bp["fc_proj_w"], bp["fc_proj_b"])
                return x, ck, cv, extras

            x, ck, cv, extras = lax.fori_loop(
                0, params["blocks"]["ln1_scale"].shape[0], body, (x, ck, cv, extras)
            )
            return x, ck, cv, seq_lens + 1, extras

        return lax.fori_loop(0, n_steps, one_step, state)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--variants", default="xla,int8")
    ap.add_argument("--bounds", default="256,512,1024")
    args = ap.parse_args()

    cfg = XTTSGPTConfig()
    from auralis_tpu.models.xttsv2.gpt import init_gpt_params, make_kv_cache

    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    S, d = args.slots, cfg.hidden_size
    H = cfg.num_attention_heads
    print(f"backend: {jax.default_backend()}  slots={S} steps={args.steps}")
    sec_per_token = 1024 / 22050

    for variant in args.variants.split(","):
        for bound in map(int, args.bounds.split(",")):
            int8 = variant.startswith("int8")
            cache = make_kv_cache(cfg, S, dtype=jnp.int8 if int8 else jnp.bfloat16)
            t_pad = cache.k.shape[2]
            if int8:
                extras = (
                    jnp.ones((cfg.num_hidden_layers, S, t_pad), jnp.float32),
                    jnp.ones((cfg.num_hidden_layers, S, t_pad), jnp.float32),
                )
            else:
                extras = ()
            x = jax.random.normal(jax.random.PRNGKey(1), (S, d)).astype(jnp.bfloat16)
            seq_lens = jnp.full((S,), bound - args.steps * 5 - 2, jnp.int32)
            state = (x, cache.k, cache.v, seq_lens, extras)
            run = make_variant(cfg, variant, bound, args.steps)
            try:
                dt, state = time_steps(lambda st: run(params, st), state)
            except Exception as e:
                print(f"  {variant:9s} bound {bound:5d}: FAILED {type(e).__name__}: {e}")
                continue
            ms = dt * 1e3 / args.steps
            rtf = ms / 1e3 / (S * sec_per_token)
            print(f"  {variant:9s} bound {bound:5d}: {ms:7.3f} ms/step   "
                  f"full-occupancy decode RTF {rtf:.5f}")
            del state, cache, extras


if __name__ == "__main__":
    main()
