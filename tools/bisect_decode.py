"""Bisect the decode step's small-shape overhead (judge r3 weak #3 / r4 item
4: s8/bound-256 measures 1.556 ms with w8a8 vs a ~0.6 ms memory floor —
where does the other ~1 ms sit, and does an explicitly double-buffered
Pallas MLP beat XLA's scheduling?).

Rungs (all 30-layer straight-line chains at decode shapes [S, D]):

  mlp8    ln2 + W8A8 fc->gelu->fc_proj + residual, XLA (`_dot_w8a8` x2) —
          the production MLP side of the step
  mlpk    same chain with the Pallas fused_mlp_w8 kernel (tile_i via
          --tile_i) — grid-pipelined weight streaming, VMEM-resident
          intermediate
  qkv8    ln1 + W8A8 qkv dot + (q+v) passthrough + W8A8 attn_proj +
          residual — the attention-side matmuls without attention
  attn    the production int8-KV attention body alone at --bound (cache
          read + scores + softmax + context), no weight matmuls
  step    the full production decode_steps_status program (same number
          bench_prod_step reports)
  empty   trivial jitted add — dispatch floor

Run subsets with --rungs so a degraded remote-compile rig builds the ladder
incrementally (each rung is one fresh executable; the persistent cache keeps
finished rungs across invocations).

rep* rungs (repmlp8, repmlpk, repqkv8, repattn) run K={1,8} applications of
the chain inside one executable and report the marginal time per extra
application — pure device time with the host-dispatch floor cancelled.
(The `step` rung is single-dispatch; tools/bench_prod_step.py's 32-step
blocks are the amortized production-step number.)

Usage: python tools/bisect_decode.py --slots 8 --bound 256 \
           [--rungs mlp8,mlpk,qkv8,attn,step,empty] [--n 30] [--tile_i 1024]
"""
from __future__ import annotations

import argparse
import math
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.common.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from auralis_tpu.models.xttsv2.config import XTTSGPTConfig
from auralis_tpu.models.xttsv2.gpt import (
    _block_params,
    _dot_w8a8,
    _quantize_rows,
    init_gpt_params,
    layer_norm,
    make_kv_cache,
    quantize_decode_weights,
)
from auralis_tpu.ops.experimental.fused_mlp import fused_mlp_w8


def drain(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, make_args, n=30, warmup=2):
    for _ in range(warmup):
        out = fn(*make_args())
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*make_args())
    drain(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--bound", type=int, default=256)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--tile_i", type=int, default=1024)
    ap.add_argument("--rungs", default="mlp8,mlpk,qkv8,attn,step,empty")
    args = ap.parse_args()
    rungs = set(args.rungs.split(","))

    import dataclasses

    cfg = dataclasses.replace(
        XTTSGPTConfig(), kv_int8=True, unroll_layers=True, decode_w8a8=True
    )
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = dict(params)
    params["blocks_q8"] = jax.jit(quantize_decode_weights)(params["blocks"])
    s, d = args.slots, cfg.hidden_size
    h_heads, head_dim = cfg.num_attention_heads, cfg.head_dim
    nl = cfg.num_hidden_layers
    print(
        f"backend: {jax.default_backend()}  slots={s} bound={args.bound} "
        f"tile_i={args.tile_i}",
        flush=True,
    )
    x0 = (0.1 * jax.random.normal(jax.random.PRNGKey(1), (s, d))).astype(jnp.bfloat16)

    # ------------------------------------------------ MLP chains (30 layers)
    # params is an ARGUMENT (not a closure capture): closed-over weights
    # become HLO constants and overflow the remote compile service's
    # request-body limit (HTTP 413)
    def mlp_chain(prm, x, *, kernel: bool):
        for layer in range(nl):
            bp = _block_params(prm["blocks"], layer)
            bq = _block_params(prm["blocks_q8"], layer)
            xn = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
            if kernel:
                y = fused_mlp_w8(
                    xn, bq["fc_w_q"], bq["fc_w_s"], bp["fc_b"],
                    bq["fc_proj_w_q"], bq["fc_proj_w_s"], bp["fc_proj_b"],
                    tile_i=args.tile_i,
                )
            else:
                h = _dot_w8a8(xn, bq["fc_w_q"], bq["fc_w_s"], bp["fc_b"])
                h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
                y = _dot_w8a8(h, bq["fc_proj_w_q"], bq["fc_proj_w_s"], bp["fc_proj_b"])
            x = x + y
        return x

    if "mlp8" in rungs:
        t = timeit(jax.jit(partial(mlp_chain, kernel=False)), lambda: (params, x0), n=args.n)
        print(f"  mlp chain XLA w8a8     {t * 1e3:7.3f} ms", flush=True)
    if "mlpk" in rungs:
        t = timeit(jax.jit(partial(mlp_chain, kernel=True)), lambda: (params, x0), n=args.n)
        print(f"  mlp chain Pallas fused {t * 1e3:7.3f} ms", flush=True)

    # ------------------------------------------- attention-side matmuls only
    def qkv_chain(prm, x):
        for layer in range(nl):
            bp = _block_params(prm["blocks"], layer)
            bq = _block_params(prm["blocks_q8"], layer)
            xn = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
            qkv = _dot_w8a8(xn, bq["attn_w_q"], bq["attn_w_s"], bp["attn_b"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            ctx = (q + v).astype(x.dtype)
            x = x + _dot_w8a8(ctx, bq["attn_proj_w_q"], bq["attn_proj_w_s"], bp["attn_proj_b"])
        return x

    if "qkv8" in rungs:
        t = timeit(jax.jit(qkv_chain), lambda: (params, x0), n=args.n)
        print(f"  qkv+proj chain w8a8    {t * 1e3:7.3f} ms", flush=True)

    # ---------- dispatch-amortized repeats (device-time isolation) ---------
    # bench_prod_step amortizes dispatch over 32-step blocks, so its ms/step
    # is true device time — but the single-dispatch chain rungs above carry
    # the ~2.25 ms tunnel dispatch floor. These rungs run K={1,8} chain
    # applications inside ONE executable (fori_loop, single HLO body) and
    # report the marginal per-application time, which is pure device time.
    def _marginal(tag, fn1, fn8, mk):
        t1 = timeit(fn1, mk, n=args.n)
        t8 = timeit(fn8, mk, n=args.n)
        print(
            f"  {tag} K=1 {t1 * 1e3:7.3f} ms  K=8 {t8 * 1e3:7.3f} ms"
            f"  device/chain {(t8 - t1) / 7 * 1e3:7.3f} ms",
            flush=True,
        )

    def chain_rep(prm, x, *, kernel, k):
        body = lambda _, xx: mlp_chain(prm, xx, kernel=kernel)
        return lax.fori_loop(0, k, body, x)

    if "repmlp8" in rungs:
        _marginal(
            "rep mlp XLA w8a8   ",
            jax.jit(partial(chain_rep, kernel=False, k=1)),
            jax.jit(partial(chain_rep, kernel=False, k=8)),
            lambda: (params, x0),
        )
    if "repmlpk" in rungs:
        _marginal(
            "rep mlp Pallas     ",
            jax.jit(partial(chain_rep, kernel=True, k=1)),
            jax.jit(partial(chain_rep, kernel=True, k=8)),
            lambda: (params, x0),
        )

    def qkv_rep(prm, x, *, k):
        return lax.fori_loop(0, k, lambda _, xx: qkv_chain(prm, xx), x)

    if "repqkv8" in rungs:
        _marginal(
            "rep qkv+proj w8a8  ",
            jax.jit(partial(qkv_rep, k=1)),
            jax.jit(partial(qkv_rep, k=8)),
            lambda: (params, x0),
        )

    # --------------------------------- int8-KV attention body alone (30 L)
    if "attn" in rungs or "repattn" in rungs:
        bound = args.bound
        # allocate the shared single-dispatch cache only for the rung that
        # uses it (full-T caches are ~4.4 GiB at s64 — see the del below)
        cache = make_kv_cache(cfg, s) if "attn" in rungs else None
        seq_lens = jnp.full((s,), bound - 2, jnp.int32)
        scale = 1.0 / math.sqrt(head_dim)
        head_onehot = jnp.asarray(
            (np.arange(d) // head_dim)[:, None] == np.arange(h_heads)[None, :],
            jnp.float32,
        )
        slot_idx = jnp.arange(s)
        key_pos = jnp.arange(bound)
        att_mask = key_pos[None, :] <= seq_lens[:, None]
        neg = jnp.finfo(jnp.float32).min

        def attn_only(q_in, cache):
            x = q_in
            for layer in range(nl):
                q = x
                k = x
                v = x
                k_q, k_s = _quantize_rows(k)
                v_q, v_s = _quantize_rows(v)
                cache = type(cache)(
                    cache.k.at[layer, slot_idx, seq_lens].set(k_q),
                    cache.v.at[layer, slot_idx, seq_lens].set(v_q),
                    cache.k_scale.at[layer, slot_idx, seq_lens].set(k_s),
                    cache.v_scale.at[layer, slot_idx, seq_lens].set(v_s),
                )
                k_all = cache.k[layer, :s, :bound]
                v_all = cache.v[layer, :s, :bound]
                k_sc = cache.k_scale[layer, :s, :bound]
                v_sc = cache.v_scale[layer, :s, :bound]
                q_f = q.astype(jnp.float32).reshape(s, h_heads, head_dim)
                q_s = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8) / 127.0
                q_i8 = jnp.round(q_f / q_s).astype(jnp.int8).reshape(s, d)
                qmat = q_i8[:, :, None] * head_onehot.astype(jnp.int8)[None]
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
                pf = probs * v_sc[:, None, :]
                p_s = jnp.maximum(jnp.max(pf, axis=-1, keepdims=True), 1e-20) / 127.0
                p_i8 = jnp.round(pf / p_s).astype(jnp.int8)
                ctx_full = jnp.einsum(
                    "sht,stc->shc", p_i8, v_all, preferred_element_type=jnp.int32
                )
                ctx_f = ctx_full.astype(jnp.float32) * p_s
                ctx = jnp.sum(ctx_f * head_onehot.T[None], axis=1)
                x = (x + ctx.reshape(s, d)).astype(x.dtype)
            return x, cache

        if "attn" in rungs:
            attn_jit = jax.jit(attn_only, donate_argnames=("cache",))
            holder = [cache]

            def run_attn():
                out, holder[0] = attn_jit(x0, holder[0])
                return out

            t = timeit(run_attn, lambda: (), n=args.n)
            print(f"  attention body (int8)  {t * 1e3:7.3f} ms", flush=True)

        if "repattn" in rungs:
            # repeats write the same cache rows each iteration — fine for
            # bandwidth timing, the read traffic per iteration is identical
            def attn_rep(q_in, cache, *, k):
                def body(_, carry):
                    return attn_only(*carry)

                out, cache = lax.fori_loop(0, k, body, (q_in, cache))
                return out, cache

            h1 = [make_kv_cache(cfg, s)]
            h8 = [make_kv_cache(cfg, s)]
            j1 = jax.jit(partial(attn_rep, k=1), donate_argnames=("cache",))
            j8 = jax.jit(partial(attn_rep, k=8), donate_argnames=("cache",))

            def run1():
                out, h1[0] = j1(x0, h1[0])
                return out

            def run8():
                out, h8[0] = j8(x0, h8[0])
                return out

            _marginal("rep attn int8      ", lambda: run1(), lambda: run8(), lambda: ())
            # caches are ~4.4 GiB each at s64/full-T: free them before the
            # variant rungs below allocate their own, or four live copies
            # OOM the chip
            del h1, h8

    # ------- attention-body variants (judge r4 item 5: the int8 body sits
    # at 3.1x its KV-read floor; the attributed residual is the quantize-
    # requantize chain at tiny row counts). Two reformulations, measured
    # with the same rep-K marginal method as `repattn`:
    #   repattnnq  keep the int8 score matmul (cache read stays int8) but
    #              skip the PROB requantize: probs stay f32/bf16 and V is
    #              converted to bf16 for the context matmul (materializes a
    #              bf16 copy of the V read — trades bandwidth for VPU ops)
    #   repattnbf  dequant-once: convert BOTH K and V reads to bf16 and run
    #              the whole body in bf16 (no quantize chain at all; 2x-ish
    #              read-side traffic)
    if rungs & {"repattnnq", "repattnbf"}:
        bound = args.bound
        scale = 1.0 / math.sqrt(head_dim)
        head_onehot = jnp.asarray(
            (np.arange(d) // head_dim)[:, None] == np.arange(h_heads)[None, :],
            jnp.float32,
        )
        slot_idx = jnp.arange(s)
        seq_lens = jnp.full((s,), bound - 2, jnp.int32)
        key_pos = jnp.arange(bound)
        att_mask = key_pos[None, :] <= seq_lens[:, None]
        neg = jnp.finfo(jnp.float32).min

        def attn_variant(q_in, cache, *, bf16_scores: bool):
            x = q_in
            for layer in range(nl):
                q = x
                k = x
                v = x
                k_q, k_s = _quantize_rows(k)
                v_q, v_s = _quantize_rows(v)
                cache = type(cache)(
                    cache.k.at[layer, slot_idx, seq_lens].set(k_q),
                    cache.v.at[layer, slot_idx, seq_lens].set(v_q),
                    cache.k_scale.at[layer, slot_idx, seq_lens].set(k_s),
                    cache.v_scale.at[layer, slot_idx, seq_lens].set(v_s),
                )
                k_all = cache.k[layer, :s, :bound]
                v_all = cache.v[layer, :s, :bound]
                k_sc = cache.k_scale[layer, :s, :bound]
                v_sc = cache.v_scale[layer, :s, :bound]
                if bf16_scores:
                    # dequant-once K: bf16 copy of the K read, bf16 matmul
                    k_bf = (
                        k_all.astype(jnp.bfloat16)
                        * k_sc[:, :, None].astype(jnp.bfloat16)
                    )
                    qmat = (q.astype(jnp.float32) * scale)[:, :, None] * head_onehot[None]
                    scores = jnp.einsum(
                        "stc,sch->sht", k_bf, qmat.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    q_f = q.astype(jnp.float32).reshape(s, h_heads, head_dim)
                    q_s = jnp.maximum(
                        jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8
                    ) / 127.0
                    q_i8 = jnp.round(q_f / q_s).astype(jnp.int8).reshape(s, d)
                    qmat = q_i8[:, :, None] * head_onehot.astype(jnp.int8)[None]
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
                # no prob requantize: fold V's dequant scale into the probs
                # and run the context matmul in bf16 against a converted V
                pf = (probs * v_sc[:, None, :]).astype(jnp.bfloat16)
                ctx_full = jnp.einsum(
                    "sht,stc->shc", pf, v_all.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                ctx = jnp.sum(ctx_full * head_onehot.T[None], axis=1)
                x = (x + ctx.reshape(s, d)).astype(x.dtype)
            return x, cache

        def rep_variant(tag, bf16_scores):
            def rep(q_in, cache, *, k):
                def body(_, carry):
                    return attn_variant(*carry, bf16_scores=bf16_scores)

                out, cache = lax.fori_loop(0, k, body, (q_in, cache))
                return out, cache

            h1 = [make_kv_cache(cfg, s)]
            h8 = [make_kv_cache(cfg, s)]
            j1 = jax.jit(partial(rep, k=1), donate_argnames=("cache",))
            j8 = jax.jit(partial(rep, k=8), donate_argnames=("cache",))

            def run1():
                out, h1[0] = j1(x0, h1[0])
                return out

            def run8():
                out, h8[0] = j8(x0, h8[0])
                return out

            _marginal(tag, lambda: run1(), lambda: run8(), lambda: ())

        if "repattnnq" in rungs:
            rep_variant("rep attn no-requant", bf16_scores=False)
        if "repattnbf" in rungs:
            rep_variant("rep attn bf16-deq  ", bf16_scores=True)

    # ------------------------------------------------ full production step
    if "step" in rungs:
        from auralis_tpu.runtime.decode_loop import (
            decode_steps_status,
            init_decode_state,
        )

        state = init_decode_state(cfg, s, jax.random.PRNGKey(2))
        # every slot live at a fill level that stays under the bound for the
        # whole warmup+measure run (mirrors tools/bench_prod_step.py)
        state = state._replace(
            active=jnp.ones((s,), jnp.bool_),
            seq_lens=jnp.full((s,), args.bound - 34, jnp.int32),
            audio_pos=jnp.full((s,), 8, jnp.int32),
            last_token=jnp.zeros((s,), jnp.int32),
            sampling=state.sampling._replace(
                temperature=jnp.full((s,), 0.75),
                top_p=jnp.full((s,), 0.85),
                top_k=jnp.full((s,), 50, jnp.int32),
                repetition_penalty=jnp.full((s,), 5.0),
                do_sample=jnp.ones((s,), bool),
            ),
        )
        holder = [state]
        fn = partial(decode_steps_status, params, cfg, n_steps=1, len_bound=args.bound)

        def run_step():
            holder[0], status = fn(holder[0])
            return status

        t = timeit(run_step, lambda: (), n=args.n)
        print(f"  production step        {t * 1e3:7.3f} ms", flush=True)

    if "empty" in rungs:
        tiny = jnp.zeros((8,), jnp.float32)
        bump = jax.jit(lambda v: v + 1.0)
        t = timeit(bump, lambda: (tiny,), n=args.n)
        print(f"  dispatch floor         {t * 1e3:7.3f} ms", flush=True)

    wq8 = sum(
        int(np.prod(v.shape)) * v.dtype.itemsize
        for k, v in params["blocks_q8"].items()
    )
    kv = 2 * nl * s * args.bound * d  # int8 K+V reads
    print(
        f"  floors: int8 weights ~{wq8 / 819e9 * 1e3:.3f} ms, "
        f"KV read ~{kv / 819e9 * 1e3:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
