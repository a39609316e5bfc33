"""Micro-profile of every device program in the serving path on the current
backend: decode step (by occupancy x length bucket), prefill insert, vocoder,
conditioning, speaker encoder. Prints a table + implied RTF budget, and — per
program — achieved HBM bandwidth and MXU utilization against the chip's
theoretical peaks (XLA's compiled cost model supplies FLOPs and bytes
accessed, so the numbers stay honest as the programs evolve).

Usage: python tools/profile_components.py [--slots 32] [--steps 64]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _drain(out):
    """Synchronize by FETCHING a scalar of the result. On the axon remote
    platform `jax.block_until_ready` can return before execution completes
    (observed: 64-step decode blocks "finishing" in 0.2 ms); a device_get
    is the only reliable barrier."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, n=5, warmup=1, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _drain(out)
    return (time.perf_counter() - t0) / n, out


# Theoretical peaks by device kind. v5e: 197 TFLOP/s bf16 (394 TOP/s int8),
# 819 GB/s HBM (public TPU v5e spec). CPU rows are placeholders so the tool
# still prints ratios when exercised off-chip.
_PEAKS = {
    "TPU v5 lite": {"flops": 197e12, "int8_ops": 394e12, "hbm_gbs": 819.0},
    "TPU v5e": {"flops": 197e12, "int8_ops": 394e12, "hbm_gbs": 819.0},
    "TPU v4": {"flops": 275e12, "int8_ops": 275e12, "hbm_gbs": 1228.0},
    "cpu": {"flops": 2e12, "int8_ops": 4e12, "hbm_gbs": 100.0},
}


def _device_peaks():
    kind = getattr(jax.devices()[0], "device_kind", "cpu")
    for k, v in _PEAKS.items():
        if k.lower() in str(kind).lower():
            return kind, v
    return kind, _PEAKS["cpu"]


def program_cost(fn, *args, **kw):
    """XLA's cost model for the compiled program: (flops, bytes_accessed).
    Returns (None, None) when the backend doesn't expose cost analysis
    (the axon remote platform doesn't; callers then fall back to the
    analytic models below)."""
    try:
        compiled = jax.jit(lambda *a: fn(*a, **kw)).lower(*args).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        if flops or bytes_acc:
            return flops, bytes_acc
        return None, None
    except Exception:
        return None, None


# ---------------------------------------------------------------- analytic
# First-principles FLOP/byte models for the serving programs, used when the
# backend exposes no compiled cost analysis. These count only the dominant
# terms (weight streams, KV traffic, matmul FLOPs; conv FLOPs for the
# vocoder) — good to ~10%, which is enough to place a program on the
# roofline honestly.

def pytree_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def prefill_cost_analytic(cfg, bucket: int, weight_bytes: int, kv_itemsize: float):
    """One insert_sequence at prompt bucket `bucket`: full weight stream +
    causal-attention prefill over the bucket + KV write."""
    d, L = cfg.hidden_size, cfg.num_hidden_layers
    b = bucket
    mm = 8 * d * d + 4 * d * cfg.n_inner  # qkv+proj / mlp per token per layer
    flops = L * (b * mm + 4 * b * b * d)  # matmuls + scores/PV
    bytes_acc = weight_bytes + L * 2 * b * d * kv_itemsize
    return float(flops), float(bytes_acc)


def decode_cost_analytic(
    cfg, num_slots: int, bound: int, n_steps: int, weight_bytes: int,
    kv_itemsize: float,
):
    """One fused n_steps decode block. The batched step is fixed-shape: all
    `num_slots` lanes compute (occupancy only changes which lanes carry live
    audio), and each step streams the full weight set and every lane's KV up
    to the length bound."""
    d, L = cfg.hidden_size, cfg.num_hidden_layers
    S = num_slots
    mm = 8 * d * d + 4 * d * cfg.n_inner
    per_step_flops = L * S * (mm + 4 * bound * d)
    per_step_bytes = weight_bytes + L * S * bound * 2 * d * kv_itemsize
    return float(n_steps * per_step_flops), float(n_steps * per_step_bytes)


def vocoder_cost_analytic(hp, batch: int, n_latents: int, itemsize: int = 4):
    """Conv-FLOPs walk over the HiFi-GAN stack: every conv weight [k,cin,cout]
    contributes 2*k*cin*cout per output frame at its stage's temporal length
    (input frames upsampled 4x1.088 by the latent interp, then x8,8,2,2)."""
    t_in = int(n_latents * (1024 / 256) * (24000 / 22050))

    def conv_flops(w, t_out):
        k, cin, cout = w.shape
        return 2.0 * k * cin * cout * t_out

    flops = conv_flops(hp["conv_pre_w"], t_in)
    flops += 2.0 * hp["cond_w"].shape[0] * hp["cond_w"].shape[1] * t_in
    t = t_in
    n_mrf = len(hp["resblocks"]) // len(hp["ups"])
    for i, up in enumerate(hp["ups"]):
        k, cin, cout = up["w"].shape
        rate = (8, 8, 2, 2)[i]
        t *= rate
        flops += 2.0 * k * cin * cout * t
        flops += 2.0 * hp["conds"][i]["w"].shape[0] * cout * t
        for rb in hp["resblocks"][i * n_mrf : (i + 1) * n_mrf]:
            for conv in rb["convs1"] + rb["convs2"]:
                flops += conv_flops(conv["w"], t)
    flops += conv_flops(hp["conv_post_w"], t)
    # bandwidth: weights once + the big stage activations (rough)
    bytes_acc = pytree_bytes(hp) + 3 * batch * t * 32 * itemsize
    return float(batch * flops), float(bytes_acc)


def roofline_str(dt_s: float, flops, bytes_acc, peaks) -> str:
    """'2.1 TFLOP/s (1.1% MXU) | 640 GB/s (78% HBM)' for one timed program."""
    if not flops and not bytes_acc:
        return "(no cost model)"
    parts = []
    if flops:
        fs = flops / dt_s
        parts.append(f"{fs/1e12:5.2f} TFLOP/s ({100*fs/peaks['flops']:4.1f}% MXU)")
    if bytes_acc:
        bw = bytes_acc / dt_s / 1e9
        parts.append(f"{bw:6.1f} GB/s ({100*bw*1e9/(peaks['hbm_gbs']*1e9):4.1f}% HBM)")
    return " | ".join(parts)


def main():
    from auralis_tpu.common.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument(
        "--kv-int8", action="store_true",
        help="profile with int8 KV (the TPU serving default; plain config "
        "default is bf16 for parity with the hermetic tests)",
    )
    args = ap.parse_args()

    from auralis_tpu.models.xttsv2.config import XTTSConfig
    from auralis_tpu.models.xttsv2.gpt import init_gpt_params
    from auralis_tpu.runtime.decode_loop import (
        decode_steps_status,
        init_decode_state,
        insert_sequence,
        prefill_bucket,
    )
    from auralis_tpu.models.xttsv2.hifigan import hifi_decoder, init_hifigan_params

    kind, peaks = _device_peaks()
    print(
        f"backend: {jax.default_backend()}  devices: {len(jax.devices())}  "
        f"kind: {kind}  peaks: {peaks['flops']/1e12:.0f} TFLOP/s bf16, "
        f"{peaks['hbm_gbs']:.0f} GB/s HBM"
    )
    cfg = XTTSConfig().gpt
    if args.kv_int8:
        import dataclasses

        cfg = dataclasses.replace(cfg, kv_int8=True)
    key = jax.random.PRNGKey(0)
    params = init_gpt_params(cfg, key, dtype=jnp.bfloat16)
    S = args.slots
    gpt_bytes = pytree_bytes(params)
    # int8 KV stores one f32 scale per (token, row); bf16 KV is 2 B/elem
    kv_itemsize = (1 + 4 / cfg.hidden_size) if cfg.kv_int8 else 2.0
    print(f"gpt weights: {gpt_bytes/2**30:.2f} GiB  kv cache: "
          f"{'int8' if cfg.kv_int8 else 'bf16'}")

    # token/sec of audio: gpt_code_stride_len upsample to 24 kHz
    sec_per_token = 1024 / 22050  # ≈ 46.4 ms of audio per mel token

    # ---- prefill ----
    state = init_decode_state(cfg, S, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    prefill_ms = {}
    for blen in (128, 256):
        b = prefill_bucket(blen, cfg.max_seq_len)
        embeds = jnp.zeros((b, cfg.hidden_size), jnp.bfloat16)
        def ins(st):
            return insert_sequence(
                params, cfg, st, embeds, jnp.int32(blen), jnp.int32(0),
                jnp.float32(0.75), jnp.float32(0.85), jnp.int32(50),
                jnp.float32(5.0), jnp.bool_(True),
            )
        state = ins(state)  # compile (donated: thread through)
        _drain(state.seq_lens)
        t0 = time.perf_counter()
        for _ in range(5):
            state = ins(state)
        _drain(state.seq_lens)
        dt = (time.perf_counter() - t0) / 5
        prefill_ms[b] = dt * 1e3
        fl, by = program_cost(
            lambda st: insert_sequence(
                params, cfg, st, embeds, jnp.int32(blen), jnp.int32(0),
                jnp.float32(0.75), jnp.float32(0.85), jnp.int32(50),
                jnp.float32(5.0), jnp.bool_(True),
            ),
            state,
        )
        if fl is None:
            fl, by = prefill_cost_analytic(cfg, b, gpt_bytes, kv_itemsize)
        print(f"prefill bucket {b}: {dt*1e3:8.2f} ms   "
              f"{roofline_str(dt, fl, by, peaks)}")

    # ---- decode: occupancy x len_bound ----
    print(f"\ndecode_steps ({args.steps} steps fused):")
    for occ in (8, 16, 32):
        if occ > S:
            continue
        state = init_decode_state(cfg, S, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
        embeds = jnp.zeros((128, cfg.hidden_size), jnp.bfloat16)
        for i in range(occ):
            state = insert_sequence(
                params, cfg, state, embeds, jnp.int32(100), jnp.int32(i),
                jnp.float32(0.75), jnp.float32(0.85), jnp.int32(50),
                jnp.float32(5.0), jnp.bool_(True),
            )
        # ascending bounds with the SAME threaded state keeps the caller
        # contract max(seq_lens) + n_steps < bound satisfied (seq starts at
        # 100; compile+timed blocks advance it past each bound in turn)
        est_len = 100
        for bound, blocks in ((256, 2), (512, 4), (1024, 6)):
            if est_len + (blocks + 1) * args.steps + args.steps >= bound:
                continue  # not enough headroom under the len_bound contract
            est_len += (blocks + 1) * args.steps
            def step(st):
                st2, _ = decode_steps_status(
                    params, cfg, st, n_steps=args.steps, len_bound=bound
                )
                return st2
            # donated state: thread it through each timed call
            state = step(state)  # compile
            _drain(state.seq_lens)
            t0 = time.perf_counter()
            for _ in range(blocks):
                state = step(state)
            _drain(state.seq_lens)
            dt = (time.perf_counter() - t0) / blocks
            ms_per_step = dt * 1e3 / args.steps
            # audio throughput if all occ slots were live
            rtf = ms_per_step / 1e3 / (occ * sec_per_token)
            fl, by = program_cost(step, state)
            if fl is None:
                fl, by = decode_cost_analytic(
                    cfg, S, bound, args.steps, gpt_bytes, kv_itemsize
                )
            print(
                f"  occ {occ:3d} len_bound {bound:5d}: {ms_per_step:7.2f} ms/step"
                f"  -> decode-only RTF {rtf:.4f}   "
                f"{roofline_str(dt, fl, by, peaks)}"
            )

    # ---- vocoder ----
    # profile the SERVING configuration: bf16 params, fused Pallas MRF
    # resblocks, and merged-stage kernels where they fit VMEM (on CPU the
    # XLA conv path runs, same as serving there)
    on_tpu = jax.default_backend() == "tpu"
    voc_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"\nvocoder (HiFi-GAN full, {'bf16+Pallas MRF' if on_tpu else 'f32 XLA'}):")
    hp = init_hifigan_params(
        jax.random.PRNGKey(2), in_channels=cfg.hidden_size, cond_channels=512,
        upsample_initial=512, dtype=voc_dtype,
    )
    packed = stages = None
    if on_tpu:
        from auralis_tpu.models.xttsv2.hifigan import RESBLOCK_KERNELS
        from auralis_tpu.ops.mrf import pack_hifigan_mrf

        packed, stages = pack_hifigan_mrf(
            hp["resblocks"], RESBLOCK_KERNELS, dtype=voc_dtype
        )
    voc = jax.jit(lambda p, l, g: hifi_decoder(
        p, l, g, ar_mel_length_compression=1024, output_hop_length=256,
        input_sample_rate=22050, output_sample_rate=24000,
        packed_resblocks=packed, packed_stages=stages))
    for bucket, batch in ((640, 1), (640, 4)):
        lat = jnp.zeros((batch, bucket, cfg.hidden_size), jnp.float32)
        g = jnp.zeros((batch, 512), jnp.float32)
        dt, _ = timeit(voc, hp, lat, g, n=3)
        audio_s = batch * bucket * sec_per_token
        fl, by = program_cost(voc, hp, lat, g)
        if fl is None:
            fl, by = vocoder_cost_analytic(hp, batch, bucket)
        print(
            f"  bucket {bucket} batch {batch}: {dt*1e3:8.1f} ms"
            f"  ({audio_s:.1f}s audio -> RTF {dt/audio_s:.4f})   "
            f"{roofline_str(dt, fl, by, peaks)}"
        )


if __name__ == "__main__":
    main()
