"""Vocoder benchmark: full HiFi-GAN call + per-stage MRF kernel A/B.

Times, at production shapes (batch 4, the serving latent buckets):
  - the full hifi_decoder program per bucket, per MRF form:
      xla     — plain XLA convs (no Pallas)
      blocks  — per-resblock fused Pallas kernels (ops/mrf.PackedResblock)
      merged  — merged three-blocks-in-one-stage kernels (PackedMRFStage)
  - optionally (--stages) each stage's isolated resblock/merged-kernel cost

Sync discipline per the axon pitfalls: completion is forced by device_get.

Usage: python tools/bench_vocoder.py [--buckets 256,640] [--forms blocks,merged]
       [--stages] [--batch 4]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.common.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from auralis_tpu.models.xttsv2.hifigan import (
    RESBLOCK_KERNELS,
    UPSAMPLE_RATES,
    hifi_decoder,
    init_hifigan_params,
)
from auralis_tpu.ops.mrf import pack_hifigan_mrf


def _drain(y):
    return np.asarray(jax.device_get(jax.tree.leaves(y)[0].ravel()[:1]))


def _time(fn, *args, n=5):
    y = fn(*args)
    _drain(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    _drain(y)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="256,384,640")
    ap.add_argument("--forms", default="blocks,merged")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--stages", action="store_true",
                    help="also time each stage's kernels in isolation")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the site hook ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and set(args.forms.split(",")) - {"xla"}:
        # the Pallas kernels are Mosaic/TPU-only (interpret mode at these
        # shapes is impractically slow) — off-chip only the XLA form runs
        print("off-chip backend: forcing --forms xla", file=sys.stderr)
        args.forms = "xla"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"backend: {jax.default_backend()}  dtype: {dtype.__name__}")
    params = init_hifigan_params(jax.random.PRNGKey(0), dtype=dtype)
    packed, stages = pack_hifigan_mrf(params["resblocks"], RESBLOCK_KERNELS, dtype=dtype)
    print("merged-stage tiles:", [s.t_tile if s else None for s in stages])

    kw = {
        "xla": {},
        "blocks": dict(packed_resblocks=packed),
        "merged": dict(packed_resblocks=packed, packed_stages=stages),
    }
    B = args.batch
    g = (0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, 512))).astype(jnp.float32)
    sec_per_latent = 1024 / 22050
    for bucket in map(int, args.buckets.split(",")):
        lat = (0.1 * jax.random.normal(
            jax.random.PRNGKey(1), (B, bucket, 1024))).astype(jnp.float32)
        row = []
        for form in args.forms.split(","):
            fn = jax.jit(lambda l, gg, _kw=kw[form]: hifi_decoder(params, l, gg, **_kw))
            dt = _time(fn, lat, g)
            rtf = dt / (B * bucket * sec_per_latent)
            row.append(f"{form} {dt*1e3:7.1f} ms (RTF {rtf:.5f})")
        print(f"bucket {bucket:4d} batch {B}: " + "   ".join(row))
        del lat

    if args.stages:
        T0 = int(640 * 4 * (24000 / 22050)) + 2  # post-interp frames @ bucket 640
        t = T0
        print(f"\nper-stage (batch {B}, generator input {T0} frames):")
        for si, rate in enumerate(UPSAMPLE_RATES):
            t *= rate
            c = 512 // (2 ** (si + 1))
            x = (0.1 * jax.random.normal(
                jax.random.PRNGKey(3), (B, t, c))).astype(dtype)
            cells = []
            for j, k in enumerate(RESBLOCK_KERNELS):
                dt = _time(jax.jit(packed[si * 3 + j]), x, n=3)
                cells.append(f"k{k} {dt*1e3:6.1f}")
            if stages[si] is not None:
                dt = _time(jax.jit(stages[si]), x, n=3)
                cells.append(f"merged {dt*1e3:6.1f}")
            print(f"  stage{si} T={t} C={c}: " + "  ".join(cells) + " ms")
            del x


if __name__ == "__main__":
    main()
