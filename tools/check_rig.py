"""Rig health probe: answers "is the TPU path usable right now, and what
latencies should I expect?" before launching a long bench or serving run.

Reports, stage by stage:
  - backend init time and device kind
  - admission latency (first host->device round-trip; on shared/remote rigs
    this is the queue wait behind other tenants' work)
  - steady-state link RTT (cached no-op round-trips)
  - compile latency for a trivial UNCACHED program (the remote compile
    server's current health) — skipped with --no-compile

Exit code 0 = healthy, 1 = degraded (thresholds printed).

Usage: python tools/check_rig.py [--no-compile]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-compile", action="store_true",
                    help="skip the uncached-compile probe (leaves no junk in the server queue)")
    args = ap.parse_args()

    from auralis_tpu.common.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    devs = jax.devices()
    t_init = time.perf_counter() - t0
    print(f"backend init : {t_init*1e3:8.1f} ms  ({devs})")

    t0 = time.perf_counter()
    x = jax.device_put(np.ones((8, 128), np.float32))
    np.asarray(jax.device_get(x[:1, :1]))
    t_admit = time.perf_counter() - t0
    print(f"admission    : {t_admit*1e3:8.1f} ms  (first round-trip incl. queue wait)")

    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(x[:1, :1]))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"link RTT     : {rtt*1e3:8.1f} ms  (median of 5 cached round-trips)")

    t_compile = None
    if not args.no_compile:
        # a shape no serving program uses, salted by time so the persistent
        # cache can never satisfy it: measures the compile server itself
        n = 131 + int(time.time()) % 7
        y = jax.device_put(np.ones((n, n), np.float32))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jax.jit(lambda a: (a @ a).sum())(y)))
        t_compile = time.perf_counter() - t0
        print(f"fresh compile: {t_compile*1e3:8.1f} ms  (trivial uncached program)")

    degraded = t_admit > 10.0 or rtt > 1.0 or (t_compile or 0) > 120.0
    print("verdict      : " + ("DEGRADED — expect multi-minute boots; consider "
                               "waiting for the rig to drain" if degraded else "healthy"))
    return 1 if degraded else 0


if __name__ == "__main__":
    raise SystemExit(main())
