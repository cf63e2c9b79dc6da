"""Measure this chip's actual bf16 MXU peak (VERDICT r3 weak #1).

BENCH_NOTES carried two contradictory bf16-peak values (394 vs 197
TF/s) and `bench_mxu.py` rows above either (337 TF/s at 128->128).
Audit of bench_mxu's method: at K=128 the differential window
(repeat 1024-128) is only ~4 ms of compute measured against a ~33 ms
relay round-trip with multi-ms jitter at --runs 3 -- noise on
(t_hi - t_lo) inflates TF/s without bound. Nothing was elided; the
window was too small.

This script makes the window two orders larger and fits a slope:

- shape: (8192, 1024) x (1024, 1024) bf16 dots, the canonical
  MXU-saturating square chain (128-multiple everywhere, VMEM-resident
  operands, arithmetic intensity ~500 FLOP/byte >> the ~250 ridge).
- weights scaled by 1/K so the carried activation stays O(1) -- no
  Inf/NaN fast-path questions.
- each dot depends on the previous (fori_loop carry), so no
  dead-code elision; a 1-element readback forces materialisation.
- timing: min-of-N per repeat count, then least-squares slope of
  time vs repeat across {256, 1024, 2048, 4096} -- fixed dispatch/
  readback overheads land in the intercept, not the rate.

Usage: python scripts/bench_peak.py [--runs 5]
Prints one JSON line per shape plus a final summary line.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _chain(repeat):
    def run(x, w):
        def body(i, v):
            return jax.lax.dot_general(
                v, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, repeat, body, x)
    return jax.jit(run)


def _time_min(fn, x, w, runs):
    out = fn(x, w)
    _ = np.asarray(out.ravel()[:1])          # sync (relay needs readback)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(x, w)
        _ = np.asarray(out.ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def measure(m, k, repeats, runs):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((m, k)), jnp.bfloat16)
    # scale so ||v|| stays O(1) through the chain: E[row sum] ~ k*mean
    w = jnp.asarray(rng.random((k, k)) * (2.0 / k), jnp.bfloat16)
    times = [_time_min(_chain(r), x, w, runs) for r in repeats]
    # least-squares slope of time vs repeat
    rs = np.asarray(repeats, np.float64)
    ts = np.asarray(times, np.float64)
    slope = float(np.cov(rs, ts, bias=True)[0, 1] / np.var(rs))
    flops_per_iter = 2.0 * m * k * k
    tf = flops_per_iter / slope / 1e12
    return tf, dict(zip((str(r) for r in repeats),
                        (round(t * 1e3, 1) for t in times))), slope


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    results = {}
    # (m, k, repeats): big square saturating chains. 1024-square is the
    # canonical peak shape; 512 and 2048 bracket it.
    for m, k, repeats in (
        (8192, 1024, (256, 1024, 2048, 4096)),
        (8192, 512, (1024, 4096, 8192)),
        (4096, 2048, (128, 512, 1024)),
    ):
        tf, times_ms, slope = measure(m, k, repeats, args.runs)
        results[f"{m}x{k}x{k}"] = tf
        print(json.dumps({
            "bench": "peak_chain", "m": m, "k": k,
            "tf_s": round(tf, 1), "ms_per_iter": round(slope * 1e3, 4),
            "min_times_ms": times_ms,
        }), flush=True)

    peak = max(results.values())
    print(json.dumps({"bench": "peak_summary",
                      "bf16_peak_tf_s": round(peak, 1),
                      "per_shape": {s: round(v, 1)
                                    for s, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
