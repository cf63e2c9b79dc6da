"""int8 MXU probe: is quantized inference worth building on v5e?

v5e's MXU advertises 2x int8 throughput vs bf16 (394 vs 197 TOPS).
This probes whether XLA actually reaches it through this relay for the
RRDB-shaped ops before any quantized-engine work is committed:

1. chained int8xint8->int32 matmuls at RDB shapes vs the same in bf16,
2. an int8 3x3 conv (NHWC) vs bf16 at the halo-window shape.

Differential timing (two repeat counts) cancels the relay round-trip,
same method as scripts/bench_mxu.py. Two traps the first draft of this
script hit, kept here as warnings:
- operands must be jit ARGUMENTS — closed-over arrays become HLO
  constants, the chain constant-folds at compile time (30-min compiles,
  an HTTP 413 from shipping a 428 MB constant to the compile relay, and
  negative "rates"),
- each iteration must DEPEND on the carry or while-loop invariant code
  motion hoists the op out of the loop,
- the carry must require EVERY output element, and not through a
  linear reduction: carrying `out[:1, :1]` lets XLA push the slice
  through the dot (one row x one column -> 1899 "TOPS" on a 394-TOPS
  chip), and `sum(out)` is algebraically rewritable as two matvecs.
  `max(out)` is not — that is the carry used here.
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _time_chain(make_fn, operands, reps_lo=4096, reps_hi=32768, runs=4):
    """Median-of-trials differential: chains must be long enough (≥0.3 s
    at the hi count) that relay dispatch variance (~tens-hundreds of ms
    per trial) doesn't swamp the signal — short chains here produced
    negative 'rates'."""
    fn_lo = jax.jit(partial(make_fn, reps_lo))
    fn_hi = jax.jit(partial(make_fn, reps_hi))
    for fn in (fn_lo, fn_hi):                      # compile + warm
        np.asarray(fn(*operands).ravel()[:1])
    med = []
    for fn in (fn_lo, fn_hi):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            np.asarray(fn(*operands).ravel()[:1])
            samples.append(time.perf_counter() - t0)
        med.append(sorted(samples)[len(samples) // 2])
    return (med[1] - med[0]) / (reps_hi - reps_lo)


def bench_matmul(m: int, k: int, n: int, runs: int) -> dict:
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (m, k), np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (k, n), np.int8))
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    # Each iteration's LHS depends on the carry (a broadcast VPU add,
    # negligible vs the dot) so XLA's while-loop invariant code motion
    # cannot hoist the dot out of the loop, and the carry is max(out):
    # it needs every output element and, unlike sum(out) or a slice,
    # cannot be pushed through the dot algebraically (see module doc).
    def chain_i8(reps, a, b):
        def body(i, acc):
            lhs = a + (acc % 2).astype(jnp.int8)
            out = jax.lax.dot(lhs, b, preferred_element_type=jnp.int32)
            return jnp.max(out)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    def chain_bf(reps, a, b):
        def body(i, acc):
            lhs = a + (acc % 2.0).astype(jnp.bfloat16)
            out = jax.lax.dot(lhs, b, preferred_element_type=jnp.float32)
            return jnp.max(out)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    flops = 2 * m * k * n
    s_i8 = _time_chain(chain_i8, (a8, b8), runs=runs)
    s_bf = _time_chain(chain_bf, (ab, bb), runs=runs)
    return {"case": f"dot m{m} k{k} n{n}",
            "int8_tops": round(flops / s_i8 / 1e12, 1),
            "bf16_tfs": round(flops / s_bf / 1e12, 1),
            "speedup": round(s_bf / s_i8, 2)}


def bench_conv(b: int, hw: int, cin: int, cout: int, runs: int) -> dict:
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 128, (b, hw, hw, cin), np.int8))
    k8 = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout), np.int8))
    xb = x8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)
    dims = ("NHWC", "HWIO", "NHWC")

    # carry-dependent input perturbation to defeat LICM, max(out) carry
    # so the full conv output must be materialised (see bench_matmul)
    def chain_i8(reps, x, k):
        def body(i, acc):
            xs = x + (acc % 2).astype(jnp.int8)
            out = jax.lax.conv_general_dilated(
                xs, k, (1, 1), "SAME", dimension_numbers=dims,
                preferred_element_type=jnp.int32)
            return jnp.max(out)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    def chain_bf(reps, x, k):
        def body(i, acc):
            xs = x + (acc % 2.0).astype(jnp.bfloat16)
            out = jax.lax.conv_general_dilated(
                xs, k, (1, 1), "SAME", dimension_numbers=dims,
                preferred_element_type=jnp.float32)
            return jnp.max(out)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    flops = 2 * b * hw * hw * 9 * cin * cout
    s_i8 = _time_chain(chain_i8, (x8, k8), reps_lo=64,
                       reps_hi=512, runs=runs)
    s_bf = _time_chain(chain_bf, (xb, kb), reps_lo=64,
                       reps_hi=512, runs=runs)
    return {"case": f"conv3x3 b{b} {hw}^2 {cin}->{cout}",
            "int8_tops": round(flops / s_i8 / 1e12, 1),
            "bf16_tfs": round(flops / s_bf / 1e12, 1),
            "speedup": round(s_bf / s_i8, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv-only", action="store_true")
    ap.add_argument("--swinir", action="store_true",
                    help="probe SwinIR's dominant matmul shapes instead "
                         "(QKV/proj/MLP at the 4x288^2 window batch)")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    import json

    if args.swinir:
        # SwinIR-M x4 at the production window batch (4x288^2 -> 5184
        # windows of 64 tokens, C=180): QKV 180->540, proj 180->180,
        # MLP 180->360 and 360->180. Attention QK^T itself (head-dim 30
        # contraction) is not probed — 30 pads to 128 lanes either way.
        m = 5184 * 64
        for k, n in ((180, 540), (180, 180), (180, 360), (360, 180)):
            print(json.dumps(bench_matmul(m, k, n, args.runs)), flush=True)
        return
    if not args.conv_only:
        for m, k, n in ((27840, 128, 128), (27840, 192, 192),
                        (27840, 96, 160), (27840, 288, 128)):
            print(json.dumps(bench_matmul(m, k, n, args.runs)), flush=True)
    # The production _rdb_packed conv shapes (models/rrdbnet.py:153-161):
    # per-source wide convs, cin 64/32, cout 192..64 — plus the legacy
    # narrow/concat shapes for comparison.
    for b, hw, cin, cout in ((16, 264, 64, 192), (16, 264, 32, 160),
                             (16, 264, 32, 128), (16, 264, 32, 96),
                             (16, 264, 32, 64), (16, 264, 64, 64),
                             (16, 264, 96, 32), (16, 264, 192, 64)):
        print(json.dumps(bench_conv(b, hw, cin, cout, args.runs)),
              flush=True)


if __name__ == "__main__":
    main()
