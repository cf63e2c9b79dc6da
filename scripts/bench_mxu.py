"""MXU microbenchmark: pure Mosaic matmul rate at RDB shapes.

Round-2 measured "raw matmul ~52 TF/s" inside the fused-RDB kernels,
but that number conflates the dots with tap staging and VMEM traffic.
This isolates each factor so the round-3 kernel design targets the real
bottleneck (VERDICT r2 #1: "the burden is a measured decomposition"):

- ``pallas_dot``: chained (Mt, K)×(K, N) dots, operands VMEM-resident —
  the pure MXU + Mosaic-scheduling rate at this shape.
- ``pallas_dot_stage``: same with the v2 kernel's 3-copy lane staging
  before every dot — isolates staging overhead.
- ``xla_dot``: the identical chained contraction under plain jit.

The axon relay adds ~33 ms fixed dispatch+readback latency per call, so
every rate is computed DIFFERENTIALLY: time repeat=R_hi and repeat=R_lo
and divide the extra FLOPs by the extra time — fixed overheads cancel.

Usage: python scripts/bench_mxu.py [--runs 3]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, MT = 27840, 1392          # v2 kernel's matmul M (174·160), /8-aligned tile


def _dot_kernel(repeat, stage, x_ref, w_ref, o_ref, stage_ref):
    k = x_ref.shape[1]

    def body(i, acc):
        if stage:
            stage_ref[:, 0:k] = acc
            stage_ref[:, k:2 * k] = acc
            stage_ref[:, 2 * k:3 * k] = acc
            lhs = stage_ref[:, 0:k]
        else:
            lhs = acc
        return jax.lax.dot_general(
            lhs, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)

    o_ref[:] = jax.lax.fori_loop(0, repeat, body, x_ref[:])


def _pallas_chain(k, repeat, stage):
    return jax.jit(functools.partial(
        lambda xx, ww: pl.pallas_call(
            functools.partial(_dot_kernel, repeat, stage),
            grid=(M // MT,),
            in_specs=[
                pl.BlockSpec((MT, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((MT, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, k), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((MT, 3 * k), jnp.bfloat16)],
        )(xx, ww)))


def _xla_chain(repeat):
    def run(xx, ww):
        def body(i, v):
            return jax.lax.dot_general(
                v, ww, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, repeat, body, xx)
    return jax.jit(run)


def _time(fn, x, w, runs):
    out = fn(x, w)
    _ = np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(x, w)
        _ = np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / runs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--lo", type=int, default=128)
    ap.add_argument("--hi", type=int, default=1024)
    ap.add_argument("--ks", default="192,128,256,512")
    ap.add_argument("--pairs", default="")
    args = ap.parse_args()

    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    rng = np.random.default_rng(0)
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    if args.pairs:
        pairs_main(args.runs, args.lo, args.hi, args.pairs)
        return

    for k in (int(v) for v in args.ks.split(",")):
        x = jnp.asarray(rng.random((M, k)), jnp.bfloat16)
        w = jnp.asarray(rng.random((k, k)), jnp.bfloat16)
        dflops = 2 * M * k * k * (args.hi - args.lo)
        for name, mk in (("pallas_dot", lambda r: _pallas_chain(k, r, False)),
                         ("pallas_dot_stage",
                          lambda r: _pallas_chain(k, r, True)),
                         ("xla_dot", lambda r: _xla_chain(r))):
            t_lo = _time(mk(args.lo), x, w, args.runs)
            t_hi = _time(mk(args.hi), x, w, args.runs)
            tf = dflops / (t_hi - t_lo) / 1e12 if t_hi > t_lo else float("nan")
            print(json.dumps({
                "bench": name, "k": k, "n": k,
                "tf_s": round(tf, 1),
                "ms_lo": round(t_lo * 1e3, 1), "ms_hi": round(t_hi * 1e3, 1),
            }), flush=True)




# ---- round 2: rectangular-shape pairs -------------------------------------
# Chained dots need square weights; rectangular RDB shapes are measured as
# alternating pairs (K→N then N→K). Run: python scripts/bench_mxu.py --pairs

def _pair_kernel(repeat, stage, x_ref, w1_ref, w2_ref, o_ref, stage_ref):
    k = x_ref.shape[1]
    n = w1_ref.shape[1]

    def body(i, acc):
        if stage:
            stage_ref[:, 0:k] = acc
            lhs = stage_ref[:, 0:k]
        else:
            lhs = acc
        mid = jax.lax.dot_general(
            lhs, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x_ref.dtype)
        if stage:
            stage_ref[:, 0:n] = mid
            mid = stage_ref[:, 0:n]
        return jax.lax.dot_general(
            mid, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x_ref.dtype)

    o_ref[:] = jax.lax.fori_loop(0, repeat, body, x_ref[:])


def _pair_chain(k, n, repeat, stage):
    smax = 3 * max(k, n)
    return jax.jit(functools.partial(
        lambda xx, w1, w2: pl.pallas_call(
            functools.partial(_pair_kernel, repeat, stage),
            grid=(M // MT,),
            in_specs=[
                pl.BlockSpec((MT, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((MT, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, k), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((MT, smax), jnp.bfloat16)],
        )(xx, w1, w2)))


def pairs_main(runs, lo, hi, specs):
    rng = np.random.default_rng(0)
    for spec in specs.split(","):
        k, n = (int(v) for v in spec.split("x"))
        x = jnp.asarray(rng.random((M, k)), jnp.bfloat16)
        w1 = jnp.asarray(rng.random((k, n)), jnp.bfloat16)
        w2 = jnp.asarray(rng.random((n, k)), jnp.bfloat16)
        dflops = 2 * M * k * n * 2 * (hi - lo)
        for stage in (False, True):
            t_lo = _time(lambda a, b, m=_pair_chain(k, n, lo, stage):
                         m(a, b, w2), x, w1, runs)
            t_hi = _time(lambda a, b, m=_pair_chain(k, n, hi, stage):
                         m(a, b, w2), x, w1, runs)
            tf = dflops / (t_hi - t_lo) / 1e12 if t_hi > t_lo else float("nan")
            print(json.dumps({
                "bench": "pair_stage" if stage else "pair",
                "k": k, "n": n, "tf_s": round(tf, 1),
                "ms_lo": round(t_lo * 1e3, 1),
                "ms_hi": round(t_hi * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
