"""int8 probe for the UPSAMPLE TAIL: is quantizing conv_up1/up2/hr worth it?

The shipped int8 "mixed" mode quantizes only the trunk's 64->192 wx
conv (+4.4% engine-level, BENCH_NOTES). The tail is the next candidate:

- conv_up1/conv_up2 run as FUSED phase-kernel convs 64->256 at 1x/2x
  resolution (models/rrdbnet.py::_up_conv_fused) — the same wide-output
  geometry as the winning 64->192 conv (1.51x isolated),
- conv_hr is a plain 64->64 conv at 4x resolution (1.82x isolated at
  the 264^2 probe shape — but here it runs at 1056^2, where the int32
  conv output's 2x write bytes are the known W8A8 failure mode).

This measures the WHOLE tail in context (16x264^2 trunk features ->
uint8-scale output, the production headline window batch) in four
formulations, before any engine integration is committed:

  bf16      — the production tail (_up_conv_fused math)
  i8_up     — int8 up1+up2 (low/mid res), bf16 conv_hr/conv_last
  i8_hr     — bf16 up1/up2, int8 conv_hr (the 4x-res bandwidth test)
  i8_full   — int8 up1+up2+hr (conv_last stays bf16: 64->3 is tiny and
              quality-critical, same policy as rrdbnet_int8)

Same timing discipline as scripts/bench_int8.py: operands as jit args,
carry-dependent input perturbation against LICM, max() carry so every
output element must be materialised, differential rep counts to cancel
the relay dispatch cost, median of trials.

Reference hot loop being accelerated: the x4 upsample in
/root/reference/server/app/cnn_super_resolution.py:146-158.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _shuffle2(out: jnp.ndarray, cout: int) -> jnp.ndarray:
    n, h, w, _ = out.shape
    out = out.reshape(n, h, w, cout, 2, 2)
    out = out.transpose(0, 1, 4, 2, 5, 3)
    return out.reshape(n, h * 2, w * 2, cout)


def _lrelu(x):
    return jnp.where(x >= 0, x, x * jnp.asarray(0.2, x.dtype))


def _conv(x, k, out_dtype=None):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def _quant(x):
    # static per-tensor act scale (the integration would calibrate it;
    # the probe only needs the same op sequence)
    return jnp.clip(jnp.round(x * jnp.asarray(63.0, x.dtype)),
                    -127, 127).astype(jnp.int8)


_DEQ = 1.0 / 63.0 / 127.0


def make_tail(i8_up: bool, i8_hr: bool):
    """-> fn(reps, x, kup1, kup2, khr, klast) with kernels already in
    the dtype the formulation consumes (bf16 or int8)."""

    def up_stage(x, k):                       # fused 64->256 + shuffle
        if i8_up:
            y = _conv(_quant(x), k, jnp.int32)
            y = y.astype(jnp.bfloat16) * jnp.bfloat16(_DEQ)
        else:
            y = _conv(x, k)
        return _lrelu(_shuffle2(y, 64))

    def hr_stage(x, k):
        if i8_hr:
            y = _conv(_quant(x), k, jnp.int32)
            y = y.astype(jnp.bfloat16) * jnp.bfloat16(_DEQ)
        else:
            y = _conv(x, k)
        return _lrelu(y)

    def tail(reps, x, kup1, kup2, khr, klast):
        def body(i, acc):
            xs = x + (acc % 2.0).astype(jnp.bfloat16)
            f = up_stage(xs, kup1)
            f = up_stage(f, kup2)
            f = hr_stage(f, khr)
            out = _conv(f, klast)
            return jnp.max(out)
        return jax.lax.fori_loop(0, reps, body, jnp.bfloat16(0))

    return tail


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=264,
                    help="trunk feature size (production halo window)")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--reps-lo", type=int, default=4)
    ap.add_argument("--reps-hi", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (the axon sitecustomize overrides "
                         "JAX_PLATFORMS — must set via jax.config)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    rng = np.random.default_rng(0)
    b, hw = args.batch, args.hw
    x = jnp.asarray(rng.standard_normal((b, hw, hw, 64)),
                    jnp.bfloat16)

    def kern(cin, cout, int8):
        k = rng.integers(-127, 128, (3, 3, cin, cout))
        return jnp.asarray(k, jnp.int8 if int8 else jnp.bfloat16)

    flops = 2 * b * 9 * 64 * (hw * hw * 256            # up1 (fused, 1x)
                              + 4 * hw * hw * 256      # up2 (fused, 2x)
                              + 16 * hw * hw * 64      # hr  (4x)
                              + 16 * hw * hw * 3)      # last (4x)

    cases = (("bf16", False, False), ("i8_up", True, False),
             ("i8_hr", False, True), ("i8_full", True, True))
    base_s = None
    for name, i8u, i8h in cases:
        ops = (x, kern(64, 256, i8u), kern(64, 256, i8u),
               kern(64, 64, i8h), kern(64, 3, False))
        fn_lo = jax.jit(partial(make_tail(i8u, i8h), args.reps_lo))
        fn_hi = jax.jit(partial(make_tail(i8u, i8h), args.reps_hi))
        for fn in (fn_lo, fn_hi):
            np.asarray(fn(*ops).ravel()[:1])           # compile + warm
        med = []
        for fn in (fn_lo, fn_hi):
            samples = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                np.asarray(fn(*ops).ravel()[:1])
                samples.append(time.perf_counter() - t0)
            med.append(sorted(samples)[len(samples) // 2])
        s = (med[1] - med[0]) / (args.reps_hi - args.reps_lo)
        if name == "bf16":
            base_s = s
        print(json.dumps({
            "case": f"tail b{b} {hw}^2 {name}",
            "ms_per_tail": round(s * 1e3, 2),
            "tfs_equiv": round(flops / s / 1e12, 1),
            "vs_bf16": round(base_s / s, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
