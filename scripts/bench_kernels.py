"""On-TPU RDB kernel regression harness (VERDICT r1 #7).

Runs the XLA delta-RDB and both Pallas fused-RDB kernels on the real
chip with fixed seeds: asserts exactness (fp32, small shape) and then
measures useful TF/s on the round-1 comparison shape (16×276², bf16,
12-RDB in-jit chain). Prints one JSON line per variant; paste results
into BENCH_NOTES.md with the date.

Useful-FLOPs accounting: 9·(64·192 + 32·(160+128+96+64)) MACs/px = 479,232
FLOPs/px/RDB — the delta formulation's true work (identical math to the
concat form).

Usage: python scripts/bench_kernels.py [--variants xla,v1,v2] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

FLOPS_PER_PX_RDB = 2 * 9 * (64 * 192 + 32 * (160 + 128 + 96 + 64))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="xla,v1,v2")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--chain", type=int, default=12)
    ap.add_argument("--shape", default="16,276,276")
    ap.add_argument("--tile", type=int, default=144)
    ap.add_argument("--skip-gate", action="store_true",
                    help="throughput only (gates already green this session)")
    args = ap.parse_args()

    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    from s2sr_tpu.models.rrdbnet import RRDBNet, _rdb, _rdb_packed
    from s2sr_tpu.ops.pallas.fused_rdb import (
        pack_rdb_weights, pack_rdb_weights_v2, pack_rdb_weights_v3,
        rdb_pallas, rdb_pallas_v2, rdb_pallas_v3,
    )

    backend = jax.default_backend()
    print(f"# backend: {backend}", file=sys.stderr)

    net = RRDBNet(num_feat=64, num_block=1, num_grow_ch=32)
    params = net.init(jax.random.PRNGKey(0))
    p = jax.tree.map(lambda a: a[0], params["body"]["rdb1"])

    rng = np.random.default_rng(7)

    # ---- exactness gate (fp32, ragged small shape) ---------------------
    xs = jnp.asarray(rng.random((1, 40, 72, 64)), jnp.float32)
    want = np.asarray(_rdb(xs, p, jnp.float32)) if not args.skip_gate else None
    packed1, b14_1, b5_1 = pack_rdb_weights(p, dtype=jnp.float32)
    packed2, b14_2, b5_2 = pack_rdb_weights_v2(p, dtype=jnp.float32)
    variants = args.variants.split(",")
    if "v1" in variants and not args.skip_gate:
        got = np.asarray(rdb_pallas(xs, packed1, b14_1, b5_1))
        err = float(np.abs(got - want).max())
        print(json.dumps({"check": "v1_exact", "max_err": err}))
        assert err < 1e-4, f"v1 inexact on {backend}: {err}"
    if "v2" in variants and not args.skip_gate:
        got = np.asarray(rdb_pallas_v2(xs, packed2, b14_2, b5_2))
        err = float(np.abs(got - want).max())
        print(json.dumps({"check": "v2_exact", "max_err": err}))
        assert err < 1e-4, f"v2 inexact on {backend}: {err}"
    if "v3" in variants and not args.skip_gate:
        packed3, b14_3, b5_3 = pack_rdb_weights_v3(p, dtype=jnp.float32)
        # fp32 doubles every VMEM buffer; gate at tile=64 (input is 40×72)
        got = np.asarray(rdb_pallas_v3(xs, packed3, b14_3, b5_3, tile=64))
        err = float(np.abs(got - want).max())
        print(json.dumps({"check": "v3_exact", "max_err": err}))
        assert err < 1e-4, f"v3 inexact on {backend}: {err}"
    if ("v4" in variants or "v4t9" in variants) and not args.skip_gate:
        from s2sr_tpu.ops.pallas.fused_rdb_v4 import rdb_pallas_v4

        packed2f, b14f, b5f = pack_rdb_weights_v2(p, dtype=jnp.float32)
        if "v4" in variants:
            got = np.asarray(rdb_pallas_v4(xs, packed2f, b14f, b5f,
                                           tile=64, stage_taps=3))
            err = float(np.abs(got - want).max())
            print(json.dumps({"check": "v4_exact", "max_err": err}))
            assert err < 1e-4, f"v4 inexact on {backend}: {err}"
        if "v4t9" in variants:
            packed3f, _, _ = pack_rdb_weights_v3(p, dtype=jnp.float32)
            mix = (packed2f[0],) + tuple(packed3f[1:])
            got = np.asarray(rdb_pallas_v4(xs, mix, b14f, b5f,
                                           tile=64, stage_taps=9))
            err = float(np.abs(got - want).max())
            print(json.dumps({"check": "v4t9_exact", "max_err": err}))
            assert err < 1e-4, f"v4t9 inexact on {backend}: {err}"

    # ---- throughput (bf16, chained) ------------------------------------
    b, h, w = (int(v) for v in args.shape.split(","))
    x = jnp.asarray(rng.random((b, h, w, 64)), jnp.bfloat16)
    R = args.chain
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    packed1b, b14_1b, b5_1b = pack_rdb_weights(p, dtype=jnp.bfloat16)
    packed2b, b14_2b, b5_2b = pack_rdb_weights_v2(p, dtype=jnp.bfloat16)

    def chain(step):
        def run(x):
            return jax.lax.fori_loop(0, R, lambda i, v: step(v), x)
        return jax.jit(run)

    fns = {}
    if "xla" in variants:
        fns["xla"] = chain(lambda v: _rdb(v, pb, jnp.bfloat16))
    if "xp" in variants or "xpp" in variants:
        # the prefix-layout packed accumulator (the 'xpp' experiment)
        # was promoted into the library as _rdb_packed — both names now
        # measure the production formulation
        fns["xp"] = chain(lambda v: _rdb_packed(v, pb, jnp.bfloat16))
    if "v1" in variants:
        fns["v1"] = chain(lambda v: rdb_pallas(v, packed1b, b14_1b, b5_1b))
    if "v2" in variants:
        fns["v2"] = chain(lambda v: rdb_pallas_v2(v, packed2b, b14_2b,
                                                  b5_2b, tile=args.tile))
    if "v3" in variants:
        packed3b, b14_3b, b5_3b = pack_rdb_weights_v3(p, dtype=jnp.bfloat16)
        fns["v3"] = chain(lambda v: rdb_pallas_v3(v, packed3b, b14_3b,
                                                  b5_3b, tile=args.tile))
    if "v4" in variants or "v4t9" in variants:
        from s2sr_tpu.ops.pallas.fused_rdb_v4 import rdb_pallas_v4

        if "v4" in variants:
            fns["v4"] = chain(lambda v: rdb_pallas_v4(
                v, packed2b, b14_2b, b5_2b, tile=args.tile, stage_taps=3))
        if "v4t9" in variants:
            packed3b2, _, _ = pack_rdb_weights_v3(p, dtype=jnp.bfloat16)
            mixb = (packed2b[0],) + tuple(packed3b2[1:])
            fns["v4t9"] = chain(lambda v: rdb_pallas_v4(
                v, mixb, b14_2b, b5_2b, tile=args.tile, stage_taps=9))
    # time-attribution ablations (math intentionally wrong — never gated,
    # never shipped; they decompose v4's measured time, BENCH_NOTES r3)
    for abl in ("no_fill", "no_acc"):
        vname = f"v4_{abl}"
        if vname in variants:
            from s2sr_tpu.ops.pallas.fused_rdb_v4 import rdb_pallas_v4

            fns[vname] = chain(lambda v, abl=abl: rdb_pallas_v4(
                v, packed2b, b14_2b, b5_2b, tile=args.tile, stage_taps=3,
                ablate=abl))
    if "v4_serialdma" in variants:
        from s2sr_tpu.ops.pallas.fused_rdb_v4 import rdb_pallas_v4

        fns["v4_serialdma"] = chain(lambda v: rdb_pallas_v4(
            v, packed2b, b14_2b, b5_2b, tile=args.tile, stage_taps=3,
            prefetch=False))
    if "i8" in variants:
        # W8A8 quantized packed RDB (models/rrdbnet_int8.py). TF/s is
        # FLOP-equivalent (same useful work, int8 MXU arithmetic); no
        # exactness gate — int8 is intentionally approximate, quality is
        # bounded in tests/test_int8.py.
        from s2sr_tpu.models.rrdbnet_int8 import (_pack_rdb_kernels,
                                                  _quantize_kernel,
                                                  _rdb_packed_i8)

        ws = _pack_rdb_kernels(p)
        w8s, deqs = zip(*(_quantize_kernel(w) for w in ws))
        s_act = jnp.full((5,), 1.0 / 127.0, jnp.float32)
        qp = {"w8": tuple(w8s),
              "deq": tuple(d * s_act[i] for i, d in enumerate(deqs)),
              "qm": 1.0 / s_act,
              "b": tuple(p[f"conv{k}"]["bias"].astype(jnp.float32)
                         for k in range(1, 6))}
        fns["i8"] = chain(lambda v: _rdb_packed_i8(v, qp, jnp.bfloat16))
    if "i8fast" in variants:
        # ablation: dequant/quant arithmetic in bf16 instead of f32
        # (half the elementwise bandwidth; slightly different quantizer)
        from s2sr_tpu.models.rrdbnet_int8 import (_pack_rdb_kernels,
                                                  _quantize_kernel)

        ws = _pack_rdb_kernels(p)
        w8s, deqs = zip(*(_quantize_kernel(w) for w in ws))
        deq_b = tuple((d / 127.0).astype(jnp.bfloat16) for d in deqs)
        qm_b = jnp.bfloat16(127.0)
        b_b = tuple(p[f"conv{k}"]["bias"].astype(jnp.bfloat16)
                    for k in range(1, 6))

        def conv_i8f(x8, w8, d):
            out = jax.lax.conv_general_dilated(
                x8, w8, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return out.astype(jnp.bfloat16) * d

        def quant_b(x):
            return jnp.clip(jnp.round(x * qm_b), -127, 127).astype(jnp.int8)

        def rdb_i8f(x):
            g = 32
            lrelu = lambda t: jnp.where(t >= 0, t, t * jnp.bfloat16(0.2))
            acc = conv_i8f(quant_b(x), w8s[0], deq_b[0])
            x1 = quant_b(lrelu(acc[..., -g:] + b_b[0]))
            acc = acc[..., :-g] + conv_i8f(x1, w8s[1], deq_b[1])
            x2 = quant_b(lrelu(acc[..., -g:] + b_b[1]))
            acc = acc[..., :-g] + conv_i8f(x2, w8s[2], deq_b[2])
            x3 = quant_b(lrelu(acc[..., -g:] + b_b[2]))
            acc = acc[..., :-g] + conv_i8f(x3, w8s[3], deq_b[3])
            x4 = quant_b(lrelu(acc[..., -g:] + b_b[3]))
            x5 = acc[..., :-g] + conv_i8f(x4, w8s[4], deq_b[4]) + b_b[4]
            return x5 * jnp.bfloat16(0.2) + x

        fns["i8fast"] = chain(rdb_i8f)
    if "i8acc" in variants:
        # int32-accumulator formulation: ONE shared activation scale per
        # RDB + JOINT per-channel weight scales across the 5 stage
        # kernels -> raw int32 conv outputs sum directly in the prefix
        # accumulator; dequant happens only at the 32-lane tail
        # extractions (and the final 64-lane residual), not over every
        # wide conv output.
        from s2sr_tpu.models.rrdbnet_int8 import _pack_rdb_kernels

        ws = _pack_rdb_kernels(p)                     # cout 192..64
        # joint per-channel scales on the packed prefix layout: lane c
        # of the accumulator receives contributions from every stage
        # kernel whose cout covers c (all kernels share prefix lanes)
        s192 = jnp.zeros((192,), jnp.float32)
        for wk in ws:
            co = wk.shape[-1]
            s192 = s192.at[:co].max(jnp.max(jnp.abs(wk), axis=(0, 1, 2)))
        s192 = jnp.maximum(s192, 1e-12) / 127.0
        w8s = tuple(
            jnp.clip(jnp.round(wk / s192[: wk.shape[-1]]), -127, 127)
            .astype(jnp.int8) for wk in ws)
        s_a = 1.0 / 127.0                              # shared act scale
        d192 = (s192 * s_a).astype(jnp.float32)        # joint dequant
        b_f = tuple(p[f"conv{k}"]["bias"].astype(jnp.float32)
                    for k in range(1, 6))

        def conv_raw32(x8, w8):
            return jax.lax.conv_general_dilated(
                x8, w8, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        def quant_a(x):
            q = jnp.round(x.astype(jnp.float32) * (1.0 / s_a))
            return jnp.clip(q, -127, 127).astype(jnp.int8)

        def rdb_i8acc(x):
            g = 32
            lrelu = lambda t: jnp.where(t >= 0, t, t * 0.2)

            def tail(acc32, k):
                co = acc32.shape[-1]
                t = acc32[..., -g:].astype(jnp.float32) * d192[co - g:co]
                return quant_a(lrelu(t + b_f[k]))

            acc = conv_raw32(quant_a(x), w8s[0])               # int32 192
            x1 = tail(acc, 0)
            acc = acc[..., :-g] + conv_raw32(x1, w8s[1])       # int32 160
            x2 = tail(acc, 1)
            acc = acc[..., :-g] + conv_raw32(x2, w8s[2])       # int32 128
            x3 = tail(acc, 2)
            acc = acc[..., :-g] + conv_raw32(x3, w8s[3])       # int32 96
            x4 = tail(acc, 3)
            acc = acc[..., :-g] + conv_raw32(x4, w8s[4])       # int32 64
            x5 = acc.astype(jnp.float32) * d192[:64] + b_f[4]
            return (x5 * 0.2).astype(jnp.bfloat16) + x

        fns["i8acc"] = chain(rdb_i8acc)
    if "i8noq" in variants:
        # time-attribution ablation (math intentionally wrong, never
        # shipped): int8 convs with NO quant/dequant glue — the output
        # is cast to int8 by truncation, the accumulator stays bf16 via
        # plain casts. Separates "int8 convs run slower in chain
        # context" from "the W8A8 scale glue costs the difference".
        from s2sr_tpu.models.rrdbnet_int8 import _pack_rdb_kernels

        ws_n = _pack_rdb_kernels(p)
        w8n = tuple(jnp.clip(jnp.round(wk * 64), -127, 127)
                    .astype(jnp.int8) for wk in ws_n)

        def conv_n(x8, w8):
            return jax.lax.conv_general_dilated(
                x8, w8, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        def rdb_i8noq(x):
            # same bf16-accumulator structure as variant i8, but every
            # quant/dequant is a bare CAST — isolates the scale/round/
            # clip arithmetic from the int8-conv + cast cost
            g = 32
            acc = conv_n(x.astype(jnp.int8), w8n[0]).astype(jnp.bfloat16)
            x1 = acc[..., -g:].astype(jnp.int8)
            acc = acc[..., :-g] + conv_n(x1, w8n[1]).astype(jnp.bfloat16)
            x2 = acc[..., -g:].astype(jnp.int8)
            acc = acc[..., :-g] + conv_n(x2, w8n[2]).astype(jnp.bfloat16)
            x3 = acc[..., -g:].astype(jnp.int8)
            acc = acc[..., :-g] + conv_n(x3, w8n[3]).astype(jnp.bfloat16)
            x4 = acc[..., -g:].astype(jnp.int8)
            acc = acc[..., :-g] + conv_n(x4, w8n[4]).astype(jnp.bfloat16)
            return acc * jnp.bfloat16(1e-4) + x

        fns["i8noq"] = chain(rdb_i8noq)
    if "i8mix" in variants:
        # mixed-precision probe: quantize ONLY the 64->192 stage conv
        # (46% of FLOPs, the 1.51x isolated int8 winner) — one quant
        # pass on the 64-ch input + one dequant on its output; the four
        # 32->wide convs stay bf16 (their isolated gains are smaller
        # and each would add its own glue).
        from s2sr_tpu.models.rrdbnet_int8 import (_pack_rdb_kernels,
                                                  _quantize_kernel)

        ws_m = _pack_rdb_kernels(p)
        wx8, sx_w = _quantize_kernel(ws_m[0])
        deq_x = (sx_w / 127.0).astype(jnp.float32)
        wb_m = tuple(w.astype(jnp.bfloat16) for w in ws_m[1:])
        b_m = tuple(p[f"conv{k}"]["bias"].astype(jnp.bfloat16)
                    for k in range(1, 6))

        def conv_bf(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def rdb_i8mix(x):
            g = 32
            lrelu = lambda t: jnp.where(t >= 0, t, t * jnp.bfloat16(0.2))
            x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 127.0),
                          -127, 127).astype(jnp.int8)
            out = jax.lax.conv_general_dilated(
                x8, wx8, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            acc = (out.astype(jnp.float32) * deq_x).astype(jnp.bfloat16)
            x1 = lrelu(acc[..., -g:] + b_m[0])
            acc = acc[..., :-g] + conv_bf(x1, wb_m[0])
            x2 = lrelu(acc[..., -g:] + b_m[1])
            acc = acc[..., :-g] + conv_bf(x2, wb_m[1])
            x3 = lrelu(acc[..., -g:] + b_m[2])
            acc = acc[..., :-g] + conv_bf(x3, wb_m[2])
            x4 = lrelu(acc[..., -g:] + b_m[3])
            x5 = acc[..., :-g] + conv_bf(x4, wb_m[3]) + b_m[4]
            return x5 * jnp.bfloat16(0.2) + x

        fns["i8mix"] = chain(rdb_i8mix)
    if "wino" in variants:
        # Winograd F(2×2,3×3) probe — the one conv formulation class
        # not yet measured on this chain. Each 3×3 conv becomes 16
        # batched matmuls over BᵀdB-transformed 4×4 tiles (2.25× fewer
        # MACs than direct), but the transformed operand V
        # [16,N,H/2,W/2,C] and product M round-trip HBM: arithmetic
        # intensity drops from ~190 to ~8 FLOP/byte, so the roofline
        # predicts a bandwidth-bound loss (~6 TF/s GEMM-rate ≈ ~14
        # direct-equivalent vs 57 direct). Measured to close the avenue
        # with data rather than a projection; fp32 gate vs _rdb below
        # (Winograd is not bit-exact — transform rounding — hence a
        # probe, never a production candidate for the byte-exact pin).
        from s2sr_tpu.models.rrdbnet import _lrelu, packed_prefix_kernels

        Bt = jnp.array([[1, 0, -1, 0], [0, 1, 1, 0],
                        [0, -1, 1, 0], [0, 1, 0, -1]], jnp.float32)
        Gw = jnp.array([[1, 0, 0], [.5, .5, .5],
                        [.5, -.5, .5], [0, 0, 1]], jnp.float32)
        At = jnp.array([[1, 1, 1, 0], [0, 1, -1, -1]], jnp.float32)

        def wino_u(wk, dtype):
            return jnp.einsum("ur,rsco,vs->uvco", Gw,
                              wk.astype(jnp.float32), Gw).astype(dtype)

        def wino_conv(t, U, dtype):
            n, hh, ww, c = t.shape
            o = U.shape[-1]
            tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
            th, tw = hh // 2, ww // 2
            d = jnp.stack([tp[:, r:r + 2 * th:2, s:s + 2 * tw:2, :]
                           for r in range(4) for s in range(4)])
            d = d.reshape(4, 4, n, th, tw, c)
            btd = Bt.astype(dtype)
            v = jnp.einsum("ur,rsnhwc->usnhwc", btd, d)
            v = jnp.einsum("usnhwc,vs->uvnhwc", v, btd)
            m_ = jnp.einsum("uvnhwc,uvco->uvnhwo", v, U)
            atd = At.astype(dtype)
            y = jnp.einsum("iu,uvnhwo->ivnhwo", atd, m_)
            y = jnp.einsum("ivnhwo,jv->nhiwjo", y, atd)
            return y.reshape(n, hh, ww, o)

        def make_wino_rdb(pp, dtype):
            Us = tuple(wino_u(wk, dtype)
                       for wk in packed_prefix_kernels(pp))
            bs = tuple(pp[f"conv{k}"]["bias"].astype(dtype)
                       for k in range(1, 6))

            def rdb_w(t):
                g_ = 32
                acc = wino_conv(t, Us[0], dtype)
                x1 = _lrelu(acc[..., -g_:] + bs[0])
                acc = acc[..., :-g_] + wino_conv(x1, Us[1], dtype)
                x2 = _lrelu(acc[..., -g_:] + bs[1])
                acc = acc[..., :-g_] + wino_conv(x2, Us[2], dtype)
                x3 = _lrelu(acc[..., -g_:] + bs[2])
                acc = acc[..., :-g_] + wino_conv(x3, Us[3], dtype)
                x4 = _lrelu(acc[..., -g_:] + bs[3])
                x5 = acc[..., :-g_] + wino_conv(x4, Us[4], dtype) + bs[4]
                return x5 * jnp.asarray(0.2, dtype) + t

            return rdb_w

        if not args.skip_gate:
            want_w = want if want is not None else np.asarray(
                _rdb(xs, p, jnp.float32))
            got = np.asarray(make_wino_rdb(p, jnp.float32)(xs))
            err = float(np.abs(got - want_w).max())
            print(json.dumps({"check": "wino_close", "max_err": err}))
            assert err < 1e-3, f"winograd transform wrong: {err}"
        fns["wino"] = chain(make_wino_rdb(p, jnp.bfloat16))

    useful = b * h * w * FLOPS_PER_PX_RDB * R
    for name, fn in fns.items():
        t_c0 = time.perf_counter()
        out = fn(x)
        _ = np.asarray(out.ravel()[:1])     # relay: readback, not block_until_ready
        compile_s = time.perf_counter() - t_c0
        # runs are serially dependent (out feeds the next chain) — queue
        # them all and read back ONCE, so the ~33 ms relay round-trip is
        # amortised across runs instead of billed per run as chip time
        t0 = time.perf_counter()
        for _ in range(args.runs):
            out = fn(out)
        _ = np.asarray(out.ravel()[:1])
        dt = (time.perf_counter() - t0) / args.runs
        print(json.dumps({
            "variant": name, "backend": backend,
            "shape": [b, h, w], "chain": R,
            "ms_per_chain": round(dt * 1e3, 2),
            "tf_s": round(useful / dt / 1e12, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
