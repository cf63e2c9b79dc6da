"""Per-tensor HBM byte decomposition of the SwinIR exact forward.

VERDICT r4 weak #1: the r4 cost table measured 368 GB accessed per 512²
exact forward (75% of HBM bandwidth, roofline-capping the family at
0.58 MPix/s) but never said WHERE the bytes go. This script compiles
the exact whole-image forward and attributes every optimized-HLO
instruction's output bytes (= HBM writes; reads mirror writes for
streaming fusions) to a bucket keyed by (opcode, shape class, dtype) —
the shape classes are derived from the model's own dimensions, so
"scores", "qkv", "feature map", "MLP hidden" fall out by element count.

Reference forward being decomposed: ``server/app/swinir.py:138-220``
(the window-attention whose intermediates dominate).

Run: python scripts/swinir_bytes.py [--size 512] [--top 25] [--measure]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

_SHAPE_RE = re.compile(
    r"(f32|bf16|f16|s32|s8|u8|pred|s64|u32)\[([0-9,]*)\](\{[^}]*\})?")
_OP_RE = re.compile(r"=\s+(?:\([^)]*\)|\S+)\s+([a-z][a-z0-9_-]*)\(")


def classify(n_el: int, classes: dict[str, set[int]]) -> str:
    for name, counts in classes.items():
        if n_el in counts:
            return name
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--measure", action="store_true",
                    help="also time the compiled forward (amortised, "
                         "probe-element readback)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--scan", action="store_true",
                    help="use the scan-over-blocks formulation")
    ap.add_argument("--group", type=int, default=None,
                    help="override WINDOW_GROUP (window pairing)")
    args = ap.parse_args()

    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax
    import jax.numpy as jnp

    from s2sr_tpu.models import swinir as swin_mod

    if args.group is not None:
        swin_mod.WINDOW_GROUP = args.group

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = swin_mod.SwinIR(dtype=dtype, **(
        {"scan": True} if args.scan and
        "scan" in swin_mod.SwinIR.__init__.__code__.co_varnames else {}))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, args.size, args.size, 3)), jnp.float32)

    fn = jax.jit(model.apply)
    print(f"# backend={jax.default_backend()} size={args.size} "
          f"dtype={args.dtype} group={swin_mod.WINDOW_GROUP}",
          file=sys.stderr)
    compiled = fn.lower(params, x).compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    total_ba = float(ca.get("bytes accessed", 0.0))
    flops = float(ca.get("flops", 0.0))

    # shape classes from the model's own dims (post-pad H=W=size here)
    h = w = args.size
    T = h * w
    win = model.window_size
    n = win * win
    nW = T // n
    g = swin_mod.WINDOW_GROUP
    classes = {
        "scores": {nW // g_ * model.num_heads[0] * (g_ * n) ** 2
                   for g_ in (1, 2, 4) if nW % g_ == 0},
        "qkv": {T * 3 * model.embed_dim},
        "mlp_hidden": {T * int(model.embed_dim * model.mlp_ratio)},
        "feat": {T * model.embed_dim},
        "upsample": {T * model.num_feat, T * 4 * model.num_feat,
                     4 * T * model.num_feat, 16 * T * model.num_feat,
                     16 * T * 3},
        "mask": {nW * n * n, (nW // g) * (g * n) ** 2 if g > 1 else -1},
        "io": {T * 3, 16 * T * 3},
    }

    buckets: dict[tuple, float] = defaultdict(float)
    bucket_n: dict[tuple, int] = defaultdict(int)
    total_out = 0.0
    bytes_per = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "s8": 1,
                 "u8": 1, "pred": 1, "s64": 8, "u32": 4}
    in_entry = False
    for line in compiled.as_text().splitlines():
        # only ENTRY-computation instructions materialize to HBM —
        # ops inside %fused_computation bodies live in registers/VMEM
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry or " = " not in line:
            continue
        head, _, rest = line.partition(" = ")
        # output type is everything before the opcode token: either one
        # shape literal or a (tuple, of, shapes)
        if rest.startswith("("):
            depth, j = 0, 0
            for j, ch in enumerate(rest):
                depth += ch == "("
                depth -= ch == ")"
                if depth == 0:
                    break
            pre, after = rest[:j + 1], rest[j + 1:]
        else:
            sp = rest.find(" ")
            pre, after = rest[:sp], rest[sp:]
        m_op = re.match(r"\s*([a-z][a-z0-9_-]*)\(", after)
        op = m_op.group(1) if m_op else "?"
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast", "copy-start", "async-start"):
            # GTE/bitcast alias existing buffers; the *-start halves of
            # async copies are counted at their *-done twin
            continue
        for dt, dims, layout in _SHAPE_RE.findall(pre):
            n_el = int(np.prod([int(d) for d in dims.split(",") if d])) \
                if dims else 1
            space = "vmem" if "S(1)" in (layout or "") else "hbm"
            cls = classify(n_el, classes)
            key = (op, cls, dt, space)
            b = n_el * bytes_per.get(dt, 4)
            buckets[key] += b
            bucket_n[key] += 1
            total_out += b

    rows = sorted(buckets.items(), key=lambda kv: -kv[1])
    print(json.dumps({
        "size": args.size, "dtype": args.dtype,
        "window_group": g,
        "xla_bytes_accessed_gb": round(total_ba / 1e9, 1),
        "sum_instruction_output_gb": round(total_out / 1e9, 1),
        "xla_gflop": round(flops / 1e9, 1),
    }), flush=True)
    for (op, cls, dt, space), b in rows[:args.top]:
        print(json.dumps({
            "op": op, "class": cls, "dtype": dt, "space": space,
            "gb": round(b / 1e9, 2),
            "count": bucket_n[(op, cls, dt, space)],
        }), flush=True)
    by_class: dict[str, float] = defaultdict(float)
    by_dtype: dict[str, float] = defaultdict(float)
    by_space: dict[str, float] = defaultdict(float)
    for (op, cls, dt, space), b in buckets.items():
        by_class[cls] += b
        by_dtype[dt] += b
        by_space[space] += b
    print(json.dumps({"by_class_gb": {
        k: round(v / 1e9, 1) for k, v in
        sorted(by_class.items(), key=lambda kv: -kv[1])}}), flush=True)
    print(json.dumps({"by_dtype_gb": {
        k: round(v / 1e9, 1) for k, v in by_dtype.items()}}), flush=True)
    print(json.dumps({"by_space_gb": {
        k: round(v / 1e9, 1) for k, v in by_space.items()}}), flush=True)

    if args.measure:
        import time

        out = fn(params, x)
        _ = np.asarray(out.ravel()[:1])
        t0 = time.perf_counter()
        outs = [fn(params, x) for _ in range(args.runs)]
        for o in outs:
            _ = np.asarray(o.ravel()[:1])
        dt_s = (time.perf_counter() - t0) / args.runs
        print(json.dumps({
            "s_per_image": round(dt_s, 3),
            "mpix_s": round(args.size ** 2 / dt_s / 1e6, 3),
            "implied_gb_s": round(total_ba / dt_s / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
