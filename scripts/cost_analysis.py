"""Per-executable FLOPs/bytes attribution via XLA's cost model.

SURVEY §5.1's tracing row names per-stage `jax.profiler` traces; the
axon relay breaks start_trace (documented, CLAUDE.md), so this is the
profiler substitute (VERDICT r4 #7): for each production executable,
dump `compiled.cost_analysis()` — compiler-counted FLOPs and bytes
accessed — plus arithmetic intensity and, with --measure, a timed run
that reconciles compiler FLOPs against measured TF/s. This also
cross-checks the bf16-peak accounting in BENCH_NOTES (the 36 MFLOP/px
RRDBNet figure, the halo-waste multiplier, the SwinIR FLOP model).

The reference has nothing comparable (its `generate_vectors.py:200`
wall-clocks stages); this is a blueprint-level subsystem, not a POC
port.

Usage: python scripts/cost_analysis.py [--measure] [--runs 3]
One JSON line per executable.
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


def _cost(jitted, *args):
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):        # older jax returns [dict]
        ca = ca[0]
    return compiled, (ca or {})


def _sync(out):
    # one-ELEMENT readback (device-side slice first): transferring the
    # full leaf would bill a multi-tens-of-MB relay transfer as compute
    # (CLAUDE.md relay rule; r4 review finding)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:1])


def _timed(jitted, args, runs):
    _sync(jitted(*args))
    t0 = time.perf_counter()
    outs = [jitted(*args) for _ in range(runs)]
    for o in outs:
        _sync(o)
    return (time.perf_counter() - t0) / runs


def _row(name, jitted, args, n_px, measure, runs):
    compiled, ca = _cost(jitted, *args)
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    row = {
        "executable": name,
        "gflops": round(flops / 1e9, 2),
        "mbytes": round(byts / 1e6, 1),
        "intensity_flop_per_byte": round(flops / byts, 1) if byts else None,
        "mflop_per_input_px": round(flops / n_px / 1e6, 2) if n_px else None,
    }
    if measure:
        dt = _timed(jitted, args, runs)
        row["ms"] = round(dt * 1e3, 2)
        row["measured_tf_s"] = round(flops / dt / 1e12, 1)
        row["hbm_gb_s"] = round(byts / dt / 1e9, 1)
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="also time each executable (amortised readback)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default="",
                    help="comma list: rrdbnet,swinir,classic,enhance")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke/CI; the axon "
                         "sitecustomize otherwise forces TPU)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    only = set(args.only.split(",")) if args.only else None

    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(0)

    def want(k):
        return only is None or k in only

    if want("rrdbnet"):
        from s2sr_tpu.models.engine import SREngine

        eng = SREngine("realesrgan_x4", weights_dir="models", tile_size=256,
                       tile_pad=4, batch_size=16, dtype="bfloat16")
        win = eng.tile_size + 2 * eng.tile_pad
        wins = jnp.asarray(
            rng.integers(0, 256, (16, win, win, 3)), jnp.uint8)
        # production serving chunk: 16 halo windows, uint8->uint8
        _row(f"rrdbnet23_chunk_16x{win}2", eng._chunk_fn,
             (eng._mparams, wins), 16 * win * win, args.measure, args.runs)
        # whole-image fused executable at the headline size
        img = jnp.asarray(rng.integers(0, 256, (1024, 1024, 3)), jnp.uint8)
        _row("rrdbnet23_enhance_1024", eng._enhance_fn,
             (eng._mparams, img), 1024 * 1024, args.measure, args.runs)

    if want("swinir"):
        from s2sr_tpu.models.engine import SREngine

        eng = SREngine("swinir_x4", weights_dir="models", dtype="bfloat16")
        img = jnp.asarray(rng.integers(0, 256, (512, 512, 3)), jnp.uint8)
        _row("swinir_x4_enhance_512_exact", eng._enhance_fn,
             (eng._mparams, img), 512 * 512, args.measure, args.runs)

    if want("enhance"):
        from s2sr_tpu.ops.enhance import enhance_for_crops

        x = jnp.asarray(rng.random((2048, 2048, 3)), jnp.float32)
        jitted = jax.jit(enhance_for_crops)
        _row("wow_crop_enhance_2048", jitted, (x,), 2048 * 2048,
             args.measure, args.runs)

    if want("classic"):
        from s2sr_tpu.models.classic import build_classic_model
        from s2sr_tpu.models.registry import get_model_config

        for name in ("edsr_x4", "espcn_x4", "lapsrn_x4"):
            model = build_classic_model(name, get_model_config(name))
            params = model.init(jax.random.PRNGKey(0))
            x = jnp.asarray(rng.random((1, 256, 256, 3)), jnp.float32)
            jitted = jax.jit(model.apply)
            _row(f"{name}_256", jitted, (params, x), 256 * 256,
                 args.measure, args.runs)


if __name__ == "__main__":
    main()
