"""Classic-model (EDSR/ESPCN/LapSRN) TPU throughput matrix.

VERDICT r4 #4: the reference's "standard" SR path
(``server/app/super_resolution.py:92-257``, cv2.dnn_superres on CPU)
is a first-class endpoint whose TPU story was untold. One row per
registry entry, warm bucketed serving path (the production
``run_classic_sr`` flow incl. the YCrCb luma wrap for 1-channel
models), amortised readback.

Weights: converted .npz/.pb from Settings.weights_dir when present,
random init otherwise (identical FLOPs — throughput is
weight-agnostic).

Usage: python scripts/bench_classic.py [--size 512] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--models", default="edsr_x2,edsr_x3,edsr_x4,"
                    "espcn_x2,espcn_x3,espcn_x4,"
                    "lapsrn_x2,lapsrn_x4,lapsrn_x8")
    ap.add_argument("--batch", type=int, default=0,
                    help="also record the BATCHED device rate: N "
                         "size//2-sized inputs per dispatch, queued "
                         "runs + one probe sync — the true kernel "
                         "rate for the dispatch-floor-bound small "
                         "models (VERDICT r4 #9)")
    args = ap.parse_args()
    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    import jax

    from s2sr_tpu.pipelines.super_resolution import create_sr_model, \
        run_classic_sr

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (args.size, args.size, 3)).astype(np.uint8)

    import jax.numpy as jnp

    for name in args.models.split(","):
        family, scale = name.rsplit("_x", 1)
        try:
            instance, params = create_sr_model(family, int(scale))
            row = {"model": name,
                   "luma_path": getattr(instance, "num_ch", 3) == 1}

            # (a) device-resident compute rate: queue runs, sync one
            # probe element each — excludes the host transfer of the
            # (s·size)² output, which rides the relay here and can be
            # orders slower than compute when the tunnel is congested
            x = jnp.asarray(img.astype(np.float32) / 255.0)[None]
            fn = jax.jit(instance.apply)
            out = fn(params, x)
            _ = np.asarray(out.ravel()[:1])
            t0 = time.perf_counter()
            outs = [fn(params, x) for _ in range(args.runs)]
            for o in outs:
                _ = np.asarray(o.ravel()[:1])
            dt_dev = (time.perf_counter() - t0) / args.runs
            row["s_device"] = round(dt_dev, 4)
            row["mpix_s_device"] = round(
                args.size * args.size / dt_dev / 1e6, 2)

            # (b) full production host path (run_classic_sr), incl.
            # output transfer + uint8 convert
            run_classic_sr(instance, params, img)       # warm
            t0 = time.perf_counter()
            for _ in range(args.runs):
                run_classic_sr(instance, params, img)
            dt = (time.perf_counter() - t0) / args.runs
            row["s_per_image"] = round(dt, 3)
            row["mpix_s"] = round(args.size * args.size / dt / 1e6, 2)
            if args.batch:
              try:
                bs, bsz = args.batch, args.size // 2
                xb = jnp.asarray(rng.random(
                    (bs, bsz, bsz, getattr(instance, "num_ch", 3)),
                    np.float32))
                out = fn(params, xb)
                _ = np.asarray(out.ravel()[:1])
                t0 = time.perf_counter()
                outs = [fn(params, xb) for _ in range(args.runs)]
                for o in outs:
                    _ = np.asarray(o.ravel()[:1])
                dt_b = (time.perf_counter() - t0) / args.runs
                row["batch"] = f"{bs}x{bsz}"
                row["s_batch"] = round(dt_b, 4)
                row["mpix_s_batched"] = round(
                    bs * bsz * bsz / dt_b / 1e6, 2)
              except Exception as e:  # batch leg must not lose the row
                row["batch_error"] = f"{type(e).__name__}: {str(e)[:120]}"
            print(json.dumps(row), flush=True)
        except Exception as e:
            print(json.dumps({"model": name, "error": type(e).__name__,
                              "detail": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
