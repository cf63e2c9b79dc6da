"""Harvest the r2 batch-32 chain win at the engine level (VERDICT r4 #1b).

r2 measured the packed-prefix RDB chain at batch 32 = 49.4 TF/s vs 46.0
at batch 16 (per-run-readback era) and never revisited it. At the
engine level a 1024^2 input under tile 256 has only 16 windows, so
"batch 32" there means a smaller tile (128 -> 64 windows of 136^2,
halo waste 1.129x vs 1.163x at t256) or a bigger input (2048^2 -> 64
windows of 276^2). This sweeps both under the r3 amortised-readback
methodology (queue all runs, one readback each at the end).

Usage: python scripts/bench_batch32.py [--runs 5]
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


def bench_config(size, tile, batch, runs):
    from s2sr_tpu.fetch.synthetic import synthetic_fields
    from s2sr_tpu.models.engine import SREngine

    eng = SREngine("realesrgan_x4", weights_dir="models", tile_size=tile,
                   tile_pad=4, batch_size=batch, dtype="bfloat16")
    img = jnp.asarray(synthetic_fields(size=(size, size), seed=0))
    out = eng.enhance_device(img)
    _ = np.asarray(out[:1, :1])          # compile + sync
    t0 = time.perf_counter()
    outs = [eng.enhance_device(img) for _ in range(runs)]
    for o in outs:
        _ = np.asarray(o[:1, :1])
    dt = time.perf_counter() - t0
    return size * size * runs / dt / 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--configs",
                    default="1024:256:16,1024:128:32,1024:128:64,"
                            "2048:256:16,2048:256:32")
    args = ap.parse_args()
    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    for spec in args.configs.split(","):
        size, tile, batch = (int(v) for v in spec.split(":"))
        mpix = bench_config(size, tile, batch, args.runs)
        print(json.dumps({"size": size, "tile": tile, "batch": batch,
                          "mpix_s": round(mpix, 3)}), flush=True)


if __name__ == "__main__":
    main()
