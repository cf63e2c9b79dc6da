"""Benchmark: x4 SR throughput (input MPix/s per chip) on real hardware.

Runs the flagship Real-ESRGAN x4 architecture (RRDBNet, 23 blocks,
identical FLOPs to the released weights) through the batched halo-tiling
engine on a 1024×1024 uint8 RGB input — the exact workload of the
reference's hot loop (``server/app/cnn_super_resolution.py:236-280``),
which it runs at ≈0.007 MPix/s on its deployed CPU (BASELINE.md:
576×432 in ≈36 s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MPIX_S = 0.007  # reference CPU observed rate (BASELINE.md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32", "int8"),
                    help="engine dtype; default bfloat16 (the parity "
                         "mode pinned byte-identical to the fp32 "
                         "oracle). int8 = W8A8 turbo serving mode.")
    args = ap.parse_args()
    from s2sr_tpu.utils.jax_cache import enable_compilation_cache

    try:
        enable_compilation_cache()
    except Exception:
        pass
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.fetch.synthetic import synthetic_fields

    size = 1024
    img = synthetic_fields(size=(size, size), seed=0)

    engine = SREngine(
        "realesrgan_x4", weights_dir="models", tile_size=256, tile_pad=4,
        batch_size=16, dtype=args.dtype,
    )

    x = jnp.asarray(img)
    # warmup/compile. NOTE: on tunnelled device platforms
    # block_until_ready may not synchronise — force a readback instead.
    out = engine.enhance_device(x)
    _ = np.asarray(out[:1, :1])

    runs = 5
    # dispatch-ahead: queue every run, then force one readback per output
    # (outputs are independent 50 MB uint8 buffers — device compute
    # serialises them; syncing per dispatch would bill the ~33 ms relay
    # round-trip 5× as fake chip time)
    t0 = time.perf_counter()
    outs = [engine.enhance_device(x) for _ in range(runs)]
    for out in outs:
        _ = np.asarray(out[:1, :1])
    dt = time.perf_counter() - t0

    mpix_s = size * size * runs / dt / 1e6
    tag = {"bfloat16": "bf16", "float32": "f32", "int8": "int8"}[args.dtype]
    print(json.dumps({
        "metric": f"x4 SR input throughput (RRDBNet-23, {tag}, halo-tiled)",
        "value": round(mpix_s, 3),
        "unit": "MPix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
