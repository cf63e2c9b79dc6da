"""Targeted config-2 probe: WOW enhance chain after the bit-exact ops.

Times the post-SR enhancement chain (``enhance_for_crops`` at 8192²,
the config-2 working size) and the full config-2 composition, plus a
component split of the chain's stages, so a regression from the
byte-exact HSV→RGB / GaussianBlur changes is attributable.

Run on the real TPU: ``python scripts/bench_config2.py``.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = x if isinstance(x, (tuple, list)) else [x]
    np.asarray(leaves[0].ravel()[:1])  # relay-safe readback


def timeit(fn, *a, n=2):
    sync(fn(*a))  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from s2sr_tpu.fetch.synthetic import synthetic_scene
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.ops import blur, color
    from s2sr_tpu.ops.enhance import enhance_for_crops

    big = 2048
    scene = synthetic_scene(size=(big, big), seed=1)
    engine = SREngine("realesrgan_x4", weights_dir="models",
                      dtype="bfloat16")
    xb = jnp.asarray(scene.data)

    sr = engine.enhance_device(xb)
    sync(sr)
    print("sr shape", sr.shape)

    # component probes at the working size (8192², uint8 HWC)
    img = jnp.asarray((np.random.default_rng(0)
                       .integers(0, 256, (8192, 8192, 3))
                       .astype(np.uint8)))
    import jax
    for name, fn in [
        ("rgb_to_lab", jax.jit(color.rgb_to_lab_u8)),
        ("lab_to_rgb", jax.jit(color.lab_to_rgb_u8)),
        ("rgb_to_hsv", jax.jit(color.rgb_to_hsv_u8)),
        ("hsv_to_rgb", jax.jit(color.hsv_to_rgb_u8)),
        ("blur_u8 s1.2", jax.jit(
            lambda v: blur.gaussian_blur_u8(v, 1.2))),
        ("unsharp s1.2", jax.jit(
            lambda v: blur.unsharp_mask_u8(v, 1.2, 0.4))),
    ]:
        try:
            dt = timeit(fn, img)
            print(f"{name:16s} {dt:7.3f} s")
        except Exception as exc:  # noqa: BLE001
            print(f"{name:16s} FAILED: {exc}")

    dt = timeit(enhance_for_crops, sr)
    print(f"enhance_for_crops(8192²) {dt:.3f} s")

    def config2(v):
        return enhance_for_crops(engine.enhance_device(v))

    sync(config2(xb))
    t0 = time.perf_counter()
    sync(config2(xb))
    dt = time.perf_counter() - t0
    print(f"config2 end-to-end {dt:.3f} s "
          f"({big * big / dt / 1e6:.3f} MPix/s)")


if __name__ == "__main__":
    main()
