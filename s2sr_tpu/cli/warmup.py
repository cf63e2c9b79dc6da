"""CLI: precompile the production executables into the persistent cache.

Cold-start pain is real and measured: the first offline pipeline on a
box whose XLA cache is empty took 69 s vs 13 s warm (BENCH_NOTES —
compiles of the 23-block model through the remote-compile relay run
~minutes). This command runs a tiny representative workload through
every production hot path so the persistent compilation cache
(`s2sr_tpu.utils.jax_cache`, keyed on HLO) holds their executables:

- the SR engine's whole-image, halo-tiled, bucketed-serving and
  masked-bucket paths at the deployed tile/pad/batch settings,
- the fused WOW + farm enhancement chains,
- the tile warp + pyramid ops,
- the vector-extraction mask chain.

Run it at image-build time or as a k8s initContainer sharing the cache
volume; a later server/CLI process then compiles nothing. Idempotent —
warm executables make this a no-op costing seconds.
"""
import argparse
import time


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Precompile production executables")
    parser.add_argument("--models", default="realesrgan_x4",
                        help="comma-separated engine models to warm")
    parser.add_argument("--dtype", default=None,
                        help="engine dtype override (default: settings)")
    parser.add_argument("--full-size", type=int, default=1024,
                        help="representative tiled-path image size "
                             "(0 skips the big tiled executable)")
    parser.add_argument("--skip-aux", action="store_true",
                        help="engine paths only (skip WOW/tiles/vectors)")
    args = parser.parse_args()

    import numpy as np

    from s2sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.monotonic()

    def tick(name: str) -> None:
        print(f"  warmed {name} ({time.monotonic() - t0:.0f}s total)",
              flush=True)

    rng = np.random.default_rng(0)
    from s2sr_tpu.models.engine import get_engine

    engine = None
    for model in args.models.split(","):
        kwargs = {"dtype": args.dtype} if args.dtype else {}
        engine = get_engine(model.strip(), **kwargs)
        # small awkward size → the masked-bucket executable (exact
        # serving for small uploads)
        engine.enhance_serving(
            rng.integers(0, 255, (150, 130, 3)).astype(np.uint8))
        tick(f"{model}: masked-bucket serving")
        if args.full_size:
            big = rng.integers(
                0, 255, (args.full_size, args.full_size, 3)
            ).astype(np.uint8)
            # large size → the bucketed TILED path: _run_chunked's
            # power-of-two chunk executables (the server's primary hot
            # path for big uploads)
            engine.enhance_serving(big)
            tick(f"{model}: chunked tiled serving {args.full_size}^2")
            # and the monolithic per-shape whole-image executable the
            # device-side enhance()/pipeline path uses
            engine.enhance(big)
            tick(f"{model}: tiled {args.full_size}^2")

    if args.skip_aux:
        print(f"warmup done in {time.monotonic() - t0:.0f}s")
        return

    import jax.numpy as jnp

    from s2sr_tpu.ops.enhance import enhance_farm, enhance_for_crops

    # enhancement runs on the SR OUTPUT (scale × the scene side) — warm
    # the shape the flagship pipeline actually hits, not the input size
    sr_side = (engine.scale if engine is not None else 4) * 512
    img = jnp.asarray(
        rng.integers(0, 255, (sr_side, sr_side, 3)).astype(np.uint8))
    np.asarray(enhance_for_crops(img))
    np.asarray(enhance_farm(img))
    tick(f"WOW + farm enhancement chains ({sr_side}^2)")

    from s2sr_tpu.fetch.synthetic import synthetic_scene
    from s2sr_tpu.tiles.pyramid import warp_tiles_device_benchmark

    scene = synthetic_scene(size=(512, 512), seed=0)
    warp_tiles_device_benchmark(scene, zoom=13, batch=32)
    tick("tile warp")

    from s2sr_tpu.vectors.extraction import (ExtractionConfig,
                                             compute_green_mask_hsv,
                                             segment_fields)

    vcfg = ExtractionConfig()
    mask = compute_green_mask_hsv(scene, vcfg)
    segment_fields(mask, vcfg)
    tick("vector mask + segmentation chains")

    print(f"warmup done in {time.monotonic() - t0:.0f}s")


if __name__ == "__main__":
    main()
