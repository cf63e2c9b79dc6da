"""Extended benchmark suite — the five BASELINE.json configs.

`bench.py` stays the driver's single-line headline; this reports the
full matrix (JSON lines, one per config) for regression tracking.

Run: python bench_all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def sync(x):
    return np.asarray(x.ravel()[:1] if hasattr(x, "ravel") else x)


def emit(name, seconds, **extra):
    print(json.dumps({"config": name, "seconds": round(seconds, 3), **extra}),
          flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="smaller shapes (CI smoke)")
    args = parser.parse_args()

    import jax.numpy as jnp

    from s2sr_tpu.fetch.synthetic import synthetic_scene
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.ops.enhance import enhance_for_crops

    size = 256 if args.quick else 512
    tmp = Path("data/bench")
    tmp.mkdir(parents=True, exist_ok=True)

    # config 1: single tile, no post-proc (BASELINE "single 512×512 RGB tile")
    scene = synthetic_scene(size=(size, size), seed=0)
    engine = SREngine("realesrgan_x4", weights_dir="models",
                      dtype="bfloat16")
    x = jnp.asarray(scene.data)
    sync(engine.enhance_device(x))                      # compile
    t0 = time.perf_counter()
    sync(engine.enhance_device(x))
    dt = time.perf_counter() - t0
    emit("1_single_tile_x4", dt,
         mpix_s=round(size * size / dt / 1e6, 3))

    # config 2: WOW with enhance on a 16-tile batch (4x4 tile image)
    big = 4 * size
    scene_big = synthetic_scene(size=(big, big), seed=1)
    xb = jnp.asarray(scene_big.data)
    sync(enhance_for_crops(engine.enhance_device(xb)))  # compile
    t0 = time.perf_counter()
    sync(enhance_for_crops(engine.enhance_device(xb)))
    dt = time.perf_counter() - t0
    emit("2_wow_enhance_16tiles", dt,
         mpix_s=round(big * big / dt / 1e6, 3))

    # config 3: original-tile generation z10–16 (warp + pyramid + encode)
    from s2sr_tpu.tiles.pyramid import (generate_xyz_tiles,
                                        warp_tiles_device_benchmark)

    # 3a: device-compute only (single probe readback) — the stable,
    # regression-gated number; the end-to-end figure below includes
    # relay transfer + host PNG encode and varies by session
    zmax = 13 if args.quick else 16
    n_base = warp_tiles_device_benchmark(scene_big, zmax)   # compile
    t0 = time.perf_counter()
    warp_tiles_device_benchmark(scene_big, zmax)
    dt = time.perf_counter() - t0
    emit("3a_tile_warp_compute", dt, tiles=n_base,
         tiles_s=round(n_base / dt, 1))

    t0 = time.perf_counter()
    generate_xyz_tiles(scene_big, tmp / "tiles", min_zoom=10,
                       max_zoom=13 if args.quick else 16)
    dt = time.perf_counter() - t0
    tiles = sum(1 for _ in (tmp / "tiles").glob("*/*/*.png"))
    emit("3_tile_pyramid", dt, tiles=tiles,
         tiles_s=round(tiles / dt, 1))

    # config 4: full pipeline offline (fetch→tiles→SR→SR tiles)
    from s2sr_tpu.geo import write_geotiff
    from s2sr_tpu.pipelines.wow_sr import process_wow_sr
    from s2sr_tpu.tiles import process_raster_to_tiles

    src = tmp / "scene.tif"
    write_geotiff(scene, src)
    t0 = time.perf_counter()
    result = process_wow_sr(src, tmp / "wow", weights_dir="models")
    process_raster_to_tiles(Path(result["outputs"]["sr_tif"]),
                            tmp / "tiles_wow", min_zoom=12,
                            max_zoom=14 if args.quick else 16)
    dt = time.perf_counter() - t0
    emit("4_full_pipeline", dt)

    # config 5: vector intelligence over the AOI
    from s2sr_tpu.utils import write_json
    from s2sr_tpu.vectors.extraction import (ExtractionConfig,
                                             extract_field_polygons)

    aoi = tmp / "aoi.geojson"
    w, s, e, n = scene.bounds
    write_json({"type": "Polygon", "coordinates": [[
        [w, s], [e, s], [e, n], [w, n], [w, s]]]}, aoi)
    t0 = time.perf_counter()
    res = extract_field_polygons(
        aoi, [src], tmp / "vectors",
        ExtractionConfig(min_area_ha=0.01, max_area_ha=10000.0))
    dt = time.perf_counter() - t0
    emit("5_vector_extraction", dt, features=res["feature_count"])

    # config 6: int8 turbo serving (mixed-precision trunk — the opt-in
    # dtype; regression-tracks the +4.4% over bf16, BENCH_NOTES int8)
    import numpy as np

    big = 512 if args.quick else 1024
    img = np.asarray(synthetic_scene(size=(big, big), seed=3).data)
    turbo = SREngine("realesrgan_x4", weights_dir="models",
                     dtype="int8", tile_pad=4)
    xb = jnp.asarray(img)
    sync(turbo.enhance_device(xb))                      # compile
    t0 = time.perf_counter()
    outs = [turbo.enhance_device(xb) for _ in range(3)]
    for o in outs:
        sync(o)
    dt = (time.perf_counter() - t0) / 3
    emit("6_int8_turbo", dt, mpix_s=round(big * big / dt / 1e6, 3))


if __name__ == "__main__":
    main()
