"""Full-resolution v2 vector extraction on device (VERDICT r4 #8).

The reference guards v2 segmentation with a ×4 downsample past 8 MPix
(`server/app/vector_extraction_v2.py:790-808`) because its CPU
watershed cannot afford full res. The TPU rebuild keeps the guard
config-compatible (`ExtractionConfigV2.max_pixels_for_full_res`) but
can actually lift it: this bench runs the v2 chain on a 16.8/33.6 MPix
synthetic multiband stack at FULL resolution (guard lifted) and at the
reference-default ×4 downsample, records cold + warm wall time, and
compares the polygon sets (count + total area delta) as the parity
note.

Run on TPU: python scripts/bench_vectors_fullres.py [--size 4096]
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
    ap.add_argument("--sizes", default="4096,5792")
    ap.add_argument("--out", default="/tmp/vec_fullres")
    args = ap.parse_args()
    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    import jax

    from s2sr_tpu.fetch.synthetic import synthetic_multiband
    from s2sr_tpu.utils import write_json
    from s2sr_tpu.vectors.extraction_v2 import (ExtractionConfigV2,
                                                extract_field_polygons_v2)

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    for size in (int(s) for s in args.sizes.split(",")):
        path = out / f"stack_{size}.tif"
        if not path.exists():
            synthetic_multiband(path=path, size=(size, size))
        aoi = out / "aoi.geojson"
        write_json({
            "type": "Polygon",
            "coordinates": [[[34.5, 31.5], [35.5, 31.5], [35.5, 32.5],
                             [34.5, 32.5], [34.5, 31.5]]],
        }, aoi)

        rows = {}
        for mode, maxpix in (("fullres", 10 ** 12),
                             ("ref_guard_x4", 8_000_000)):
            cfg = ExtractionConfigV2(
                min_area_ha=0.5, max_area_ha=100000.0,
                use_osm_roads=False, generate_zones=False,
                max_pixels_for_full_res=maxpix)
            times = []
            res = None
            for _ in range(2):          # cold, then warm
                t0 = time.perf_counter()
                res = extract_field_polygons_v2(
                    aoi, path, out / f"v2_{mode}_{size}", cfg)
                times.append(round(time.perf_counter() - t0, 2))
            feats = res["feature_count"]
            area = sum(f["properties"].get("area_ha", 0.0)
                       for f in res["geojson"]["features"])
            rows[mode] = (feats, area)
            print(json.dumps({
                "size": size, "mpix": round(size * size / 1e6, 1),
                "mode": mode, "cold_s": times[0], "warm_s": times[1],
                "features": feats, "total_area_ha": area,
            }), flush=True)
        (f_full, a_full), (f_ds, a_ds) = rows["fullres"], rows["ref_guard_x4"]
        print(json.dumps({
            "size": size, "parity": {
                "features_fullres": f_full, "features_ds": f_ds,
                "area_delta_pct": (round(100 * (a_full - a_ds) /
                                         max(a_ds, 1e-9), 2)
                                   if a_full is not None and a_ds else None),
            }}), flush=True)


if __name__ == "__main__":
    main()
