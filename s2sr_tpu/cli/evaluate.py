"""CLI: compare two rasters / tile trees (PSNR, SSIM, max diff).

Usage:
  python -m s2sr_tpu.cli.evaluate a.tif b.tif
  python -m s2sr_tpu.cli.evaluate tiles_a/ tiles_b/   (tile trees)
"""

import argparse
import json
from pathlib import Path

import numpy as np

from ..tiles.png import decode_png
from ..utils.metrics import psnr, ssim


def load(path: Path) -> np.ndarray:
    if path.suffix == ".png":
        return decode_png(path.read_bytes())
    from ..geo import read_geotiff

    return read_geotiff(path).data


def main() -> None:
    parser = argparse.ArgumentParser(description="Raster/tile-tree parity eval")
    parser.add_argument("a")
    parser.add_argument("b")
    args = parser.parse_args()
    a, b = Path(args.a), Path(args.b)
    if a.is_dir():
        scores = []
        for tile_a in sorted(a.glob("*/*/*.png")):
            tile_b = b / tile_a.relative_to(a)
            if not tile_b.exists():
                print(json.dumps({"tile": str(tile_a.relative_to(a)),
                                  "missing_in_b": True}))
                continue
            ia, ib = load(tile_a), load(tile_b)
            scores.append(psnr(ia, ib))
        print(json.dumps({
            "tiles": len(scores),
            "psnr_mean": round(float(np.mean(scores)), 2) if scores else None,
            "psnr_min": round(float(np.min(scores)), 2) if scores else None,
        }))
    else:
        ia, ib = load(a), load(b)
        if ia.shape != ib.shape:
            raise SystemExit(f"shape mismatch: {ia.shape} vs {ib.shape}")
        print(json.dumps({
            "psnr": round(psnr(ia, ib), 2),
            "ssim": round(ssim(ia, ib), 4),
            "max_abs_diff": int(np.abs(ia.astype(int) - ib.astype(int)).max()),
        }))


if __name__ == "__main__":
    main()
