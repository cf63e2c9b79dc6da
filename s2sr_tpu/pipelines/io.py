"""Shared raster/image input normalisation for the SR pipelines.

Reproduces the read path all reference pipelines share
(``server/app/wow_sr.py:59-79``, ``farm_sr.py:128-153``,
``cnn_super_resolution.py:299-315``): GeoTIFF → first 3 bands (or a
gray band replicated), min-max scaled to uint8 when >8-bit; other image
formats via PIL.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..geo import Affine, CRS, GeoTiff, read_geotiff, write_geotiff


def load_rgb(path: Path | str) -> Tuple[np.ndarray, Optional[Affine], Optional[CRS]]:
    """→ (uint8 (H, W, 3) RGB, transform?, crs?)."""
    path = Path(path)
    if path.suffix.lower() in (".tif", ".tiff"):
        r = read_geotiff(path)
        if r.count >= 3:
            img = r.data[:, :, :3]
        else:
            img = np.repeat(r.data[:, :, :1], 3, axis=2)
        if img.dtype != np.uint8:
            if img.max() > 255:
                # byte-exact reference formula (wow_sr.py:68-71): no
                # epsilon — an epsilon shifts every boundary-landing
                # pixel (incl. the max pixel, 255 → 254) one step down
                lo, hi = img.min(), img.max()
                if hi == lo:  # constant >255 raster: reference divides 0/0
                    img = np.zeros(img.shape, np.uint8)
                else:
                    img = ((img.astype(np.float64) - lo) / (hi - lo)
                           * 255).astype(np.uint8)
            else:
                img = img.astype(np.uint8)
        return img, r.transform, r.crs
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"))
    return img, None, None


def save_sr_output(
    rgb: np.ndarray,
    output_path: Path,
    transform: Optional[Affine],
    crs: Optional[CRS],
    scale: int,
    also_png: bool = True,
) -> Path:
    """GeoTIFF (rescaled Affine) when georeferenced, else PNG; plus the
    unconditional PNG twin the reference writes (``wow_sr.py:161-164``)."""
    from PIL import Image

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    if transform is not None:
        out_tif = output_path.with_suffix(".tif")
        write_geotiff(
            GeoTiff(rgb, transform=transform.rescaled(scale), crs=crs),
            out_tif,
        )
        final = out_tif
    else:
        final = output_path.with_suffix(".png")
        Image.fromarray(rgb).save(final)
    if also_png:
        png = output_path.with_suffix(".png")
        if not png.exists() or final.suffix != ".png":
            Image.fromarray(rgb).save(png)
    return final
