"""Multiband (B04/B08/SCL) fetch + stack for NDVI vector extraction.

Capability parity with ``server/app/fetch_multiband.py:89-193``: STAC
search, per-band download, NIR/SCL reprojection onto the red-band grid,
3-band uint16 stack written as GeoTIFF in EPSG:4326. The band warps use
the in-process device warp instead of rasterio reproject. Offline mode
produces the deterministic synthetic multiband fixture.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..config import get_settings
from ..geo import Affine, CRS, GeoTiff, write_geotiff
from ..geo.warp import control_grid, warp_bilinear_batch
from ..utils import ensure_directory, setup_logging, write_json
from .client import EARTH_SEARCH, Scene, _aoi_bounds
from .synthetic import synthetic_multiband

logger = setup_logging("s2sr_tpu.fetch_multiband")


@dataclass
class FetchConfig:
    max_age_days: int = 30
    max_cloud_pct: float = 30.0
    out_size: int = 1024
    collections: tuple = ("sentinel-2-l2a",)


def _stac_search(aoi_geometry: dict, config: FetchConfig) -> Optional[Scene]:
    import requests

    end = datetime.now(timezone.utc).replace(tzinfo=None)
    start = end - timedelta(days=config.max_age_days)
    payload = {
        "collections": list(config.collections),
        "intersects": aoi_geometry,
        "datetime": (f"{start:%Y-%m-%d}T00:00:00Z/"
                     f"{end:%Y-%m-%d}T23:59:59Z"),
        "query": {"eo:cloud_cover": {"lte": config.max_cloud_pct}},
        "limit": 5,
        "sortby": [{"field": "properties.eo:cloud_cover", "direction": "asc"}],
    }
    response = requests.post(EARTH_SEARCH, json=payload, timeout=30)
    response.raise_for_status()
    features = response.json().get("features", [])
    return Scene.from_stac_feature(features[0]) if features else None


def _warp_band_to_grid(band: GeoTiff, dst_transform: Affine,
                       dst_crs: CRS, size: int,
                       categorical: bool = False) -> np.ndarray:
    """Warp one band onto the output grid (the reprojection of NIR/SCL
    onto the red grid, ``fetch_multiband.py:125-153``). ``categorical``
    selects nearest-neighbour (SCL class codes must never interpolate —
    the reference uses Resampling.nearest there, ``:152``)."""
    import jax.numpy as jnp

    from ..geo.warp import warp_nearest_batch

    ctrl = control_grid(dst_transform, dst_crs, band.transform,
                        band.crs or dst_crs, size, size)
    src = jnp.asarray(band.data[:, :, :1].astype(np.float32))
    warp = warp_nearest_batch if categorical else warp_bilinear_batch
    out, _ = warp(src, jnp.asarray(ctrl)[None], size, size)
    return np.asarray(out[0, :, :, 0])


def fetch_and_stack_multiband(
    aoi_geometry: dict,
    output_dir: Path | str,
    config: Optional[FetchConfig] = None,
) -> Tuple[Path, dict]:
    """B04/B08/SCL → single 3-band uint16 GeoTIFF in EPSG:4326."""
    settings = get_settings()
    config = config or FetchConfig()
    output_dir = ensure_directory(output_dir)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    out_path = Path(output_dir) / f"{ts}_multiband.tif"

    w, s, e, n = _aoi_bounds(aoi_geometry)
    dst_transform = Affine.from_bounds(w, s, e, n,
                                       config.out_size, config.out_size)

    if settings.offline:
        logger.info("offline: synthesizing multiband fixture")
        raster = synthetic_multiband(size=(config.out_size, config.out_size),
                                     bounds=(w, s, e, n))
        write_geotiff(raster, out_path)
        metadata = {
            "scene_id": "synthetic_multiband",
            "bands": ["B04", "B08", "SCL"],
            "source": "synthetic_fallback",
            "file_path": str(out_path),
        }
        write_json(metadata, out_path.with_suffix(".json"))
        return out_path, metadata

    from .client import PublicSentinel2Client

    scene = _stac_search(aoi_geometry, config)
    if scene is None:
        raise RuntimeError("no scenes found for multiband fetch")
    client = PublicSentinel2Client(settings)

    bands = {}
    for key in ("red", "nir", "scl"):
        href = scene.assets.get(key, {}).get("href")
        if not href:
            raise RuntimeError(f"scene {scene.scene_id} missing asset {key}")
        bands[key] = client._download_asset(href, aoi_geometry)

    size = config.out_size
    red = _warp_band_to_grid(bands["red"], dst_transform, CRS(4326), size)
    nir = _warp_band_to_grid(bands["nir"], dst_transform, CRS(4326), size)
    scl = _warp_band_to_grid(bands["scl"], dst_transform, CRS(4326), size,
                             categorical=True)
    stack = np.stack([
        np.clip(red, 0, 65535), np.clip(nir, 0, 65535),
        np.clip(scl, 0, 255),
    ], axis=-1).astype(np.uint16)
    write_geotiff(GeoTiff(stack, transform=dst_transform, crs=CRS(4326)),
                  out_path)
    metadata = {
        "scene_id": scene.scene_id,
        "acquisition_date": scene.acquisition_date.isoformat(),
        "cloud_cover_pct": scene.cloud_cover,
        "bands": ["B04", "B08", "SCL"],
        "source": "aws_earth_search",
        "file_path": str(out_path),
    }
    write_json(metadata, out_path.with_suffix(".json"))
    return out_path, metadata
