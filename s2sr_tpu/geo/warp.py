"""Device-side raster reprojection (replaces ``gdalwarp`` subprocess).

The reference shells out to GDAL for every reprojection
(``server/app/tiling.py:100-135``). Here warping is an inverse-mapping
bilinear gather that runs on device, with the exact projection math
evaluated on a coarse **control grid** on host (float64) and bilinearly
densified on device — the same approximation strategy GDAL's transformer
uses (its default error threshold is 0.125 px; a 17×17 grid per 256-px
tile keeps error ~100× below that for Mercator/UTM geometry).

Pixels sampled outside the source get alpha 0 (→ transparent in tiles,
nodata in rasters).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .affine import Affine
from .crs import CRS, transform_bounds, transform_points
from .geotiff import GeoTiff


def control_grid(
    dst_transform: Affine,
    dst_crs: CRS,
    src_transform: Affine,
    src_crs: CRS,
    dst_h: int,
    dst_w: int,
    grid: int = 17,
) -> np.ndarray:
    """(grid, grid, 2) source pixel coords (col, row) for control points
    spanning the destination window edges (positions 0..dst_w in
    continuous pixel space)."""
    us = np.linspace(0.0, dst_w, grid)
    vs = np.linspace(0.0, dst_h, grid)
    uu, vv = np.meshgrid(us, vs)
    dx, dy = dst_transform * (uu.ravel(), vv.ravel())
    sx, sy = transform_points(dst_crs, src_crs, dx, dy)
    inv = ~src_transform
    col, row = inv * (sx, sy)
    out = np.stack([np.asarray(col), np.asarray(row)], axis=-1)
    return out.reshape(grid, grid, 2).astype(np.float32)


def _densify_ctrl(ctrl: jnp.ndarray, out_h: int, out_w: int,
                  h: int, w: int):
    """Bilinearly densify a (B, G, G, 2) control grid to per-pixel
    source coords → (col, row, valid), each (B, out_h, out_w). Shared
    by the bilinear and lanczos kernels so the centre-alignment and
    coverage conventions cannot diverge."""
    g = ctrl.shape[1]
    py = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h * (g - 1)
    px = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w * (g - 1)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, g - 2)
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, g - 2)
    fy = (py - y0)[None, :, None, None]          # (1, out_h, 1, 1)
    fx = (px - x0)[None, None, :, None]          # (1, 1, out_w, 1)

    c00 = ctrl[:, y0][:, :, x0]                  # (B, out_h, out_w, 2)
    c01 = ctrl[:, y0][:, :, x0 + 1]
    c10 = ctrl[:, y0 + 1][:, :, x0]
    c11 = ctrl[:, y0 + 1][:, :, x0 + 1]
    coords = (c00 * (1 - fy) * (1 - fx) + c01 * (1 - fy) * fx
              + c10 * fy * (1 - fx) + c11 * fy * fx)
    col, row = coords[..., 0] - 0.5, coords[..., 1] - 0.5  # centre-aligned
    valid = ((col > -1.0) & (col < w) & (row > -1.0) & (row < h))
    return col, row, valid


@partial(jax.jit, static_argnums=(2, 3))
def warp_bilinear_batch(
    src: jnp.ndarray,        # (H, W, C) float32
    ctrl: jnp.ndarray,       # (B, G, G, 2) source (col, row) at controls
    out_h: int,
    out_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp a batch of destination windows. Returns (rgb, alpha):
    (B, out_h, out_w, C) float32 and (B, out_h, out_w) float32 in {0,1}."""
    h, w, c = src.shape
    col, row, valid = _densify_ctrl(ctrl, out_h, out_w, h, w)

    ci = jnp.clip(jnp.floor(col), 0, w - 1)
    ri = jnp.clip(jnp.floor(row), 0, h - 1)
    fc = jnp.clip(col - ci, 0.0, 1.0)[..., None]
    fr = jnp.clip(row - ri, 0.0, 1.0)[..., None]
    ci = ci.astype(jnp.int32)
    ri = ri.astype(jnp.int32)
    ci1 = jnp.minimum(ci + 1, w - 1)
    ri1 = jnp.minimum(ri + 1, h - 1)

    def gather(rr, cc):
        return src[rr, cc]                        # advanced indexing gather

    p00 = gather(ri, ci)
    p01 = gather(ri, ci1)
    p10 = gather(ri1, ci)
    p11 = gather(ri1, ci1)
    rgb = (p00 * (1 - fr) * (1 - fc) + p01 * (1 - fr) * fc
           + p10 * fr * (1 - fc) + p11 * fr * fc)
    return rgb, valid.astype(jnp.float32)


@partial(jax.jit, static_argnums=(2, 3))
def warp_nearest_batch(
    src: jnp.ndarray,        # (H, W, C) float32
    ctrl: jnp.ndarray,       # (B, G, G, 2) source (col, row) at controls
    out_h: int,
    out_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-neighbour variant of :func:`warp_bilinear_batch` for
    CATEGORICAL rasters (SCL class codes): interpolating class codes
    invents classes at boundaries (rasterio uses Resampling.nearest for
    SCL too, ``fetch_multiband.py:152``)."""
    h, w, _ = src.shape
    col, row, valid = _densify_ctrl(ctrl, out_h, out_w, h, w)
    ci = jnp.clip(jnp.round(col), 0, w - 1).astype(jnp.int32)
    ri = jnp.clip(jnp.round(row), 0, h - 1).astype(jnp.int32)
    return src[ri, ci], valid.astype(jnp.float32)


def _mercator_bounds(raster: GeoTiff) -> Tuple[float, float, float, float]:
    w, s, e, n = raster.bounds
    assert raster.crs is not None
    return transform_bounds(raster.crs, CRS(3857), w, s, e, n)


def default_mercator_resolution(raster: GeoTiff) -> float:
    """Destination pixel size (m) preserving the source pixel count along x,
    the same heuristic gdalwarp uses by default."""
    mw, ms, me, mn = _mercator_bounds(raster)
    return (me - mw) / raster.width


def warp_to_mercator(
    raster: GeoTiff,
    resolution: Optional[float] = None,
    block_rows: int = 1024,
    grid_step: int = 64,
    method: str = "bilinear",
) -> GeoTiff:
    """Reproject a raster to EPSG:3857 (the ``reproject_to_web_mercator``
    equivalent, ``server/app/tiling.py:100-135``). Adds an alpha band when
    warping introduces empty corners or the source carries nodata
    (gdalwarp honors source nodata the same way)."""
    assert raster.crs is not None, "raster must be georeferenced"
    if raster.crs.epsg == 3857:
        return raster
    mw, ms, me, mn = _mercator_bounds(raster)
    if resolution is None:
        resolution = (me - mw) / raster.width
    out_w = max(int(round((me - mw) / resolution)), 1)
    out_h = max(int(round((mn - ms) / resolution)), 1)
    dst_transform = Affine.from_origin(mw, mn, resolution, resolution)

    src_np = raster.data.astype(np.float32)
    if raster.nodata is not None:
        # weighted warp: nodata taps get weight 0 so they neither smear
        # into valid pixels nor count as coverage. A pixel is nodata
        # only when ALL bands equal the value (gdalwarp's default
        # UNIFIED_SRC_NODATA, and tiles/pyramid._rgba_source's rule) —
        # ANY-band matching would punch holes through valid dark pixels
        # like (0,128,77) on a nodata=0 collar
        mask = ~(raster.data == raster.nodata).all(axis=-1, keepdims=True)
        src_np = np.concatenate(
            [src_np * mask, mask.astype(np.float32)], axis=-1)
    src = jnp.asarray(src_np)
    rows_out = []
    alpha_out = []
    for y0 in range(0, out_h, block_rows):
        bh = min(block_rows, out_h - y0)
        block_transform = dst_transform * Affine.translation(0, y0)
        g = max(2, min(33, bh // grid_step + 2))
        gw = max(2, min(33, out_w // grid_step + 2))
        gg = max(g, gw)
        ctrl = control_grid(block_transform, CRS(3857), raster.transform,
                            raster.crs, bh, out_w, grid=gg)
        warp_fn = (warp_nearest_batch if method in ("near", "nearest")
                   else warp_bilinear_batch)
        rgb, alpha = warp_fn(src, jnp.asarray(ctrl)[None], bh, out_w)
        rows_out.append(np.asarray(rgb[0]))
        alpha_out.append(np.asarray(alpha[0]))
    data = np.concatenate(rows_out, axis=0)
    alpha = np.concatenate(alpha_out, axis=0)
    if raster.nodata is not None:
        cov = data[..., -1]
        data = data[..., :-1] / np.maximum(cov[..., None], 1e-6)
        alpha = alpha * (cov > 0.5)

    # quantise to the SOURCE dtype's range — uint16 reflectance and
    # float rasters must survive the round trip, not be clamped to 255
    dt = raster.data.dtype
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        out = np.clip(np.round(data), info.min, info.max).astype(dt)
        alpha_full = info.max
    else:
        out = data.astype(dt)
        alpha_full = 1.0
    if (alpha < 0.5).any():
        out = np.concatenate(
            [out, (alpha[..., None] * alpha_full).astype(dt)], axis=-1)
    return GeoTiff(out, transform=dst_transform, crs=CRS(3857),
                   nodata=raster.nodata)


@partial(jax.jit, static_argnums=(2, 3))
def warp_lanczos_batch(
    src: jnp.ndarray,        # (H, W, C) float32
    ctrl: jnp.ndarray,       # (B, G, G, 2) source (col, row) at controls
    out_h: int,
    out_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lanczos-3 (6×6 tap) variant of :func:`warp_bilinear_batch` — the
    high-zoom resampling the reference requests from gdal2tiles for
    z18–20 tiles (``server/app/esrgan_tiles.py:138``). Separable
    windowed-sinc weights, edge-replicated taps, alpha from source
    coverage like the bilinear path."""
    h, w, c = src.shape
    col, row, valid = _densify_ctrl(ctrl, out_h, out_w, h, w)

    def lanczos3(x):
        ax = jnp.abs(x)
        pix = jnp.pi * x
        val = jnp.where(
            ax < 1e-6, 1.0,
            3.0 * jnp.sin(pix) * jnp.sin(pix / 3.0)
            / jnp.maximum(pix * pix, 1e-12))
        return jnp.where(ax < 3.0, val, 0.0)

    ci = jnp.floor(col).astype(jnp.int32)
    ri = jnp.floor(row).astype(jnp.int32)
    acc = jnp.zeros(col.shape + (c,), jnp.float32)
    wsum = jnp.zeros(col.shape + (1,), jnp.float32)
    for dy in range(-2, 4):
        ty = ri + dy
        wy = lanczos3(row - ty.astype(jnp.float32))[..., None]
        tyc = jnp.clip(ty, 0, h - 1)
        for dx in range(-2, 4):
            tx = ci + dx
            wx = lanczos3(col - tx.astype(jnp.float32))[..., None]
            txc = jnp.clip(tx, 0, w - 1)
            weight = wy * wx
            acc = acc + weight * src[tyc, txc]
            wsum = wsum + weight
    out = acc / jnp.maximum(wsum, 1e-12)
    return out, valid.astype(jnp.float32)
