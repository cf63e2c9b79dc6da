"""Vector extraction v2: real-NDVI gradient watershed + zones + roads.

Behaviour-compatible with ``server/app/vector_extraction_v2.py``:
:class:`ExtractionConfigV2` (same fields/defaults, ``:57-98``), NDVI
from B04/B08 with SCL classes 4–7 valid (``:269-271``), VARI+ExG RGB
fallback blended 0.6/0.4 (``:331``), Sobel-gradient watershed with
maximum-filter seeds (``:371-391``), min-region pruning (``:415-420``),
per-field NDVI statistics (``:550-604``), confidence v2 (``:607-642``),
k-means management zones (``:650-711``), OSM road clipping
(``:433-542``), and the ≥8 MPix ×4 downsampling guard (``:790-808``).

TPU-native: NDVI/gradient/watershed run on device; k-means is the
jit-compiled Lloyd's in :func:`s2sr_tpu.vectors.ops.kmeans_1d`; road
clipping is performed by rasterising buffered road lines and carving
them from the label raster *before* polygonisation (equivalent result
to the reference's post-hoc polygon differencing, no GEOS needed).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial
from datetime import datetime, timezone
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_settings
from ..geo import Affine, GeoTiff, read_geotiff
from ..utils import ensure_directory, setup_logging, write_json
from . import ops
from .extraction import crop_raster_to_aoi, load_aoi_geojson
from .geometry import Polygon, mask_to_polygons, rasterize_polygon

logger = setup_logging("s2sr_tpu.vector_extraction_v2")


@dataclass
class ExtractionConfigV2:
    red_band_idx: int = 1
    nir_band_idx: int = 2
    ndvi_veg_threshold: float = 0.2
    gaussian_sigma: float = 1.5
    gradient_threshold: float = 0.05
    watershed_compactness: float = 0.01
    morph_kernel_size: int = 3
    min_region_pixels: int = 100
    min_area_ha: float = 0.5
    max_area_ha: float = 500.0
    simplify_tolerance_m: float = 3.0
    use_osm_roads: bool = True
    road_buffer_m: float = 5.0
    generate_zones: bool = True
    num_zones: int = 3
    use_composite: bool = False
    composite_dates: int = 5
    max_pixels_for_full_res: int = 8_000_000
    downsample_factor: int = 4


def compute_ndvi_from_bands(
    raster: GeoTiff, red_band: int = 1, nir_band: int = 2,
    scl_band: Optional[int] = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    red = raster.band(red_band).astype(np.float32)
    nir = raster.band(nir_band).astype(np.float32)
    if scl_band and raster.count >= scl_band:
        scl = raster.band(scl_band).astype(np.int32)
        valid = np.isin(scl, [4, 5, 6, 7])
    else:
        valid = (red > 0) & (nir > 0)
    denominator = nir + red
    ndvi = np.divide(nir - red, denominator,
                     out=np.zeros_like(red), where=denominator > 0)
    return np.clip(ndvi, -1, 1), valid


def compute_ndvi_from_rgb(raster: GeoTiff) -> Tuple[np.ndarray, np.ndarray]:
    """VARI + ExG blend (``:291-343``)."""
    if raster.count < 3:
        raise ValueError("Need at least 3 bands for RGB")
    r = raster.band(1).astype(np.float32)
    g = raster.band(2).astype(np.float32)
    b = raster.band(3).astype(np.float32)
    if r.max() > 1:
        r, g, b = r / 255.0, g / 255.0, b / 255.0
    denom = g + r - b
    denom = np.where(np.abs(denom) > 0.01, denom, 0.01)
    vari = (g - r) / denom
    total = np.maximum(r + g + b, 0.01)
    exg = 2 * g / total - r / total - b / total
    veg = 0.6 * np.clip(vari, -1, 1) + 0.4 * np.clip(exg * 2, -1, 1)
    brightness = (r + g + b) / 3
    valid = (brightness > 0.05) & (brightness < 0.95)
    return np.clip(veg, -1, 1).astype(np.float32), valid


@partial(jax.jit, static_argnums=(2, 3))
def _segment_gradient_device(ndvi_dev, valid_dev, sigma, grad_thresh):
    # ONE traced chain: the eager glue between the jitted ops used to
    # cost a relay round-trip per operator (the r3 vector-extraction
    # lesson — BENCH_NOTES "37×")
    smooth = ops.gaussian_filter(ndvi_dev, sigma)
    gradient = ops.sobel_gradient(smooth)
    interior = (gradient < grad_thresh) & valid_dev
    dist = ops.distance_transform(interior.astype(jnp.uint8))
    local_max = (dist == ops.maximum_filter(dist, 20)) & (dist > 5)
    markers = ops.connected_components(local_max.astype(jnp.uint8))
    # Reference background marker (:398): every invalid pixel seeds a
    # sentinel label and the flood runs over the WHOLE frame, so valid
    # pixels whose lowest-gradient path leads to cloud/invalid areas
    # lose to the background competitor (then zeroed, :412) instead of
    # being claimed by the nearest field.
    h, w = ndvi_dev.shape
    bg = jnp.int32(h * w + 2)  # > any CC label; ties resolve against it
    markers = jnp.where(valid_dev, markers.astype(jnp.int32), bg)
    labels = ops.watershed_gradient(markers, gradient,
                                    jnp.ones((h, w), jnp.uint8))
    labels = jnp.where(labels == bg, 0, labels)
    return labels, gradient


@partial(jax.jit, static_argnums=(1,))
def _grow_road_mask(mask_u8, buffer_px):
    kernel = np.ones((3, 3), np.uint8)
    grown = mask_u8
    for _ in range(buffer_px):
        grown = ops._dilate_once(grown, kernel)
    return grown


def segment_by_gradient(
    ndvi: np.ndarray, valid_mask: np.ndarray, config: ExtractionConfigV2
) -> Tuple[np.ndarray, np.ndarray]:
    """Gradient watershed (``:351-425``). Returns (labels, gradient)."""
    labels, gradient = _segment_gradient_device(
        jnp.asarray(ndvi), jnp.asarray(valid_mask),
        float(config.gaussian_sigma), float(config.gradient_threshold))
    host = ops.renumber_labels(np.asarray(labels))

    # prune small regions (:415-420) — vectorized: a per-label scan is
    # O(labels·pixels), minutes of host time on big rasters
    sizes = np.bincount(host.ravel())
    kill = sizes < config.min_region_pixels
    kill[0] = False
    host[kill[host]] = 0
    host = ops.renumber_labels(host)
    logger.info("Segmented %d field regions", host.max())
    return host, np.asarray(gradient)


# --- OSM roads ---------------------------------------------------------

def fetch_osm_roads(bounds_4326: Tuple[float, float, float, float],
                    timeout_s: int = 30) -> List[np.ndarray]:
    """Overpass highway query (``:433-482``); [] offline or on failure."""
    settings = get_settings()
    if settings.offline:
        logger.info("offline: skipping OSM road fetch")
        return []
    import requests

    w, s, e, n = bounds_4326
    query = (
        "[out:json][timeout:25];"
        f"way[highway]({s},{w},{n},{e});"
        "out geom;"
    )
    try:
        resp = requests.post("https://overpass-api.de/api/interpreter",
                             data={"data": query}, timeout=timeout_s)
        resp.raise_for_status()
        elements = resp.json().get("elements", [])
    except Exception as exc:
        logger.warning("OSM fetch failed: %s", exc)
        return []
    roads = []
    for el in elements:
        geom = el.get("geometry") or []
        if len(geom) >= 2:
            roads.append(np.asarray([[p["lon"], p["lat"]] for p in geom]))
    logger.info("Fetched %d OSM road segments", len(roads))
    return roads


def carve_roads_from_labels(
    labels: np.ndarray, roads: List[np.ndarray], transform: Affine,
    road_buffer_m: float,
) -> np.ndarray:
    """Burn buffered road lines as background into the label raster —
    the pre-polygonisation equivalent of the reference's polygon
    differencing (``:485-542``)."""
    if not roads:
        return labels
    h, w = labels.shape
    inv = ~transform
    # The reference differences polygons with the road LINE buffered by
    # buffer_m — a corridor 2·buffer_m wide (buffer_deg = m/111000,
    # ``:498-502``). The rasterized line below is already one pixel
    # (~pixel_m) wide, so dilate by the REMAINING radius: at the
    # default 5 m buffer on ~10 m pixels the corridor is the bare line
    # (total ≈ 10 m, exactly the reference's 2×5 m), while a 20 m
    # buffer on the same grid grows the line by 1-2 px per side.
    corridor_px = max(
        int(round(2 * road_buffer_m / 111000 / abs(transform.a))), 1)
    grow_px = (corridor_px - 1) // 2
    road_mask = np.zeros((h, w), bool)
    for line in roads:
        col, row = inv * (line[:, 0], line[:, 1])
        col = np.asarray(col)
        row = np.asarray(row)
        for i in range(len(col) - 1):
            steps = int(max(abs(col[i + 1] - col[i]),
                            abs(row[i + 1] - row[i]), 1)) + 1
            cs = np.linspace(col[i], col[i + 1], steps).astype(int)
            rs = np.linspace(row[i], row[i + 1], steps).astype(int)
            ok = (cs >= 0) & (cs < w) & (rs >= 0) & (rs < h)
            road_mask[rs[ok], cs[ok]] = True
    if grow_px >= 1:
        road_mask = np.asarray(
            _grow_road_mask(jnp.asarray(road_mask.astype(np.uint8)),
                            int(grow_px))) > 0
    out = labels.copy()
    out[road_mask] = 0
    return out


# --- statistics / confidence / zones -----------------------------------

def _poly_window(poly: Polygon, transform: Affine,
                 shape: Tuple[int, int], margin: int = 3):
    """Pixel bounding window of a world-space polygon.

    Per-field stats/zones rasterized over the FULL raster made the
    feature loop O(features × pixels) — 63% of the full-res wall time
    in the r5 profile (16.8 MPix × 558 fields). Returns a local
    inverse transform (world → window-relative pixel), the (y0, x0)
    offset, and the window shape; margin covers the 2-px boundary
    dilation."""
    exterior = np.asarray(poly.to_geojson()["coordinates"][0], np.float64)
    inv = ~transform
    col, row = inv * (exterior[:, 0], exterior[:, 1])
    h, w = shape
    x0 = max(int(np.floor(np.min(col))) - margin, 0)
    y0 = max(int(np.floor(np.min(row))) - margin, 0)
    x1 = min(int(np.ceil(np.max(col))) + margin, w)
    y1 = min(int(np.ceil(np.max(row))) + margin, h)
    if x1 <= x0 or y1 <= y0:
        return None
    local_inv = Affine.translation(-x0, -y0) * inv
    return local_inv, (y0, x0), (y1 - y0, x1 - x0)


def compute_field_statistics(
    poly: Polygon, ndvi: np.ndarray, gradient: np.ndarray,
    transform: Affine,
) -> dict:
    win = _poly_window(poly, transform, ndvi.shape)
    if win is None:
        return {}
    local_inv, (y0, x0), (bh, bw) = win
    ndvi = ndvi[y0:y0 + bh, x0:x0 + bw]
    gradient = gradient[y0:y0 + bh, x0:x0 + bw]
    mask = rasterize_polygon(poly.to_geojson()["coordinates"],
                             (bh, bw), local_inv)
    values = ndvi[mask]
    if len(values) == 0:
        return {}
    p10, p90 = np.percentile(values, [10, 90])
    stats = {
        "mean_ndvi": float(np.mean(values)),
        "ndvi_std": float(np.std(values)),
        "p10_ndvi": float(p10),
        "p90_ndvi": float(p90),
        "ndvi_range": float(p90 - p10),
    }
    # ndimage.binary_dilation(mask, iterations=2) & ~mask (:589) — the
    # default scipy structure is the 4-connected cross; a close() here
    # would be ~identity and zero the edge term for convex fields
    grown = mask.copy()
    for _ in range(2):
        d = grown.copy()
        d[1:, :] |= grown[:-1, :]
        d[:-1, :] |= grown[1:, :]
        d[:, 1:] |= grown[:, :-1]
        d[:, :-1] |= grown[:, 1:]
        grown = d
    boundary = grown & ~mask
    stats["edge_strength"] = (float(np.mean(gradient[boundary]))
                              if boundary.any() else 0.0)
    perimeter = poly.length
    stats["compactness"] = (float(4 * np.pi * poly.area / perimeter**2)
                            if perimeter > 0 else 0.0)
    return stats


def compute_confidence_v2(stats: dict, source: str) -> float:
    score = 0.5
    score += min(stats.get("edge_strength", 0) * 2, 0.2)
    score += stats.get("compactness", 0) * 0.15
    ndvi_std = stats.get("ndvi_std", 0.5)
    if ndvi_std < 0.1:
        score += 0.15
    elif ndvi_std < 0.2:
        score += 0.1
    elif ndvi_std < 0.3:
        score += 0.05
    if source == "ndvi_bands":
        score += 0.1
    return round(min(max(score, 0.1), 1.0), 2)


def generate_management_zones(
    poly: Polygon, ndvi: np.ndarray, transform: Affine, num_zones: int = 3
) -> List[dict]:
    win = _poly_window(poly, transform, ndvi.shape)
    if win is None:
        return []
    local_inv, (y0, x0), (bh, bw) = win
    ndvi = ndvi[y0:y0 + bh, x0:x0 + bw]
    mask = rasterize_polygon(poly.to_geojson()["coordinates"],
                             (bh, bw), local_inv)
    rows, cols = np.where(mask)
    if len(rows) < num_zones * 10:
        return []
    values = ndvi[mask]
    labels = np.asarray(ops.kmeans_1d(jnp.asarray(values), num_zones))
    zone_raster = np.zeros_like(ndvi, np.uint8)
    zone_raster[rows, cols] = labels + 1
    zones = []
    for zone_id in range(1, num_zones + 1):
        zone_mask = zone_raster == zone_id
        if not zone_mask.any():
            continue
        zone_values = ndvi[zone_mask]
        for zp in mask_to_polygons(zone_mask):
            if zp.is_empty:
                continue
            world = zp.transform(
                lambda x, y: transform * (x + x0, y + y0))
            zones.append({
                "geometry": world,
                "zone_id": int(zone_id),
                "mean_ndvi": float(np.mean(zone_values)),
                "zone_class": (["low", "medium", "high"][zone_id - 1]
                               if num_zones == 3 else f"zone_{zone_id}"),
            })
    return zones


# --- main pipeline -----------------------------------------------------

def extract_field_polygons_v2(
    aoi_geojson: Path | str,
    raster_path: Path | str,
    out_dir: Path | str,
    config: Optional[ExtractionConfigV2] = None,
) -> dict:
    """Main v2 entry (``:719-1030``)."""
    out_dir = Path(out_dir)
    if config is None:
        config = ExtractionConfigV2()
    aoi_geom = load_aoi_geojson(aoi_geojson)
    raster = read_geotiff(raster_path)

    try:
        working = crop_raster_to_aoi(raster, aoi_geom)
    except Exception as exc:
        logger.warning("Crop failed, using full raster: %s", exc)
        working = raster

    # SCL-stack autodetect (:801-806): 3-band uint16 → stacked B04/B08/SCL
    is_stack = (working.count == 3 and working.data.dtype == np.uint16)
    if is_stack:
        ndvi, valid = compute_ndvi_from_bands(
            working, config.red_band_idx, config.nir_band_idx, 3)
        source = "ndvi_bands"
    else:
        ndvi, valid = compute_ndvi_from_rgb(working)
        source = "rgb_estimated"

    # downsample guard (:790-808)
    transform = working.transform
    factor = 1
    if ndvi.size > config.max_pixels_for_full_res:
        factor = config.downsample_factor
        ndvi = ndvi[::factor, ::factor]
        valid = valid[::factor, ::factor]
        transform = transform * Affine.scale(factor)
        logger.info("Downsampled ×%d for segmentation", factor)

    labels, gradient = segment_by_gradient(ndvi, valid, config)

    roads: List[np.ndarray] = []
    if config.use_osm_roads:
        w, s, e, n = working.bounds
        roads = fetch_osm_roads((w, s, e, n))
        labels = carve_roads_from_labels(labels, roads, transform,
                                         config.road_buffer_m)

    # polygons + stats + cleanup
    min_area_m2 = config.min_area_ha * 10000
    max_area_m2 = config.max_area_ha * 10000
    simplify_tol = config.simplify_tolerance_m / 111000  # v2 uses /111000 (:903), not v1's 1e-5
    features = []
    from .geometry import iter_label_masks

    for label_val, sub, (oy, ox) in iter_label_masks(labels):
        for poly in mask_to_polygons(sub):
            if poly.is_empty:
                continue
            world = poly.transform(
                lambda x, y: transform * (x + ox, y + oy))
            world = world.simplify(simplify_tol)
            area_m2 = world.area * (87000 * 111000)
            if not (min_area_m2 <= area_m2 <= max_area_m2):
                continue
            stats = compute_field_statistics(world, ndvi, gradient, transform)
            features.append({
                "geometry": world,
                "label": int(label_val),
                "area_ha": round(area_m2 / 10000, 2),
                "stats": stats,
            })

    timestamp = datetime.now(timezone.utc).replace(tzinfo=None).isoformat() + "Z"
    geojson_features = []
    all_zones = []
    for i, feat in enumerate(features):
        poly = feat["geometry"]
        stats = feat["stats"]
        confidence = compute_confidence_v2(stats, source)
        feature_id = hashlib.md5(poly.wkt[:100].encode()).hexdigest()[:12]
        props = {
            "id": feature_id,
            "field_index": i + 1,
            "area_ha": feat["area_ha"],
            "source": source,
            "confidence": confidence,
            "created_at": timestamp,
            **{k: round(v, 4) for k, v in stats.items()},
        }
        geojson_features.append({
            "type": "Feature",
            "id": feature_id,
            "properties": props,
            "geometry": poly.to_geojson(),
        })
        if config.generate_zones:
            for zone in generate_management_zones(
                    poly, ndvi, transform, config.num_zones):
                zone_feature = {
                    "type": "Feature",
                    "properties": {
                        "field_id": feature_id,
                        "zone_id": zone["zone_id"],
                        "zone_class": zone["zone_class"],
                        "mean_ndvi": round(zone["mean_ndvi"], 4),
                    },
                    "geometry": zone["geometry"].to_geojson(),
                }
                all_zones.append(zone_feature)

    fields_geojson = {
        "type": "FeatureCollection",
        "properties": {
            "generated_at": timestamp,
            "source_method": source,
            "feature_count": len(geojson_features),
            "version": "2.0",
            "roads_clipped": bool(roads),
        },
        "features": geojson_features,
    }
    ensure_directory(out_dir)
    fields_path = out_dir / "fields.geojson"
    write_json(fields_geojson, fields_path)

    zones_path = None
    if all_zones:
        zones_geojson = {
            "type": "FeatureCollection",
            "properties": {"generated_at": timestamp,
                           "zone_count": len(all_zones)},
            "features": all_zones,
        }
        zones_path = out_dir / "zones.geojson"
        write_json(zones_geojson, zones_path)

    metadata = {
        "status": "completed",
        "version": "2.0",
        "input_raster": str(raster_path),
        "output_geojson": str(fields_path),
        "zones_geojson": str(zones_path) if zones_path else None,
        "feature_count": len(geojson_features),
        "zone_count": len(all_zones),
        "source_method": source,
        "downsample_factor": factor,
        "roads_clipped": len(roads),
        "created_at": timestamp,
    }
    write_json(metadata, out_dir / "extraction_metadata.json")
    logger.info("V2 EXTRACTION COMPLETE: %d fields, %d zones",
                len(geojson_features), len(all_zones))
    return {
        "status": "completed",
        "output_path": str(fields_path),
        "feature_count": len(geojson_features),
        "zone_count": len(all_zones),
        "source_method": source,
        "geojson": fields_geojson,
    }
