"""Vector module tests: ops vs scipy/cv2 oracles, geometry, end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from s2sr_tpu.vectors import ops
from s2sr_tpu.vectors.geometry import (
    Polygon,
    mask_to_polygons,
    rasterize_polygon,
    ring_area,
    simplify_ring,
)


@pytest.fixture
def blob_mask(rng):
    """A mask with two blobs, one containing a hole."""
    m = np.zeros((64, 64), np.uint8)
    m[8:30, 8:30] = 1
    m[14:20, 14:20] = 0      # hole
    m[40:60, 35:58] = 1
    return m


class TestOps:
    def test_gaussian_matches_scipy(self, rng):
        from scipy import ndimage

        x = rng.random((50, 60)).astype(np.float32)
        want = ndimage.gaussian_filter(x, sigma=2.0)
        got = np.asarray(ops.gaussian_filter(jnp.asarray(x), 2.0))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_ellipse_kernel_matches_cv2(self):
        import cv2

        for size in (3, 5, 7, 9):
            want = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
            got = ops.ellipse_kernel(size)
            np.testing.assert_array_equal(got, want)

    def test_morphology_matches_cv2(self, blob_mask):
        import cv2

        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        want_close = cv2.morphologyEx(blob_mask, cv2.MORPH_CLOSE, kernel,
                                      iterations=2)
        got_close = np.asarray(ops.binary_close(jnp.asarray(blob_mask), 5, 2))
        np.testing.assert_array_equal(got_close, want_close)
        want_open = cv2.morphologyEx(blob_mask, cv2.MORPH_OPEN, kernel,
                                     iterations=2)
        got_open = np.asarray(ops.binary_open(jnp.asarray(blob_mask), 5, 2))
        np.testing.assert_array_equal(got_open, want_open)

    def test_fill_holes_matches_scipy(self, blob_mask):
        from scipy.ndimage import binary_fill_holes

        want = binary_fill_holes(blob_mask).astype(np.uint8)
        got = np.asarray(ops.fill_holes(jnp.asarray(blob_mask)))
        np.testing.assert_array_equal(got, want)

    def test_distance_transform_close_to_scipy(self, blob_mask):
        from scipy.ndimage import distance_transform_edt

        want = distance_transform_edt(blob_mask)
        got = np.asarray(ops.distance_transform(jnp.asarray(blob_mask)))
        # JFA is exact except rare voronoi-seam pixels
        assert np.abs(got - want).max() <= 1.0
        assert (np.abs(got - want) < 1e-3).mean() > 0.99

    def test_connected_components_matches_scipy(self, blob_mask):
        from scipy import ndimage

        want, n_want = ndimage.label(blob_mask,
                                     structure=np.ones((3, 3)))
        got = ops.renumber_labels(
            np.asarray(ops.connected_components(jnp.asarray(blob_mask))))
        assert got.max() == n_want
        # same partition (bijective label mapping)
        for lbl in range(1, n_want + 1):
            region = got[want == lbl]
            assert len(np.unique(region)) == 1 and region[0] > 0

    def test_watershed_covers_mask(self, blob_mask):
        dist = np.asarray(ops.distance_transform(jnp.asarray(blob_mask)))
        markers_mask = (dist > 0.5 * dist.max()).astype(np.uint8)
        markers = ops.renumber_labels(np.asarray(
            ops.connected_components(jnp.asarray(markers_mask))))
        labels = np.asarray(ops.watershed_uniform(
            jnp.asarray(markers, jnp.int32), jnp.asarray(blob_mask)))
        assert ((labels > 0) == (blob_mask > 0)).all()
        assert labels.max() == markers.max()


class TestSegmentationOracle:
    """The fixed v1 chain vs a cv2/scipy replay of the reference's
    ``segment_fields`` (vector_extraction.py:304-383), including the
    background-marker watershed whose net output is the distance cores."""

    @staticmethod
    def _reference_segment(mask, sigma=2.0, ksize=5, iters=2):
        import cv2
        from scipy import ndimage
        from scipy.ndimage import binary_fill_holes

        smoothed = ndimage.gaussian_filter(mask, sigma=sigma)
        binary = (smoothed > 0.5).astype(np.uint8)
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
        closed = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel,
                                  iterations=iters)
        opened = cv2.morphologyEx(closed, cv2.MORPH_OPEN, kernel,
                                  iterations=iters)
        filled = binary_fill_holes(opened).astype(np.uint8)
        dist = cv2.distanceTransform(filled, cv2.DIST_L2, 5)
        local_max = (dist > 0.3 * dist.max()).astype(np.uint8)
        _, markers = cv2.connectedComponents(local_max)
        markers = markers + 1
        markers[filled == 0] = 0
        img3 = cv2.cvtColor((filled * 255).astype(np.uint8),
                            cv2.COLOR_GRAY2BGR)
        ws = cv2.watershed(img3, markers.astype(np.int32))
        ws[ws == -1] = 0
        ws[ws == 1] = 0
        return ws

    @pytest.fixture
    def field_mask(self, rng):
        """Several convex-ish fields of distinct sizes, float mask."""
        m = np.zeros((96, 96), np.float32)
        m[8:40, 6:44] = 1
        m[50:90, 10:50] = 1
        m[12:44, 56:92] = 1
        m[60:88, 60:88] = 1
        noise = rng.random((96, 96)) < 0.02
        return np.clip(m + noise, 0, 1).astype(np.float32)

    def test_v1_chain_matches_reference_cores(self, field_mask):
        from s2sr_tpu.vectors.extraction import ExtractionConfig, segment_fields

        want = ops.renumber_labels(self._reference_segment(field_mask))
        got = segment_fields(field_mask, ExtractionConfig())
        # identical region count and per-region agreement (cv2's DIST_L2
        # maskSize=5 is a chamfer approximation of our exact EDT, so the
        # 0.3·max core boundary can differ by ~a pixel)
        assert got.max() == want.max()
        for lbl in range(1, want.max() + 1):
            ours = np.unique(got[want == lbl])
            ours = ours[ours > 0]
            assert len(ours) == 1, f"ref region {lbl} split: {ours}"
            inter = ((want == lbl) & (got == ours[0])).sum()
            union = ((want == lbl) | (got == ours[0])).sum()
            assert inter / union > 0.85, f"region {lbl} IoU {inter/union:.2f}"
        # the watershed's net output is the cores, NOT the filled mask:
        # labelled area must be well below the vegetation area
        assert (got > 0).sum() < 0.8 * (field_mask > 0.5).sum()

    def test_padding_is_inert(self, field_mask):
        """Shape-bucketed run (zero padding + valid_hw) must reproduce
        the unpadded result exactly — padded zeros must inject no EDT
        seeds, no gaussian bleed, no morphology border artifacts."""
        from s2sr_tpu.vectors.extraction import ExtractionConfig, segment_fields

        cfg = ExtractionConfig()
        h, w = field_mask.shape
        want = segment_fields(field_mask, cfg)
        padded = np.zeros((h + 37, w + 61), np.float32)
        padded[:h, :w] = field_mask
        got = segment_fields(padded, cfg, valid_hw=(h, w))[:h, :w]
        # same partition (labels may renumber differently)
        assert (got > 0).sum() == (want > 0).sum()
        for lbl in range(1, want.max() + 1):
            ours = np.unique(got[want == lbl])
            assert len(ours) == 1 and ours[0] > 0
            np.testing.assert_array_equal(got == ours[0], want == lbl)

    def test_fill_holes_diagonal_pinch(self):
        """scipy floods the complement 4-connectedly: a hole sealed only
        diagonally is still a hole."""
        from scipy.ndimage import binary_fill_holes

        m = np.array([[0, 0, 0, 0, 0],
                      [0, 1, 1, 0, 0],
                      [0, 1, 0, 1, 0],
                      [0, 1, 1, 1, 0],
                      [0, 0, 0, 0, 0]], np.uint8)
        want = binary_fill_holes(m).astype(np.uint8)
        got = np.asarray(ops.fill_holes(jnp.asarray(m)))
        np.testing.assert_array_equal(got, want)
        assert got[2, 2] == 1  # the diagonally-sealed hole is filled

    def test_renumber_and_prune_vectorized(self, rng):
        labels = rng.integers(0, 50, (200, 200)).astype(np.int32) * 977
        out = ops.renumber_labels(labels)
        uniq_in = np.unique(labels)
        uniq_out = np.unique(out)
        assert uniq_out.max() == (uniq_in > 0).sum()
        # order-preserving bijection
        for a, b in zip(uniq_in[uniq_in > 0], uniq_out[uniq_out > 0]):
            np.testing.assert_array_equal(labels == a, out == b)


class TestGeometry:
    def test_square_ring(self):
        m = np.zeros((10, 10), bool)
        m[2:6, 3:8] = True
        polys = mask_to_polygons(m)
        assert len(polys) == 1
        assert polys[0].area == pytest.approx(4 * 5)
        assert not polys[0].holes

    def test_hole_detected(self, blob_mask):
        polys = mask_to_polygons(blob_mask == 1)
        polys.sort(key=lambda p: -abs(ring_area(p.exterior)))
        big = polys[0]
        assert len(big.holes) == 1
        assert big.area == pytest.approx(22 * 22 - 6 * 6)

    def test_area_matches_pixel_count_random(self, rng):
        m = rng.random((40, 40)) > 0.7
        from scipy import ndimage

        m = ndimage.binary_closing(m)  # reduce single-pixel noise
        polys = mask_to_polygons(m)
        total = sum(p.area for p in polys)
        assert total == pytest.approx(m.sum())

    def test_simplify_square_stays_square(self):
        ring = np.array([[0, 0], [5, 0], [10, 0], [10, 10],
                         [0, 10], [0, 5], [0, 0]], float)
        out = simplify_ring(ring, 0.1)
        assert len(out) <= len(ring)
        assert abs(ring_area(out)) == pytest.approx(100)

    def test_rasterize_roundtrip(self):
        from s2sr_tpu.geo import Affine

        m = np.zeros((32, 32), bool)
        m[5:20, 8:25] = True
        polys = mask_to_polygons(m)
        coords = polys[0].to_geojson()["coordinates"]
        back = rasterize_polygon(coords, (32, 32), Affine.identity())
        np.testing.assert_array_equal(back, m)

    def test_wkt_format(self):
        p = Polygon(np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float))
        assert p.wkt == "POLYGON ((0 0, 1 0, 1 1, 0 0))"


class TestExtraction:
    def test_end_to_end_rgb_fallback(self, tmp_path):
        from s2sr_tpu.fetch.synthetic import synthetic_scene
        from s2sr_tpu.utils import write_json
        from s2sr_tpu.vectors.extraction import (
            ExtractionConfig, extract_field_polygons)

        scene_path = tmp_path / "scene.tif"
        synthetic_scene(path=scene_path, size=(192, 192))
        aoi = tmp_path / "aoi.geojson"
        write_json({
            "type": "Polygon",
            "coordinates": [[[35.005, 32.005], [35.045, 32.005],
                             [35.045, 32.045], [35.005, 32.045],
                             [35.005, 32.005]]],
        }, aoi)
        # the fixture scene is near-wall-to-wall vegetation by the HSV
        # heuristic → one large region; widen the area window so the
        # smoke test asserts the plumbing, not the palette
        result = extract_field_polygons(
            aoi, [scene_path], tmp_path / "vectors",
            ExtractionConfig(min_area_ha=0.01, max_area_ha=5000.0),
        )
        assert result["status"] == "completed"
        assert result["source_method"] == "rgb_fallback"
        assert result["feature_count"] > 0
        gj = result["geojson"]
        assert gj["type"] == "FeatureCollection"
        f0 = gj["features"][0]
        assert set(f0["properties"]) == {
            "id", "field_index", "area_ha", "source", "confidence",
            "created_at"}
        assert 0.1 <= f0["properties"]["confidence"] <= 1.0
        assert (tmp_path / "vectors" / "fields.geojson").exists()
        assert (tmp_path / "vectors" / "extraction_metadata.json").exists()

    def test_ndvi_path_with_multiband(self, tmp_path):
        from s2sr_tpu.fetch.synthetic import synthetic_multiband
        from s2sr_tpu.geo import GeoTiff, write_geotiff
        from s2sr_tpu.utils import write_json
        from s2sr_tpu.vectors.extraction import (
            ExtractionConfig, extract_field_polygons)
        import numpy as np

        mb = synthetic_multiband(size=(128, 128))
        # build an 8-band stack so the band-4/8 NDVI rule engages
        h, w, _ = mb.data.shape
        stack = np.zeros((h, w, 8), np.uint16)
        stack[..., 3] = mb.band(1)   # band 4 = red
        stack[..., 7] = mb.band(2)   # band 8 = nir
        path = tmp_path / "mb.tif"
        write_geotiff(GeoTiff(stack, transform=mb.transform, crs=mb.crs), path)
        aoi = tmp_path / "aoi.geojson"
        write_json({
            "type": "Polygon",
            "coordinates": [[[35.001, 32.001], [35.049, 32.001],
                             [35.049, 32.049], [35.001, 32.049],
                             [35.001, 32.001]]],
        }, aoi)
        result = extract_field_polygons(
            aoi, [path], tmp_path / "v",
            ExtractionConfig(min_area_ha=0.01, max_area_ha=5000.0))
        assert result["source_method"] == "ndvi"
        assert result["feature_count"] > 0


class TestExtractionV2:
    def test_v2_end_to_end_bands(self, tmp_path):
        from s2sr_tpu.fetch.synthetic import synthetic_multiband
        from s2sr_tpu.utils import read_json, write_json
        from s2sr_tpu.vectors.extraction_v2 import (
            ExtractionConfigV2, extract_field_polygons_v2)

        path = tmp_path / "stack.tif"
        synthetic_multiband(path=path, size=(160, 160))
        aoi = tmp_path / "aoi.geojson"
        write_json({
            "type": "Polygon",
            "coordinates": [[[35.002, 32.002], [35.048, 32.002],
                             [35.048, 32.048], [35.002, 32.048],
                             [35.002, 32.002]]],
        }, aoi)
        cfg = ExtractionConfigV2(min_area_ha=0.05, max_area_ha=5000.0,
                                 min_region_pixels=30, use_osm_roads=False)
        result = extract_field_polygons_v2(aoi, path, tmp_path / "v2", cfg)
        assert result["status"] == "completed"
        assert result["source_method"] == "ndvi_bands"
        assert result["feature_count"] > 0
        gj = read_json(tmp_path / "v2" / "fields.geojson")
        props = gj["features"][0]["properties"]
        # v2 adds per-field NDVI statistics to the schema
        for key in ("mean_ndvi", "ndvi_std", "p10_ndvi", "p90_ndvi",
                    "edge_strength", "compactness", "confidence"):
            assert key in props, key
        # management zones written when fields are large enough
        if result["zone_count"]:
            zones = read_json(tmp_path / "v2" / "zones.geojson")
            z0 = zones["features"][0]["properties"]
            assert set(z0) == {"field_id", "zone_id", "zone_class", "mean_ndvi"}

    def test_v2_rgb_fallback(self, tmp_path):
        from s2sr_tpu.fetch.synthetic import synthetic_scene
        from s2sr_tpu.utils import write_json
        from s2sr_tpu.vectors.extraction_v2 import (
            ExtractionConfigV2, extract_field_polygons_v2)

        path = tmp_path / "rgb.tif"
        synthetic_scene(path=path, size=(160, 160))
        aoi = tmp_path / "aoi.geojson"
        write_json({
            "type": "Polygon",
            "coordinates": [[[35.002, 32.002], [35.048, 32.002],
                             [35.048, 32.048], [35.002, 32.048],
                             [35.002, 32.002]]],
        }, aoi)
        cfg = ExtractionConfigV2(min_area_ha=0.01, max_area_ha=5000.0,
                                 min_region_pixels=20, use_osm_roads=False,
                                 generate_zones=False)
        result = extract_field_polygons_v2(aoi, path, tmp_path / "v2", cfg)
        assert result["source_method"] == "rgb_estimated"

    def test_multiband_fetch_offline(self, tmp_path, monkeypatch):
        from s2sr_tpu.fetch.multiband import FetchConfig, fetch_and_stack_multiband
        from s2sr_tpu.geo import read_geotiff
        import s2sr_tpu.fetch.multiband as mb
        import s2sr_tpu.config.settings as cfg_mod

        aoi = {"type": "Polygon", "coordinates": [[
            [35.0, 32.0], [35.02, 32.0], [35.02, 32.02],
            [35.0, 32.02], [35.0, 32.0]]]}
        path, meta = fetch_and_stack_multiband(
            aoi, tmp_path, FetchConfig(out_size=64))
        assert meta["bands"] == ["B04", "B08", "SCL"]
        r = read_geotiff(path)
        assert r.data.shape == (64, 64, 3)
        assert r.data.dtype == np.uint16


class TestV2Parity:
    def test_background_marker_stops_bleed(self):
        """With an invalid (cloud) region, fields must not flood up to
        the valid-mask boundary: the reference's background marker
        (vector_extraction_v2.py:398) competes for ambiguous pixels."""
        from s2sr_tpu.vectors.extraction_v2 import _segment_gradient_device

        rng = np.random.default_rng(3)
        ndvi = np.full((128, 128), 0.1, np.float32)
        ndvi[30:70, 30:70] = 0.7          # one field plateau
        ndvi += rng.normal(0, 0.01, ndvi.shape).astype(np.float32)
        valid = np.ones((128, 128), bool)
        valid[:, 100:] = False            # cloud strip on the right
        labels, _ = _segment_gradient_device(
            jnp.asarray(ndvi), jnp.asarray(valid), 1.5, 0.05)
        labels = np.asarray(labels)
        # nothing labelled inside the invalid strip
        assert (labels[:, 100:] == 0).all()
        # the flat background near the cloud boundary must belong to the
        # background flood, not be annexed by the field's label
        field_label = np.unique(labels[45:55, 45:55])
        field_label = field_label[field_label > 0]
        assert len(field_label) >= 1
        assert (labels[:, 95:100] != field_label[0]).all()

    def test_edge_strength_nonzero_for_convex_field(self):
        """The boundary is dilation−mask (reference :589); a close()
        would be ~identity and zero the edge term for convex fields."""
        from scipy import ndimage
        from s2sr_tpu.geo import Affine
        from s2sr_tpu.vectors.extraction_v2 import compute_field_statistics
        from s2sr_tpu.vectors.geometry import mask_to_polygons

        ndvi = np.full((64, 64), 0.2, np.float32)
        ndvi[20:44, 20:44] = 0.8
        gx = ndimage.sobel(ndvi, axis=1)
        gy = ndimage.sobel(ndvi, axis=0)
        gradient = np.sqrt(gx**2 + gy**2)
        mask = np.zeros((64, 64), bool)
        mask[20:44, 20:44] = True
        poly = mask_to_polygons(mask)[0]
        stats = compute_field_statistics(
            poly, ndvi, gradient, Affine.identity())
        assert stats["edge_strength"] > 0.1
        # oracle: scipy's own dilation boundary
        boundary = ndimage.binary_dilation(mask, iterations=2) & ~mask
        want = float(np.mean(gradient[boundary]))
        assert stats["edge_strength"] == pytest.approx(want, rel=1e-6)


class TestWatershedQuality:
    def test_gradient_watershed_agrees_with_cv2(self):
        """Quantified agreement with cv2.watershed on a gradient surface
        (SURVEY §7 hard-part #2). One marker per field basin — the
        configuration the v2 pipeline produces after seed pruning. (With
        multiple markers on one flat background plateau cv2's
        equal-priority carve-up is implementation-defined and a single
        marker absorbs the basin; our geodesic split differs there by
        design.)"""
        import cv2
        from scipy import ndimage

        rng = np.random.default_rng(5)
        base = np.zeros((120, 120), np.float32)
        base[10:60, 10:55] = 0.7
        base[65:110, 20:70] = 0.5
        base[15:50, 70:110] = 0.85
        ndvi = ndimage.gaussian_filter(
            base + rng.normal(0, 0.02, base.shape).astype(np.float32), 2.0)
        gx = ndimage.sobel(ndvi, axis=1)
        gy = ndimage.sobel(ndvi, axis=0)
        gradient = np.sqrt(gx**2 + gy**2).astype(np.float32)

        markers = np.zeros((120, 120), np.int32)
        markers[30, 30] = 1      # centre of each plateau
        markers[85, 45] = 2
        markers[30, 90] = 3
        markers[3, 3] = 4        # one background marker

        g_u8 = (gradient / gradient.max() * 255).astype(np.uint8)
        m_cv = markers.copy()
        cv2.watershed(cv2.cvtColor(g_u8, cv2.COLOR_GRAY2BGR), m_cv)
        m_cv[m_cv == -1] = 0

        got = np.asarray(ops.watershed_gradient(
            jnp.asarray(markers), jnp.asarray(gradient),
            jnp.asarray(np.ones((120, 120), np.uint8)), 256))

        both = (m_cv > 0) & (got > 0)
        agree = (m_cv[both] == got[both]).mean()
        assert agree > 0.9, f"watershed agreement {agree:.3f}"
        # per-basin IoU for the three field basins; the weakest ridge
        # (plateau 0.5) shifts its saddle boundary by a few px between
        # the two flood orders — low-information zones later absorbed by
        # simplification/area filters
        for lbl in (1, 2, 3):
            inter = ((m_cv == lbl) & (got == lbl)).sum()
            union = ((m_cv == lbl) | (got == lbl)).sum()
            assert inter / union > 0.7, f"basin {lbl} IoU {inter/union:.2f}"


def test_carve_roads_corridor_scales_with_buffer():
    """Corridor width follows the reference's 2×buffer_m total
    (``:498-502``): 5 m on ~10 m pixels = the bare 1-px line; 30 m
    grows the line by (2·30/10 - 1)//2 = 2 px per side."""
    from s2sr_tpu.geo import Affine
    from s2sr_tpu.vectors.extraction_v2 import carve_roads_from_labels

    labels = np.ones((21, 21), np.int32)
    t = Affine.from_origin(35.0, 32.0, 9e-5, 9e-5)   # ~10 m pixels
    # one horizontal road through the middle row
    y_mid = 32.0 - 10.5 * 9e-5
    road = np.array([[35.0, y_mid], [35.0 + 21 * 9e-5, y_mid]])

    out5 = carve_roads_from_labels(labels, [road], t, road_buffer_m=5.0)
    carved5 = (out5 == 0).sum(axis=0)
    assert carved5.max() == 1          # bare line ≈ 10 m total corridor

    out30 = carve_roads_from_labels(labels, [road], t, road_buffer_m=30.0)
    carved30 = (out30 == 0).sum(axis=0)
    assert carved30.max() == 5         # 1 + 2 px each side ≈ 50 m


def test_crop_raster_to_aoi_multipolygon():
    """MultiPolygon AOIs keep every member polygon (rasterio masks the
    full geometry — the old code dropped all but the first)."""
    from s2sr_tpu.geo import Affine, CRS, GeoTiff
    from s2sr_tpu.vectors.extraction import crop_raster_to_aoi

    data = np.full((40, 40, 3), 99, np.uint8)
    t = Affine.from_origin(35.0, 32.4, 0.01, 0.01)
    r = GeoTiff(data, transform=t, crs=CRS(4326))

    def box(x0, y0, x1, y1):
        return [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]

    aoi = {"type": "MultiPolygon", "coordinates": [
        box(35.02, 32.30, 35.10, 32.38),
        box(35.25, 32.05, 35.35, 32.15),
    ]}
    out = crop_raster_to_aoi(r, aoi)
    # window spans BOTH polygons and both interiors survive the mask
    assert (out.data[3, 3] == 99).all()            # inside polygon 1
    assert (out.data[-9, -9] == 99).all()          # inside polygon 2
    assert (out.data[18, 18] == 0).all()           # between them


def test_green_mask_single_band_raster():
    """A 1-band raster must not crash the HSV fallback — gray is
    replicated to 3 channels like the pipelines' read path."""
    from s2sr_tpu.geo import Affine, CRS, GeoTiff
    from s2sr_tpu.vectors.extraction import (ExtractionConfig,
                                             compute_vegetation_mask)

    data = np.random.default_rng(0).integers(
        0, 255, (16, 16, 1)).astype(np.uint8)
    r = GeoTiff(data, transform=Affine.from_origin(35, 32, 1e-4, 1e-4),
                crs=CRS(4326))
    mask, method = compute_vegetation_mask(r, ExtractionConfig())
    assert mask.shape == (16, 16) and method in ("hsv", "rgb_fallback")


def test_polygon_contains_point_respects_holes():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    p = Polygon(outer, [hole])
    assert p.contains_point(2.0, 2.0)          # in shell, outside hole
    assert not p.contains_point(5.0, 5.0)      # inside the hole
    assert not p.contains_point(11.0, 5.0)     # outside entirely
