"""Foundation tests: affine, CRS math, GeoTIFF codec, fixtures."""

from pathlib import Path
import numpy as np
import pytest

from s2sr_tpu.geo import Affine, CRS, GeoTiff, read_geotiff, transform_bounds, transform_points, write_geotiff
from s2sr_tpu.geo.crs import (
    lonlat_to_mercator,
    lonlat_to_utm,
    mercator_to_lonlat,
    utm_to_lonlat,
)
from s2sr_tpu.fetch.synthetic import synthetic_multiband, synthetic_scene


class TestAffine:
    def test_mul_point(self):
        t = Affine.from_origin(35.0, 32.0, 0.0001, 0.0001)
        x, y = t * (0, 0)
        assert (x, y) == (35.0, 32.0)
        x, y = t * (10, 20)
        assert x == pytest.approx(35.001)
        assert y == pytest.approx(32.0 - 0.002)

    def test_inverse_roundtrip(self):
        t = Affine(0.5, 0.1, 100.0, -0.2, -0.5, 200.0)
        inv = ~t
        x, y = t * (13, 7)
        c, r = inv * (x, y)
        assert c == pytest.approx(13)
        assert r == pytest.approx(7)

    def test_rescaled_matches_reference_semantics(self):
        # x4 SR keeps the origin, shrinks pixel size (wow_sr.py:128-135)
        t = Affine.from_origin(10.0, 20.0, 4.0, 4.0)
        r = t.rescaled(4)
        assert r.a == 1.0 and r.e == -1.0
        assert (r.c, r.f) == (10.0, 20.0)

    def test_from_bounds(self):
        t = Affine.from_bounds(0, 0, 10, 20, 100, 200)
        assert t.bounds(100, 200) == pytest.approx((0, 0, 10, 20))


class TestCRS:
    def test_parse(self):
        assert CRS.from_string("EPSG:3857").epsg == 3857
        assert CRS.from_string(4326).is_geographic
        assert CRS(32636).utm_zone == (36, True)
        assert CRS(32736).utm_zone == (36, False)

    def test_mercator_known_point(self):
        # Null island and a reference point cross-checked against proj
        x, y = lonlat_to_mercator(0.0, 0.0)
        assert float(x) == pytest.approx(0.0, abs=1e-6)
        x, y = lonlat_to_mercator(35.0, 32.0)
        assert float(x) == pytest.approx(3896182.177503, abs=0.01)
        assert float(y) == pytest.approx(3763310.627144, abs=0.01)

    def test_mercator_roundtrip(self):
        lon = np.linspace(-179, 179, 31)
        lat = np.linspace(-84, 84, 31)
        x, y = lonlat_to_mercator(lon, lat)
        lon2, lat2 = mercator_to_lonlat(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_utm_known_points(self):
        # CN Tower, the standard documented UTM example (zone 17N)
        e, n = lonlat_to_utm(-79.387139, 43.642567, 17, True)
        assert float(e) == pytest.approx(630084.3, abs=0.5)
        assert float(n) == pytest.approx(4833438.6, abs=0.5)
        # Central meridian identities: E=500000, N = k0 * meridian arc
        e, n = lonlat_to_utm(33.0, 0.0, 36, True)
        assert float(e) == pytest.approx(500000.0, abs=1e-6)
        assert float(n) == pytest.approx(0.0, abs=1e-6)
        e, n = lonlat_to_utm(33.0, 45.0, 36, True)
        assert float(n) == pytest.approx(4984944.378 * 0.9996, abs=1e-3)

    def test_utm_roundtrip(self):
        lon = np.linspace(30.1, 35.9, 17)
        lat = np.linspace(-40.0, 60.0, 17)
        e, n = lonlat_to_utm(lon, lat, 36, True)
        lon2, lat2 = utm_to_lonlat(e, n, 36, True)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_transform_points_hub(self):
        e, n = lonlat_to_utm(35.0, 32.0, 36, True)
        x, y = transform_points("EPSG:32636", "EPSG:3857", e, n)
        lon, lat = mercator_to_lonlat(x, y)
        assert float(lon) == pytest.approx(35.0, abs=1e-6)
        assert float(lat) == pytest.approx(32.0, abs=1e-6)

    def test_transform_bounds(self):
        b = transform_bounds("EPSG:4326", "EPSG:3857", 35.0, 32.0, 35.05, 32.05)
        assert b[0] < b[2] and b[1] < b[3]
        assert b[0] == pytest.approx(3896182.18, abs=0.5)


class TestGeoTiffCodec:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
    @pytest.mark.parametrize("compress", ["deflate", "none"])
    def test_roundtrip(self, tmp_path, rng, dtype, compress):
        if np.issubdtype(dtype, np.integer):
            data = rng.integers(0, np.iinfo(dtype).max, (37, 53, 3)).astype(dtype)
        else:
            data = rng.random((37, 53, 3)).astype(dtype)
        t = Affine.from_origin(35.0, 32.0, 0.001, 0.001)
        src = GeoTiff(data, transform=t, crs=CRS(4326), nodata=0)
        p = tmp_path / "x.tif"
        write_geotiff(src, p, compress=compress)
        back = read_geotiff(p)
        np.testing.assert_array_equal(back.data, data)
        assert back.crs == CRS(4326)
        assert back.transform.a == pytest.approx(0.001)
        assert back.transform.f == pytest.approx(32.0)
        assert back.nodata == 0

    def test_single_band(self, tmp_path, rng):
        data = rng.integers(0, 255, (64, 64)).astype(np.uint8)
        p = tmp_path / "one.tif"
        write_geotiff(GeoTiff(data, crs=CRS(3857)), p)
        back = read_geotiff(p)
        assert back.count == 1
        np.testing.assert_array_equal(back.data[:, :, 0], data)

    def test_projected_crs_roundtrip(self, tmp_path):
        data = np.zeros((8, 8, 1), np.uint8)
        p = tmp_path / "utm.tif"
        write_geotiff(GeoTiff(data, crs=CRS(32636)), p)
        assert read_geotiff(p).crs == CRS(32636)

    def test_cv2_can_read_our_tiff(self, tmp_path, rng):
        """Cross-codec check: OpenCV's libtiff reads our output bytes."""
        import cv2

        data = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
        p = tmp_path / "interop.tif"
        write_geotiff(GeoTiff(data), p)
        img = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
        assert img is not None
        np.testing.assert_array_equal(img[:, :, ::-1], data)  # cv2 is BGR

    def test_read_cv2_written_tiff(self, tmp_path, rng):
        """And we read libtiff-produced files (external-file path)."""
        import cv2

        data = rng.integers(0, 255, (33, 47, 3)).astype(np.uint8)
        p = tmp_path / "ext.tif"
        cv2.imwrite(str(p), data[:, :, ::-1])
        back = read_geotiff(p)
        np.testing.assert_array_equal(back.data, data)


class TestSynthetic:
    def test_scene_deterministic(self, tmp_path):
        a = synthetic_scene(seed=7, size=(128, 128))
        b = synthetic_scene(seed=7, size=(128, 128))
        np.testing.assert_array_equal(a.data, b.data)
        c = synthetic_scene(seed=8, size=(128, 128))
        assert not np.array_equal(a.data, c.data)

    def test_scene_written_and_georeferenced(self, tmp_path):
        p = tmp_path / "scene.tif"
        synthetic_scene(path=p, size=(96, 96))
        back = read_geotiff(p)
        assert back.data.shape == (96, 96, 3)
        assert back.crs == CRS(4326)
        w, s, e, n = back.bounds
        assert (w, s, e, n) == pytest.approx((35.0, 32.0, 35.05, 32.05))

    def test_multiband_ndvi_contrast(self):
        mb = synthetic_multiband(size=(128, 128))
        red = mb.band(1).astype(np.float32)
        nir = mb.band(2).astype(np.float32)
        ndvi = (nir - red) / (nir + red + 1e-6)
        assert ndvi.max() > 0.5          # vegetated parcels present
        assert ndvi.min() < 0.3          # bare parcels present
        assert (mb.band(3) == 9).any()   # cloud stripe present


class TestCogReader:
    def test_windowed_read_matches_full(self, tmp_path, rng):
        from s2sr_tpu.geo.cog import CogReader

        data = rng.integers(0, 65535, (200, 300, 3)).astype(np.uint16)
        t = Affine.from_origin(35.0, 32.0, 0.001, 0.001)
        p = tmp_path / "cog.tif"
        write_geotiff(GeoTiff(data, transform=t, crs=CRS(4326)), p,
                      rows_per_strip=16)
        r = CogReader(p)
        win = r.read_window(37, 95, 50, 60)
        np.testing.assert_array_equal(win, data[37:87, 95:155])
        # window transform is shifted correctly
        gt = r.window_geotiff(37, 95, 50, 60)
        x, y = gt.transform * (0, 0)
        wx, wy = t * (95, 37)
        assert (x, y) == (wx, wy)
        r.close()

    def test_window_clipped_at_edges(self, tmp_path, rng):
        from s2sr_tpu.geo.cog import CogReader

        data = rng.integers(0, 255, (40, 40, 1)).astype(np.uint8)
        p = tmp_path / "edge.tif"
        write_geotiff(GeoTiff(data), p, rows_per_strip=8)
        r = CogReader(p)
        win = r.read_window(-10, 30, 30, 30)
        # rows -10..0 zero; cols 30..40 data, 40..60 zero
        assert (win[:10] == 0).all()
        np.testing.assert_array_equal(win[10:30, :10], data[0:20, 30:40])
        assert (win[:, 10:] == 0).all()
        r.close()

    def test_http_range_file_against_local(self, tmp_path, rng):
        """Serve a GeoTIFF over a local HTTP server with Range support and
        read a window through HttpRangeFile — verifying the COG path
        fetches only part of the file."""
        import functools
        import threading
        from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

        from s2sr_tpu.geo.cog import CogReader, HttpRangeFile

        data = rng.integers(0, 255, (256, 256, 3)).astype(np.uint8)
        p = tmp_path / "served.tif"
        write_geotiff(GeoTiff(data), p, rows_per_strip=8, compress="none")

        class RangeHandler(SimpleHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def send_head(self):
                # SimpleHTTPRequestHandler lacks Range; implement minimally
                path = Path(self.translate_path(self.path))
                if not path.exists():
                    self.send_error(404)
                    return None
                blob = path.read_bytes()
                rng_header = self.headers.get("Range")
                if rng_header:
                    span = rng_header.split("=")[1]
                    a, b = span.split("-")
                    start, end = int(a), min(int(b), len(blob) - 1)
                    body = blob[start:end + 1]
                    self.send_response(206)
                    self.send_header("Content-Range",
                                     f"bytes {start}-{end}/{len(blob)}")
                else:
                    body = blob
                    self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                import io as _io

                return _io.BytesIO(body)

        handler = functools.partial(RangeHandler, directory=str(tmp_path))
        server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            url = f"http://127.0.0.1:{port}/served.tif"
            f = HttpRangeFile(url, block_size=8192)
            r = CogReader(f)
            win = r.read_window(100, 50, 32, 64)
            np.testing.assert_array_equal(win, data[100:132, 50:114])
            # fewer bytes than the whole file were fetched
            total = len(f._blocks) * f.block_size
            assert total < p.stat().st_size
        finally:
            server.shutdown()


class TestCodecCompressionVariants:
    @pytest.mark.parametrize("compression", ["tiff_lzw", "packbits", "tiff_deflate"])
    def test_decode_pil_compressed(self, tmp_path, rng, compression):
        """Our strip decoders vs PIL/libtiff-encoded files."""
        from PIL import Image

        data = rng.integers(0, 255, (90, 130, 3)).astype(np.uint8)
        p = tmp_path / f"{compression}.tif"
        Image.fromarray(data).save(p, compression=compression)
        back = read_geotiff(p)
        np.testing.assert_array_equal(back.data, data)

    def test_decode_pil_lzw_16bit(self, tmp_path, rng):
        from PIL import Image

        data = rng.integers(0, 65535, (64, 48)).astype(np.uint16)
        p = tmp_path / "lzw16.tif"
        Image.fromarray(data).save(p, compression="tiff_lzw")
        back = read_geotiff(p)
        np.testing.assert_array_equal(back.data[:, :, 0], data)


def test_affine_rescaled_scales_all_linear_terms():
    t = Affine(10.0, 1.0, 500.0, -2.0, -10.0, 9000.0)
    r = t.rescaled(4)
    # rescaled == t * scale(1/4): every linear coefficient divides
    assert (r.a, r.b, r.d, r.e) == (2.5, 0.25, -0.5, -2.5)
    assert (r.c, r.f) == (t.c, t.f)
    # a pixel at 4x finer index maps to the same ground point
    assert r * (8.0, 4.0) == t * (2.0, 1.0)


def test_affine_invert_rejects_overflow():
    with pytest.raises(ValueError):
        ~Affine(1e-300, 0.0, 0.0, 0.0, 1e-300, 0.0)
    # tiny-but-legit geographic determinants still invert
    inv = ~Affine(9e-5, 0.0, 35.0, 0.0, -9e-5, 32.0)
    col, row = inv * (35.0 + 9e-5 * 10, 32.0 - 9e-5 * 20)
    assert col == pytest.approx(10.0) and row == pytest.approx(20.0)


def test_write_geotiff_south_up_roundtrip(tmp_path):
    """South-up (e > 0) transforms must survive the write/read cycle
    (ModelPixelScale can't encode them; ModelTransformation can)."""
    data = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    t = Affine(10.0, 0.0, 100.0, 0.0, 10.0, 200.0)   # e > 0: south-up
    write_geotiff(GeoTiff(data, transform=t, crs=CRS(32636)), tmp_path / "s.tif")
    back = read_geotiff(tmp_path / "s.tif")
    assert back.transform.e == pytest.approx(10.0)
    assert back.transform.f == pytest.approx(200.0)
    np.testing.assert_array_equal(back.data, data)


def test_warp_preserves_uint16_and_float(tmp_path):
    """warp_to_mercator must not clamp uint16 reflectance to 255 or
    round floats."""
    from s2sr_tpu.geo.warp import warp_to_mercator

    t = Affine.from_origin(35.0, 32.0, 1e-4, 1e-4)
    u16 = np.full((64, 64, 3), 8000, np.uint16)
    w16 = warp_to_mercator(GeoTiff(u16, transform=t, crs=CRS(4326)))
    interior = w16.data[16:-16, 16:-16, :3]
    assert w16.data.dtype == np.uint16
    assert interior.max() > 7000, "uint16 values clamped"

    f32 = np.full((64, 64, 3), 0.37, np.float32)
    wf = warp_to_mercator(GeoTiff(f32, transform=t, crs=CRS(4326)))
    assert wf.data.dtype == np.float32
    assert abs(float(wf.data[32, 32, 0]) - 0.37) < 1e-3, "floats rounded"


def test_warp_honors_nodata(tmp_path):
    """A nodata collar must neither smear into valid pixels nor read as
    coverage (alpha 0 there), like gdalwarp."""
    from s2sr_tpu.geo.warp import warp_to_mercator

    t = Affine.from_origin(35.0, 32.0, 1e-4, 1e-4)
    data = np.full((64, 64, 3), 200, np.uint8)
    data[:, :16] = 0                          # left nodata collar
    g = GeoTiff(data, transform=t, crs=CRS(4326), nodata=0.0)
    warped = warp_to_mercator(g)
    assert warped.count == 4, "expected an alpha band"
    rgb, alpha = warped.data[..., :3], warped.data[..., 3]
    h, w = alpha.shape
    # collar maps to roughly the left quarter: alpha 0 there
    assert (alpha[:, : w // 8] == 0).all()
    # valid interior keeps full value — no bilinear smear of the collar
    valid = alpha > 0
    assert rgb[..., 0][valid].min() >= 199


def test_cogreader_closes_fd_on_bad_file(tmp_path):
    import os

    from s2sr_tpu.geo.cog import CogReader

    bad = tmp_path / "not_a.tif"
    bad.write_bytes(b"PNG\x00" + b"x" * 64)
    fd_dir = Path("/proc/self/fd")
    before = len(list(fd_dir.iterdir()))
    for _ in range(5):
        with pytest.raises(ValueError):
            CogReader(bad)
    after = len(list(fd_dir.iterdir()))
    assert after <= before + 1          # no fd accumulation


def test_http_range_file_server_ignores_range(monkeypatch):
    """A 200 full-body response must be sliced to the requested span,
    not cached as a block at the wrong offset."""
    from s2sr_tpu.geo import cog as cog_mod

    body = bytes(range(256)) * 40       # 10240 bytes

    class FakeResp:
        status_code = 200
        headers = {}
        content = body

        def raise_for_status(self):
            pass

    class FakeRequests:
        @staticmethod
        def get(url, timeout=None, headers=None):
            return FakeResp()

    import sys as _sys
    monkeypatch.setitem(_sys.modules, "requests", FakeRequests)
    f = cog_mod.HttpRangeFile("http://x/test.tif", block_size=1024)
    f.seek(4096)
    got = f.read(512)
    assert got == body[4096:4608]
    assert f.size() == len(body)


def test_warp_nodata_unified_convention():
    """A pixel is nodata only when ALL bands equal the value (gdalwarp
    UNIFIED_SRC_NODATA) — valid dark pixels like (0,128,77) on a
    nodata=0 raster must stay opaque through warp_to_mercator."""
    from s2sr_tpu.geo.warp import warp_to_mercator

    data = np.full((32, 32, 3), 150, np.uint8)
    data[4:8, 4:8] = [0, 128, 77]       # valid pixel with one zero band
    data[:2, :] = 0                     # true nodata collar (all zero)
    t = Affine.from_origin(35.0, 32.0, 1e-4, 1e-4)
    r = GeoTiff(data, transform=t, crs=CRS(4326), nodata=0.0)
    out = warp_to_mercator(r)
    assert out.count == 4
    alpha = out.band(4)
    h, w = alpha.shape
    # the dark-but-valid region maps to roughly the same fractional
    # position; sample its center
    cy, cx = int(6 / 32 * h), int(6 / 32 * w)
    assert alpha[cy, cx] > 0, "valid dark pixel punched transparent"
    assert (out.data[cy, cx, 1] > 60), "green channel lost"
    # the all-zero collar stays transparent
    assert alpha[0, w // 2] == 0


def test_warp_nearest_method_keeps_classes():
    """method='near' must not invent class codes (categorical rasters)."""
    from s2sr_tpu.geo.warp import warp_to_mercator

    classes = np.array([0, 4, 5, 6], np.uint8)
    rng = np.random.default_rng(3)
    data = classes[rng.integers(0, 4, (40, 40))][..., None].repeat(3, axis=2)
    t = Affine.from_origin(35.0, 32.0, 1e-4, 1e-4)
    r = GeoTiff(data, transform=t, crs=CRS(4326))
    out = warp_to_mercator(r, method="near")
    vals = np.unique(out.data[..., 0])
    assert set(vals.tolist()) <= set(classes.tolist()), vals
