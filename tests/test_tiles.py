"""Tile engine tests: mercator math, PNG codec, warp, pyramid."""

import numpy as np
import pytest

import jax.numpy as jnp

from s2sr_tpu.fetch.synthetic import synthetic_scene
from s2sr_tpu.geo import Affine, CRS, GeoTiff, write_geotiff
from s2sr_tpu.geo.crs import lonlat_to_mercator, transform_bounds
from s2sr_tpu.geo.warp import control_grid, warp_bilinear_batch, warp_to_mercator
from s2sr_tpu.tiles import (
    decode_png,
    encode_png,
    get_raster_info,
    mercator_to_tile,
    process_raster_to_tiles,
    resolution,
    tile_bounds,
    tiles_for_bounds,
)
from s2sr_tpu.utils import read_json


class TestMercatorMath:
    def test_world_tile(self):
        w, s, e, n = tile_bounds(0, 0, 0)
        assert w == pytest.approx(-20037508.342789244)
        assert n == pytest.approx(20037508.342789244)
        assert e == pytest.approx(-w) and s == pytest.approx(-n)

    def test_known_tile_address(self):
        # (35.025E, 32.025N) at z12 — verified against the slippy-map formula
        mx, my = lonlat_to_mercator(35.025, 32.025)
        x, y = mercator_to_tile(float(mx), float(my), 12)
        n = 2**12
        import math

        lon, lat = 35.025, 32.025
        want_x = int((lon + 180) / 360 * n)
        lat_rad = math.radians(lat)
        want_y = int((1 - math.asinh(math.tan(lat_rad)) / math.pi) / 2 * n)
        assert (x, y) == (want_x, want_y)

    def test_resolution_halves(self):
        assert resolution(11) == pytest.approx(resolution(10) / 2)

    def test_tiles_for_bounds_cover(self):
        b = tile_bounds(10, 600, 420)
        inner = (b[0] + 1, b[1] + 1, b[2] - 1, b[3] - 1)
        assert list(tiles_for_bounds(inner, 10)) == [(600, 420)]
        spanning = (b[0] - 1, b[1] + 1, b[2] + 1, b[3] - 1)
        assert list(tiles_for_bounds(spanning, 10)) == [(599, 420), (600, 420), (601, 420)]


class TestPng:
    @pytest.mark.parametrize("channels", [1, 3, 4])
    @pytest.mark.parametrize("filter_sub", [True, False])
    def test_roundtrip(self, rng, channels, filter_sub):
        img = rng.integers(0, 256, (40, 56, channels)).astype(np.uint8)
        data = encode_png(img, filter_sub=filter_sub)
        back = decode_png(data)
        np.testing.assert_array_equal(back, img)

    def test_pil_interop(self, rng, tmp_path):
        from PIL import Image
        import io

        img = rng.integers(0, 256, (32, 32, 4)).astype(np.uint8)
        data = encode_png(img)
        pil = np.asarray(Image.open(io.BytesIO(data)))
        np.testing.assert_array_equal(pil, img)
        # and decode PIL's own encoding (exercises Up/Average/Paeth filters)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        back = decode_png(buf.getvalue())
        np.testing.assert_array_equal(back, img)


class TestWarp:
    def test_identity_warp_preserves_pixels(self, rng):
        """3857→3857 identity grid returns the source (interior pixels)."""
        src_np = rng.random((64, 64, 3)).astype(np.float32) * 255
        t = Affine.from_origin(0, 64, 1.0, 1.0)  # 1 m pixels at origin
        ctrl = control_grid(t, CRS(3857), t, CRS(3857), 64, 64, grid=5)
        rgb, alpha = warp_bilinear_batch(jnp.asarray(src_np),
                                         jnp.asarray(ctrl)[None], 64, 64)
        np.testing.assert_allclose(np.asarray(rgb[0]), src_np, atol=1e-2)
        assert np.asarray(alpha).min() == 1.0

    def test_shifted_window_alpha(self, rng):
        src_np = rng.random((32, 32, 3)).astype(np.float32)
        t = Affine.from_origin(0, 32, 1.0, 1.0)
        # destination window half outside the source (shift +16 px east)
        t_dst = Affine.from_origin(16, 32, 1.0, 1.0)
        ctrl = control_grid(t_dst, CRS(3857), t, CRS(3857), 32, 32, grid=5)
        rgb, alpha = warp_bilinear_batch(jnp.asarray(src_np),
                                         jnp.asarray(ctrl)[None], 32, 32)
        a = np.asarray(alpha[0])
        assert a[:, :15].min() == 1.0    # covered half
        assert a[:, 17:].max() == 0.0    # outside half

    def test_warp_to_mercator_geometry(self):
        """4326 raster → 3857: bounds must transform consistently."""
        scene = synthetic_scene(size=(128, 128))
        warped = warp_to_mercator(scene)
        assert warped.crs == CRS(3857)
        ww, ws, we, wn = warped.bounds
        tw, ts, te, tn = transform_bounds(CRS(4326), CRS(3857), *(
            scene.bounds[i] for i in (0, 1, 2, 3)))
        assert ww == pytest.approx(tw, abs=1.0)
        assert wn == pytest.approx(tn, abs=1.0)
        assert warped.count == 3  # fully covered: no alpha band needed


class TestPyramid:
    def test_process_raster_to_tiles(self, tmp_path):
        scene = synthetic_scene(path=tmp_path / "scene.tif", size=(256, 256))
        tiles_dir = tmp_path / "tiles"
        meta = process_raster_to_tiles(tmp_path / "scene.tif", tiles_dir,
                                       min_zoom=10, max_zoom=13)
        assert (tiles_dir / "tileset.json").exists()
        assert meta["minzoom"] == 10 and meta["maxzoom"] == 13
        assert meta["tileSize"] == 256 and meta["format"] == "png"
        # every zoom dir present, tile names are ints, PNGs decode RGBA 256²
        for z in range(10, 14):
            zdir = tiles_dir / str(z)
            assert zdir.exists(), f"missing zoom {z}"
            pngs = list(zdir.glob("*/*.png"))
            assert pngs, f"no tiles at zoom {z}"
            img = decode_png(pngs[0].read_bytes())
            assert img.shape == (256, 256, 4)

    def test_tile_content_matches_source_location(self, tmp_path):
        """A pixel sampled from a base tile equals the source pixel there."""
        scene = synthetic_scene(size=(256, 256))
        from s2sr_tpu.tiles.pyramid import _base_zoom_tiles

        store = _base_zoom_tiles(scene, 14)
        assert store
        # centre-of-AOI tile: compare mean color against source mean (loose)
        src_mean = scene.data.mean(axis=(0, 1))
        covered = [t for t in store.values() if (t[..., 3] == 255).all()]
        assert covered, "expected at least one fully-covered tile"
        tile_mean = np.stack([t[..., :3].mean(axis=(0, 1)) for t in covered]).mean(axis=0)
        np.testing.assert_allclose(tile_mean, src_mean, atol=12)

    def test_parent_is_average_of_children(self):
        from s2sr_tpu.tiles.pyramid import _downsample_level

        child = np.full((256, 256, 4), 255, np.uint8)
        child[..., :3] = 100
        store = {(2, 2): child}
        parents = _downsample_level(store)
        assert (1, 1) in parents
        p = parents[(1, 1)]
        # child (2,2) is the top-left quadrant of parent (1,1)
        assert (p[:128, :128, :3] == 100).all()
        assert (p[:128, :128, 3] == 255).all()
        assert (p[128:, 128:, 3] == 0).all()


class TestLanczos:
    def test_identity_lanczos_preserves_interior(self, rng):
        from s2sr_tpu.geo.warp import warp_lanczos_batch

        src = rng.random((64, 64, 3)).astype(np.float32)
        t = Affine.from_origin(0, 64, 1.0, 1.0)
        ctrl = control_grid(t, CRS(3857), t, CRS(3857), 64, 64, grid=5)
        out, alpha = warp_lanczos_batch(jnp.asarray(src),
                                        jnp.asarray(ctrl)[None], 64, 64)
        # identity sampling positions hit pixel centres: lanczos weights
        # collapse to the centre tap
        np.testing.assert_allclose(np.asarray(out[0])[4:-4, 4:-4],
                                   src[4:-4, 4:-4], atol=1e-3)

    def test_lanczos_sharper_than_bilinear_on_upscale(self, rng):
        """x4 overzoom of a step edge: lanczos keeps a steeper transition."""
        from s2sr_tpu.geo.warp import warp_bilinear_batch, warp_lanczos_batch

        src = np.zeros((32, 32, 1), np.float32)
        src[:, 16:] = 1.0
        t = Affine.from_origin(0, 32, 1.0, 1.0)
        t_dst = Affine.from_origin(12, 24, 0.25, 0.25)  # x4 zoom window
        ctrl = control_grid(t_dst, CRS(3857), t, CRS(3857), 64, 64, grid=5)
        bil, _ = warp_bilinear_batch(jnp.asarray(src),
                                     jnp.asarray(ctrl)[None], 64, 64)
        lan, _ = warp_lanczos_batch(jnp.asarray(src),
                                    jnp.asarray(ctrl)[None], 64, 64)
        row_b = np.asarray(bil[0, 32, :, 0])
        row_l = np.asarray(lan[0, 32, :, 0])
        assert np.abs(np.diff(row_l)).max() > np.abs(np.diff(row_b)).max()


def test_warp_tiles_device_benchmark_counts(rng):
    """The compute-only bench helper must cover exactly the tiles the
    real pyramid produces at base zoom (one probe readback)."""
    from s2sr_tpu.fetch.synthetic import synthetic_scene
    from s2sr_tpu.tiles.mercator import tiles_for_bounds
    from s2sr_tpu.geo.crs import CRS, transform_bounds
    from s2sr_tpu.tiles.pyramid import warp_tiles_device_benchmark

    scene = synthetic_scene(size=(256, 256), seed=3)
    n = warp_tiles_device_benchmark(scene, 13, batch=8)
    w, s, e, no = scene.bounds
    keys = list(tiles_for_bounds(
        transform_bounds(scene.crs, CRS(3857), w, s, e, no), 13))
    assert n == len(keys) > 0
