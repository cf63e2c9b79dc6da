"""Fetch-subsystem tests: scene selection, degradation ladder, warps.

Pins the r3 review fixes: synthetic fixtures never poison selection,
fetch_best_scene honours the caller's chosen scene and raises instead of
silently substituting fake data, SCL resamples nearest-neighbour, and
STAC null datetimes don't crash.
"""

from datetime import datetime, timedelta, timezone
from pathlib import Path

import numpy as np
import pytest

from s2sr_tpu.fetch.smart_fetch import (
    _synthesize_scene,
    select_best_local_image,
    smart_fetch,
)
from s2sr_tpu.fetch.synthetic import synthetic_scene
from s2sr_tpu.utils import write_json


def _real_scene(source_dir: Path, name: str, cloud: float,
                age_days: float) -> Path:
    path = source_dir / f"{name}.tif"
    synthetic_scene(path=path, size=(32, 32))
    acq = (datetime.now(timezone.utc).replace(tzinfo=None)
           - timedelta(days=age_days))
    write_json({
        "scene_id": name,
        "acquisition_date": acq.isoformat() + "Z",
        "cloud_cover_pct": cloud,
        "source": "aws_earth_search",
    }, path.with_suffix(".json"))
    return path


class TestSelection:
    def test_synthetic_fixture_never_outranks_real(self, tmp_path):
        """A synthetic sidecar (cloud 0.0, date=now) must not beat real
        imagery — it would permanently suppress every future fetch."""
        _synthesize_scene(tmp_path, None)
        _real_scene(tmp_path, "real_scene", cloud=12.0, age_days=5)
        best = select_best_local_image(tmp_path)
        assert best is not None
        assert best["scene_id"] == "real_scene"

    def test_synthetic_only_is_no_local(self, tmp_path):
        _synthesize_scene(tmp_path, None)
        assert select_best_local_image(tmp_path) is None

    def test_offline_reuses_existing_fixture(self, tmp_path):
        """Offline (the default) with no real imagery: the last-resort
        rung reuses the existing fixture instead of synthesizing a new
        file per run."""
        from s2sr_tpu.config import get_settings

        assert get_settings().offline
        aoi = {"type": "Polygon", "coordinates": [[
            [35.0, 32.0], [35.02, 32.0], [35.02, 32.02],
            [35.0, 32.02], [35.0, 32.0]]]}
        p1, m1 = smart_fetch(aoi, tmp_path)
        p2, m2 = smart_fetch(aoi, tmp_path)
        assert p1 == p2
        assert m1["source"] == "synthetic_fallback"
        assert len(list(tmp_path.glob("synthetic_*.tif"))) == 1


class TestClient:
    def test_null_datetime_does_not_crash(self):
        from s2sr_tpu.fetch.client import Scene

        scene = Scene.from_stac_feature({
            "id": "composite", "properties": {"datetime": None},
            "assets": {}})
        assert scene.scene_id == "composite"
        assert scene.acquisition_date is not None

    def test_fetch_best_scene_uses_chosen_feature(self, tmp_path, monkeypatch):
        """The scene smart_fetch chose is fetched directly — no second
        search that could exclude it under different parameters."""
        from s2sr_tpu.fetch.client import PublicSentinel2Client
        from s2sr_tpu.geo import Affine, CRS, GeoTiff

        client = PublicSentinel2Client()

        def boom(*a, **k):
            raise AssertionError("search must not be called")

        monkeypatch.setattr(client, "search", boom)

        rng = np.random.default_rng(0)
        fake = GeoTiff(
            rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
            transform=Affine.from_bounds(35.0, 32.0, 35.02, 32.02, 64, 64),
            crs=CRS(4326))
        monkeypatch.setattr(client, "_download_asset", lambda url, aoi: fake)

        aoi = {"type": "Polygon", "coordinates": [[
            [35.0, 32.0], [35.02, 32.0], [35.02, 32.02],
            [35.0, 32.02], [35.0, 32.0]]]}
        feature = {
            "id": "S2A_CHOSEN",
            "properties": {"datetime": "2026-08-10T10:00:00Z",
                           "eo:cloud_cover": 7.5},
            "assets": {"visual": {"href": "https://example/visual.tif"}},
        }
        path, meta = client.fetch_best_scene(
            aoi, tmp_path, scene={"scene_id": "S2A_CHOSEN",
                                  "feature": feature},
            max_age_days=90, max_cloud=80.0)
        assert meta["scene_id"] == "S2A_CHOSEN"
        assert meta["cloud_cover_pct"] == 7.5
        assert Path(path).exists()

    def test_fetch_best_scene_raises_on_empty_search(self, tmp_path,
                                                     monkeypatch):
        """No silent synthetic substitution: smart_fetch owns the
        fallback ladder, the client raises."""
        from s2sr_tpu.fetch.client import PublicSentinel2Client

        client = PublicSentinel2Client()
        monkeypatch.setattr(client, "search", lambda *a, **k: [])
        with pytest.raises(ValueError, match="No Sentinel-2 scenes"):
            client.fetch_best_scene({"type": "Polygon", "coordinates": []},
                                    tmp_path)
        assert list(tmp_path.glob("*.tif")) == []


class TestWarps:
    def test_nearest_warp_never_invents_classes(self):
        """SCL class codes through the warp: output values must be a
        subset of input values (bilinear would interpolate 4|9 → 6)."""
        import jax.numpy as jnp

        from s2sr_tpu.geo import Affine, CRS
        from s2sr_tpu.geo.warp import control_grid, warp_nearest_batch

        scl = np.full((64, 64), 4.0, np.float32)
        scl[:, 32:] = 9.0
        src_tr = Affine.from_bounds(35.0, 32.0, 35.1, 32.1, 64, 64)
        dst_tr = Affine.from_bounds(35.0, 32.0, 35.1, 32.1, 97, 97)
        ctrl = control_grid(dst_tr, CRS(4326), src_tr, CRS(4326), 97, 97)
        out, _ = warp_nearest_batch(jnp.asarray(scl[..., None]),
                                    jnp.asarray(ctrl)[None], 97, 97)
        values = set(np.unique(np.asarray(out)))
        assert values <= {4.0, 9.0}, values

    def test_tile_source_honours_alpha_and_nodata(self):
        from s2sr_tpu.geo import Affine, CRS, GeoTiff
        from s2sr_tpu.tiles.pyramid import _rgba_source

        rgb = np.full((16, 16, 3), 120, np.uint8)
        alpha = np.full((16, 16, 1), 255, np.uint8)
        alpha[:8] = 0                     # transparent top half
        r4 = GeoTiff(np.concatenate([rgb, alpha], -1),
                     transform=Affine.identity(), crs=CRS(4326))
        src = _rgba_source(r4)
        assert src.shape == (16, 16, 4)
        assert (src[:8, :, 3] == 0).all()
        assert (src[8:, :, 3] == 255).all()

        rgb0 = rgb.copy()
        rgb0[:4] = 0                      # nodata region
        rn = GeoTiff(rgb0, transform=Affine.identity(), crs=CRS(4326),
                     nodata=0)
        src = _rgba_source(rn)
        assert (src[:4, :, 3] == 0).all()
        assert (src[4:, :, 3] == 255).all()


def test_load_aoi_geometry_empty_featurecollection(tmp_path):
    """Empty FeatureCollection must raise the clear ValueError, not an
    IndexError (matches vectors.extraction.load_aoi_geojson)."""
    import pytest

    from s2sr_tpu.fetch.smart_fetch import load_aoi_geometry
    from s2sr_tpu.utils import write_json

    p = tmp_path / "aoi.geojson"
    write_json({"type": "FeatureCollection", "features": []}, p)
    with pytest.raises(ValueError, match="No features"):
        load_aoi_geometry(p)
