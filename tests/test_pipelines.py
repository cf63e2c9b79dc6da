"""End-to-end pipeline tests (offline, synthetic fixture, random weights).

Mirrors the validation surface SURVEY §4 prescribes: fixture GeoTIFF →
SR pipeline → artifact + sidecar-metadata assertions, all offline.
Small images keep the (random-weight) model fast on CPU.
"""

import json

import numpy as np
import pytest

from s2sr_tpu.fetch.synthetic import synthetic_scene
from s2sr_tpu.geo import read_geotiff
from s2sr_tpu.pipelines.wow_sr import apply_wow_sr, process_wow_sr
from s2sr_tpu.pipelines.farm_sr import process_farm_sr


@pytest.fixture(scope="module")
def small_scene(tmp_path_factory):
    path = tmp_path_factory.mktemp("scene") / "s2_fixture.tif"
    synthetic_scene(path=path, size=(64, 64))
    return path


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    """Empty weights dir → engines run on deterministic random init."""
    return tmp_path_factory.mktemp("weights")


def test_wow_pipeline_end_to_end(small_scene, weights_dir, tmp_path):
    out = tmp_path / "wow"
    result = process_wow_sr(small_scene, out, enhance_crops=True,
                            weights_dir=weights_dir)

    # artifact layout identical to reference (wow_sr.py:243-259)
    sr_tif = result["outputs"]["sr_tif"]
    sr_png = result["outputs"]["sr_png"]
    assert sr_tif and sr_png
    meta_file = out / "s2_fixture_wow_sr_metadata.json"
    assert meta_file.exists()
    meta = json.loads(meta_file.read_text())
    sm = meta["sr_metadata"]
    assert sm["scale"] == 4
    assert sm["original_size"] == [64, 64]
    assert sm["output_size"] == [256, 256]
    assert sm["effective_resolution_m"] == 2.5
    assert sm["pipeline"] == "Real-ESRGAN x4 + Enhanced"
    assert sm["enhancements"] == [
        "CLAHE local contrast", "Unsharp mask", "Vegetation boost"]

    # georeferencing: x4 output has /4 pixel size, same origin
    src = read_geotiff(small_scene)
    dst = read_geotiff(sr_tif)
    assert dst.data.shape == (256, 256, 3)
    assert dst.transform.a == pytest.approx(src.transform.a / 4)
    assert dst.transform.c == pytest.approx(src.transform.c)
    assert dst.crs == src.crs


def test_wow_no_enhance(small_scene, weights_dir, tmp_path):
    _, meta = apply_wow_sr(small_scene, tmp_path / "plain",
                           enhance_crops=False, weights_dir=weights_dir)
    assert meta["enhancements"] == []
    assert len(meta["stages"]) == 1


def test_wow_deterministic(small_scene, weights_dir, tmp_path):
    """Same input → bit-identical output (fixed random init, no RNG at run)."""
    _, m1 = apply_wow_sr(small_scene, tmp_path / "a", weights_dir=weights_dir)
    _, m2 = apply_wow_sr(small_scene, tmp_path / "b", weights_dir=weights_dir)
    a = read_geotiff(tmp_path / "a.tif").data
    b = read_geotiff(tmp_path / "b.tif").data
    np.testing.assert_array_equal(a, b)


def test_farm_pipeline_end_to_end(small_scene, weights_dir, tmp_path):
    result = process_farm_sr(small_scene, tmp_path / "farm",
                             weights_dir=weights_dir)
    sm = result["sr_metadata"]
    assert sm["scale"] == 4
    assert len(sm["steps"]) == 4
    assert read_geotiff(result["outputs"]["sr_tif"]).data.shape == (256, 256, 3)


def test_png_input_path(weights_dir, tmp_path):
    """Non-georeferenced input (the /api/enhance upload path) → PNG out."""
    from PIL import Image

    img = np.random.default_rng(0).integers(0, 255, (48, 48, 3)).astype(np.uint8)
    src = tmp_path / "upload.png"
    Image.fromarray(img).save(src)
    final, meta = apply_wow_sr(src, tmp_path / "up_out",
                               enhance_crops=True, weights_dir=weights_dir)
    assert final.suffix == ".png"
    out = np.asarray(Image.open(final))
    assert out.shape == (192, 192, 3)


def test_load_rgb_16bit_reference_normalization(tmp_path):
    """>8-bit rasters min-max scale with the reference's exact formula
    (wow_sr.py:68-71, no epsilon): the max pixel lands on 255, every
    boundary-landing value truncates identically."""
    from s2sr_tpu.geo import Affine, GeoTiff, write_geotiff
    from s2sr_tpu.pipelines.io import load_rgb

    rng = np.random.default_rng(7)
    img = rng.integers(0, 4096, size=(16, 16, 3), dtype=np.uint16)
    img[0, 0, 0] = 4095
    path = tmp_path / "scene16.tif"
    write_geotiff(GeoTiff(img, transform=Affine.identity(), crs=None), path)
    out, _, _ = load_rgb(path)
    exp = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)
    assert out.max() == 255


def test_load_rgb_16bit_small_values_cast_not_scaled(tmp_path):
    """A >8-bit raster whose values fit 0-255 casts directly (no stretch)
    — reference wow_sr.py:72-73."""
    from s2sr_tpu.geo import Affine, GeoTiff, write_geotiff
    from s2sr_tpu.pipelines.io import load_rgb

    img = np.full((8, 8, 3), 200, np.uint16)
    path = tmp_path / "dim16.tif"
    write_geotiff(GeoTiff(img, transform=Affine.identity(), crs=None), path)
    out, _, _ = load_rgb(path)
    np.testing.assert_array_equal(out, np.full((8, 8, 3), 200, np.uint8))
