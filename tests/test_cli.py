"""CLI smoke tests: each entry point runs end-to-end on fixtures."""

import subprocess
import sys
from pathlib import Path

import pytest

from s2sr_tpu.fetch.synthetic import synthetic_scene

REPO = Path(__file__).resolve().parent.parent


def run_cli(module, *args, cwd):
    env_code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.path.insert(0, {str(REPO)!r});"
        f"sys.argv = ['{module}'] + {list(args)!r};"
        f"import runpy; runpy.run_module('{module}', run_name='__main__')"
    )
    return subprocess.run([sys.executable, "-c", env_code], cwd=cwd,
                          capture_output=True, text=True, timeout=600)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    path = d / "scene.tif"
    synthetic_scene(path=path, size=(64, 64))
    return path


def test_tile_cli(scene, tmp_path):
    r = run_cli("s2sr_tpu.cli.tile", str(scene), "-o", str(tmp_path / "t"),
                "--min-zoom", "12", "--max-zoom", "13", cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "t" / "tileset.json").exists()


def test_wow_cli(scene, tmp_path):
    r = run_cli("s2sr_tpu.cli.wow_sr", str(scene), "-o", str(tmp_path / "w"),
                "--weights-dir", str(tmp_path / "weights"), cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert list((tmp_path / "w").glob("*_wow_sr.tif"))


def test_generate_vectors_cli(scene, tmp_path):
    from s2sr_tpu.utils import write_json

    aoi = tmp_path / "aoi.geojson"
    write_json({"type": "Polygon", "coordinates": [[
        [35.005, 32.005], [35.045, 32.005], [35.045, 32.045],
        [35.005, 32.045], [35.005, 32.005]]]}, aoi)
    r = run_cli("s2sr_tpu.cli.generate_vectors",
                "--aoi", str(aoi), "--raster", str(scene),
                "-o", str(tmp_path / "v"),
                "--min-area-ha", "0.01", "--max-area-ha", "5000",
                cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "v" / "fields.geojson").exists()


def test_fetch_cli_offline(tmp_path):
    r = run_cli("s2sr_tpu.cli.fetch", "--max-days", "30", cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Best image" in r.stdout


def test_convert_weights_cli(tmp_path):
    import torch

    sd = {"conv_first.weight": torch.zeros(4, 3, 3, 3),
          "conv_first.bias": torch.zeros(4),
          "body.0.rdb1.conv1.weight": torch.zeros(2, 4, 3, 3),
          "body.0.rdb1.conv1.bias": torch.zeros(2)}
    # complete a minimal valid structure
    for j in (1, 2, 3):
        for k in (1, 2, 3, 4, 5):
            cin = 4 + (k - 1) * 2 if k < 5 else 4 + 4 * 2
            cout = 2 if k < 5 else 4
            sd[f"body.0.rdb{j}.conv{k}.weight"] = torch.zeros(cout, cin, 3, 3)
            sd[f"body.0.rdb{j}.conv{k}.bias"] = torch.zeros(cout)
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        sd[f"{name}.weight"] = torch.zeros(4, 4, 3, 3)
        sd[f"{name}.bias"] = torch.zeros(4)
    sd["conv_last.weight"] = torch.zeros(3, 4, 3, 3)
    sd["conv_last.bias"] = torch.zeros(3)
    pth = tmp_path / "model.pth"
    torch.save({"params_ema": sd}, pth)
    r = run_cli("s2sr_tpu.cli.convert_weights", str(pth), cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "model.npz").exists()


def test_convert_weights_from_training_ckpt(tmp_path):
    """train → convert → serve loop: a training checkpoint exports to a
    .npz the weight loader round-trips bit-for-bit."""
    import jax
    import numpy as np

    from s2sr_tpu.models.weights import load_params
    from s2sr_tpu.training.checkpoint import CheckpointManager
    from s2sr_tpu.training.train import TrainConfig, init_training

    cfg = TrainConfig(num_feat=8, num_block=1, num_grow_ch=8,
                      lr_decay_steps=1)
    params, opt = init_training(cfg, seed=3)
    ck = tmp_path / "ckpt"
    mgr = CheckpointManager(ck)
    mgr.save(7, params, opt)
    mgr.wait()

    r = run_cli("s2sr_tpu.cli.convert_weights", "--from-ckpt", str(ck),
                "--feat", "8", "--blocks", "1", "--grow", "8",
                "--model-name", "mymodel", cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    out = ck / "mymodel.npz"
    assert out.exists() and "step 7" in r.stdout

    loaded = load_params(out)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # exactly one source required
    r = run_cli("s2sr_tpu.cli.convert_weights", cwd=tmp_path)
    assert r.returncode != 0


def test_fetch_scene_cutline_offline(tmp_path):
    """Offline: synthesizes a scene, then applies the AOI cutline."""
    from s2sr_tpu.utils import write_json

    aoi = tmp_path / "aoi.geojson"
    write_json({"type": "Feature", "geometry": {
        "type": "Polygon", "coordinates": [[
            [35.01, 32.01], [35.04, 32.01], [35.03, 32.04],
            [35.01, 32.04], [35.01, 32.01]]]}}, aoi)
    r = run_cli("s2sr_tpu.cli.fetch_scene", "--aoi", str(aoi),
                "-o", str(tmp_path / "src"), "--cutline", cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    from s2sr_tpu.geo import read_geotiff

    cut = list((tmp_path / "src").glob("*_cutline.tif"))
    assert cut
    raster = read_geotiff(cut[0])
    assert raster.count == 4                        # alpha band added
    alpha = raster.band(4)
    assert (alpha == 0).any() and (alpha == 255).any()
    # pixels outside the polygon are zeroed
    assert (raster.data[alpha == 0][:, :3] == 0).all()


def test_apply_cutline_multipolygon():
    """A MultiPolygon AOI keeps pixels inside EVERY member polygon
    (gdalwarp -cutline clips to the full multipolygon, not part 1)."""
    import numpy as np

    from s2sr_tpu.cli.fetch_scene import apply_cutline
    from s2sr_tpu.geo import Affine, CRS, GeoTiff

    data = np.full((40, 40, 3), 200, np.uint8)
    raster = GeoTiff(data, transform=Affine.from_origin(35.0, 32.4, 0.01, 0.01),
                     crs=CRS(4326))

    def box(x0, y0, x1, y1):
        return [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]

    aoi = {"type": "MultiPolygon", "coordinates": [
        box(35.02, 32.30, 35.10, 32.38),      # rows ~2-10, cols ~2-10
        box(35.25, 32.05, 35.35, 32.15),      # rows ~25-35, cols ~25-35
    ]}
    out = apply_cutline(raster, aoi)
    alpha = out.data[:, :, 3]
    assert alpha[5, 5] == 255                 # inside polygon 1
    assert alpha[30, 30] == 255               # inside polygon 2 (the fix)
    assert alpha[18, 18] == 0                 # between the two
    assert (out.data[alpha == 0][:, :3] == 0).all()


def test_evaluate_cli_identical_inputs(scene, tmp_path):
    """PSNR=inf (identical inputs) must still emit STRICT JSON — the
    default json.dumps 'Infinity' literal breaks jq/spec parsers."""
    import json

    r = run_cli("s2sr_tpu.cli.evaluate", str(scene), str(scene),
                cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]

    def reject(c):
        raise AssertionError(f"non-standard JSON constant: {c}")

    res = json.loads(r.stdout.strip().splitlines()[-1],
                     parse_constant=reject)
    assert res["identical"] is True
    assert res["psnr"] is None and res["max_abs_diff"] == 0


def test_convert_weights_from_ckpt_ema(tmp_path):
    """convert_weights --from-ckpt --ema exports the weight EMA (the
    Real-ESRGAN params_ema convention) from an EMA-trained checkpoint."""
    import numpy as np

    import jax

    from s2sr_tpu.training.checkpoint import CheckpointManager
    from s2sr_tpu.training.train import (TrainConfig, ema_params,
                                         init_training, make_train_step)

    cfg = TrainConfig(num_feat=8, num_block=1, num_grow_ch=4,
                      dtype="float32", ema_decay=0.9)      # scale 4
    params, opt = init_training(cfg)
    step, _ = make_train_step(cfg)
    rng = np.random.default_rng(0)
    lr = rng.random((2, 8, 8, 3), np.float32)
    hr = rng.random((2, 32, 32, 3), np.float32)
    params, opt, _ = step(params, opt, lr, hr)
    ck = tmp_path / "ckpt"
    mgr = CheckpointManager(ck)
    mgr.save(1, params, opt)
    mgr.wait()

    out = tmp_path / "realesrgan_x4.npz"
    r = run_cli("s2sr_tpu.cli.convert_weights", "--from-ckpt", str(ck),
                "--feat", "8", "--blocks", "1", "--grow", "4", "--ema",
                "-o", str(out), cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "params_ema" in r.stdout and out.exists()

    from s2sr_tpu.models.weights import load_params

    got = load_params(out)
    want = ema_params(opt)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-7)
