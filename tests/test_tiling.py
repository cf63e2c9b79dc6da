"""Halo-tiling engine parity vs a numpy oracle of the reference loop.

The oracle reproduces the sequential tile loop's placement/crop/stitch
semantics (``server/app/cnn_super_resolution.py:236-280``) directly in
numpy. The mock model has a real receptive field (3×3 box filter before
×scale nearest upsample) so any halo/stitch mistake changes pixels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2sr_tpu.parallel import TilePlan, build_mesh, sr_whole_image, tiled_apply


def mock_model_np(batch: np.ndarray, scale: int) -> np.ndarray:
    """(B, h, w, c): 3×3 zero-padded box filter, then nearest ×scale."""
    b, h, w, c = batch.shape
    padded = np.pad(batch, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = np.zeros_like(batch, dtype=np.float64)
    for dy in range(3):
        for dx in range(3):
            acc += padded[:, dy:dy + h, dx:dx + w, :]
    acc = (acc / 9.0).astype(np.float32)
    up = np.repeat(np.repeat(acc, scale, axis=1), scale, axis=2)
    return up


def mock_model_jax(batch: jnp.ndarray, scale: int) -> jnp.ndarray:
    b, h, w, c = batch.shape
    padded = jnp.pad(batch, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = sum(
        padded[:, dy:dy + h, dx:dx + w, :]
        for dy in range(3) for dx in range(3)
    ) / 9.0
    return jnp.repeat(jnp.repeat(acc, scale, axis=1), scale, axis=2)


def reference_tile_loop(img: np.ndarray, tile: int, pad: int, scale: int) -> np.ndarray:
    """Numpy port of the reference's per-tile semantics (the oracle)."""
    h, w, c = img.shape
    out = np.zeros((h * scale, w * scale, c), np.float32)
    tiles_x = (w + tile - 1) // tile
    tiles_y = (h + tile - 1) // tile
    for y in range(tiles_y):
        for x in range(tiles_x):
            x1 = x * tile
            y1 = y * tile
            x2 = min(x1 + tile + pad * 2, w)
            y2 = min(y1 + tile + pad * 2, h)
            x1 = max(x2 - tile - pad * 2, 0)
            y1 = max(y2 - tile - pad * 2, 0)
            tile_out = mock_model_np(img[None, y1:y2, x1:x2, :], scale)[0]
            ox1, oy1 = x1 * scale, y1 * scale
            ox2, oy2 = x2 * scale, y2 * scale
            p = pad * scale
            if x > 0:
                tile_out = tile_out[:, p:, :]
                ox1 += p
            if y > 0:
                tile_out = tile_out[p:, :, :]
                oy1 += p
            if x < tiles_x - 1:
                tile_out = tile_out[:, :-p, :]
                ox2 -= p
            if y < tiles_y - 1:
                tile_out = tile_out[:-p, :, :]
                oy2 -= p
            out[oy1:oy2, ox1:ox2, :] = tile_out
    return out


@pytest.mark.parametrize("shape,tile,pad", [
    ((96, 96), 32, 4),     # exact multiple grid
    ((96, 70), 32, 4),     # clamped right edge
    ((70, 100), 32, 4),    # clamped bottom edge + interior columns
    ((30, 130), 32, 4),    # single row, W ragged
    ((130, 30), 32, 4),    # single column (W < tile+2p)
    ((33, 33), 32, 4),     # tiny over-pitch remainder
])
@pytest.mark.parametrize("scale", [2, 4])
def test_tiled_apply_matches_reference_loop(rng, shape, tile, pad, scale):
    img = rng.random((*shape, 3)).astype(np.float32)
    want = reference_tile_loop(img, tile, pad, scale)
    got = np.asarray(tiled_apply(
        lambda b: mock_model_jax(b, scale),
        jnp.asarray(img), tile=tile, pad=pad, scale=scale, batch_size=4,
    ))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_plan_static_window_shape():
    plan = TilePlan.for_image(70, 100, tile=32, pad=4)
    assert (plan.win_h, plan.win_w) == (40, 40)
    assert plan.num_windows == plan.ny * plan.nx == 3 * 4
    starts = plan.starts()
    assert starts.shape == (12, 2)
    assert starts[:, 0].max() + plan.win_h == 70
    assert starts[:, 1].max() + plan.win_w == 100


def test_engage_threshold(rng):
    """Below the h·w > tile²·4 threshold the model sees the whole image."""
    calls = []

    def spy_model(b):
        calls.append(b.shape)
        return mock_model_jax(b, 2)

    img = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
    sr_whole_image(spy_model, img, tile=32, pad=4, scale=2, batch_size=4)
    assert calls[0][1:3] == (64, 64)  # single full-image pass


def test_batch_padding_any_chunk_size(rng):
    """Result independent of batch_size (padding windows are discarded)."""
    img = jnp.asarray(rng.random((96, 96, 3)).astype(np.float32))
    ref = np.asarray(tiled_apply(lambda b: mock_model_jax(b, 2), img,
                                 tile=32, pad=4, scale=2, batch_size=9))
    for bs in (1, 2, 5, 16):
        got = np.asarray(tiled_apply(lambda b: mock_model_jax(b, 2), img,
                                     tile=32, pad=4, scale=2, batch_size=bs))
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_sharded_matches_unsharded(rng):
    """8-virtual-device mesh: sharded window batch gives identical pixels."""
    mesh = build_mesh("dp=8")
    img = jnp.asarray(rng.random((96, 96, 3)).astype(np.float32))
    want = np.asarray(tiled_apply(lambda b: mock_model_jax(b, 2), img,
                                  tile=32, pad=4, scale=2, batch_size=8))
    got = np.asarray(tiled_apply(lambda b: mock_model_jax(b, 2), img,
                                 tile=32, pad=4, scale=2, batch_size=8,
                                 mesh=mesh))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rrdbnet_through_tiling_matches_single_pass(rng):
    """End-to-end: tiny RRDBNet tiled vs whole-image — halo is sufficient.

    RRDB receptive field exceeds the halo, so tiny differences near tile
    seams are expected; assert they stay under half a uint8 level.
    """
    from s2sr_tpu.models.rrdbnet import RRDBNet

    net = RRDBNet(num_feat=16, num_block=1, num_grow_ch=8, scale=2,
                  dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.random((80, 80, 3)).astype(np.float32))
    whole = np.asarray(net.apply(params, img[None])[0])
    tiled = np.asarray(tiled_apply(
        lambda b: net.apply(params, b), img,
        tile=32, pad=8, scale=2, batch_size=4,
    ))
    assert np.abs(whole - tiled).max() < 0.5 / 255.0


def test_engine_sharded_matches_unsharded(rng, tmp_path):
    """Real (tiny) RRDBNet through SREngine with an 8-device dp mesh —
    pixel-identical to the single-device path."""
    import jax
    import torch

    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.weights import convert_rrdbnet_state_dict, save_params
    from s2sr_tpu.parallel import build_mesh
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_rrdbnet import make_state_dict

    sd = make_state_dict()
    params = convert_rrdbnet_state_dict(sd)
    weights_dir = tmp_path / "w"
    save_params(params, weights_dir / "realesrgan_x4.npz")

    img = (rng.random((280, 270, 3)) * 255).astype(np.uint8)
    plain = SREngine("realesrgan_x4", weights_dir=weights_dir,
                     dtype="float32", tile_size=128, tile_pad=10,
                     batch_size=4)
    sharded = SREngine("realesrgan_x4", weights_dir=weights_dir,
                       dtype="float32", tile_size=128, tile_pad=10,
                       batch_size=4, mesh=build_mesh("dp=8"))
    a = plain.enhance(img)
    b = sharded.enhance(img)
    np.testing.assert_array_equal(a, b)


def test_enhance_serving_bucketed(rng, tmp_path):
    """Bucketed serving path (VERDICT r1 #3): tiled images are byte-equal
    to the per-shape jit path, and two different tiled sizes reuse ONE
    chunk executable (no new XLA compiles on a warm server)."""
    import jax

    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.weights import convert_rrdbnet_state_dict, save_params
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_rrdbnet import make_state_dict

    sd = make_state_dict()
    params = convert_rrdbnet_state_dict(sd)
    weights_dir = tmp_path / "w"
    save_params(params, weights_dir / "realesrgan_x4.npz")

    engine = SREngine("realesrgan_x4", weights_dir=weights_dir,
                      dtype="float32", tile_size=48, tile_pad=4,
                      batch_size=4)

    img_a = rng.integers(0, 256, (150, 130, 3)).astype(np.uint8)
    exact = engine.enhance(img_a)
    served = engine.enhance_serving(img_a)
    np.testing.assert_array_equal(served, exact)

    before = engine._chunk_fn._cache_size()
    img_b = rng.integers(0, 256, (170, 110, 3)).astype(np.uint8)
    out_b = engine.enhance_serving(img_b)
    assert out_b.shape == (680, 440, 3)
    assert engine._chunk_fn._cache_size() == before  # warm executable reused

    # small-image bucket: a 64-multiple input is exact vs the direct path
    img_c = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    np.testing.assert_array_equal(engine.enhance_serving(img_c),
                                  engine.enhance(img_c))


def test_run_chunked_pow2_decomposition(rng, tmp_path):
    """_run_chunked must not pad small batches up to batch_size (the r2
    regression: a 1-window image computed 16 copies). Any N decomposes
    into power-of-two chunks that sum to exactly N."""
    from s2sr_tpu.models.engine import SREngine

    calls = []

    class FakeEngine:
        batch_size = 16
        params = None
        _mparams = None

        def _chunk_fn(self, params, batch):
            calls.append(batch.shape[0])
            return batch

    fake = FakeEngine()
    for n in (1, 2, 3, 5, 11, 16, 17, 37):
        calls.clear()
        wins = rng.integers(0, 255, (n, 8, 8, 3)).astype(np.uint8)
        out = SREngine._run_chunked(fake, wins)
        assert out.shape[0] == n
        np.testing.assert_array_equal(out, wins)
        assert sum(calls) == n, (n, calls)           # exact work
        assert all(c & (c - 1) == 0 for c in calls)  # powers of two
        assert max(calls) <= 16


def test_enhance_serving_exact_all_sizes(rng, tmp_path):
    """VERDICT r2 #2: the serving path must be EXACT for every image
    size, including non-64-multiple small images (zero-pad bucket +
    conv-padding mask == the per-shape forward, bit-identical), and
    must not compile new executables per size on a warm engine."""
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.weights import convert_rrdbnet_state_dict, save_params
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_rrdbnet import make_state_dict

    sd = make_state_dict()
    params = convert_rrdbnet_state_dict(sd)
    weights_dir = tmp_path / "w"
    save_params(params, weights_dir / "realesrgan_x4.npz")

    engine = SREngine("realesrgan_x4", weights_dir=weights_dir,
                      dtype="float32", tile_size=48, tile_pad=4,
                      batch_size=4)

    # awkward small sizes (none 64-multiples): masked-bucket path
    for h, w in [(48, 40), (77, 63), (1, 1), (65, 64), (33, 95)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        served = engine.enhance_serving(img)
        exact = engine.enhance(img)
        np.testing.assert_array_equal(served, exact), (h, w)

    # same bucket (64, 64) and (128, 128) now warm: new sizes that hit
    # those buckets must not trigger fresh compiles
    before = engine._masked_chunk_fn._cache_size()
    for h, w in [(50, 41), (120, 100)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        np.testing.assert_array_equal(engine.enhance_serving(img),
                                      engine.enhance(img))
    assert engine._masked_chunk_fn._cache_size() == before

    # coalesced path mixes masked smalls with tiled images and stays exact
    imgs = [rng.integers(0, 256, s).astype(np.uint8)
            for s in [(48, 40, 3), (150, 130, 3), (63, 77, 3)]]
    outs = engine.enhance_serving_many(imgs)
    for im, out in zip(imgs, outs):
        np.testing.assert_array_equal(out, engine.enhance(im))


def test_enhance_serving_exact_reference_job_shape(rng, tmp_path):
    """The reference's one observed real workload is 576×432
    (BASELINE.md) — 432 is not a 64-multiple. With a production-shaped
    engine (tile 256) this lands in the small-image bucket; serving
    must equal the exact forward bit-for-bit."""
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.weights import convert_rrdbnet_state_dict, save_params
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_rrdbnet import make_state_dict

    sd = make_state_dict(nb=1)
    params = convert_rrdbnet_state_dict(sd)
    weights_dir = tmp_path / "w"
    save_params(params, weights_dir / "realesrgan_x4.npz")
    engine = SREngine("realesrgan_x4", weights_dir=weights_dir,
                      dtype="float32", tile_size=256, tile_pad=10,
                      batch_size=4)
    img = rng.integers(0, 256, (432, 576, 3)).astype(np.uint8)
    served = engine.enhance_serving(img)
    assert served.shape == (1728, 2304, 3)
    np.testing.assert_array_equal(served, engine.enhance(img))


def test_default_halo_pad4_is_exact(rng, tmp_path):
    """The production halo default is pad 4 (BENCH_NOTES r3: byte-equal
    to the exact whole-image forward with a 0.0017-LSB float margin on
    the full 23-block model on TPU; +9% end-to-end over the reference's
    pad 10). Pin (a) the default, (b) byte-equality of the tiled pad-4
    serving path vs the exact per-shape forward on uniform noise.

    Weights here use the model's own init (the ESRGAN residual-scaled
    distribution the released checkpoints live in) — halo truncation
    error scales with conv gain, and adversarial unscaled weights
    (tests' ``make_state_dict``, randn·0.05 everywhere) can push pad-4
    deviation to ~0.4 LSB (measured, BENCH_NOTES r3). The mechanism
    tests above keep exercising those adversarial weights at pad 10,
    where equality holds regardless."""
    from s2sr_tpu.config import get_settings
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.rrdbnet import RRDBNet
    from s2sr_tpu.models.weights import save_params

    assert get_settings().sr_tile_pad == 4

    net = RRDBNet(num_feat=32, num_block=2, num_grow_ch=16, scale=4)
    params = net.init(jax.random.PRNGKey(0))
    weights_dir = tmp_path / "w"
    save_params(params, weights_dir / "realesrgan_x4.npz")

    engine = SREngine("realesrgan_x4", weights_dir=weights_dir,
                      dtype="float32", tile_size=128, batch_size=4)
    assert engine.tile_pad == 4          # ctor default matches settings

    img = rng.integers(0, 256, (280, 270, 3)).astype(np.uint8)  # tiled
    served = engine.enhance_serving(img)

    # the oracle must NOT tile: build the exact whole-image forward
    # directly (engine.enhance would take the same pad-4 tiled path at
    # this size, which only re-checks the stitch) — mirrors
    # engine.py::enhance_fn_raw's exact branch incl. BGR flip and
    # truncation quantisation
    import jax.numpy as jnp

    from s2sr_tpu.models.rrdbnet import rrdbnet_apply

    x = jnp.asarray(img).astype(jnp.float32)[:, :, ::-1] / 255.0
    out = rrdbnet_apply(engine.params, x[None], scale=4,
                        dtype=jnp.float32)[0][:, :, ::-1]
    exact = np.asarray(
        jnp.trunc(jnp.clip(out * 255.0, 0.0, 255.0)).astype(jnp.uint8))
    np.testing.assert_array_equal(served, exact)


def test_get_engine_reads_settings_knobs(tmp_path, monkeypatch):
    """Settings sr_tile_* / sr_dtype knobs reach engines built through
    get_engine (they were silently unused before r3)."""
    from s2sr_tpu.config import settings as settings_mod
    from s2sr_tpu.models import engine as engine_mod
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_rrdbnet import make_state_dict
    from s2sr_tpu.models.weights import convert_rrdbnet_state_dict, save_params

    sd = make_state_dict(nb=1)
    params = convert_rrdbnet_state_dict(sd)
    weights_dir = tmp_path / "w"
    save_params(params, weights_dir / "realesrgan_x4.npz")

    cfg = settings_mod.Settings(sr_tile_size=96, sr_tile_pad=6,
                                sr_batch_size=2, sr_dtype="float32",
                                sr_exact_area=12345,
                                weights_dir=str(weights_dir))
    monkeypatch.setattr(engine_mod, "get_settings", lambda: cfg,
                        raising=False)
    monkeypatch.setattr("s2sr_tpu.config.get_settings", lambda: cfg)
    engine_mod._ENGINE_CACHE.clear()
    try:
        eng = engine_mod.get_engine("realesrgan_x4",
                                    weights_dir=str(weights_dir))
        assert (eng.tile_size, eng.tile_pad, eng.batch_size) == (96, 6, 2)
        assert eng.dtype.__name__ == "float32"
        assert eng.engage_area == 12345          # sr_exact_area (r4)
    finally:
        engine_mod._ENGINE_CACHE.clear()
