"""Classic SR family (EDSR/ESPCN/LapSRN) forward-shape + behaviour tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from s2sr_tpu.models.classic import EDSR, ESPCN, LapSRN, _pixel_shuffle


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_edsr_shapes(scale):
    model = EDSR(scale=scale, num_feat=16, num_blocks=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).random((1, 12, 10, 3)), jnp.float32)
    out = model.apply(params, x)
    assert out.shape == (1, 12 * scale, 10 * scale, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_espcn_shapes(scale):
    model = ESPCN(scale=scale)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 8, 8, 3))
    out = model.apply(params, x)
    assert out.shape == (2, 8 * scale, 8 * scale, 3)


@pytest.mark.parametrize("scale", [2, 4, 8])
def test_lapsrn_shapes(scale):
    model = LapSRN(scale=scale, num_feat=8, depth_per_level=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).random((1, 8, 8, 3)), jnp.float32)
    out = model.apply(params, x)
    assert out.shape == (1, 8 * scale, 8 * scale, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pixel_shuffle_matches_torch():
    x = np.random.default_rng(2).random((2, 5, 7, 12)).astype(np.float32)
    want = F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(_pixel_shuffle(jnp.asarray(x), 2))
    np.testing.assert_array_equal(got, want)


def test_lapsrn_bilinear_upsample_identity():
    """With zero residual convs, LapSRN reduces to bilinear-kernel
    transposed-conv upsampling of the image — smoke-check monotonicity."""
    model = LapSRN(scale=2, num_feat=4, depth_per_level=1)
    params = model.init(jax.random.PRNGKey(0))
    params["levels"][0]["res"]["kernel"] = jnp.zeros_like(
        params["levels"][0]["res"]["kernel"])
    params["levels"][0]["res"]["bias"] = jnp.zeros_like(
        params["levels"][0]["res"]["bias"])
    ramp = jnp.broadcast_to(
        jnp.linspace(0, 1, 16)[None, :, None, None], (1, 16, 16, 3)
    ).transpose(0, 2, 1, 3)
    out = np.asarray(model.apply(params, ramp))
    # interior columns should stay monotone non-decreasing
    interior = out[0, 8, 2:-2, 0]
    assert (np.diff(interior) >= -1e-5).all()


def test_swinir_registry_both_scales():
    """The reference registry ships BOTH classical SwinIR scales
    (``server/app/swinir.py:21-34``: swinir_x2 + swinir_x4)."""
    from s2sr_tpu.models.registry import get_model_config

    for name, scale in (("swinir_x2", 2), ("swinir_x4", 4)):
        cfg = get_model_config(name)
        assert cfg["family"] == "swinir"
        assert cfg["scale"] == scale
        assert cfg["window_size"] == 8
        assert cfg["embed_dim"] == 180
        assert len(cfg["depths"]) == len(cfg["num_heads"]) == 6


def test_swinir_x2_engine_constructs(tmp_path):
    """The full-size swinir_x2 registry entry builds through SREngine
    (random init; no forward — the 180-dim model is too slow for CPU CI)."""
    from s2sr_tpu.models.engine import SREngine

    eng = SREngine("swinir_x2", weights_dir=tmp_path, dtype="float32")
    assert eng.scale == 2
    assert eng.family == "swinir"
    assert eng.tile_pad >= 16          # reference wrapper pad (swinir.py:704-748)
    assert not eng.pretrained          # offline: random init, loud degraded mode


def test_swinir_engine_small(tmp_path):
    """SwinIR drives through the same SREngine surface."""
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.registry import MODELS

    # register a tiny SwinIR variant so the test is fast
    MODELS["swinir_tiny"] = {
        "family": "swinir", "scale": 2, "embed_dim": 12,
        "depths": (2,), "num_heads": (2,), "window_size": 4,
        "description": "test",
    }
    try:
        eng = SREngine("swinir_tiny", weights_dir=tmp_path, dtype="float32")
        img = np.random.default_rng(0).integers(0, 255, (24, 20, 3)).astype(np.uint8)
        out = eng.enhance(img)
        assert out.shape == (48, 40, 3)
        assert out.dtype == np.uint8
    finally:
        MODELS.pop("swinir_tiny", None)


def test_swinir_engine_loads_trained_npz(tmp_path):
    """convert_weights --from-ckpt exports .npz; the engine must load it
    (trained-SwinIR serving loop, not just released .pth conversion)."""
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.registry import MODELS
    from s2sr_tpu.models.swinir import SwinIR
    from s2sr_tpu.models.weights import save_params

    MODELS["swinir_tiny"] = {
        "family": "swinir", "scale": 2, "embed_dim": 12,
        "depths": (2,), "num_heads": (2,), "window_size": 4,
        "description": "test",
    }
    try:
        model = SwinIR(scale=2, embed_dim=12, depths=(2,), num_heads=(2,),
                       window_size=4, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(7))
        save_params(params, tmp_path / "swinir_tiny.npz")
        eng = SREngine("swinir_tiny", weights_dir=tmp_path, dtype="float32")
        assert eng.pretrained
        # the loaded tree must be exactly the exported one (incl. the
        # list-structured layers rebuilt from the flat npz)
        for got, want in zip(jax.tree.leaves(eng.params),
                             jax.tree.leaves(params), strict=True):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        eng_rand = SREngine("swinir_tiny", weights_dir=tmp_path / "empty",
                            dtype="float32")
        assert not eng_rand.pretrained
    finally:
        MODELS.pop("swinir_tiny", None)


# --- masked-bucket exactness + warm serving (VERDICT r4 #4) -----------------

def _mask_case(model, params, h, w, c, atol=0.0):
    """Masked bucketed forward == standalone per-shape forward on the
    true region (the rrdbnet masked-bucket contract, now for the
    classic families)."""
    rng = np.random.default_rng(7)
    x = rng.random((h, w, c)).astype(np.float32)
    s = model.scale
    want = np.asarray(model.apply(params, jnp.asarray(x)[None])[0])
    hb, wb = -(-h // 32) * 32, -(-w // 32) * 32
    xp = np.zeros((hb, wb, c), np.float32)
    xp[:h, :w] = x
    mask = np.zeros((hb, wb, 1), np.float32)
    mask[:h, :w] = 1.0
    got = np.asarray(model.apply(
        params, jnp.asarray(xp)[None], jnp.asarray(mask)[None])[0])
    np.testing.assert_allclose(got[:h * s, :w * s], want, atol=atol)


def test_edsr_masked_bucket_exact():
    model = EDSR(scale=4, num_feat=8, num_blocks=2, dtype=jnp.float32)
    _mask_case(model, model.init(jax.random.PRNGKey(0)), 21, 27, 3)


def test_edsr_x3_masked_bucket_exact():
    model = EDSR(scale=3, num_feat=8, num_blocks=2, dtype=jnp.float32)
    _mask_case(model, model.init(jax.random.PRNGKey(1)), 30, 18, 3)


def test_espcn_masked_bucket_exact():
    model = ESPCN(scale=4, num_ch=1)
    _mask_case(model, model.init(jax.random.PRNGKey(0)), 19, 25, 1)


def test_lapsrn_masked_bucket_exact():
    model = LapSRN(scale=4, num_feat=8, depth_per_level=2, num_ch=1)
    _mask_case(model, model.init(jax.random.PRNGKey(0)), 22, 17, 1)


def test_classic_warm_serving_bucket_reuse(tmp_path, monkeypatch):
    """Two upload sizes in the same 64-bucket reuse ONE executable (the
    engine path's warm-shape story, now for the classic pipeline)."""
    from s2sr_tpu.config import settings as settings_mod
    from s2sr_tpu.pipelines import super_resolution as sr_mod

    cfg = settings_mod.Settings(weights_dir=str(tmp_path / "w"))
    monkeypatch.setattr(sr_mod, "get_settings", lambda: cfg, raising=False)
    monkeypatch.setattr(settings_mod, "get_settings", lambda: cfg)

    from s2sr_tpu.models.classic import ESPCN
    inst = ESPCN(scale=2, num_ch=3)
    params = inst.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    a = (rng.random((50, 40, 3)) * 255).astype(np.uint8)
    out_a = sr_mod.run_classic_sr(inst, params, a)
    assert out_a.shape == (100, 80, 3)
    fn = inst._jit_apply
    warm = fn._cache_size()
    b = (rng.random((60, 33, 3)) * 255).astype(np.uint8)   # same 64-bucket
    out_b = sr_mod.run_classic_sr(inst, params, b)
    assert out_b.shape == (120, 66, 3)
    assert fn._cache_size() == warm    # no fresh compile

    # exactness through the public path: bucketed == direct per-shape
    x01 = a.astype(np.float32) / 255.0
    direct = np.asarray(inst.apply(params, jnp.asarray(x01)[None])[0])
    direct_u8 = np.asarray(
        jnp.clip(jnp.round(jnp.asarray(direct) * 255.0), 0, 255)
        .astype(jnp.uint8))
    np.testing.assert_array_equal(out_a, direct_u8)


def test_swinir_engage_rule_exact_ceiling(tmp_path):
    """VERDICT r4 #3: tiled SwinIR is approximate at any pad, so the
    engage threshold is the exactness boundary — raised from the
    CPU-era tile2*4 rule to the measured exact-path ceiling
    (SWINIR_EXACT_AREA). exact_area overrides for probing."""
    from s2sr_tpu.models.engine import SREngine, SWINIR_EXACT_AREA
    from s2sr_tpu.models.registry import MODELS

    MODELS["swinir_tiny"] = {
        "family": "swinir", "scale": 2, "embed_dim": 12,
        "depths": (2,), "num_heads": (2,), "window_size": 4,
        "description": "test",
    }
    try:
        img = np.random.default_rng(0).integers(
            0, 255, (96, 96, 3)).astype(np.uint8)

        eng = SREngine("swinir_tiny", weights_dir=tmp_path,
                       dtype="float32", tile_size=16)
        # default: engage raised to the measured ceiling, NOT tile2*4
        assert eng.engage_area == SWINIR_EXACT_AREA
        assert eng._serving_parts(img) is None      # 96x96 -> exact path
        out = eng.enhance_serving(img)
        assert out.shape == (192, 192, 3)

        # forced-low ceiling: the same image takes the tiled path
        eng2 = SREngine("swinir_tiny", weights_dir=tmp_path,
                        dtype="float32", tile_size=16, exact_area=1024)
        assert eng2.engage_area == 1024
        parts = eng2._serving_parts(img)
        assert parts is not None and parts[1]["kind"] == "tiled"

        # rrdbnet keeps the reference rule
        eng3 = SREngine("realesrgan_x4", weights_dir=tmp_path / "empty",
                        tile_size=48, dtype="float32")
        assert eng3.engage_area == 48 * 48 * 4
    finally:
        MODELS.pop("swinir_tiny", None)


def test_run_classic_sr_many_matches_single():
    """Batched classic serving (VERDICT r4 #9): mixed sizes group by
    bucket into as few dispatches as groups, and every output is
    bit-identical to the one-image path."""
    from s2sr_tpu.pipelines.super_resolution import (create_sr_model,
                                                    run_classic_sr,
                                                    run_classic_sr_many)

    rng = np.random.default_rng(0)
    for family in ("espcn", "edsr"):
        inst, params = create_sr_model(family, 2)
        imgs = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
                for h, w in ((40, 56), (40, 56), (30, 20), (64, 64))]
        many = run_classic_sr_many(inst, params, imgs)
        for img, got in zip(imgs, many):
            want = run_classic_sr(inst, params, img)
            assert got.shape == want.shape
            assert (got == want).all(), family
