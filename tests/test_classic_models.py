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
