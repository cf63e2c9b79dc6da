"""JPEG degradation model (ops/jpeg.py) vs the real libjpeg round-trip,
and its wiring into the device/host training samplers.

The degradation completes Real-ESRGAN's blur+noise+JPEG recipe (the
reference's released weights were trained with it upstream; the
reference itself never trains — SURVEY §2)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2sr_tpu.fetch.synthetic import synthetic_fields
from s2sr_tpu.ops.jpeg import jpeg_degrade
from s2sr_tpu.utils.metrics import psnr


def _img(seed=3, size=128):
    return synthetic_fields(size=(size, size), seed=seed)


def _real_jpeg(u8: np.ndarray, q: int) -> np.ndarray:
    ok, enc = cv2.imencode(".jpg", u8[..., ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, q])
    assert ok
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]


def _sim_jpeg(u8: np.ndarray, q: float) -> np.ndarray:
    f = jnp.asarray(u8.astype(np.float32) / 255.0)
    sim = np.asarray(jpeg_degrade(f, q))
    return np.clip(np.round(sim * 255.0), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("q", [90, 50, 10])
def test_tracks_real_libjpeg(q):
    """The DCT-quantization model must stay close to the real encoder:
    near-transparent to its output (≥35 dB) and within ~1 dB of the
    same distortion level vs the original."""
    img = _img()
    real = _real_jpeg(img, q)
    sim = _sim_jpeg(img, float(q))
    assert psnr(sim, real) >= 35.0
    assert abs(psnr(sim, img) - psnr(real, img)) <= 1.2


def test_quality_monotonic():
    img = _img(seed=7)
    levels = [psnr(_sim_jpeg(img, float(q)), img)
              for q in (10, 30, 50, 75, 95)]
    assert all(a < b for a, b in zip(levels, levels[1:]))


def test_q100_no_subsample_near_lossless():
    img = _img(seed=5)
    f = jnp.asarray(img.astype(np.float32) / 255.0)
    sim = np.asarray(jpeg_degrade(f, 100.0, subsample=False))
    u8 = np.clip(np.round(sim * 255.0), 0, 255).astype(np.uint8)
    assert psnr(u8, img) >= 45.0


def test_traced_quality_jit_vmap():
    """quality as a traced per-sample scalar inside jit — the form the
    device sampler uses."""
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.random((3, 32, 32, 3)), jnp.float32)
    qs = jnp.asarray([10.0, 50.0, 95.0])
    out = np.asarray(jax.jit(jax.vmap(jpeg_degrade))(batch, qs))
    assert out.shape == batch.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # lower quality must distort more
    errs = [float(np.abs(out[i] - np.asarray(batch[i])).mean())
            for i in range(3)]
    assert errs[0] > errs[2]


def test_bad_size_raises():
    x = jnp.zeros((24, 24, 3), jnp.float32)
    with pytest.raises(ValueError):
        jpeg_degrade(x, 50.0)              # 24 % 16 != 0 with 4:2:0
    jpeg_degrade(x, 50.0, subsample=False)  # 24 % 8 == 0 is fine


def test_device_pool_sampler_jpeg():
    from s2sr_tpu.training.train import make_pool_sampler

    rng = np.random.default_rng(1)
    pool = jnp.asarray(rng.random((2, 128, 128, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    plain = make_pool_sampler(4, 16, 2)
    degraded = make_pool_sampler(4, 16, 2, jpeg_range=(30.0, 95.0))
    lr_p, hr_p = jax.jit(plain)(pool, key)
    lr_d, hr_d = jax.jit(degraded)(pool, key)
    np.testing.assert_array_equal(np.asarray(hr_p), np.asarray(hr_d))
    lr_d = np.asarray(lr_d)
    assert lr_d.min() >= 0.0 and lr_d.max() <= 1.0
    assert np.abs(lr_d - np.asarray(lr_p)).max() > 1e-4

    with pytest.raises(ValueError):
        make_pool_sampler(4, 12, 2, jpeg_range=(30.0, 95.0))


def test_host_sampler_jpeg():
    from s2sr_tpu.training.data import PairSampler

    plain = PairSampler(crop_lr=16, scale=4, batch_size=2, seed=9)
    degraded = PairSampler(crop_lr=16, scale=4, batch_size=2, seed=9,
                           jpeg_range=(30.0, 95.0))
    lr_p, hr_p = plain.sample()
    lr_d, hr_d = degraded.sample()
    assert lr_d.shape == lr_p.shape
    assert lr_d.min() >= 0.0 and lr_d.max() <= 1.0
    assert np.abs(lr_d - lr_p).max() > 1e-4


def test_device_vs_host_jpeg_equivalent_distortion():
    """The two samplers' JPEG legs are different encoders (DCT model vs
    libjpeg) but must land at the same distortion level on the same
    input (the no-drift contract in data.py)."""
    img = _img(seed=11, size=64)
    for q in (30, 60, 90):
        real = _real_jpeg(img, q)
        sim = _sim_jpeg(img, float(q))
        assert abs(psnr(sim, img) - psnr(real, img)) <= 1.5
