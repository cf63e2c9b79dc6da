"""int8 (W8A8) quantized trunk: mechanics, quality bound, serving contract.

The int8 path (engine ``dtype="int8"``) is a tested quantization
HARNESS, not a v5e throughput mode: isolated conv probes measured
1.18-1.51x MXU headroom but the chain runs ~12% SLOWER than bf16
(BENCH_NOTES round-3 int8 section — the avenue is closed by
measurement). Quality tests run on UNSCALED random weights
(``make_state_dict`` — the adversarial regime where the trunk dominates
the output); with ESRGAN-scaled init the trunk contributes ~1e-7 and
any quantization test would pass vacuously.

Serving contract: int8 bucketed serving is pinned uint8-identical to
the int8 per-shape forward (not float-bit-identical like bf16 — XLA's
FMA contraction of the dequant-multiply+accumulate chain differs by
~1e-11 across bucket shapes, far below the 1/255 quantisation step).
"""
from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from test_rrdbnet import make_state_dict  # noqa: E402


def _tiny_params():
    from s2sr_tpu.models.weights import convert_rrdbnet_state_dict

    return convert_rrdbnet_state_dict(make_state_dict())


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


def test_quantized_weights_reconstruct():
    """Per-channel int8 weight quantization: dequantized kernels within
    half a quantization step of the originals."""
    from s2sr_tpu.models.rrdbnet_int8 import (_pack_rdb_kernels,
                                              _quantize_kernel)

    params = _tiny_params()
    p = jax.tree.map(lambda a: a[0], params["body"])["rdb1"]
    for w in _pack_rdb_kernels(p):
        w8, s = _quantize_kernel(w)
        deq = np.asarray(w8, np.float32) * np.asarray(s)
        step = np.asarray(s)  # per-channel quantization step
        assert np.all(np.abs(deq - np.asarray(w)) <= 0.5 * step + 1e-12)


def test_quant_maps_zero_to_zero():
    from s2sr_tpu.models.rrdbnet_int8 import _quant

    x = jnp.asarray([[0.0, 1.0, -1.0, 0.004]], jnp.float32)
    q = np.asarray(_quant(x, jnp.float32(127.0)))
    assert q[0, 0] == 0 and q[0, 1] == 127 and q[0, 2] == -127


@pytest.mark.parametrize("mode", ["mixed", "full"])
def test_int8_forward_tracks_float(mode):
    """Quantized forward vs fp32 on adversarial (unscaled) weights:
    bounded quantization error, and the error is REAL (the quantized
    conv is actually engaged — corrupting it changes the output).
    Mixed mode (one conv quantized) must beat full W8A8 quality."""
    from s2sr_tpu.models.rrdbnet import rrdbnet_apply
    from s2sr_tpu.models.rrdbnet_int8 import (quantize_rrdbnet,
                                              rrdbnet_apply_int8)

    params = _tiny_params()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 40, 36, 3)), jnp.float32)
    calib = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    qbody = quantize_rrdbnet(params, calib, mode=mode)

    ref = np.clip(np.asarray(rrdbnet_apply(params, x, dtype=jnp.float32)), 0, 1)
    got = np.clip(np.asarray(rrdbnet_apply_int8(
        params, qbody, x, dtype=jnp.float32, mode=mode)), 0, 1)
    p = _psnr(got, ref)
    assert p > 35.0, f"{mode} quality too low: {p:.1f} dB"

    zeroed = jax.tree.map(jnp.zeros_like, qbody)
    dead = np.clip(np.asarray(rrdbnet_apply_int8(
        params, zeroed, x, dtype=jnp.float32, mode=mode)), 0, 1)
    assert np.abs(dead - got).max() > 1e-3, "quantized conv not engaged"


def test_mixed_beats_full_quality():
    from s2sr_tpu.models.rrdbnet import rrdbnet_apply
    from s2sr_tpu.models.rrdbnet_int8 import (quantize_rrdbnet,
                                              rrdbnet_apply_int8)

    params = _tiny_params()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 40, 36, 3)), jnp.float32)
    calib = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ref = np.clip(np.asarray(rrdbnet_apply(params, x, dtype=jnp.float32)), 0, 1)
    psnrs = {}
    for mode in ("mixed", "full"):
        q = quantize_rrdbnet(params, calib, mode=mode)
        out = np.clip(np.asarray(rrdbnet_apply_int8(
            params, q, x, dtype=jnp.float32, mode=mode)), 0, 1)
        psnrs[mode] = _psnr(out, ref)
    assert psnrs["mixed"] > psnrs["full"], psnrs


def test_int8_engine_serving_uint8_identical(tmp_path):
    """Engine dtype='int8': bucketed serving == per-shape exact path at
    the uint8 contract, for an awkward non-64-multiple size."""
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.weights import save_params

    params = _tiny_params()
    weights_dir = tmp_path / "w"
    save_params(params, weights_dir / "realesrgan_x4.npz")

    rng = np.random.default_rng(11)
    engine = SREngine("realesrgan_x4", weights_dir=weights_dir,
                      dtype="int8", tile_size=48, tile_pad=4, batch_size=4)
    assert engine.quantized and engine._qbody is not None

    img = rng.integers(0, 256, (50, 42, 3)).astype(np.uint8)
    exact = engine.enhance(img)
    served = engine.enhance_serving(img)
    assert exact.shape == (200, 168, 3)
    np.testing.assert_array_equal(served, exact)


def test_int8_engine_quality_vs_float(tmp_path):
    """Engine-level quality: int8 output within a bounded PSNR of the
    float engine on the same weights."""
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.weights import save_params

    params = _tiny_params()
    weights_dir = tmp_path / "w"
    save_params(params, weights_dir / "realesrgan_x4.npz")

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    f32 = SREngine("realesrgan_x4", weights_dir=weights_dir,
                   dtype="float32", tile_size=48, tile_pad=4,
                   batch_size=4).enhance(img)
    q8 = SREngine("realesrgan_x4", weights_dir=weights_dir,
                  dtype="int8", tile_size=48, tile_pad=4,
                  batch_size=4).enhance(img)
    p = _psnr(q8 / 255.0, f32 / 255.0)
    assert p > 35.0, f"int8 engine quality too low: {p:.1f} dB"


def test_int8_coalesced_serving_matches_individual(tmp_path):
    """enhance_serving_many under the int8 engine == per-image serving
    (the batch-coalescing path reuses the same quantized chunk
    executables)."""
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.weights import save_params

    params = _tiny_params()
    weights_dir = tmp_path / "w"
    save_params(params, weights_dir / "realesrgan_x4.npz")
    engine = SREngine("realesrgan_x4", weights_dir=weights_dir,
                      dtype="int8", tile_size=48, tile_pad=4, batch_size=4)
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (40, 40, 3)).astype(np.uint8),
            rng.integers(0, 256, (50, 42, 3)).astype(np.uint8)]
    many = engine.enhance_serving_many(imgs)
    for img, out in zip(imgs, many):
        np.testing.assert_array_equal(out, engine.enhance_serving(img))


def test_int8_rejects_swinir(tmp_path):
    from s2sr_tpu.models.engine import SREngine

    with pytest.raises(ValueError, match="int8"):
        SREngine("swinir_x4", weights_dir=tmp_path, dtype="int8")
