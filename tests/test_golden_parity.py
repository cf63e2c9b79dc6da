"""End-to-end WOW parity: our pipeline vs a torch+cv2 reference oracle.

The strongest integration guarantee in the suite: the oracle replays the
reference's *entire* WOW path (``wow_sr.py:28-209``) — uint8 read, BGR
feed, torch RRDBNet forward, *255/clip/truncate quantisation, then the
cv2 CLAHE/unsharp/vegetation chain — using shared random weights, and
the framework must reproduce it within the documented Lab-table budget.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from s2sr_tpu.models.weights import convert_rrdbnet_state_dict, save_params
from test_rrdbnet import NB, make_state_dict, oracle_forward


def reference_wow_oracle(sd, img_rgb: np.ndarray) -> np.ndarray:
    """The reference WOW path, end to end (torch + cv2)."""
    img_bgr = img_rgb[:, :, ::-1].copy()
    x = torch.from_numpy(img_bgr.astype(np.float32) / 255.0)
    x = x.permute(2, 0, 1).unsqueeze(0)
    out = oracle_forward(sd, x, nb=NB, scale=4)
    out = out.squeeze(0).permute(1, 2, 0).numpy()
    sr_bgr = (out * 255.0).clip(0, 255).astype(np.uint8)
    sr_rgb = sr_bgr[:, :, ::-1]

    # _enhance_for_crops (wow_sr.py:187-209)
    lab = cv2.cvtColor(sr_rgb, cv2.COLOR_RGB2LAB)
    clahe = cv2.createCLAHE(clipLimit=2.5, tileGridSize=(8, 8))
    lab[:, :, 0] = clahe.apply(lab[:, :, 0])
    enhanced = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    blurred = cv2.GaussianBlur(enhanced, (0, 0), 1.2)
    sharpened = cv2.addWeighted(enhanced, 1.4, blurred, -0.4, 0)
    hsv = cv2.cvtColor(sharpened, cv2.COLOR_RGB2HSV).astype(np.float32)
    green = (hsv[:, :, 0] > 35) & (hsv[:, :, 0] < 85)
    hsv[:, :, 1] = np.where(green, np.clip(hsv[:, :, 1] * 1.2, 0, 255),
                            hsv[:, :, 1])
    final = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return np.clip(final, 0, 255).astype(np.uint8)


def test_wow_path_matches_reference_oracle(tmp_path):
    from s2sr_tpu.fetch.synthetic import synthetic_fields
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.ops.enhance import enhance_for_crops
    from s2sr_tpu.utils.metrics import psnr

    sd = make_state_dict()
    params = convert_rrdbnet_state_dict(sd)
    weights_dir = tmp_path / "weights"
    save_params(params, weights_dir / "realesrgan_x4.npz")

    img = synthetic_fields(size=(48, 40), seed=3)
    want = reference_wow_oracle(sd, img)

    engine = SREngine("realesrgan_x4", weights_dir=weights_dir,
                      dtype="float32")
    sr = engine.enhance_device(jnp.asarray(img))
    got = np.asarray(enhance_for_crops(sr))

    assert got.shape == want.shape == (192, 160, 3)
    score = psnr(got, want)
    # deviation budget: ±1 LSB Lab tables through CLAHE (documented in
    # tests/test_enhance.py); the SR stage itself is exact in fp32
    assert score > 40.0, f"wow-path PSNR {score:.1f} dB"
    # and the SR stage alone is quantisation-exact
    x = torch.from_numpy(img[:, :, ::-1].astype(np.float32) / 255.0)
    x = x.permute(2, 0, 1).unsqueeze(0)
    out = oracle_forward(sd, x, nb=NB, scale=4).squeeze(0).permute(1, 2, 0)
    sr_want = (out.numpy() * 255.0).clip(0, 255).astype(np.uint8)[:, :, ::-1]
    np.testing.assert_array_equal(np.asarray(sr), sr_want)


def test_tiled_wow_sr_matches_reference_tile_loop(tmp_path):
    """An image above the h·w > tile²·4 threshold exercises the batched
    halo engine; the oracle replays the reference's sequential tile loop
    (``cnn_super_resolution.py:236-280``) with the torch model."""
    from s2sr_tpu.fetch.synthetic import synthetic_fields
    from s2sr_tpu.models.engine import SREngine

    sd = make_state_dict()
    params = convert_rrdbnet_state_dict(sd)
    weights_dir = tmp_path / "weights"
    save_params(params, weights_dir / "realesrgan_x4.npz")

    img = synthetic_fields(size=(300, 280), seed=9)

    # oracle: reference tile loop, tile=128/pad=10 (small to multi-tile)
    tile, pad, scale = 128, 10, 4
    bgr = img[:, :, ::-1].astype(np.float32) / 255.0
    h, w, _ = bgr.shape
    out = np.zeros((h * scale, w * scale, 3), np.float32)
    tiles_x = (w + tile - 1) // tile
    tiles_y = (h + tile - 1) // tile
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            x1, y1 = tx * tile, ty * tile
            x2 = min(x1 + tile + pad * 2, w)
            y2 = min(y1 + tile + pad * 2, h)
            x1 = max(x2 - tile - pad * 2, 0)
            y1 = max(y2 - tile - pad * 2, 0)
            t_in = torch.from_numpy(bgr[y1:y2, x1:x2]).permute(2, 0, 1)[None]
            t_out = oracle_forward(sd, t_in, nb=NB, scale=scale)
            t_out = t_out.squeeze(0).permute(1, 2, 0).numpy()
            ox1, oy1, ox2, oy2 = (x1 * scale, y1 * scale,
                                  x2 * scale, y2 * scale)
            p = pad * scale
            if tx > 0:
                t_out = t_out[:, p:]
                ox1 += p
            if ty > 0:
                t_out = t_out[p:]
                oy1 += p
            if tx < tiles_x - 1:
                t_out = t_out[:, :-p]
                ox2 -= p
            if ty < tiles_y - 1:
                t_out = t_out[:-p]
                oy2 -= p
            out[oy1:oy2, ox1:ox2] = t_out
    want = (out * 255.0).clip(0, 255).astype(np.uint8)[:, :, ::-1]

    engine = SREngine("realesrgan_x4", weights_dir=weights_dir,
                      dtype="float32", tile_size=tile, tile_pad=pad,
                      batch_size=2)
    got = engine.enhance(img)
    # float-associativity knife edges at the *255 truncation can flip
    # isolated pixels by one level (~1e-5 of pixels); anything more
    # would indicate a tiling/stitch bug
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-4
