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
