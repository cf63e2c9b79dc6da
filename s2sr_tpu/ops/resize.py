"""Integer-factor bicubic upscale matching ``cv2.resize INTER_CUBIC``.

Used by the classic-model luma path: the reference's cv2.dnn_superres
upscales the Cr/Cb channels with INTER_CUBIC while the network handles
luma. cv2's bicubic uses the Catmull-Rom-like kernel with a = -0.75,
center-aligned sampling (src = (dst + 0.5)/s - 0.5) and replicated
borders; for an integer factor the fractional phases repeat, so the
resize is a fixed bank of s 4-tap filters per axis — implemented as a
vectorised gather + weighted sum (oracle-tested against cv2.resize).
"""

from __future__ import annotations

import numpy as np


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """4-tap weights for fractional offset t ∈ [0,1): taps at
    -1, 0, +1, +2 relative to floor(src)."""
    d = np.stack([t + 1.0, t, 1.0 - t, 2.0 - t])
    ad = np.abs(d)
    w = np.where(
        ad <= 1.0, (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0,
        np.where(ad < 2.0, a * (ad**3 - 5.0 * ad**2 + 8.0 * ad - 4.0), 0.0))
    return w.astype(np.float32)


def _upscale_axis(img: np.ndarray, s: int, axis: int) -> np.ndarray:
    img = np.moveaxis(img, axis, 0)
    n = img.shape[0]
    dst = np.arange(n * s, dtype=np.float64)
    src = (dst + 0.5) / s - 0.5
    base = np.floor(src).astype(np.int64)
    frac = (src - base).astype(np.float32)
    w = _cubic_weights(frac)                        # (4, n*s)
    idx = np.clip(base[None, :] + np.array([-1, 0, 1, 2])[:, None], 0, n - 1)
    out = np.einsum("kd,kd...->d...", w, img[idx].astype(np.float32))
    return np.moveaxis(out, 0, axis)


def upscale_cubic(img: np.ndarray, s: int) -> np.ndarray:
    """(H, W[, C]) float → (H·s, W·s[, C]), cv2 INTER_CUBIC parity."""
    return _upscale_axis(_upscale_axis(img, s, 0), s, 1)
