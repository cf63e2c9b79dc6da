"""Gaussian filtering + unsharp mask matching cv2 semantics, in JAX.

The WOW chain's sharpening step (``server/app/wow_sr.py:196-197``) is
``GaussianBlur(σ=1.2, ksize auto)`` + ``addWeighted(1.4, -0.4)``; the
farm chain uses σ=1.0/2.0 variants (``server/app/farm_sr.py:61-88``).

cv2 specifics reproduced here:
- auto kernel size for 8U input: ``ksize = round(σ·3·2 + 1) | 1``,
- ``BORDER_REFLECT_101`` edge handling (numpy/jnp ``reflect``),
- separable filtering with round-to-nearest uint8 saturation.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel for explicitly positive sigma."""
    c = (ksize - 1) / 2.0
    xs = np.arange(ksize, dtype=np.float64) - c
    k = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def auto_ksize(sigma: float, depth_8u: bool = True) -> int:
    """cv2.GaussianBlur's ksize=(0,0) rule."""
    k = int(round(sigma * (3 if depth_8u else 4) * 2 + 1)) | 1
    return max(k, 1)


def gaussian_blur(
    img: jnp.ndarray, sigma: float, ksize: Optional[int] = None
) -> jnp.ndarray:
    """Separable Gaussian blur of (H, W, C) float32, reflect-101 borders."""
    if ksize is None:
        ksize = auto_ksize(sigma)
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2
    x = img.astype(jnp.float32)
    xp = jnp.pad(x, ((pad, pad), (0, 0), (0, 0)), mode="reflect")
    x = sum(xp[i:i + img.shape[0]] * k[i] for i in range(ksize))
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = sum(xp[:, i:i + img.shape[1]] * k[i] for i in range(ksize))
    return x


# cv2's u8 GaussianBlur runs a FIXED-POINT pipeline (the "bit-exact"
# path, OpenCV 3.4.1+): an 8-bit kernel summing to exactly 256, an
# exact u16 horizontal pass (value·2⁸), a vertical accumulation to
# value·2¹⁶ and a half-up descale. The 8-bit kernel is round(k·256)
# with the quantization residue added to the CENTER tap — verified
# byte-exact vs cv2 for σ 1.0 / 1.2 / 1.5 (every σ the enhancement
# chains use) on dense random images. σ 2.0 shows cv2 distributing
# its residue differently ([52,45,31,16,7,2,1] vs our [51,45,31,17,…]);
# its oracle-derived half-kernel is baked below.
_FIXED_KERNELS = {
    (13, 2.0): np.array([1, 2, 7, 16, 31, 45, 52, 45, 31, 16, 7, 2, 1],
                        np.int64),
}


def _fixed_kernel_u8(ksize: int, sigma: float) -> np.ndarray:
    key = (ksize, round(float(sigma), 6))
    if key in _FIXED_KERNELS:
        return _FIXED_KERNELS[key]
    k = gaussian_kernel_1d(ksize, sigma).astype(np.float64)
    q = np.round(k * 256).astype(np.int64)
    q[ksize // 2] += 256 - q.sum()
    return q


def gaussian_blur_u8(img: jnp.ndarray, sigma: float,
                     ksize: Optional[int] = None) -> jnp.ndarray:
    """uint8 in → uint8 out — bit-exact cv2.GaussianBlur (the u8
    fixed-point path; the old float emulation was ±1 LSB on ~19%).

    All arithmetic runs in f32 on exact integers < 2²⁴ (max
    accumulator 255·2¹⁶ + 2¹⁵ < 2²⁴), so FMA contraction cannot change
    any value — no barriers needed, and the separable passes stay
    VPU-elementwise on TPU."""
    if ksize is None:
        ksize = auto_ksize(sigma)
    q = _fixed_kernel_u8(ksize, sigma)
    pad = ksize // 2
    h, w = img.shape[0], img.shape[1]
    x = img.astype(jnp.float32)
    xp = jnp.pad(x, ((pad, pad),) + ((0, 0),) * (x.ndim - 1),
                 mode="reflect")
    acc = sum(xp[i:i + h] * jnp.float32(q[i]) for i in range(ksize))
    ap = jnp.pad(acc, ((0, 0), (pad, pad)) + ((0, 0),) * (x.ndim - 2),
                 mode="reflect")
    v = sum(ap[:, i:i + w] * jnp.float32(q[i]) for i in range(ksize))
    out = jnp.floor((v + jnp.float32(32768.0)) * jnp.float32(2.0 ** -16))
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def add_weighted_u8(a: jnp.ndarray, alpha: float,
                    b: jnp.ndarray, beta: float,
                    gamma: float = 0.0) -> jnp.ndarray:
    """cv2.addWeighted on uint8 (saturating, round-to-nearest)."""
    out = a.astype(jnp.float32) * alpha + b.astype(jnp.float32) * beta + gamma
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def unsharp_mask_u8(img: jnp.ndarray, sigma: float,
                    amount: float, ksize: Optional[int] = None) -> jnp.ndarray:
    """``addWeighted(img, 1+amount, blur(img), -amount)`` — the reference's
    sharpening building block (``wow_sr.py:196-197`` with amount=0.4)."""
    blurred = gaussian_blur_u8(img, sigma, ksize)
    return add_weighted_u8(img, 1.0 + amount, blurred, -amount)
