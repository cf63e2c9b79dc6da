"""Device-side JPEG compression degradation (DCT-quantization model).

Real-ESRGAN's degradation recipe is blur + noise + **JPEG** (the
reference serves weights trained with it upstream; the in-repo sampler
already carries blur/noise — this adds the missing third leg so the
training subsystem can synthesise the full "real" degradation on
device, inside the scanned train step).

TPU-native formulation: JPEG's lossy core is 8×8 block DCT →
quantization → IDCT. Blocked DCT is two 8×8 matmuls per block, which
XLA maps onto the MXU as one batched einsum over all blocks — no
Huffman/entropy stage is needed because it is lossless. The model:

- RGB → full-range BT.601 YCbCr (the JFIF convention),
- 4:2:0 chroma subsampling (2×2 mean; libjpeg's default sampling),
- per-channel 8×8 DCT-II (orthonormal), centred at −128,
- quantization ``round(coef / t_q) * t_q`` with the ITU T.81 Annex K
  example tables scaled by libjpeg's quality curve
  (``q<50 → 5000/q``, else ``200−2q``; per-entry clip to [1, 255]),
- IDCT, nearest chroma upsample, YCbCr → RGB, clip to [0, 1].

``quality`` may be a traced scalar → per-sample random quality inside
``jit`` (the table scaling is a handful of VPU ops). Differences vs
libjpeg proper (validated in tests/test_jpeg.py against cv2.imencode):
integer rounding points and the decoder's "fancy" triangular chroma
upsample — the simulated output stays within a few dB of the real
round-trip and tracks quality monotonically, which is what a
degradation model needs.

Reference context: the reference itself never trains (SURVEY §2); this
mirrors the upstream Real-ESRGAN recipe its released weights came from
(second-order degradation pipeline), as BENCH_NOTES' weights-gap
section documents.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["jpeg_degrade", "dct8_matrix", "luma_qtable", "chroma_qtable"]


def dct8_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix ``D`` (f_hat = D f D^T)."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    d[0] *= 1.0 / np.sqrt(2)
    return (d * 0.5).astype(np.float32)


# ITU-T T.81 Annex K.1 example quantization tables (the tables libjpeg
# and cv2 ship as "standard"); public constants, not copied code.
_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)

_CHROMA_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


def luma_qtable(quality):
    return _scale_table(_LUMA_Q, quality)


def chroma_qtable(quality):
    return _scale_table(_CHROMA_Q, quality)


def _scale_table(base: np.ndarray, quality):
    """libjpeg's quality → table mapping (jpeg_quality_scaling +
    jpeg_add_quant_table): works on traced scalars."""
    q = jnp.clip(quality, 1.0, 100.0)
    # libjpeg uses INTEGER division (5000/quality) — float division gives
    # a scale off by up to 1 at some integer qualities (e.g. q=33:
    # int(5000/33)=151 vs 151.515), shifting quant-table entries by 1.
    # floor() == integer division for positive q; non-integer traced
    # qualities degrade gracefully to the same rule applied to floor(q).
    scale = jnp.where(q < 50.0, jnp.floor(5000.0 / jnp.floor(q)),
                      200.0 - 2.0 * q)
    return jnp.clip(jnp.floor((base * scale + 50.0) / 100.0), 1.0, 255.0)


def _blocks(ch: jnp.ndarray) -> jnp.ndarray:
    """(H, W) → (H/8, W/8, 8, 8)"""
    h, w = ch.shape
    return ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblocks(bl: jnp.ndarray) -> jnp.ndarray:
    nh, nw = bl.shape[:2]
    return bl.transpose(0, 2, 1, 3).reshape(nh * 8, nw * 8)


def _dct_quant_idct(ch: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """One channel (0..255 domain, H and W multiples of 8) through
    block DCT → quantize → IDCT."""
    d = jnp.asarray(dct8_matrix(), ch.dtype)
    bl = _blocks(ch - 128.0)
    coef = jnp.einsum("ij,bcjk,lk->bcil", d, bl, d)
    coef = jnp.round(coef / table) * table
    bl = jnp.einsum("ji,bcjk,kl->bcil", d, coef, d)
    return _unblocks(bl) + 128.0


def jpeg_degrade(img: jnp.ndarray, quality,
                 subsample: bool = True) -> jnp.ndarray:
    """JPEG-compression degradation of ``img`` (H, W, 3) RGB in [0, 1].

    ``quality`` ∈ [1, 100] (python float or traced scalar). With
    ``subsample`` (default — libjpeg's 4:2:0) H and W must be multiples
    of 16, else multiples of 8; training crops satisfy this
    (``crop_lr`` 48). Returns the degraded image clipped to [0, 1].
    """
    h, w, _ = img.shape
    mult = 16 if subsample else 8
    if h % mult or w % mult:
        raise ValueError(f"jpeg_degrade needs H, W multiples of {mult}, "
                         f"got {h}x{w}")
    x = img.astype(jnp.float32) * 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    tl = luma_qtable(quality).astype(jnp.float32)
    tc = chroma_qtable(quality).astype(jnp.float32)

    y = _dct_quant_idct(y, tl)
    if subsample:
        def down2(c):
            return c.reshape(h // 2, 2, w // 2, 2).mean((1, 3))

        def up2(c):
            return jnp.repeat(jnp.repeat(c, 2, 0), 2, 1)

        cb = up2(_dct_quant_idct(down2(cb), tc))
        cr = up2(_dct_quant_idct(down2(cr), tc))
    else:
        cb = _dct_quant_idct(cb, tc)
        cr = _dct_quant_idct(cr, tc)

    cb = cb - 128.0
    cr = cr - 128.0
    out = jnp.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return jnp.clip(out / 255.0, 0.0, 1.0).astype(img.dtype)
