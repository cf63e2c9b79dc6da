"""Colorspace conversions matching OpenCV uint8 semantics, in JAX.

The WOW/farm enhancement chains hinge on cv2's exact 8-bit conversions
(``server/app/wow_sr.py:190-207``): RGB↔Lab (D65, sRGB gamma, L scaled
to 0..255, a/b offset +128) and RGB↔HSV (H in 0..179). These run
on-device as part of the fused enhancement chain. RGB→HSV and RGB→Lab
are bit-exact vs cv2 (fixed-point pipelines, exhaustively verified);
HSV→RGB matches cv2's float path; Lab→RGB is within ≤2 LSB of cv2's
integer inverse (rare — see its docstring).

All functions take/return ``(..., 3)`` arrays; uint8 variants are
suffixed ``_u8`` and operate on float32 internally.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sRGB → XYZ (D65) matrix rows (OpenCV constants)
_XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
_XN = 0.950456
_ZN = 1.088754
_LAB_T = 0.008856
_LAB_K = 7.787
_LAB_OFF = 16.0 / 116.0


def _srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * x ** (1.0 / 2.4) - 0.055)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(t > _LAB_T, jnp.cbrt(t), _LAB_K * t + _LAB_OFF)


def _lab_f_inv(ft: jnp.ndarray) -> jnp.ndarray:
    t3 = ft**3
    return jnp.where(t3 > _LAB_T, t3, (ft - _LAB_OFF) / _LAB_K)


# --- cv2's exact fixed-point RGB→Lab (8U) pipeline ---------------------
#
# cv2.COLOR_RGB2LAB on uint8 runs an integer pipeline (color_lab.cpp):
# an 11-bit sRGB gamma table (round(2040·γ(i/255))), a 12-bit XYZ matrix
# with the D65 whitepoint division baked into the rounded coefficients,
# a 3072-entry cube-root table (round(2¹⁵·f(i/2040))) and CV_DESCALE
# rounding. Emulating the float formula instead deviates up to 3 LSB on
# ~0.05% of the cube (dark saturated colors). The tables below are the
# f64 formula values plus two entry corrections where OpenCV's softfloat
# init rounds differently — derived by constraint-solving the exhaustive
# 256³ cv2 oracle (scripts/derive_lab_tables.py); the result is
# byte-exact vs cv2 on ALL 16 777 216 colors (0 mismatches).
_LAB_SHIFT = 12
_LAB_SHIFT2 = 15


def _lab_tables() -> tuple:
    i = np.arange(256) / 255.0
    gamma = np.where(i <= 0.04045, i / 12.92, ((i + 0.055) / 1.055) ** 2.4)
    gamma_tab = np.floor(2040.0 * gamma + 0.5).astype(np.int32)
    x = np.arange(3072) / 2040.0
    f = np.where(x < 216.0 / 24389.0, x * 841.0 / 108.0 + 16.0 / 116.0,
                 np.cbrt(x))
    cbrt_tab = np.floor((1 << _LAB_SHIFT2) * f + 0.5).astype(np.int32)
    # softfloat-vs-IEEE table-init rounding: the only two entries where
    # OpenCV's init lands on the other side of .5 (oracle-derived)
    cbrt_tab[49] -= 1
    cbrt_tab[628] += 1
    coeffs = np.floor((1 << _LAB_SHIFT) * np.asarray(_XYZ)
                      / np.asarray([_XN, 1.0, _ZN])[:, None] + 0.5
                      ).astype(np.int32)
    return gamma_tab, cbrt_tab, coeffs


_LAB_GAMMA_TAB, _LAB_CBRT_TAB, _LAB_COEFFS = _lab_tables()


def _descale(v: jnp.ndarray, n: int) -> jnp.ndarray:
    return (v + (1 << (n - 1))) >> n


def _lut_select(idx: jnp.ndarray, table: np.ndarray, w: int,
                chunk: int = 1 << 21) -> jnp.ndarray:
    """Bit-exact table lookup as two one-hot selections on the MXU.

    Per-element ``jnp.take`` serializes on TPU (~9 ns/element — the six
    Lab lookups cost 3.8 s on one 8192² SR output); this decomposes
    ``T[i]`` into a row-select (one-hot (N, K/w) × (K/w, w) matmul)
    followed by a lane-select (one-hot multiply-reduce over w), turning
    the lookup into MXU work + streamed elementwise at a few hundred
    bytes/px. Exact under ANY matmul precision: TPU f32 dots truncate
    operands to bf16 (8 mantissa bits), so each table value is split
    into two bytes — one-hots (0/1) and bytes (< 2⁸) are bf16-exact,
    every sum has exactly one nonzero term, and accumulation is f32.
    Large inputs run in ``lax.map`` chunks so the (N, 2w) intermediate
    never exceeds a few hundred MB of HBM.
    """
    import jax

    k = table.shape[0]
    t = np.asarray(table, np.int64).reshape(k // w, w)
    assert (t >= 0).all() and (t < 1 << 16).all()
    m2 = jnp.asarray(np.concatenate([t >> 8, t & 255], axis=1)
                     .astype(np.float32))
    shape = idx.shape
    flat = idx.reshape(-1)
    n = flat.shape[0]

    def select(ix):
        ohh = (ix[:, None] // w == jnp.arange(k // w, dtype=jnp.int32)
               ).astype(jnp.float32)
        rows2 = jax.lax.dot_general(ohh, m2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        rows = 256.0 * rows2[:, :w] + rows2[:, w:]
        ohl = (ix[:, None] % w == jnp.arange(w, dtype=jnp.int32)
               ).astype(jnp.float32)
        return jnp.sum(rows * ohl, axis=-1)

    if n <= chunk:
        out = select(flat)
    else:
        pad = -n % chunk
        flat = jnp.pad(flat, (0, pad))
        out = jax.lax.map(select, flat.reshape(-1, chunk)).reshape(-1)[:n]
    return out.astype(jnp.int32).reshape(shape)


def _lab_lookup(idx: jnp.ndarray, table: np.ndarray, w: int) -> jnp.ndarray:
    """Backend-routed exact lookup: gathers are fast on CPU (and keep
    the exhaustive-cube tests cheap); TPU takes the MXU formulation.
    Both paths are bit-identical (``test_lab_mxu_lookup_paths_agree``)."""
    import jax

    if jax.default_backend() == "tpu":
        return _lut_select(idx, table, w)
    return jnp.take(jnp.asarray(table), idx)


def rgb_to_lab_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB → uint8 Lab — bit-exact cv2.COLOR_RGB2LAB (verified
    against the exhaustive 256³ cube: 0 mismatches)."""
    C = _LAB_COEFFS
    i = rgb.astype(jnp.int32)
    r = _lab_lookup(i[..., 0], _LAB_GAMMA_TAB, 16)
    g = _lab_lookup(i[..., 1], _LAB_GAMMA_TAB, 16)
    b = _lab_lookup(i[..., 2], _LAB_GAMMA_TAB, 16)
    fX = _lab_lookup(_descale(r * C[0, 0] + g * C[0, 1] + b * C[0, 2],
                              _LAB_SHIFT), _LAB_CBRT_TAB, 64)
    fY = _lab_lookup(_descale(r * C[1, 0] + g * C[1, 1] + b * C[1, 2],
                              _LAB_SHIFT), _LAB_CBRT_TAB, 64)
    fZ = _lab_lookup(_descale(r * C[2, 0] + g * C[2, 1] + b * C[2, 2],
                              _LAB_SHIFT), _LAB_CBRT_TAB, 64)
    l_scale = (116 * 255 + 50) // 100                        # 296
    l_shift = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)
    L = _descale(l_scale * fY + l_shift, _LAB_SHIFT2)
    a = _descale(500 * (fX - fY) + (128 << _LAB_SHIFT2), _LAB_SHIFT2)
    bb = _descale(200 * (fY - fZ) + (128 << _LAB_SHIFT2), _LAB_SHIFT2)
    out = jnp.stack([L, a, bb], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def lab_to_rgb_u8(lab: jnp.ndarray) -> jnp.ndarray:
    """uint8 Lab → uint8 RGB (cv2.COLOR_LAB2RGB semantics).

    Exhaustive 256³ comparison vs cv2 5.0: 91.81% byte-exact, 8.18%
    off by 1 LSB, 0.003% by 2, two pixels by 3.  cv2's u8 inverse is
    its ``Lab2RGBinteger`` fixed-point pipeline; a full reconstruction
    campaign (scripts/derive_lab_inverse.py) coordinate-fitted every
    per-index table (LabToYF, adiv/bdiv, abToXZ, inv-gamma, matrix)
    against the exhaustive oracle and plateaued at 98.2% exact: the
    residual errors sit just above the half-up descale boundary and
    pixels with identical fitted sums map to different oracle outputs,
    so cv2's SIMD combines terms with extra truncation this
    single-descale structure cannot express.  Shipping those ~70 KB
    fitted tables would put two 36 864-entry MXU-LUT gathers on the
    hot chain (≈1 s at 8192², vs ~0.1 s for this formula) for a still
    inexact result — the float formula stays."""
    L = lab[..., 0].astype(jnp.float32) * 100.0 / 255.0
    a = lab[..., 1].astype(jnp.float32) - 128.0
    b = lab[..., 2].astype(jnp.float32) - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    X = _lab_f_inv(fx) * _XN
    Y = _lab_f_inv(fy)
    Z = _lab_f_inv(fz) * _ZN
    r = 3.240479 * X - 1.537150 * Y - 0.498535 * Z
    g = -0.969256 * X + 1.875992 * Y + 0.041556 * Z
    bl = 0.055648 * X - 0.204043 * Y + 1.057311 * Z
    rgb = _linear_to_srgb(jnp.stack([r, g, bl], axis=-1)) * 255.0
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


_HSV_SHIFT = 12
# cv2's fixed-point division tables: sdiv[v] = round((255 << 12) / v),
# hdiv[d] = round((180 << 12) / (6·d)); entry 0 is 0.
# cv2's sdiv/hdiv tables are computed arithmetically in rgb_to_hsv_u8
# (round-half-up integer division — exhaustively equal to the tables,
# asserted in tests); no LUT gathers on device.


def rgb_to_hsv_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB → uint8 HSV with H in 0..179 — bit-exact cv2 fixed-point
    algorithm (12-bit division tables, descale-with-rounding)."""
    i = rgb.astype(jnp.int32)
    r, g, b = i[..., 0], i[..., 1], i[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    half = 1 << (_HSV_SHIFT - 1)
    # cv2's sdiv/hdiv division tables computed arithmetically instead of
    # per-pixel LUT gathers (TPU gathers serialize: 1.4 s → ~0.1 s on
    # 67 MPix). round-half-up equals np.round for every possible entry
    # (no half-to-even ties exist — exhaustively checked in tests).
    sdiv_v = jnp.where(
        v > 0, (2 * (255 << _HSV_SHIFT) + v) // (2 * jnp.maximum(v, 1)), 0)
    hdiv_d = jnp.where(
        diff > 0,
        (2 * (180 << _HSV_SHIFT) + 6 * diff)
        // (12 * jnp.maximum(diff, 1)), 0)
    s = (diff * sdiv_v + half) >> _HSV_SHIFT
    hnum = jnp.where(
        v == r, g - b,
        jnp.where(v == g, (b - r) + 2 * diff, (r - g) + 4 * diff),
    )
    h = (hnum * hdiv_d + half) >> _HSV_SHIFT
    h = jnp.where(h < 0, h + 180, h)
    out = jnp.stack([h, s, v], axis=-1)
    return out.astype(jnp.uint8)


def _fma_rn(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest f32 fused multiply-add a·b+c from plain IEEE f32
    ops (error-free transformations: Dekker two-product + two-sum).

    Needed because cv2's compiled HSV→RGB contracts ``1 - s*x`` into a
    hardware fma, and matching it byte-exactly requires the same single
    rounding; JAX/XLA has no fma primitive and TPU has no f64. Matches
    the true fma except in double-rounding corner cases — none occur on
    the full 256³ HSV cube (exhaustively pinned vs cv2)."""
    from jax.lax import optimization_barrier as ob

    # Every intermediate is barriered: XLA's backend contracts mul+add
    # chains into hardware fma (and may reassociate under fast-math),
    # which silently changes the intermediate roundings the EFT depends
    # on — observed as 1-ulp drift under jit vs op-by-op eager. The
    # barriers pin each step to one IEEE f32 rounding.
    split = jnp.float32(4097.0)   # 2^12 + 1 Dekker split for f32
    ca = ob(split * a)
    ahi = ob(ca - ob(ca - a))
    alo = ob(a - ahi)
    cb = ob(split * b)
    bhi = ob(cb - ob(cb - b))
    blo = ob(b - bhi)
    p = ob(a * b)
    e1 = ob(ob(ahi * bhi) - p)
    e2 = ob(e1 + ob(ahi * blo))
    e3 = ob(e2 + ob(alo * bhi))
    e = ob(e3 + ob(alo * blo))
    s = ob(c + p)
    bv = ob(s - c)
    err = ob(ob(c - ob(s - bv)) + ob(p - bv))
    return ob(s + ob(err + e))


# cv2's HSV→RGB sector table (b, g, r) ← tab index, color_hsv.cpp
_HSV_SECTOR = np.array([[1, 3, 0], [1, 0, 2], [3, 0, 1],
                        [0, 2, 1], [0, 1, 3], [2, 1, 0]], np.int32)


def hsv_to_rgb_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    """uint8 HSV (H 0..179) → uint8 RGB — bit-exact cv2.COLOR_HSV2RGB
    (verified against the exhaustive 256³ cube: 0 mismatches).

    cv2's u8 path runs the float kernel on normalized s, v with h
    scaled by 6/180, contracts ``1 - s*x`` into hardware fma
    (``_fma_rn`` reproduces the single rounding), and TRUNCATES the
    final ×255 — not rounds (the old emulation rounded in the 0..255
    domain: ±1 LSB on 34% of the cube)."""
    one = jnp.float32(1.0)
    s = hsv[..., 1].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    v = hsv[..., 2].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    h = hsv[..., 0].astype(jnp.float32) * jnp.float32(6.0 / 180.0)
    h = jnp.where(h >= 6.0, h - jnp.float32(6.0), h)
    sector = jnp.floor(h)
    frac = h - sector
    sec = jnp.clip(sector.astype(jnp.int32), 0, 5)
    tab = jnp.stack([
        v,
        v * (one - s),
        v * _fma_rn(-s, frac, one),
        v * _fma_rn(-s, one - frac, one),
    ], axis=-1)
    # static per-sector lane picks via select (a take_along_axis gather
    # here would serialize on TPU exactly like the Lab jnp.take did)
    conds = [sec == k for k in range(6)]

    def pick(channel):
        return jnp.select(conds,
                          [tab[..., _HSV_SECTOR[k][channel]]
                           for k in range(6)])

    rgb = jnp.stack([pick(2), pick(1), pick(0)], axis=-1)
    return jnp.clip(jnp.trunc(rgb * jnp.float32(255.0)), 0, 255) \
        .astype(jnp.uint8)


# --- float YCrCb (cv2 COLOR_RGB2YCrCb float semantics) -----------------
#
# The reference's cv2.dnn_superres runs ESPCN/LapSRN/FSRCNN on the luma
# channel of a float [0,1] YCrCb image and bicubic-upscales chroma; the
# classic-model luma path reproduces that flow. cv2 float constants:
# delta = 0.5, Cr = (R-Y)*0.713 + delta, Cb = (B-Y)*0.564 + delta.

def rgb_to_ycrcb_f32(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 0.5
    cb = (b - y) * 0.564 + 0.5
    return jnp.stack([y, cr, cb], axis=-1) if isinstance(rgb, jnp.ndarray) \
        else np.stack([y, cr, cb], axis=-1)


def ycrcb_to_rgb_f32(ycc):
    y, cr, cb = ycc[..., 0], ycc[..., 1] - 0.5, ycc[..., 2] - 0.5
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    return jnp.stack([r, g, b], axis=-1) if isinstance(ycc, jnp.ndarray) \
        else np.stack([r, g, b], axis=-1)
