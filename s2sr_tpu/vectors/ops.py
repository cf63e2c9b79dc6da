"""Segmentation primitives in JAX (scipy.ndimage / cv2 equivalents).

The reference's field segmentation is CPU scipy/cv2
(``server/app/vector_extraction.py:304-383``): gaussian smoothing,
elliptical morphology, hole filling, L2 distance transform, connected
components, watershed. SURVEY §7 ranks watershed/CC "hard part #2" —
they are inherently sequential flood algorithms; here they are
reformulated as converging iterative label relaxations
(``lax.while_loop`` of cheap 3×3 min/max filters) that map well to the
VPU, with the distance transform as jump-flooding (O(log n) gather
passes):

- :func:`gaussian_filter` — matches ``scipy.ndimage.gaussian_filter``
  (truncate=4.0, reflect mode),
- :func:`binary_close` / :func:`binary_open` — cv2 ellipse kernels,
- :func:`fill_holes` — border flood on the complement,
- :func:`distance_transform` — jump-flood EDT (exact for almost all
  pixels; ≤1 px deviation possible on voronoi seams),
- :func:`connected_components` — min-label relaxation,
- :func:`watershed_uniform` — geodesic nearest-marker flooding, the
  behaviour cv2.watershed exhibits on the uniform images the reference
  feeds it (``vector_extraction.py:356-378``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# --- gaussian (scipy.ndimage semantics) --------------------------------

def _scipy_gauss_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnums=(1,))
def gaussian_filter(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """scipy.ndimage.gaussian_filter (2-D, mode='reflect') equivalent."""
    k = jnp.asarray(_scipy_gauss_kernel(sigma))
    radius = (k.shape[0] - 1) // 2
    x = img.astype(jnp.float32)
    # scipy 'reflect' = numpy 'symmetric' (edge pixel repeated)
    xp = jnp.pad(x, ((radius, radius), (0, 0)), mode="symmetric")
    x = sum(xp[i:i + img.shape[0]] * k[i] for i in range(k.shape[0]))
    xp = jnp.pad(x, ((0, 0), (radius, radius)), mode="symmetric")
    return sum(xp[:, i:i + img.shape[1]] * k[i] for i in range(k.shape[0]))


# --- morphology (cv2 semantics) ----------------------------------------

def ellipse_kernel(size: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (size, size))."""
    r = size // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    kernel = np.zeros((size, size), np.uint8)
    for i in range(size):
        dy = abs(i - r)
        if r > 0:
            dx = int(round(r * math.sqrt(max(0.0, 1.0 - (dy * dy) * inv_r2))))
        else:
            dx = 0
        kernel[i, max(r - dx, 0):min(r + dx + 1, size)] = 1
    return kernel


def _dilate_once(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((ph, ph), (pw, pw)), constant_values=0)
    out = jnp.zeros_like(x)
    for i in range(kh):
        for j in range(kw):
            if kernel[i, j]:
                out = jnp.maximum(out, xp[i:i + x.shape[0], j:j + x.shape[1]])
    return out


def _erode_once(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((ph, ph), (pw, pw)), constant_values=1)
    out = jnp.ones_like(x)
    for i in range(kh):
        for j in range(kw):
            if kernel[i, j]:
                out = jnp.minimum(out, xp[i:i + x.shape[0], j:j + x.shape[1]])
    return out


@partial(jax.jit, static_argnums=(1, 2))
def binary_close(mask: jnp.ndarray, kernel_size: int = 5,
                 iterations: int = 2,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """cv2.morphologyEx(MORPH_CLOSE, ellipse) — dilate×n then erode×n.

    With ``valid`` (bool mask of the true image rectangle inside a
    shape-bucketed frame), pixels outside it take cv2's BORDER_CONSTANT
    values — 0 for dilate, 1 for erode (morphologyDefaultBorderValue) —
    so results on the valid rectangle match cv2 on the unpadded crop.
    """
    kernel = ellipse_kernel(kernel_size)
    x = mask.astype(jnp.uint8)
    for _ in range(iterations):
        if valid is not None:
            x = jnp.where(valid, x, 0)
        x = _dilate_once(x, kernel)
    for _ in range(iterations):
        if valid is not None:
            x = jnp.where(valid, x, 1)
        x = _erode_once(x, kernel)
    if valid is not None:
        x = jnp.where(valid, x, 0)
    return x


@partial(jax.jit, static_argnums=(1, 2))
def binary_open(mask: jnp.ndarray, kernel_size: int = 5,
                iterations: int = 2,
                valid: jnp.ndarray | None = None) -> jnp.ndarray:
    kernel = ellipse_kernel(kernel_size)
    x = mask.astype(jnp.uint8)
    for _ in range(iterations):
        if valid is not None:
            x = jnp.where(valid, x, 1)
        x = _erode_once(x, kernel)
    for _ in range(iterations):
        if valid is not None:
            x = jnp.where(valid, x, 0)
        x = _dilate_once(x, kernel)
    if valid is not None:
        x = jnp.where(valid, x, 0)
    return x


# --- hole filling ------------------------------------------------------

@jax.jit
def fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """scipy.ndimage.binary_fill_holes equivalent: flood the complement
    from the border; anything unreached is a hole → filled."""
    inv = (mask == 0)
    h, w = mask.shape
    border = jnp.zeros((h, w), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    reach0 = border & inv

    # scipy floods the complement with the default cross structure
    # (generate_binary_structure(2, 1)) — 4-connected, so holes behind
    # diagonally-pinched walls still count as holes.
    k3 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)

    def body(state):
        reach, _ = state
        grown = _dilate_once(reach.astype(jnp.uint8), k3) > 0
        new = grown & inv
        return new, jnp.any(new != reach)

    def cond(state):
        return state[1]

    reach, _ = jax.lax.while_loop(cond, body, (reach0, jnp.asarray(True)))
    return (mask | (~reach & inv)).astype(jnp.uint8)


# --- distance transform (jump flooding) --------------------------------

@jax.jit
def distance_transform(mask: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance to the nearest zero pixel (cv2.distanceTransform
    DIST_L2 / scipy distance_transform_edt equivalent), via the
    jump-flooding algorithm: log2(n) gather passes over (y, x) seeds."""
    h, w = mask.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    big = jnp.int32(1 << 20)
    inside = mask > 0
    seed_y = jnp.where(inside, big, yy)
    seed_x = jnp.where(inside, big, xx)

    def dist2(sy, sx):
        dy = (sy - yy).astype(jnp.float32)
        dx = (sx - xx).astype(jnp.float32)
        return jnp.where(sy >= big, jnp.float32(1e18), dy * dy + dx * dx)

    steps = []
    step = 1 << max(h, w).bit_length()
    while step >= 1:
        steps.append(step)
        step //= 2

    sy, sx = seed_y, seed_x
    for step in steps:
        best = dist2(sy, sx)
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dy == 0 and dx == 0:
                    continue
                cy = jnp.roll(sy, (dy, dx), (0, 1))
                cx = jnp.roll(sx, (dy, dx), (0, 1))
                # mask wrap-around: candidates whose origin wrapped are junk,
                # but their coords stay valid seeds (still actual zero pixels),
                # so correctness holds — JFA just needs *some* seed.
                d = dist2(cy, cx)
                take = d < best
                best = jnp.where(take, d, best)
                sy = jnp.where(take, cy, sy)
                sx = jnp.where(take, cx, sx)
    return jnp.sqrt(dist2(sy, sx))


# --- connected components ---------------------------------------------

@jax.jit
def connected_components(mask: jnp.ndarray) -> jnp.ndarray:
    """8-connected labelling via min-label relaxation.

    Output matches cv2.connectedComponents up to label renumbering
    (labels here are flat indices; use :func:`renumber_labels` for
    compact 1..N ids with background 0).
    """
    h, w = mask.shape
    inside = mask > 0
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    big = jnp.int32(h * w + 1)
    labels0 = jnp.where(inside, idx, big)

    def min_neighbor(lab):
        lp = jnp.pad(lab, 1, constant_values=big)
        best = lab
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                best = jnp.minimum(best, lp[dy:dy + h, dx:dx + w])
        return jnp.where(inside, best, big)

    def body(state):
        lab, _ = state
        new = jnp.minimum(lab, min_neighbor(lab))
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], body, (labels0, jnp.asarray(True)))
    return jnp.where(inside, labels + 1, 0)  # 0 = background


def renumber_labels(labels: np.ndarray) -> np.ndarray:
    """Compact nonzero labels to 1..N (host-side, vectorized —
    O(pixels·log labels), not the O(labels·pixels) per-label scan)."""
    unique = np.unique(labels)
    compact = np.cumsum(unique > 0).astype(np.int32)  # 0 stays 0
    return compact[np.searchsorted(unique, labels)]


# --- watershed (uniform-image flooding) --------------------------------

@jax.jit
def watershed_uniform(markers: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Flood marker labels geodesically through ``mask`` until it is
    covered — the behaviour of cv2.watershed on a constant-intensity
    image (the reference's usage: binary field mask + distance-maxima
    markers, ``vector_extraction.py:356-378``). Ties at equidistant
    fronts resolve to the smaller label (cv2 resolves by queue order;
    boundaries may differ by ≤1 px — SURVEY §7 hard-part #2 tolerance).

    ``markers``: int32, 0 = unassigned; ``mask``: flood region (>0).
    """
    h, w = markers.shape
    inside = mask > 0
    big = jnp.int32(1 << 30)
    lab0 = jnp.where(markers > 0, markers.astype(jnp.int32), big)
    lab0 = jnp.where(inside | (markers > 0), lab0, -1)  # -1 = outside

    def spread(lab):
        current = jnp.where(lab > 0, lab, big)
        lp = jnp.pad(current, 1, constant_values=big)
        best = current
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                best = jnp.minimum(best, lp[dy:dy + h, dx:dx + w])
        # only unassigned inside pixels adopt a neighbour label
        unassigned = (lab == big)
        return jnp.where(unassigned & (best < big), best, lab)

    def body(state):
        lab, _ = state
        new = spread(lab)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(lambda s: s[1], body,
                                (lab0, jnp.asarray(True)))
    lab = jnp.where(lab >= big, 0, lab)
    return jnp.where(lab < 0, 0, lab)


# --- v2 additions: sobel, maximum filter, gradient watershed -----------

@jax.jit
def sobel_gradient(img: jnp.ndarray) -> jnp.ndarray:
    """Gradient magnitude from scipy-style Sobel filters
    (``scipy.ndimage.sobel`` per axis, reflect mode —
    ``vector_extraction_v2.py:371-373``)."""
    x = img.astype(jnp.float32)
    xp = jnp.pad(x, 1, mode="symmetric")
    h, w = img.shape

    def shifted(dy, dx):
        return xp[dy:dy + h, dx:dx + w]

    # scipy sobel axis=1 (x): smooth [1,2,1] over rows, diff [-1,0,1] over cols
    gx = ((shifted(0, 2) + 2 * shifted(1, 2) + shifted(2, 2))
          - (shifted(0, 0) + 2 * shifted(1, 0) + shifted(2, 0)))
    gy = ((shifted(2, 0) + 2 * shifted(2, 1) + shifted(2, 2))
          - (shifted(0, 0) + 2 * shifted(0, 1) + shifted(0, 2)))
    return jnp.sqrt(gx * gx + gy * gy)


@partial(jax.jit, static_argnums=(1,))
def maximum_filter(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """scipy.ndimage.maximum_filter (square window, reflect mode)."""
    half_lo = size // 2
    half_hi = size - 1 - half_lo
    x = img.astype(jnp.float32)
    h, w = img.shape
    xp = jnp.pad(x, ((half_lo, half_hi), (0, 0)), mode="symmetric")
    x = xp[0:h]
    for i in range(1, size):
        x = jnp.maximum(x, xp[i:i + h])
    xp = jnp.pad(x, ((0, 0), (half_lo, half_hi)), mode="symmetric")
    x = xp[:, 0:w]
    for i in range(1, size):
        x = jnp.maximum(x, xp[:, i:i + w])
    return x


@partial(jax.jit, static_argnums=(3,))
def watershed_gradient(markers: jnp.ndarray, gradient: jnp.ndarray,
                       mask: jnp.ndarray, levels: int = 64) -> jnp.ndarray:
    """Marker-driven watershed on a gradient surface.

    Approximates Meyer's priority flooding (cv2.watershed,
    ``vector_extraction_v2.py:402-406``) by quantising the gradient into
    ``levels`` altitude bands and geodesically spreading labels through
    each band lowest-first. Basin boundaries land within ~1 quantisation
    band of the exact algorithm.
    """
    h, w = markers.shape
    inside = mask > 0
    g = gradient.astype(jnp.float32)
    gmin = jnp.min(g)
    gmax = jnp.max(g)
    q = jnp.clip(((g - gmin) / jnp.maximum(gmax - gmin, 1e-12)
                  * (levels - 1)).astype(jnp.int32), 0, levels - 1)

    big = jnp.int32(1 << 30)
    lab0 = jnp.where(markers > 0, markers.astype(jnp.int32), big)
    lab0 = jnp.where(inside | (markers > 0), lab0, -1)

    def spread_level(lab, level):
        allowed = inside & (q <= level)

        def one(state):
            lab, _ = state
            current = jnp.where(lab > 0, lab, big)
            lp = jnp.pad(current, 1, constant_values=big)
            best = current
            for dy in (0, 1, 2):
                for dx in (0, 1, 2):
                    if dy == 1 and dx == 1:
                        continue
                    best = jnp.minimum(best, lp[dy:dy + h, dx:dx + w])
            unassigned = (lab == big) & allowed
            new = jnp.where(unassigned & (best < big), best, lab)
            return new, jnp.any(new != lab)

        lab, _ = jax.lax.while_loop(lambda s: s[1], one,
                                    (lab, jnp.asarray(True)))
        return lab

    def body(level, lab):
        return spread_level(lab, level)

    lab = jax.lax.fori_loop(0, levels, body, lab0)
    lab = jnp.where(lab >= big, 0, lab)
    return jnp.where(lab < 0, 0, lab)


def kmeans_1d(values: jnp.ndarray, k: int, iters: int = 25,
              seed: int = 42) -> jnp.ndarray:
    """Lloyd's k-means on a 1-D feature (the management-zone clustering,
    ``vector_extraction_v2.py:676-677``), jit-compiled. Returns labels
    ordered so cluster ids are sorted by centroid value."""
    values = values.reshape(-1).astype(jnp.float32)

    @partial(jax.jit, static_argnums=(1, 2))
    def run(vals, k, iters):
        # quantile init (deterministic)
        qs = jnp.quantile(vals, (jnp.arange(k) + 0.5) / k)

        def step(_, centers):
            d = jnp.abs(vals[:, None] - centers[None, :])
            assign = jnp.argmin(d, axis=1)
            sums = jax.ops.segment_sum(vals, assign, num_segments=k)
            counts = jax.ops.segment_sum(jnp.ones_like(vals), assign,
                                         num_segments=k)
            return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)

        centers = jax.lax.fori_loop(0, iters, step, qs)
        order = jnp.argsort(centers)
        rank = jnp.argsort(order)
        assign = jnp.argmin(jnp.abs(vals[:, None] - centers[None, :]), axis=1)
        return rank[assign]

    return run(values, k, iters)
