"""CLAHE (contrast-limited adaptive histogram equalisation) on device.

The WOW chain applies cv2 CLAHE (clip 2.5, 8×8 tiles) to the Lab L
channel (``server/app/wow_sr.py:191-193``); farm uses clip 2.0/3.0
(``server/app/farm_sr.py:74-88``). SURVEY §7 ranks this the #1 hard
kernel: no off-the-shelf JAX op exists, and output must match cv2's
integer algorithm closely (PSNR budget).

The cv2 algorithm, reproduced exactly:
1. pad image to tile-size multiples with reflect-101,
2. 256-bin histogram per tile,
3. clip at ``max(int(clip·tilePixels/256), 1)``; redistribute the
   clipped mass evenly (integer division) and the remainder to bins
   ``0, step, 2·step…`` with ``step = max(256 // residual, 1)``,
4. LUT = ``round(cdf · 255 / tilePixels)``,
5. per-pixel bilinear blend of the 4 surrounding tile LUTs with
   replicate edge handling.

All stages are vectorised (histogram via per-tile one-hot matmul — an
MXU-friendly formulation — and the blend via 4 LUT gathers).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1, 2, 3))
def clahe_u8(
    channel: jnp.ndarray,
    clip_limit: float = 2.5,
    tiles_y: int = 8,
    tiles_x: int = 8,
) -> jnp.ndarray:
    """cv2.createCLAHE(clipLimit, (tiles_x, tiles_y)).apply for uint8 (H, W)."""
    h, w = channel.shape
    th = -(-h // tiles_y)  # ceil
    tw = -(-w // tiles_x)
    ph, pw = th * tiles_y - h, tw * tiles_x - w
    padded = jnp.pad(channel, ((0, ph), (0, pw)), mode="reflect")

    tile_pixels = th * tw
    clip = max(int(clip_limit * tile_pixels / 256.0), 1)

    # --- per-tile histograms: sequential lax.map of one-hot compare+sum
    # (9× faster than scatter-add on TPU — scatters serialize; the map
    # bounds the transient one-hot to ONE tile, so no OOM on large SR
    # outputs like the vmapped one-hot had)
    tiles = padded.reshape(tiles_y, th, tiles_x, tw)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(tiles_y * tiles_x, tile_pixels)

    bins = jnp.arange(256, dtype=tiles.dtype)

    def tile_hist(tile_vals):
        return jnp.sum(tile_vals[:, None] == bins[None, :], axis=0,
                       dtype=jnp.int32)

    hist = jax.lax.map(tile_hist, tiles)  # (T, 256)

    # --- clip + redistribute (cv2 integer semantics) ------------------
    excess = jnp.maximum(hist - clip, 0).sum(axis=1, keepdims=True)
    hist = jnp.minimum(hist, clip)
    batch = excess // 256
    residual = excess - batch * 256
    hist = hist + batch
    idx = jnp.arange(256)[None, :]
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    bump = (idx % step == 0) & (idx // step < residual)
    hist = hist + bump.astype(jnp.int32)

    # --- LUTs ---------------------------------------------------------
    cdf = jnp.cumsum(hist, axis=1).astype(jnp.float32)
    lut = jnp.clip(jnp.round(cdf * (255.0 / tile_pixels)), 0, 255)  # (T, 256)

    # --- bilinear blend of 4 neighbouring tile LUTs -------------------
    if th % 2 == 0 and tw % 2 == 0:
        # fast path: per-pixel table gathers serialize on TPU (~2.4 s on
        # a 8192² SR output). Decompose into half-tile-offset regions —
        # within one region the 4 neighbour LUTs are FIXED — and select
        # values with a one-hot (px, 256)×(256, 4) matmul per region
        # (measured 0.12 s; MXU does the table lookup). Exact selection
        # (one-hot f32 dot picks a single f32 value), same blend
        # expression and rounding.
        out = _apply_luts_regions(channel, lut, tiles_y, tiles_x, th, tw)
    else:
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        tyf = ys / th - 0.5
        txf = xs / tw - 0.5
        ty1 = jnp.floor(tyf)
        tx1 = jnp.floor(txf)
        ya = (tyf - ty1)[:, None]
        xa = (txf - tx1)[None, :]
        ty1i = ty1.astype(jnp.int32)
        tx1i = tx1.astype(jnp.int32)
        ty2 = jnp.clip(ty1i + 1, 0, tiles_y - 1)
        tx2 = jnp.clip(tx1i + 1, 0, tiles_x - 1)
        ty1 = jnp.clip(ty1i, 0, tiles_y - 1)
        tx1 = jnp.clip(tx1i, 0, tiles_x - 1)

        v = channel.astype(jnp.int32)
        flat = lut.reshape(-1)

        def look(ty, tx):
            tile_id = ty[:, None] * tiles_x + tx[None, :]
            return flat[tile_id * 256 + v]

        top = look(ty1, tx1) * (1.0 - xa) + look(ty1, tx2) * xa
        bot = look(ty2, tx1) * (1.0 - xa) + look(ty2, tx2) * xa
        out = top * (1.0 - ya) + bot * ya
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def _apply_luts_regions(channel: jnp.ndarray, lut: jnp.ndarray,
                        tiles_y: int, tiles_x: int,
                        th: int, tw: int) -> jnp.ndarray:
    """Region-wise LUT application (even tile sizes).

    Pixel y's top tile index is ``floor(y/th - 0.5)``; with the image
    shifted by th/2 the bands become uniform th-tall and the fractional
    blend weight inside a band is exactly ``r/th``. For band b the two
    tile rows are ``clip(b-1)`` / ``clip(b)`` — constant per region, so
    each region's 4 LUTs form one (256, 4) matrix."""
    h, w = channel.shape
    py, px = th // 2, tw // 2
    nby = -(-(h + py) // th)
    nbx = -(-(w + px) // tw)
    xp = jnp.pad(channel, ((py, nby * th - h - py),
                           (px, nbx * tw - w - px)), mode="edge")
    regions = xp.reshape(nby, th, nbx, tw).transpose(0, 2, 1, 3)
    regions = regions.reshape(nby * nbx, th * tw)

    t1y = np.clip(np.arange(nby) - 1, 0, tiles_y - 1)
    t2y = np.clip(np.arange(nby), 0, tiles_y - 1)
    t1x = np.clip(np.arange(nbx) - 1, 0, tiles_x - 1)
    t2x = np.clip(np.arange(nbx), 0, tiles_x - 1)
    L = lut.reshape(tiles_y, tiles_x, 256)
    cube = jnp.stack([L[t1y][:, t1x], L[t1y][:, t2x],
                      L[t2y][:, t1x], L[t2y][:, t2x]], -1)
    cube = cube.reshape(nby * nbx, 256, 4)

    ya = (jnp.arange(th, dtype=jnp.float32) / th)[:, None]
    xa = (jnp.arange(tw, dtype=jnp.float32) / tw)[None, :]
    ya = jnp.broadcast_to(ya, (th, tw)).reshape(-1)
    xa = jnp.broadcast_to(xa, (th, tw)).reshape(-1)
    bins = jnp.arange(256, dtype=channel.dtype)

    def region(args):
        vals_u8, l4 = args
        oh = (vals_u8[:, None] == bins[None, :]).astype(jnp.float32)
        vals = jax.lax.dot_general(oh, l4, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        top = vals[:, 0] * (1.0 - xa) + vals[:, 1] * xa
        bot = vals[:, 2] * (1.0 - xa) + vals[:, 3] * xa
        return top * (1.0 - ya) + bot * ya

    out = jax.lax.map(region, (regions, cube))
    out = out.reshape(nby, nbx, th, tw).transpose(0, 2, 1, 3)
    out = out.reshape(nby * th, nbx * tw)
    return out[py:py + h, px:px + w]
