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
