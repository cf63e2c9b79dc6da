"""Batched halo tiling: whole-image SR through fixed-size windows.

The reference runs a sequential Python double loop, one 256 px tile at a
time through the model (``server/app/cnn_super_resolution.py:236-280``).
Here the same *observable semantics* — identical window placement, edge
re-expansion and overlap-crop stitching, so outputs are pixel-identical
— are realised TPU-first:

- all halo windows are gathered up-front into one ``(N, wh, ww, C)``
  batch (``vmap`` of ``dynamic_slice``) — the image-domain analogue of
  context parallelism with materialised halo exchange (SURVEY §2d),
- the model runs over the batch in fixed-size chunks (one compile),
  optionally sharded over a device mesh on the window axis,
- outputs are crop-stitched back with a ``lax.scan`` of
  ``dynamic_update_slice`` preserving the reference's write order
  (later windows win on clamped-edge overlaps).

Window-placement math (mirrors ``:249-254``): for tile grid pitch T and
halo p, window x-start for column i is ``max(min(i*T + T + 2p, W) - (T+2p), 0)``
and every window has static shape ``(min(H, T+2p), min(W, T+2p))`` — the
edge windows are *re-expanded* inward, which is what makes a single
static window shape (and therefore one XLA compilation) possible.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

ModelFn = Callable[[jnp.ndarray], jnp.ndarray]


@dataclass(frozen=True)
class TilePlan:
    """Static description of the halo-window decomposition of one image."""

    height: int
    width: int
    tile: int           # grid pitch (ref tile_size, 256)
    pad: int            # halo (ref tile_pad, 10)
    scale: int
    ny: int
    nx: int
    win_h: int
    win_w: int

    @classmethod
    def for_image(cls, height: int, width: int, tile: int = 256,
                  pad: int = 10, scale: int = 4) -> "TilePlan":
        return cls(
            height=height, width=width, tile=tile, pad=pad, scale=scale,
            ny=math.ceil(height / tile), nx=math.ceil(width / tile),
            win_h=min(height, tile + 2 * pad),
            win_w=min(width, tile + 2 * pad),
        )

    @property
    def num_windows(self) -> int:
        return self.ny * self.nx

    def starts(self) -> np.ndarray:
        """(N, 2) array of (y, x) window starts, row-major like the reference."""
        sy = np.array([
            max(min(i * self.tile + self.tile + 2 * self.pad, self.height)
                - self.win_h, 0)
            for i in range(self.ny)
        ])
        sx = np.array([
            max(min(j * self.tile + self.tile + 2 * self.pad, self.width)
                - self.win_w, 0)
            for j in range(self.nx)
        ])
        grid = np.stack(np.meshgrid(sy, sx, indexing="ij"), axis=-1)
        return grid.reshape(-1, 2).astype(np.int32)

    def keep_size(self) -> Tuple[int, int]:
        """Static (keep_h, keep_w) of the region every window contributes
        after halo cropping — the ONE definition shared by the device
        stitch (:func:`tiled_apply`) and the host stitch
        (``SREngine._serving_stitch``); their byte-equality rests on it."""
        s = self.scale
        return (self.win_h * s - (self.pad * s if self.ny > 1 else 0),
                self.win_w * s - (self.pad * s if self.nx > 1 else 0))

    def stitch_host(self, outs: np.ndarray) -> np.ndarray:
        """Crop-and-place window outputs on host, same write order and
        crop math as the device ``_stitch`` (numpy twin for the bucketed
        serving path)."""
        s = self.scale
        keep_h, keep_w = self.keep_size()
        crop_off, dest = self.crop_boxes()
        canvas = np.zeros((self.height * s, self.width * s,
                           outs.shape[-1]), outs.dtype)
        for i in range(self.num_windows):
            cy, cx = crop_off[i]
            dy, dx = dest[i]
            canvas[dy:dy + keep_h, dx:dx + keep_w] = \
                outs[i][cy:cy + keep_h, cx:cx + keep_w]
        return canvas

    def crop_boxes(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-window output placement after halo cropping.

        Returns ``(crop_offsets, dest_starts)``: the (y, x) offset *inside*
        the scaled window output where the kept region begins, and the
        (y, x) position in the full output image where it lands. The kept
        region has static shape (crop semantics of ``:264-276``).
        """
        s = self.scale
        p = self.pad * s
        starts = self.starts()
        crop_off = []
        dest = []
        for idx in range(self.num_windows):
            iy, ix = divmod(idx, self.nx)
            y1, x1 = starts[idx]
            oy1, ox1 = int(y1) * s, int(x1) * s
            cy = p if iy > 0 else 0
            cx = p if ix > 0 else 0
            crop_off.append((cy, cx))
            dest.append((oy1 + cy, ox1 + cx))
        return (np.asarray(crop_off, np.int32), np.asarray(dest, np.int32))

def extract_windows(img: jnp.ndarray, starts: jnp.ndarray,
                    win_h: int, win_w: int) -> jnp.ndarray:
    """Gather (N, win_h, win_w, C) halo windows from (H, W, C) image."""

    def one(start):
        return jax.lax.dynamic_slice(
            img, (start[0], start[1], 0), (win_h, win_w, img.shape[-1])
        )

    return jax.vmap(one)(starts)


def _stitch(outputs: jnp.ndarray, canvas: jnp.ndarray,
            crop_off: jnp.ndarray, dest: jnp.ndarray,
            keep_h: int, keep_w: int) -> jnp.ndarray:
    """Sequential crop-and-place (lax.scan keeps reference write order)."""

    def body(canvas, inputs):
        out, off, dst = inputs
        kept = jax.lax.dynamic_slice(
            out, (off[0], off[1], 0), (keep_h, keep_w, out.shape[-1])
        )
        return jax.lax.dynamic_update_slice(canvas, kept, (dst[0], dst[1], 0)), None

    canvas, _ = jax.lax.scan(body, canvas, (outputs, crop_off, dest))
    return canvas


def tiled_apply(
    model_fn: ModelFn,
    img: jnp.ndarray,
    tile: int = 256,
    pad: int = 10,
    scale: int = 4,
    batch_size: int = 16,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Whole-image SR via batched halo windows. ``img``: (H, W, C) float.

    ``model_fn`` maps (B, win_h, win_w, C) → (B, s·win_h, s·win_w, C).
    Windows are processed in ``batch_size`` chunks (padded with repeats of
    the last window — harmless because stitching only consumes the first
    N outputs). With a mesh, the window axis is sharded over ``dp``.
    """
    h, w, c = img.shape
    plan = TilePlan.for_image(h, w, tile=tile, pad=pad, scale=scale)
    starts = jnp.asarray(plan.starts())
    crop_off, dest = plan.crop_boxes()
    n = plan.num_windows
    s = plan.scale

    windows = extract_windows(img, starts, plan.win_h, plan.win_w)

    # pad the window batch to a multiple of batch_size (static chunking)
    n_chunks = math.ceil(n / batch_size)
    n_padded = n_chunks * batch_size
    if n_padded != n:
        fill = jnp.broadcast_to(
            windows[-1:], (n_padded - n,) + windows.shape[1:]
        )
        windows = jnp.concatenate([windows, fill], axis=0)

    windows = windows.reshape(n_chunks, batch_size, plan.win_h, plan.win_w, c)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = [None] * 5
        if "dp" in mesh.axis_names:
            spec[1] = "dp"
        if "sp" in mesh.axis_names:
            spec[2] = "sp"
        windows = jax.lax.with_sharding_constraint(
            windows, NamedSharding(mesh, P(*spec))
        )

    outputs = jax.lax.map(model_fn, windows)
    outputs = outputs.reshape(n_padded, plan.win_h * s, plan.win_w * s, c)[:n]

    keep_h, keep_w = plan.keep_size()
    # clamp: a window whose dest offset + keep size would overrun the
    # canvas cannot occur — reference crop math guarantees fit.
    canvas = jnp.zeros((h * s, w * s, c), outputs.dtype)
    return _stitch(outputs, canvas, jnp.asarray(crop_off), jnp.asarray(dest),
                   keep_h, keep_w)


def bucket_pad(img: np.ndarray, mult: int = 64):
    """Zero-pad a host (H, W, C) array to the next ``mult``-multiple
    bucket. Returns ``(padded, mask)`` with mask (hb, wb, 1) float32,
    1 inside the true rectangle.

    Single source of the exactness-critical bucket+mask construction
    used by the rrdbnet masked serving path (`models/engine.py`) and
    the classic-model warm pipeline (`pipelines/super_resolution.py`)
    — the models re-zero every conv input outside the mask, making the
    bucketed forward bit-identical to the per-shape forward.
    """
    h, w = img.shape[:2]
    hb, wb = -(-h // mult) * mult, -(-w // mult) * mult
    padded = np.zeros((hb, wb) + img.shape[2:], img.dtype)
    padded[:h, :w] = img
    mask = np.zeros((hb, wb, 1), np.float32)
    mask[:h, :w] = 1.0
    return padded, mask


def sr_whole_image(
    model_fn: ModelFn,
    img: jnp.ndarray,
    tile: int = 256,
    pad: int = 10,
    scale: int = 4,
    batch_size: int = 16,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Reference-engage-rule wrapper: tile only when ``H·W > tile²·4``
    (``server/app/cnn_super_resolution.py:226``), else single pass."""
    h, w, _ = img.shape
    if h * w > tile * tile * 4:
        return tiled_apply(model_fn, img, tile=tile, pad=pad, scale=scale,
                           batch_size=batch_size, mesh=mesh)
    return model_fn(img[None])[0]
