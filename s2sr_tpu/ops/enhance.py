"""Fused on-device crop-enhancement chains ("WOW" and "farm").

Reference behaviour being matched:

- WOW (``server/app/wow_sr.py:187-209``): Lab CLAHE (clip 2.5, 8×8) →
  unsharp (σ1.2, 1.4/−0.4) → HSV green-mask (35 < H < 85) saturation
  ×1.2.
- Farm (``server/app/farm_sr.py:61-108,168-178``): Lab CLAHE (clip 2.5,
  8×8) → unsharp (strength 1.2, radius 1.5) → green saturation ×1.3.

Each chain is one jitted function: uint8 in, uint8 out, zero host
round-trips between steps. cv2's uint8 rounding quirks are preserved,
including the float→uint8 *truncation* the reference applies to the
boosted HSV array before converting back to RGB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .blur import add_weighted_u8, gaussian_blur_u8
from .clahe import clahe_u8
from .color import (
    hsv_to_rgb_u8,
    lab_to_rgb_u8,
    rgb_to_hsv_u8,
    rgb_to_lab_u8,
)


def _clahe_on_l(img: jnp.ndarray, clip_limit: float, grid: int) -> jnp.ndarray:
    lab = rgb_to_lab_u8(img)
    l_eq = clahe_u8(lab[..., 0], clip_limit, grid, grid)
    lab = lab.at[..., 0].set(l_eq)
    return lab_to_rgb_u8(lab)


def _vegetation_boost(img: jnp.ndarray, boost: float) -> jnp.ndarray:
    hsv = rgb_to_hsv_u8(img).astype(jnp.float32)
    h, s = hsv[..., 0], hsv[..., 1]
    green = (h > 35.0) & (h < 85.0)
    s = jnp.where(green, jnp.clip(s * boost, 0.0, 255.0), s)
    hsv = hsv.at[..., 1].set(s)
    # reference casts float32→uint8 (truncation) before HSV2RGB
    hsv_u8 = jnp.trunc(hsv).astype(jnp.uint8)
    return hsv_to_rgb_u8(hsv_u8)


@jax.jit
def enhance_for_crops(img: jnp.ndarray) -> jnp.ndarray:
    """The WOW chain (``wow_sr.py:187-209``): uint8 (H, W, 3) → uint8."""
    enhanced = _clahe_on_l(img, 2.5, 8)
    sharpened = add_weighted_u8(
        enhanced, 1.4, gaussian_blur_u8(enhanced, 1.2), -0.4
    )
    out = _vegetation_boost(sharpened, 1.2)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


@jax.jit
def enhance_farm(img: jnp.ndarray) -> jnp.ndarray:
    """The farm chain (``farm_sr.py:168-178``): CLAHE → unsharp → veg."""
    enhanced = _clahe_on_l(img, 2.5, 8)
    sharpened = add_weighted_u8(
        enhanced, 1.0 + 1.2, gaussian_blur_u8(enhanced, 1.5), -1.2
    )
    return _vegetation_boost(sharpened, 1.3)


@partial(jax.jit, static_argnums=(1, 2))
def enhance_local_contrast(img: jnp.ndarray, clip_limit: float = 3.0,
                           grid_size: int = 8) -> jnp.ndarray:
    """Standalone CLAHE-on-L (``farm_sr.py:74-88``)."""
    return _clahe_on_l(img, clip_limit, grid_size)
