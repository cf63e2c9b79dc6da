"""Device mesh construction for sharded SR inference/training.

The reference has no distributed backend at all (SURVEY §2d); scaling
here is ICI-native: a ``jax.sharding.Mesh`` with

- ``dp``  — data/tile-batch axis (halo windows or training batch),
- ``sp``  — spatial axis (H dimension inside a window/batch; XLA GSPMD
            inserts the conv halo exchanges automatically),

configured from ``Settings.mesh_shape`` (e.g. ``"dp=4,sp=2"``) or
defaulting to all devices on ``dp``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_shape(spec: str) -> Tuple[Tuple[str, int], ...]:
    """Parse ``"dp=4,sp=2"`` → (("dp", 4), ("sp", 2))."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, n = part.partition("=")
        out.append((name.strip(), int(n)))
    return tuple(out)


def build_mesh(
    spec: str = "",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from a spec string; empty spec = all devices on dp."""
    devices = list(devices if devices is not None else jax.devices())
    if not spec:
        return Mesh(np.array(devices), ("dp",))
    axes = parse_mesh_shape(spec)
    names = tuple(name for name, _ in axes)
    shape = tuple(n for _, n in axes)
    total = int(np.prod(shape))
    if total > len(devices):
        raise ValueError(
            f"mesh {spec} needs {total} devices, have {len(devices)}"
        )
    grid = np.array(devices[:total]).reshape(shape)
    return Mesh(grid, names)


def window_sharding(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    """Sharding for a (N, h, w, C) window batch: N over dp, H over sp."""
    if mesh is None:
        return None
    spec = [None, None, None, None]
    if "dp" in mesh.axis_names:
        spec[0] = "dp"
    if "sp" in mesh.axis_names:
        spec[1] = "sp"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P())
