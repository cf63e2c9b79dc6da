"""Checkpoint conversion: released PyTorch ``.pth`` → JAX param pytrees.

Handles the Real-ESRGAN release checkpoints the reference downloads
(``server/app/cnn_super_resolution.py:55-70``), including the
``params_ema`` / ``params`` wrapper unwrapping (``:205-211``). Conversion
is a one-time offline step; converted weights are cached as ``.npz`` so
serving never needs torch.

Layout changes applied (torch → TPU-native):
- conv kernels OIHW → HWIO (NHWC convs),
- the 23 (or 6) ``body.N.*`` RRDB blocks are stacked along a new leading
  axis to feed the ``lax.scan`` body in :mod:`s2sr_tpu.models.rrdbnet`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_TOP_CONVS = ("conv_first", "conv_body", "conv_up1", "conv_up2",
              "conv_hr", "conv_last")


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def _conv_from_torch(sd: Mapping[str, Any], prefix: str) -> Params:
    w = _to_numpy(sd[f"{prefix}.weight"])      # (O, I, kH, kW)
    b = _to_numpy(sd[f"{prefix}.bias"])
    return {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
        "bias": jnp.asarray(b),
    }


def convert_rrdbnet_state_dict(sd: Mapping[str, Any]) -> Params:
    """Convert a (possibly wrapped) RRDBNet torch state dict to our pytree."""
    if "params_ema" in sd:
        sd = sd["params_ema"]
    elif "params" in sd:
        sd = sd["params"]

    num_block = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("body.")
    )

    blocks = []
    for i in range(num_block):
        block: Params = {}
        for j in (1, 2, 3):
            block[f"rdb{j}"] = {
                f"conv{k}": _conv_from_torch(sd, f"body.{i}.rdb{j}.conv{k}")
                for k in (1, 2, 3, 4, 5)
            }
        blocks.append(block)
    body = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params: Params = {"body": body}
    for name in _TOP_CONVS:
        if f"{name}.weight" in sd:
            params[name] = _conv_from_torch(sd, name)
    return params


def download_weights(model_name: str, dest_dir: Path | str,
                     url: str | None = None,
                     timeout: float = 120.0) -> Path:
    """Download the released checkpoint on first use — the reference's
    behaviour (``cnn_super_resolution.py:55-70``: cache keyed by
    filename, fetch the registry URL when absent).

    Returns the cached ``.pth`` path. Raises on network failure; callers
    gate on ``Settings.offline`` and fall back to random init loudly.
    """
    from .registry import get_model_config

    if url is None:
        url = get_model_config(model_name).get("url")
    if not url:
        raise ValueError(f"no release URL registered for {model_name}")
    dest_dir = Path(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / f"{model_name}.pth"
    if dest.exists():
        return dest

    import urllib.request

    tmp = dest.with_suffix(".pth.partial")
    req = urllib.request.Request(url, headers={"User-Agent": "s2sr-tpu/2.0"})
    with urllib.request.urlopen(req, timeout=timeout) as resp, \
            open(tmp, "wb") as out:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    tmp.rename(dest)  # atomic: concurrent jobs never see a torn file
    return dest


def load_torch_checkpoint(path: Path | str) -> Mapping[str, Any]:
    import torch

    return torch.load(str(path), map_location="cpu", weights_only=True)


def convert_checkpoint(pth_path: Path | str, out_path: Path | str) -> Path:
    """``.pth`` → flattened ``.npz`` cache (CLI: python -m s2sr_tpu.cli.convert)."""
    sd = load_torch_checkpoint(pth_path)
    params = convert_rrdbnet_state_dict(sd)
    return save_params(params, out_path)


# --- flat npz (de)serialisation ---------------------------------------

def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    items = (tree.items() if isinstance(tree, dict)
             else ((str(i), v) for i, v in enumerate(tree)))
    for key, value in items:
        name = f"{prefix}/{key}" if prefix else key
        if isinstance(value, (dict, list, tuple)):
            # lists (SwinIR's layers/blocks/upsample) flatten with index
            # keys and are rebuilt as lists on load
            out.update(_flatten(value, name))
        else:
            out[name] = np.asarray(value)
    return out


def _listify(node):
    """Rebuild list nodes: a dict whose keys are exactly 0..n-1."""
    if not isinstance(node, dict):
        return node
    out = {k: _listify(v) for k, v in node.items()}
    if out and all(k.isdigit() for k in out):
        idx = sorted(int(k) for k in out)
        if idx == list(range(len(idx))):
            return [out[str(i)] for i in idx]
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Params:
    tree: Params = {}
    for name, value in flat.items():
        node = tree
        parts = name.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return _listify(tree)


def save_params(params: Params, path: Path | str) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **_flatten(params))
    return path


def load_params(path: Path | str) -> Params:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def resolve_params(model_name: str, weights_dir: Path | str,
                   seed: int = 0,
                   allow_download: bool | None = None) -> tuple[Params, bool]:
    """Converted weights if cached, else download-on-first-use (unless
    offline), else deterministic random init.

    Returns ``(params, pretrained)``. In no-egress environments the
    framework stays fully functional on random weights; drop the released
    ``.pth`` in *weights_dir* (or a converted ``.npz``) for real quality.
    ``allow_download=None`` reads ``Settings.offline``.
    """
    from .registry import get_model_config
    from .rrdbnet import RRDBNet

    config = get_model_config(model_name)
    weights_dir = Path(weights_dir)
    npz = weights_dir / f"{model_name}.npz"
    if npz.exists():
        return load_params(npz), True
    pth = weights_dir / f"{model_name}.pth"
    if not pth.exists():
        if allow_download is None:
            from ..config import get_settings

            allow_download = not get_settings().offline
        if allow_download and config.get("url"):
            try:
                download_weights(model_name, weights_dir)
            except Exception as exc:  # degrade loudly, never crash serving
                import logging

                logging.getLogger("s2sr_tpu.weights").error(
                    "weight download failed for %s: %s — falling back to "
                    "random init", model_name, exc)
    if pth.exists():
        convert_checkpoint(pth, npz)
        return load_params(npz), True
    net = RRDBNet(
        num_feat=config["channels"],
        num_block=config["blocks"],
        num_grow_ch=config["growth"],
        scale=config["scale"],
    )
    return net.init(jax.random.PRNGKey(seed)), False
