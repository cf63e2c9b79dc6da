"""Standard SR pipeline (the EDSR/ESPCN/LapSRN path).

Behaviour parity with ``server/app/super_resolution.py:92-324``: model
registry dispatch, raster read/normalise, SR, rescaled-transform save,
metadata dict with the same keys. The cv2.dnn_superres backend is
replaced by the jit-compiled classic-family models
(:mod:`s2sr_tpu.models.classic`).
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.classic import build_classic_model
from ..models.registry import get_model_config
from ..models.weights import load_params
from ..utils import StageTimer, setup_logging
from .io import load_rgb, save_sr_output

logger = setup_logging("s2sr_tpu.super_resolution")


_MODEL_CACHE: dict = {}


def create_sr_model(model: str = "edsr", scale: int = 4):
    """(model instance, params) for a classic family member
    (``super_resolution.py:92-124``).

    Process-wide cached, like ``get_engine`` for the RRDBNet path: the
    reference reconstructs the cv2.dnn_superres net per job, but on
    this backend that would re-parse the .pb AND re-trace the jit per
    request (compiles ride a remote relay here — CLAUDE.md). The cache
    keys on the weight file's identity/mtime so dropping new weights in
    is picked up."""
    name = f"{model}_x{scale}"
    config = get_model_config(name)
    from ..config import get_settings as _gs

    wdir = Path(_gs().weights_dir)

    def _stamp(p: Path):
        try:
            return p.stat().st_mtime_ns
        except OSError:
            return None

    key = (name, str(wdir), _stamp(wdir / f"{name}.npz"),
           _stamp(wdir / f"{name}.pb"))
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    out = _build_sr_model(name, config, scale)
    _MODEL_CACHE[key] = out
    return out


def _build_sr_model(name: str, config: dict, scale: int):
    instance = build_classic_model(name, config)
    from ..config import get_settings

    weights_dir = Path(get_settings().weights_dir)
    npz = weights_dir / f"{name}.npz"
    pb = weights_dir / f"{name}.pb"
    if npz.exists():
        params = load_params(npz)
    elif pb.exists():
        # frozen TF GraphDef, read without TensorFlow (models/pb_reader)
        from ..models.classic import EDSR
        from ..models.pb_reader import (
            convert_edsr_pb, convert_espcn_pb, convert_lapsrn_pb,
        )

        from ..models.classic import ESPCN, LapSRN

        family = config["family"]
        if family == "edsr":
            params, inferred = convert_edsr_pb(pb, scale)
            instance = EDSR(scale=scale, num_feat=inferred["channels"],
                            num_blocks=inferred["blocks"])
            mean = inferred.get("mean")
            if mean is not None:
                # EDSR runs in the graph's native 0-255 domain
                instance.mean = jnp.asarray(
                    mean if mean.max() > 1.0 else mean * 255.0)
        elif family == "espcn":
            params = convert_espcn_pb(pb, scale)
            instance = ESPCN(scale=scale,
                             num_ch=int(params["conv1"]["kernel"].shape[2]))
        elif family == "lapsrn":
            params = convert_lapsrn_pb(pb, scale)
            instance = LapSRN(scale=scale,
                              num_ch=int(params["head"]["kernel"].shape[2]))
        else:
            raise ValueError(f"no .pb converter for family {family}")
        logger.info("%s: converted frozen GraphDef %s", name, pb)
    else:
        logger.warning("%s: no converted weights — random init", name)
        params = instance.init(jax.random.PRNGKey(0))
    return instance, params


def _jitted_apply(instance):
    """One jit wrapper per model instance (a fresh ``jax.jit`` each call
    re-traces every request)."""
    fn = getattr(instance, "_jit_apply", None)
    if fn is None:
        fn = jax.jit(instance.apply)
        instance._jit_apply = fn
    return fn


def _bucketed_forward(instance, params, arr: np.ndarray) -> np.ndarray:
    """(H, W, C) float → (sH, sW, C) via the 64-multiple shape bucket.

    The warm-serving story the RRDBNet engine already has (VERDICT r4
    #4): pad to the next 64-multiple bucket + exact-padding mask (the
    model re-zeroes every conv input outside the true rectangle — see
    ``EDSR.apply``), so any upload size reuses one executable per
    bucket instead of compiling per shape, and the result equals the
    per-shape forward bit-for-bit on the true region. On-grid inputs
    skip the mask multiplies entirely."""
    from ..parallel.tiling import bucket_pad

    h, w, _ = arr.shape
    s = instance.scale
    fn = _jitted_apply(instance)
    if h % 64 == 0 and w % 64 == 0:
        return np.asarray(fn(params, jnp.asarray(arr)[None])[0])
    xp, mask = bucket_pad(arr)
    out = fn(params, jnp.asarray(xp)[None], jnp.asarray(mask)[None])[0]
    return np.asarray(out[:h * s, :w * s])


def run_classic_sr(instance, params, img: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) → uint8 (sH, sW, 3) through a classic model.

    Single-channel models (the released ESPCN/LapSRN luma graphs) run
    the reference's ``cv2.dnn_superres`` flow: float [0,1] YCrCb, net
    on Y, INTER_CUBIC chroma upscale, merge, back to RGB
    (``dnn_superres`` preprocess/reconstruct; oracle-tested resize and
    colorspace in :mod:`s2sr_tpu.ops.resize` / ``ops.color``)."""
    from ..ops.color import rgb_to_ycrcb_f32, ycrcb_to_rgb_f32
    from ..ops.resize import upscale_cubic

    scale = instance.scale
    x01 = img.astype(np.float32) / 255.0
    if getattr(instance, "num_ch", 3) == 1:
        ycc = rgb_to_ycrcb_f32(x01)
        y_hr = _bucketed_forward(instance, params, ycc[..., :1])
        chroma = upscale_cubic(ycc[..., 1:], scale)
        out = ycrcb_to_rgb_f32(np.concatenate([y_hr, chroma], axis=-1))
    else:
        out = _bucketed_forward(instance, params, x01)
    return np.asarray(
        jnp.clip(jnp.round(jnp.asarray(out) * 255.0), 0, 255)
        .astype(jnp.uint8))


def run_classic_sr_many(instance, params, imgs) -> list:
    """Batched classic serving (VERDICT r4 #9): N images through as few
    dispatches as there are shape-bucket groups, instead of one
    round-trip per image.

    Small classic models (ESPCN/LapSRN) are dispatch-floor bound on a
    relay (~37-40 ms/round-trip vs sub-ms compute — BENCH_NOTES r4);
    stacking same-bucket images into one executable call amortises
    that floor the way the RRDB engine's window batching does. Mixed
    sizes group by the 64-multiple bucket; results are bit-identical
    to :func:`run_classic_sr` per image (same bucket/mask math).
    """
    from ..ops.color import rgb_to_ycrcb_f32, ycrcb_to_rgb_f32
    from ..ops.resize import upscale_cubic
    from ..parallel.tiling import bucket_pad

    scale = instance.scale
    luma = getattr(instance, "num_ch", 3) == 1
    nets = []          # per-image array the net sees
    chromas = []
    for img in imgs:
        x01 = np.asarray(img).astype(np.float32) / 255.0
        if luma:
            ycc = rgb_to_ycrcb_f32(x01)
            nets.append(ycc[..., :1])
            chromas.append(ycc[..., 1:])
        else:
            nets.append(x01)
            chromas.append(None)

    groups: dict = {}
    for i, arr in enumerate(nets):
        h, w, _ = arr.shape
        hb, wb = -(-h // 64) * 64, -(-w // 64) * 64
        groups.setdefault((hb, wb), []).append(i)

    fn = _jitted_apply(instance)
    sr: list = [None] * len(imgs)
    for (hb, wb), idxs in groups.items():
        on_grid = all(nets[i].shape[:2] == (hb, wb) for i in idxs)
        if on_grid:
            batch = jnp.asarray(np.stack([nets[i] for i in idxs]))
            out = np.asarray(fn(params, batch))
        else:
            xs, masks = [], []
            for i in idxs:
                xp, m = bucket_pad(nets[i])
                xs.append(xp)
                masks.append(m)
            out = np.asarray(fn(params, jnp.asarray(np.stack(xs)),
                                jnp.asarray(np.stack(masks))))
        for j, i in enumerate(idxs):
            h, w, _ = nets[i].shape
            sr[i] = out[j][:h * scale, :w * scale]

    results = []
    for i, y in enumerate(sr):
        if luma:
            chroma = upscale_cubic(chromas[i], scale)
            out = ycrcb_to_rgb_f32(np.concatenate([y, chroma], axis=-1))
        else:
            out = y
        results.append(np.asarray(
            jnp.clip(jnp.round(jnp.asarray(out) * 255.0), 0, 255)
            .astype(jnp.uint8)))
    return results


def apply_super_resolution(
    input_path: Path | str,
    output_path: Path | str,
    scale: int = 4,
    model: str = "edsr",
) -> Tuple[Path, dict]:
    """(``super_resolution.py:127-257``) read → SR → save."""
    logger.info("Super-resolution (%s x%d): %s", model.upper(), scale, input_path)
    timer = StageTimer(total_stages=2)
    img, transform, crs = load_rgb(input_path)

    with timer.stage(f"{model.upper()} x{scale}"):
        instance, params = create_sr_model(model, scale)
        out_u8 = run_classic_sr(instance, params, img)

    final = save_sr_output(out_u8, Path(output_path), transform, crs, scale)
    metadata = {
        "model": f"{model.upper()}_x{scale}",
        "scale": scale,
        "input_size": [img.shape[1], img.shape[0]],
        "output_size": [out_u8.shape[1], out_u8.shape[0]],
        "original_resolution_m": 10.0,
        "effective_resolution_m": 10.0 / scale,
        "timing": timer.summary(),
    }
    return final, metadata


def process_sentinel2_sr(
    input_tif: Path | str,
    output_dir: Path | str,
    scale: int = 4,
    model: str = "edsr",
) -> dict:
    """(``super_resolution.py:260-324``) wrapper + sidecar metadata."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    base = Path(input_tif).stem
    out_path = output_dir / f"{base}_sr_x{scale}"
    final, metadata = apply_super_resolution(input_tif, out_path, scale, model)
    result = {
        "timestamp": datetime.now().strftime("%Y%m%d_%H%M%S"),
        "input": str(input_tif),
        "outputs": {"sr_tif": str(final) if final.suffix == ".tif" else None,
                    "sr_png": str(final.with_suffix(".png"))
                    if final.with_suffix(".png").exists() else None},
        "sr_metadata": metadata,
    }
    with open(output_dir / f"{base}_sr_metadata.json", "w") as f:
        json.dump(result, f, indent=2)
    return result
