"""Accuracy envelope of the in-repo OCR (VERDICT r4 #8).

The CI fixtures and the glyph atlas are both DejaVu Sans/Mono renders,
so the green tests prove the matcher, not generalization. This
evaluates `decode/ocr.py` on HELD-OUT conditions:

- DejaVuSerif / DejaVuSerif-Bold: a different typeface class (serifs,
  different stroke contrast) present on the box but NOT in the atlas;
- PIL's embedded default bitmap font (not DejaVu at all);
- jitter sweeps on an atlas font: additive Gaussian noise, small
  rotations, render sizes.

Reports per-condition exact-string rate and character accuracy
(SequenceMatcher). The envelope goes into BENCH_NOTES + the ocr.py
docstring; pytesseract (Docker image) remains the engine of record for
arbitrary real-world plates.

Usage: python scripts/ocr_eval.py [--n 30]
"""

from __future__ import annotations

import argparse
import difflib
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the binarizer dispatches through jax; OCR eval is a host-side loop
# over many image shapes — forcing CPU avoids a remote compile per
# shape bucket (the axon sitecustomize overrides JAX_PLATFORMS)
import jax  # noqa: E402

# --composed engine needs the device; everything else forces CPU
if "engine" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from s2sr_tpu.decode.ocr import ocr_image  # noqa: E402

SERIALS = [
    "SN-4821-AX", "PLATE-0092", "A7B2-C9D4", "UP42-POC-17", "XK-3305",
    "S2SR-88-Q", "LOT-7741-Z", "MFG-2024-B", "RRDB-23-X4", "TPU-V5E-01",
]


def render(text, font, size, noise=0.0, rot=0.0, seed=0):
    from PIL import Image, ImageDraw, ImageFont

    if font == "default":
        f = ImageFont.load_default()
    else:
        f = ImageFont.truetype(font, size)
    img = Image.new("L", (10 + size * len(text), size * 3), 255)
    ImageDraw.Draw(img).text((8, size), text, fill=0, font=f)
    if rot:
        img = img.rotate(rot, expand=True, fillcolor=255,
                         resample=Image.BILINEAR)
    a = np.asarray(img, np.float32)
    if noise:
        a = a + np.random.default_rng(seed).normal(0, noise, a.shape)
    return np.clip(a, 0, 255).astype(np.uint8)


def evaluate(name, n, **kw):
    exact = 0
    char_acc = []
    cases = [SERIALS[i % len(SERIALS)] for i in range(n)]
    for i, text in enumerate(cases):
        img = render(text, seed=i, **kw)
        got = ocr_image(img)["text"].replace(" ", "")
        want = text.replace(" ", "")
        exact += got == want
        char_acc.append(difflib.SequenceMatcher(None, got, want).ratio())
    total = len(char_acc)
    print(json.dumps({
        "condition": name, "n": total,
        "exact_rate": round(exact / total, 3),
        "char_acc": round(float(np.mean(char_acc)), 3),
    }), flush=True)


def evaluate_composed(name, n, enhance_fn, **kw):
    """VERDICT r4 #7: the PRODUCT flow (decode service: QR miss → OCR →
    SR-enhanced retry), not the raw recognizer. The final serial is
    the user-visible outcome."""
    from s2sr_tpu.decode.service import decode_with_retry

    exact = 0
    char_acc = []
    retried = 0
    cases = [SERIALS[i % len(SERIALS)] for i in range(n)]
    for i, text in enumerate(cases):
        img = render(text, seed=i, **kw)
        rgb = np.stack([img] * 3, axis=-1)
        res = decode_with_retry(rgb, enhance_fn=enhance_fn)
        got = (res.get("serial") or "").replace(" ", "")
        want = text.replace(" ", "")
        exact += got == want
        retried += len(res.get("attempts", [])) > 1
        char_acc.append(difflib.SequenceMatcher(None, got, want).ratio())
    total = len(char_acc)
    print(json.dumps({
        "condition": name, "n": total,
        "exact_rate": round(exact / total, 3),
        "char_acc": round(float(np.mean(char_acc)), 3),
        "retry_rate": round(retried / total, 3),
    }), flush=True)


def _bicubic_x4(arr):
    from PIL import Image

    im = Image.fromarray(arr)
    return np.asarray(
        im.resize((im.width * 4, im.height * 4), Image.BICUBIC))


def _engine_x4():
    from s2sr_tpu.models.engine import get_engine

    engine = get_engine("realesrgan_x4", weights_dir="models")

    def fn(arr):
        return engine.enhance_serving(arr)

    return fn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--composed", choices=("off", "bicubic", "engine"),
                    default="off",
                    help="run the FAILING raw conditions through the "
                         "decode service's SR-retry flow instead of "
                         "the raw recognizer; 'engine' uses the "
                         "resident SR engine (random init when no "
                         "weights are cached — the offline product "
                         "answer), 'bicubic' the information floor")
    args = ap.parse_args()
    if args.composed != "off":
        dejavu = "/usr/share/fonts/truetype/dejavu"
        fn = (_bicubic_x4 if args.composed == "bicubic"
              else _engine_x4())
        tag = f"composed+{args.composed}"
        evaluate_composed(f"{tag}: DejaVuSans 20px", args.n, fn,
                          font=f"{dejavu}/DejaVuSans.ttf", size=20)
        evaluate_composed(f"{tag}: DejaVuSans 14px", args.n, fn,
                          font=f"{dejavu}/DejaVuSans.ttf", size=14)
        evaluate_composed(f"{tag}: PIL default bitmap", args.n, fn,
                          font="default", size=16)
        evaluate_composed(f"{tag}: noise sigma=20", args.n, fn,
                          font=f"{dejavu}/DejaVuSans.ttf", size=48,
                          noise=20)
        return
    dejavu = "/usr/share/fonts/truetype/dejavu"
    # atlas font baseline (sanity: should be ~perfect)
    evaluate("atlas: DejaVuSans 48px", args.n,
             font=f"{dejavu}/DejaVuSans.ttf", size=48)
    # serif faces (held out until r4; now IN the atlas — these rows
    # track the widened pool, the bitmap row below stays held out)
    evaluate("serif: DejaVuSerif 48px", args.n,
             font=f"{dejavu}/DejaVuSerif.ttf", size=48)
    evaluate("serif: DejaVuSerif-Bold 48px", args.n,
             font=f"{dejavu}/DejaVuSerif-Bold.ttf", size=48)
    evaluate("held-out: PIL default bitmap", args.n,
             font="default", size=16)
    # jitter on an atlas font
    evaluate("jitter: noise sigma=20", args.n,
             font=f"{dejavu}/DejaVuSans.ttf", size=48, noise=20)
    evaluate("jitter: rot +3deg", args.n,
             font=f"{dejavu}/DejaVuSans.ttf", size=48, rot=3)
    evaluate("jitter: rot -3deg + noise 12", args.n,
             font=f"{dejavu}/DejaVuSans.ttf", size=48, rot=-3, noise=12)
    evaluate("small: DejaVuSans 20px", args.n,
             font=f"{dejavu}/DejaVuSans.ttf", size=20)


if __name__ == "__main__":
    main()
