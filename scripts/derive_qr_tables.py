"""Derive QR v11-40 spec tables empirically against the OpenCV oracle.

Two tables extend :mod:`s2sr_tpu.decode.qr_tables` beyond v10:

- alignment-pattern coordinates: read directly out of cv2-encoded
  symbols by matching the exact 5×5 alignment signature;
- EC block structure (ec-per-block, block groups): for each
  (version, level) the space of structurally-possible (ec, n_blocks)
  pairs is tiny, and only the true one yields Reed-Solomon parity +
  interleave that cv2's decoder accepts — so search candidates with
  our encoder and let the oracle arbitrate. Our decoder then
  cross-validates against cv2-encoded symbols independently.

Prints python literals ready to paste into qr_tables.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cv2
import numpy as np

CV2_LEVELS = {
    "L": cv2.QRCodeEncoder_CORRECT_LEVEL_L,
    "M": cv2.QRCodeEncoder_CORRECT_LEVEL_M,
    "Q": cv2.QRCodeEncoder_CORRECT_LEVEL_Q,
    "H": cv2.QRCodeEncoder_CORRECT_LEVEL_H,
}

ALIGN_SIG = np.ones((5, 5), bool)
ALIGN_SIG[1:4, 1:4] = False
ALIGN_SIG[2, 2] = True


def cv2_matrix(version: int, level: str = "M", payload: str = "A") -> np.ndarray:
    par = cv2.QRCodeEncoder_Params()
    par.version = version
    par.correction_level = CV2_LEVELS[level]
    img = cv2.QRCodeEncoder.create(par).encode(payload)
    m = img[2:-2, 2:-2] == 0
    assert m.shape[0] == 4 * version + 17, m.shape
    return m


def _alignment_coords_one(m: np.ndarray) -> set[int]:
    size = m.shape[0]
    centers = set()
    for r in range(2, size - 2):
        for c in range(2, size - 2):
            if (m[r - 2:r + 3, c - 2:c + 3] == ALIGN_SIG).all():
                centers.add((r, c))
    counts: dict[int, int] = {}
    for r, c in centers:
        counts[r] = counts.get(r, 0) + 1
        counts[c] = counts.get(c, 0) + 1
    return {x for x, n in counts.items() if n >= 3}


def derive_alignment(version: int) -> list[int]:
    """True coords appear in EVERY symbol of the version; data-area
    coincidences (repetitive payloads can mimic the 5×5 signature)
    don't survive an intersection over distinct payload/level renders."""
    coords = None
    for payload, level in (("A", "M"), ("s2sr-derive-7", "L"),
                           ("0123456789" * 3, "H")):
        got = _alignment_coords_one(cv2_matrix(version, level, payload))
        coords = got if coords is None else (coords & got)
    size = 4 * version + 17
    return sorted(coords | {6, size - 7})


EC_VALUES = (7, 10, 13, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30)

# code-rate (data/total) windows per level, measured off the known
# v1-10 table with margin — prunes the (ec, n_blocks) search from
# thousands of oracle trials to dozens at v40
RATE_WINDOW = {"L": (0.70, 0.86), "M": (0.54, 0.68),
               "Q": (0.39, 0.51), "H": (0.27, 0.39)}


def candidates(total: int, level: str, version: int):
    lo, hi = RATE_WINDOW[level]
    # v14+ symbols always use multiple blocks and predominantly large
    # ec values — iterate ec descending there (the nb=1 false-accept
    # mode that mandated ascending order cannot occur with nb ≥ 2)
    ec_order = EC_VALUES[::-1] if version >= 14 else EC_VALUES
    nb_min = 2 if version >= 14 else 1
    for ec in ec_order:
        for nb in range(nb_min, total // (ec + 1) + 1):
            data = total - ec * nb
            if data < nb:
                continue
            if not lo <= data / total <= hi:
                continue
            d1 = data // nb
            g2 = data % nb
            groups = [(nb - g2, d1)] + ([(g2, d1 + 1)] if g2 else [])
            yield ec, groups


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--versions", default="11-40",
                    help="range lo-hi or comma list")
    args = ap.parse_args()
    if "-" in args.versions:
        lo, hi = args.versions.split("-")
        versions = list(range(int(lo), int(hi) + 1))
    else:
        versions = [int(x) for x in args.versions.split(",")]

    from s2sr_tpu.decode import qr_tables as qt
    from s2sr_tpu.decode import qr_encode as qe
    from s2sr_tpu.decode.qr_decode import decode_matrix

    det = cv2.QRCodeDetector()

    print("ALIGNMENT = {")
    align = {}
    for v in range(2, 41):
        align[v] = derive_alignment(v)
        print(f"    {v}: {align[v]},")
    print("}")

    # patch the live modules so the encoder/decoder accept high
    # versions during the search (MAX_VERSION is imported by value)
    import s2sr_tpu.decode.qr_decode as qd
    qt.ALIGNMENT.update(align)
    qt.MAX_VERSION = 40
    qe.MAX_VERSION = 40
    qd.MAX_VERSION = 40

    print("\nEC_BLOCKS updates:")
    results = {}
    for v in versions:
        total = qt.total_codewords(v)
        results[v] = {}
        for level in "LMQH":
            found = None
            for ec, groups in candidates(total, level, v):
                data_cap = sum(n * d for n, d in groups)
                qt.EC_BLOCKS.setdefault(v, {})[level] = (ec, groups)
                # cv2's decoder is flaky for some (payload, scale, mask)
                # renders even on TRUE tables — try a few variants
                ok = False
                for frac, scale, mask in ((2, 4, 0), (1, 6, 3), (3, 8, None)):
                    payload = "A" * max(1, data_cap * frac // 6)
                    try:
                        m = qe.encode_qr(payload, level=level, version=v,
                                         mask=mask)
                    except ValueError:
                        break
                    img = qe.render(m, scale=scale, border=4)
                    try:
                        txt, _, _ = det.detectAndDecode(img)
                    except cv2.error:
                        continue  # wrong table → garbage stream → throws
                    if txt == payload:
                        ok = True
                        break
                if ok:
                    # independent check: decode a cv2-encoded symbol of
                    # this (v, level) with OUR table
                    try:
                        ours = decode_matrix(cv2_matrix(v, level, payload))
                        ok2 = ours.text == payload
                    except ValueError:
                        ok2 = False
                    if ok2:
                        found = (ec, groups)
                        break
            if found is None:
                print(f"    # {v}-{level}: NOT FOUND")
            results[v][level] = found
        row = results[v]
        print(f"    {v}: {{" + ", ".join(
            f'"{lv}": {row[lv]}' for lv in "LMQH") + "},")


if __name__ == "__main__":
    main()
