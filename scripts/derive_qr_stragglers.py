"""Second-pass derivation for (version, level) entries where cv2's
decoder would not accept any candidate forward (its detector is flaky
on some of our mask/scale renders at large symbol sizes).

Reverse-only validation: decode TWO distinct cv2-encoded symbols with
our decoder under each candidate (ec, blocks) structure. A wrong
structure garbles the de-interleave permutation and/or fails the
Reed-Solomon residual check, so requiring exact text equality on both
payloads — and asserting that exactly ONE candidate passes — pins the
true table without the forward leg.

Usage: python scripts/derive_qr_stragglers.py 21:L 21:M 24:L ...
       (alignment coords for the versions involved must already be in
       qr_tables.ALIGNMENT or are derived here)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from derive_qr_tables import candidates, cv2_matrix, derive_alignment


def main() -> None:
    from s2sr_tpu.decode import qr_tables as qt
    from s2sr_tpu.decode import qr_encode as qe
    import s2sr_tpu.decode.qr_decode as qd

    qt.MAX_VERSION = qe.MAX_VERSION = qd.MAX_VERSION = 40

    targets = [t.split(":") for t in sys.argv[1:]]
    for vs, level in targets:
        v = int(vs)
        if v not in qt.ALIGNMENT:
            qt.ALIGNMENT[v] = derive_alignment(v)
            print(f"# ALIGNMENT[{v}] = {qt.ALIGNMENT[v]}")
        total = qt.total_codewords(v)
        passing = []
        for ec, groups in candidates(total, level, v):
            data_cap = sum(n * d for n, d in groups)
            qt.EC_BLOCKS.setdefault(v, {})[level] = (ec, groups)
            ok = True
            for payload in ("A" * max(1, data_cap // 3),
                            "S2SR-" + "0123456789" * max(1, data_cap // 40)):
                try:
                    res = qd.decode_matrix(cv2_matrix(v, level, payload))
                    if res.text != payload:
                        ok = False
                except (ValueError, AssertionError, IndexError, KeyError):
                    ok = False
                if not ok:
                    break
            if ok:
                passing.append((ec, groups))
        if len(passing) == 1:
            ec, groups = passing[0]
            print(f'    {v}-{level}: ({ec}, {groups}),')
        else:
            print(f"# {v}-{level}: AMBIGUOUS/none — {passing}")


if __name__ == "__main__":
    main()
