"""bench_all regression-gate logic (VERDICT r4 #5).

The full gate runs on real TPU; these pin the threshold logic itself:
recorded-quality numbers pass, a 1.5× across-the-board slowdown (the
injection `bench_all --inject-slowdown 1.5` applies on hardware)
fails, and relay-noise-sized wiggle on the engine configs does not.
"""

import importlib.util
import sys
from pathlib import Path


def _load_bench_all():
    spec = importlib.util.spec_from_file_location(
        "bench_all", Path(__file__).parent.parent / "bench_all.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_all"] = mod
    spec.loader.exec_module(mod)
    return mod


GOOD = [
    {"config": "1_single_tile_x4", "seconds": 0.26, "mpix_s": 1.0},
    {"config": "2_wow_enhance_16tiles", "seconds": 3.48},
    {"config": "3a_tile_warp_compute", "seconds": 1.0, "tiles": 127,
     "tiles_s": 127.0},
    {"config": "4_full_pipeline", "seconds": 80.0},   # ungated
    {"config": "5_vector_extraction_warm", "seconds": 0.43},
    {"config": "6_int8_turbo", "seconds": 0.7, "mpix_s": 1.51},
]


def _scaled(rows, factor):
    out = []
    for r in rows:
        r = dict(r)
        r["seconds"] = r["seconds"] * factor
        if "tiles_s" in r:
            r["tiles_s"] = r["tiles_s"] / factor
        if "mpix_s" in r:
            r["mpix_s"] = r["mpix_s"] / factor
        out.append(r)
    return out


def test_recorded_numbers_pass():
    ba = _load_bench_all()
    assert ba.evaluate_gate(GOOD) == []


def test_injected_slowdown_fails():
    ba = _load_bench_all()
    failures = ba.evaluate_gate(_scaled(GOOD, 1.5))
    assert failures, "1.5x slowdown must trip the gate"
    tripped = {f["config"] for f in failures}
    assert "1_single_tile_x4" in tripped
    assert "6_int8_turbo" in tripped


def test_relay_noise_passes():
    """Engine configs wiggle ~10% run-to-run; best-of-N keeps the
    noise configs near their floor — neither should trip the gate."""
    ba = _load_bench_all()
    assert ba.evaluate_gate(_scaled(GOOD, 1.1)) == []


def test_ungated_configs_ignored():
    ba = _load_bench_all()
    rows = [{"config": "4_full_pipeline", "seconds": 1e9}]
    assert ba.evaluate_gate(rows) == []


GOOD_R5 = GOOD + [
    {"config": "7_swinir_exact_512", "seconds": 0.26, "mpix_s": 1.03},
    {"config": "8_edsr_x4_device", "seconds": 0.33, "mpix_s": 0.80},
    {"config": "9_rdb_chain", "seconds": 0.72, "tf_s": 57.2},
]


def test_r5_families_gated():
    """VERDICT r4 #3: SwinIR + classic + chain rows are gated too —
    recorded numbers pass, 1.5x slowdown trips every one of them."""
    ba = _load_bench_all()
    assert ba.evaluate_gate(GOOD_R5) == []
    slow = []
    for r in GOOD_R5:
        r = dict(r)
        r["seconds"] *= 1.5
        for f in ("tiles_s", "mpix_s", "tf_s"):
            if f in r:
                r[f] = r[f] / 1.5
        slow.append(r)
    tripped = {f["config"] for f in ba.evaluate_gate(slow)}
    assert {"7_swinir_exact_512", "8_edsr_x4_device",
            "9_rdb_chain"} <= tripped


def test_missing_gated_field_fails_cleanly():
    """ADVICE r4: a gated row without its gated field (or null) is a
    reported failure, not a TypeError crash."""
    ba = _load_bench_all()
    rows = [{"config": "6_int8_turbo", "seconds": 0.7},
            {"config": "9_rdb_chain", "seconds": 0.72, "tf_s": None}]
    failures = ba.evaluate_gate(rows)
    assert len(failures) == 2
    assert all(f.get("error") == "gated field missing" for f in failures)
