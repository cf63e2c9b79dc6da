"""Per-checkpoint halo-exactness guard (VERDICT r3 weak #4).

The pad-4 tiling default is byte-exact only for realistic weight
scales; BENCH_NOTES' margin table showed adversarial unscaled weights
flip bytes at pad 4.  The engine now probes the tiled-vs-whole float
margin on first load of any pretrained checkpoint and escalates the
pad when the margin isn't safely under 1 output LSB — mirroring the
contract the reference's unguarded tile loop silently assumes
(``server/app/cnn_super_resolution.py:236-280``).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
from test_rrdbnet import make_state_dict  # noqa: E402

from s2sr_tpu.models.engine import SREngine, _HALO_MARGIN_MAX_LSB  # noqa: E402
from s2sr_tpu.models.weights import (  # noqa: E402
    convert_rrdbnet_state_dict,
    save_params,
)


def _save_checkpoint(tmp_path, name, weight_mult=1.0, seed=0):
    sd = make_state_dict(seed=seed)
    if weight_mult != 1.0:
        sd = {k: v * weight_mult for k, v in sd.items()}
    params = convert_rrdbnet_state_dict(sd)
    d = tmp_path / name
    save_params(params, d / "realesrgan_x4.npz")
    return d


def test_realistic_checkpoint_keeps_configured_pad(tmp_path):
    """Default behavior unchanged for realistic weight scales: the probe
    margin sits far under the threshold and pad stays as configured."""
    # 0.5× the test init: the tiny 2-block model's raw 0.05-randn init
    # probes to ~0.28 LSB (legitimately near the flip boundary at this
    # depth); trained/released-scale weights sit orders below it.
    wdir = _save_checkpoint(tmp_path, "real", weight_mult=0.5)
    eng = SREngine("realesrgan_x4", weights_dir=wdir, dtype="float32",
                   tile_size=48, tile_pad=4, batch_size=4)
    assert eng.tile_pad == 4
    assert eng.halo_margin_lsb is not None
    assert eng.halo_margin_lsb <= _HALO_MARGIN_MAX_LSB


def test_marginal_checkpoint_escalates_and_restores(tmp_path, rng):
    """A checkpoint whose pad-4 margin breaches the threshold but whose
    pad-6 margin is safe (the raw 0.05-randn test init: 0.28 → 0.02
    LSB) must auto-escalate AND the served tiled output must then match
    the genuinely UNTILED whole-image forward (an exact_area-forced
    engine; its ≤engage path is the masked bucket, bit-identical to the
    whole forward) — comparing enhance_serving vs enhance would run the
    same tiled math on both sides and prove nothing (r4 review)."""
    wdir = _save_checkpoint(tmp_path, "marginal", weight_mult=1.0)
    eng = SREngine("realesrgan_x4", weights_dir=wdir, dtype="float32",
                   tile_size=48, tile_pad=4, batch_size=4)
    assert eng.tile_pad > 4, (
        f"guard did not escalate: margin={eng.halo_margin_lsb}")
    assert eng.halo_margin_lsb <= _HALO_MARGIN_MAX_LSB

    img = rng.integers(0, 256, (150, 130, 3)).astype(np.uint8)
    whole_eng = SREngine("realesrgan_x4", weights_dir=wdir,
                         dtype="float32", tile_size=48, tile_pad=4,
                         batch_size=4, pad_probe=False,
                         exact_area=10**9)
    want = whole_eng.enhance(img)
    got = eng.enhance_serving(img)
    # the escalated pad restores a ~0.02-LSB margin; allow the
    # residual trunc-boundary straggler
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 1e-3, (diff != 0).mean()


def test_hopeless_checkpoint_stays_flagged(tmp_path):
    """A wildly-unscaled checkpoint (6×) whose margin exceeds the
    threshold at EVERY ladder pad must end at the max pad with the
    measured margin still surfaced — the flagged regime the load-time
    warning and /api/metadata expose."""
    wdir = _save_checkpoint(tmp_path, "hopeless", weight_mult=6.0)
    eng = SREngine("realesrgan_x4", weights_dir=wdir, dtype="float32",
                   tile_size=48, tile_pad=4, batch_size=4)
    assert eng.tile_pad == 10
    assert not eng.halo_margin_lsb <= _HALO_MARGIN_MAX_LSB


def test_random_init_skips_probe(tmp_path):
    """Random init is the pinned-test path, not a user checkpoint — no
    probe, pad unchanged."""
    eng = SREngine("realesrgan_x4", weights_dir=tmp_path / "empty",
                   dtype="float32", tile_size=48, tile_pad=4, batch_size=4)
    assert eng.halo_margin_lsb is None
    assert eng.tile_pad == 4


def test_probe_optout(tmp_path):
    wdir = _save_checkpoint(tmp_path, "optout", weight_mult=6.0)
    eng = SREngine("realesrgan_x4", weights_dir=wdir, dtype="float32",
                   tile_size=48, tile_pad=4, batch_size=4, pad_probe=False)
    assert eng.halo_margin_lsb is None
    assert eng.tile_pad == 4


def test_probe_memoized_across_constructions(tmp_path, monkeypatch):
    """ADVICE r4: only the FIRST construction over a given checkpoint
    pays the probe compiles — a second ad-hoc SREngine over the same
    weight file reuses the memoized margins (in-process and via the
    JSON sidecar), including the escalation ladder's."""
    import s2sr_tpu.models.engine as eng_mod

    monkeypatch.setenv("S2SR_JAX_CACHE", str(tmp_path / "cache" / "jax"))
    monkeypatch.setattr(eng_mod, "_PROBE_MEMO", {})
    wdir = _save_checkpoint(tmp_path, "memo", weight_mult=1.0)
    calls = []
    real_probe = eng_mod.probe_halo_margin

    def counting_probe(*a, **k):
        calls.append(a[3])  # the pad
        return real_probe(*a, **k)

    monkeypatch.setattr(eng_mod, "probe_halo_margin", counting_probe)
    e1 = SREngine("realesrgan_x4", weights_dir=wdir, dtype="float32",
                  tile_size=48, tile_pad=4, batch_size=4)
    first_calls = list(calls)
    assert first_calls, "first construction must probe"
    e2 = SREngine("realesrgan_x4", weights_dir=wdir, dtype="float32",
                  tile_size=48, tile_pad=4, batch_size=4)
    assert calls == first_calls, "second construction must not re-probe"
    assert e2.tile_pad == e1.tile_pad
    assert e2.halo_margin_lsb == e1.halo_margin_lsb
    # cross-process path: clear the in-process memo, the sidecar serves
    eng_mod._PROBE_MEMO.clear()
    e3 = SREngine("realesrgan_x4", weights_dir=wdir, dtype="float32",
                  tile_size=48, tile_pad=4, batch_size=4)
    assert calls == first_calls, "sidecar must serve a fresh process"
    assert e3.tile_pad == e1.tile_pad


def test_settings_pad_probe_knob(tmp_path, monkeypatch):
    """Settings.sr_pad_probe=False disables the probe through
    get_engine (the operator's global opt-out, ADVICE r4)."""
    from s2sr_tpu.config import get_settings
    from s2sr_tpu.models.engine import get_engine

    wdir = _save_checkpoint(tmp_path, "knob", weight_mult=6.0)
    monkeypatch.setenv("SR_PAD_PROBE", "false")
    get_settings.cache_clear()
    try:
        eng = get_engine("realesrgan_x4", weights_dir=str(wdir),
                         dtype="float32", tile_size=48, tile_pad=4,
                         batch_size=4)
        assert eng.halo_margin_lsb is None
        assert eng.tile_pad == 4
    finally:
        get_settings.cache_clear()
