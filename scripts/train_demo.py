"""On-hardware training convergence demo: loss ↓ + PSNR > bicubic.

Every recorded throughput number in BENCH_NOTES runs random-init
weights (no egress to fetch released checkpoints), so nothing yet
demonstrates that the *training* subsystem actually improves a model on
this hardware. This script closes that within the environment's limits:

1. L1 phase — fine-tune a small RRDBNet (`training/train.py`) on
   synthetic-fields HR/LR pairs (the same deterministic fixture
   generator the offline pipeline uses, area-×4 degradation) via the
   real `PairSampler`+`prefetch` input pipeline.
2. GAN phase — a short second-stage run of `training/gan.py`
   (relativistic discriminator + perceptual) on top of the L1 weights.
3. Held-out eval — PSNR/SSIM on unseen scenes vs the bicubic-upsample
   baseline, at init / after L1 / after GAN.

Writes one JSON artifact (default TRAIN_DEMO.json) with the loss
curve, eval table and steady-state step rate. Mirrors the training
recipe the reference's weights were produced with upstream (Real-ESRGAN
stage 1 = L1, stage 2 = GAN; the reference itself only serves frozen
weights — cnn_super_resolution.py:205-211).

Axon-relay quirks honoured: readbacks are amortised (losses stay on
device until the end; steady-state rate is measured with a single
trailing readback).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def area_down(hr: np.ndarray, scale: int) -> np.ndarray:
    from s2sr_tpu.training.data import area_downsample

    return area_downsample(hr, scale)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=2500, help="L1 steps")
    ap.add_argument("--chunk", type=int, default=32,
                    help="optimizer steps per device dispatch "
                         "(lax.scan-chunked trainer; 1 = per-step "
                         "dispatch). The relay bills ~300 ms per "
                         "dispatch — chunking moved this demo from "
                         "2.5 to device-bound steps/s")
    ap.add_argument("--pipeline", choices=("device", "host"),
                    default="device",
                    help="'device': pool lives in HBM, crops sampled "
                         "inside the scanned step (host fully out of "
                         "the loop — the 1-core host sampler capped "
                         "the chunked trainer at ~4 steps/s); 'host': "
                         "PairSampler+prefetch threads")
    ap.add_argument("--gan-steps", type=int, default=40)
    ap.add_argument("--pool", type=int, default=24,
                    help="pre-generated HR training scenes (0 = generate "
                         "a fresh scene per sample — host-bound on 1 core)")
    ap.add_argument("--gan-weight", type=float, default=0.02)
    ap.add_argument("--blur-sigma", type=float, default=0.0,
                    help="gaussian blur on the training LR (the 'real' "
                         "degradation)")
    ap.add_argument("--noise-std", type=float, default=0.0,
                    help="gaussian noise std on the training LR")
    ap.add_argument("--second-order", action="store_true",
                    help="degrade LR through the full Real-ESRGAN "
                         "two-stage device chain (training/"
                         "degradation.py: mixed kernels + random "
                         "resize + noise + JPEG + sinc) instead of "
                         "the simple blur/noise/jpeg knobs; device "
                         "pipeline only, crop multiple of 16")
    ap.add_argument("--jpeg", default="",
                    help="training-LR JPEG quality range 'QLO,QHI' "
                         "(device DCT model, per-sample uniform)")
    ap.add_argument("--eval-degraded", action="store_true",
                    help="also evaluate on DEGRADED held-out LR "
                         "(blur 1.0 + noise 0.02 + JPEG q60 — fixed, "
                         "host-side real libjpeg) vs the bicubic "
                         "baseline on the same inputs")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=48, help="LR crop size")
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--grow", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="weight EMA decay (Real-ESRGAN params_ema "
                         "recipe; 0 = off). Adds an after_l1_ema eval "
                         "leg comparing the EMA to the raw weights")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialise RRDB blocks on backward — "
                         "required for the 23-block flagship on one "
                         "16 GB chip (--feat 64 --blocks 23)")
    ap.add_argument("--eval-size", type=int, default=192,
                    help="held-out LR eval size (HR = 4x)")
    ap.add_argument("--eval-scenes", type=int, default=3)
    ap.add_argument("--out", default="TRAIN_DEMO.json")
    ap.add_argument("--ckpt-dir", default="",
                    help="save the final params via the training "
                         "CheckpointManager (for downstream probes, "
                         "e.g. int8 quality eval on trained weights)")
    ap.add_argument("--init-ckpt", default="",
                    help="warm-start params from a training "
                         "CheckpointManager dir (e.g. the 24k-step L1 "
                         "flagship) — with --steps 0 this runs a "
                         "GAN-only fine-tune on top of saved L1 weights")
    ap.add_argument("--cpu", action="store_true", help="CPU smoke mode")
    args = ap.parse_args()
    jpeg_range = None
    if args.jpeg:
        lo, hi = (float(v) for v in args.jpeg.split(","))
        jpeg_range = (lo, hi)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from s2sr_tpu.fetch.synthetic import synthetic_fields
    from s2sr_tpu.models.rrdbnet import rrdbnet_apply
    from s2sr_tpu.training.data import PairSampler, prefetch
    from s2sr_tpu.training.gan import (GanConfig, UNetDiscriminator,
                                       make_gan_train_step)
    from s2sr_tpu.training.train import (TrainConfig, init_training,
                                         make_chunked_train_step,
                                         make_device_pool_train_step,
                                         make_train_step)
    from s2sr_tpu.utils.metrics import psnr, ssim

    try:
        from s2sr_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    platform = jax.devices()[0].platform
    print(f"device: {jax.devices()[0]}")

    # clamp the chunk to the run length, round steps to whole chunks
    # BEFORE sizing the cosine schedule — the decay must complete over
    # the steps that actually run
    chunk = (max(1, min(args.chunk, args.steps)) if args.steps
             else max(1, args.chunk))
    device_pipe = args.pipeline == "device" and chunk > 1
    if args.steps % chunk:
        args.steps -= args.steps % chunk
        print(f"rounding L1 steps down to {args.steps} (chunk {chunk})")
    config = TrainConfig(num_feat=args.feat, num_block=args.blocks,
                         num_grow_ch=args.grow, learning_rate=args.lr,
                         lr_decay_steps=args.steps, remat=args.remat,
                         ema_decay=args.ema_decay)
    params, opt_state = init_training(config, seed=0)
    start_step = 0
    if args.init_ckpt:
        from s2sr_tpu.training.checkpoint import CheckpointManager
        from s2sr_tpu.training.train import restore_flexible

        params, opt_state, start_step, _ = restore_flexible(
            CheckpointManager(args.init_ckpt), config)
        print(f"warm-start params from {args.init_ckpt} "
              f"@ step {start_step}")
    second_order = None
    if args.second_order:
        if not device_pipe:
            raise SystemExit("--second-order needs the device pipeline")
        from s2sr_tpu.training.degradation import DegradationConfig

        second_order = DegradationConfig()
    if device_pipe:
        pool_fn, _ = make_device_pool_train_step(
            config, args.crop, args.batch, chunk,
            blur_sigma=args.blur_sigma, noise_std=args.noise_std,
            jpeg_range=jpeg_range, second_order=second_order)
    elif chunk > 1:
        chunk_fn, _ = make_chunked_train_step(config)
    else:
        step_fn, _ = make_train_step(config)

    # --- held-out eval scenes (seeds far outside the sampler's range) --
    scale = config.scale
    eval_pairs = []
    for i in range(args.eval_scenes):
        hr_u8 = synthetic_fields(
            size=(args.eval_size * scale,) * 2, seed=100_000 + i)
        hr = hr_u8.astype(np.float32) / 255.0
        eval_pairs.append((area_down(hr, scale), hr_u8))

    apply_jit = jax.jit(
        lambda p, x: rrdbnet_apply(p, x, scale=scale, dtype=jnp.bfloat16))

    def to_u8(x: np.ndarray) -> np.ndarray:
        return np.clip(np.round(x * 255.0), 0, 255).astype(np.uint8)

    def evaluate(p) -> dict:
        ps, ss = [], []
        for lr_img, hr_u8 in eval_pairs:
            sr = np.asarray(apply_jit(p, jnp.asarray(lr_img[None])))[0]
            sr_u8 = to_u8(sr)
            ps.append(psnr(sr_u8, hr_u8))
            ss.append(ssim(sr_u8, hr_u8))
        return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}

    def bicubic_eval() -> dict:
        import cv2

        ps, ss = [], []
        for lr_img, hr_u8 in eval_pairs:
            up = cv2.resize(to_u8(lr_img),
                            (hr_u8.shape[1], hr_u8.shape[0]),
                            interpolation=cv2.INTER_CUBIC)
            ps.append(psnr(up, hr_u8))
            ss.append(ssim(up, hr_u8))
        return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}

    # --- degraded held-out eval (fixed blur+noise+JPEG on the LR) ----
    # Fixed parameters (not the training ranges) so clean-trained and
    # degradation-trained runs are scored on IDENTICAL inputs; real
    # libjpeg on host, mirroring PairSampler's host leg.
    eval_deg_pairs = []
    if args.eval_degraded:
        import cv2
        from scipy.ndimage import gaussian_filter

        deg_rng = np.random.default_rng(2024)
        for lr_img, hr_u8 in eval_pairs:
            d = gaussian_filter(lr_img, (1.0, 1.0, 0))
            d = d + deg_rng.normal(0, 0.02, d.shape)
            u8 = np.clip(np.round(d * 255.0), 0, 255).astype(np.uint8)
            ok, enc = cv2.imencode(".jpg", u8[..., ::-1],
                                   [cv2.IMWRITE_JPEG_QUALITY, 60])
            dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
            eval_deg_pairs.append(
                (dec.astype(np.float32) / 255.0, hr_u8))

    def evaluate_degraded(p) -> dict | None:
        if not eval_deg_pairs:
            return None
        ps, ss = [], []
        for lr_img, hr_u8 in eval_deg_pairs:
            sr = np.asarray(apply_jit(p, jnp.asarray(lr_img[None])))[0]
            sr_u8 = to_u8(sr)
            ps.append(psnr(sr_u8, hr_u8))
            ss.append(ssim(sr_u8, hr_u8))
        return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}

    def bicubic_degraded() -> dict | None:
        if not eval_deg_pairs:
            return None
        import cv2

        ps, ss = [], []
        for lr_img, hr_u8 in eval_deg_pairs:
            up = cv2.resize(to_u8(lr_img),
                            (hr_u8.shape[1], hr_u8.shape[0]),
                            interpolation=cv2.INTER_CUBIC)
            ps.append(psnr(up, hr_u8))
            ss.append(ssim(up, hr_u8))
        return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}

    baseline = bicubic_eval()
    at_init = evaluate(params)
    baseline_deg = bicubic_degraded()
    print(f"bicubic baseline: {baseline}")
    print(f"model at init:    {at_init}")
    if baseline_deg:
        print(f"bicubic degraded: {baseline_deg}")

    # --- L1 phase -------------------------------------------------------
    # pre-generate the HR pool once: per-sample synthetic_fields() costs
    # ~1 s/batch of host time on the 1-core box and starves the device
    pool = [synthetic_fields(size=(args.crop * scale * 2,) * 2, seed=1 + i)
            for i in range(args.pool)] or None
    sampler = PairSampler(hr_images=pool, crop_lr=args.crop, scale=scale,
                          batch_size=args.batch, seed=1,
                          blur_sigma=args.blur_sigma,
                          noise_std=args.noise_std, jpeg_range=jpeg_range)
    losses = []
    t0 = time.monotonic()
    t_steady = None
    if device_pipe:
        if not pool:
            raise SystemExit("--pipeline device requires --pool > 0")
        pool_dev = jnp.asarray(
            np.stack(pool).astype(np.float32) / 255.0)
        key = jax.random.PRNGKey(123)
        groups = args.steps // chunk
        for gi in range(groups):
            key, sub = jax.random.split(key)
            params, opt_state, lvec = pool_fn(params, opt_state,
                                              pool_dev, sub)
            losses.append(lvec)
            if gi == 0:
                np.asarray(lvec)     # force: compile once, then time
                t_steady = time.monotonic()
            if (gi + 1) % 25 == 0 or gi + 1 == groups:
                done = (gi + 1) * chunk
                rate = ((done - chunk) / (time.monotonic() - t_steady)
                        if done > chunk else 0.0)
                print(f"  L1 {done}/{args.steps} loss "
                      f"{float(np.asarray(lvec)[-1]):.4f} "
                      f"({rate:.1f} steps/s)", flush=True)
        t1 = time.monotonic()
        loss_np = (np.concatenate([np.asarray(v) for v in losses])
                   if losses else np.zeros(0, np.float32))
        steady_rate = ((args.steps - chunk) / (t1 - t_steady)
                       if args.steps > chunk else 0.0)
    elif chunk > 1:
        it = iter(prefetch(sampler, args.steps))
        for gi in range(args.steps // chunk):
            pairs = [next(it) for _ in range(chunk)]
            lr_c = np.stack([p[0] for p in pairs])
            hr_c = np.stack([p[1] for p in pairs])
            params, opt_state, lvec = chunk_fn(params, opt_state, lr_c, hr_c)
            losses.append(lvec)      # device (chunk,); read back at the end
            if gi == 0:
                np.asarray(lvec)     # force: compile once, then time
                t_steady = time.monotonic()
        if losses:
            np.asarray(losses[-1])   # drain the device queue
        t1 = time.monotonic()
        loss_np = (np.concatenate([np.asarray(v) for v in losses])
                   if losses else np.zeros(0, np.float32))
        steady_rate = ((args.steps - chunk) / (t1 - t_steady)
                       if args.steps > chunk else 0.0)
    else:
        for i, (lr_b, hr_b) in enumerate(prefetch(sampler, args.steps)):
            params, opt_state, loss = step_fn(params, opt_state, lr_b, hr_b)
            losses.append(loss)      # device scalars; read back at the end
            if i == 0:
                np.asarray(loss)     # force: compile once, then time
                t_steady = time.monotonic()
        if losses:
            np.asarray(losses[-1])   # drain the device queue
        t1 = time.monotonic()
        loss_np = np.asarray([float(x) for x in losses])
        steady_rate = ((args.steps - 1) / (t1 - t_steady)
                       if args.steps > 1 else 0.0)
    if args.steps:
        print(f"L1: {args.steps} steps, loss {loss_np[0]:.4f} -> "
              f"{loss_np[-1]:.4f} (min {loss_np.min():.4f}), "
              f"{steady_rate:.1f} steps/s steady "
              f"(compile {t_steady - t0:.0f}s)")

    # Checkpoint the L1-phase pair NOW: (params, opt_state) are
    # consistent here (the GAN phase updates params under a different
    # optimizer — saving post-GAN params with the stale L1 opt_state
    # would corrupt a resume). The L1 params are also the PSNR-best;
    # the GAN stage deliberately trades PSNR for sharpness.
    if args.ckpt_dir and args.steps:
        from s2sr_tpu.training.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ckpt_dir)
        mgr.save(args.steps, params, opt_state)
        mgr.wait()
        print(f"saved L1 params+opt to {args.ckpt_dir} @ {args.steps}")

    after_l1 = evaluate(params)
    print(f"after L1:         {after_l1}")
    after_l1_ema = None
    if args.ema_decay > 0 and args.steps:
        from s2sr_tpu.training.train import ema_params

        ema_tree = ema_params(opt_state)
        if ema_tree is not None:
            after_l1_ema = evaluate(ema_tree)
            print(f"after L1 (EMA):   {after_l1_ema}")
    after_l1_deg = evaluate_degraded(params)
    if after_l1_deg:
        print(f"after L1 (degraded LR): {after_l1_deg}")

    # --- GAN phase ------------------------------------------------------
    gan_metrics = []
    after_gan = None
    if args.gan_steps > 0:
        gcfg = GanConfig(base=config, gan_weight=args.gan_weight)
        d_params = UNetDiscriminator(gcfg.num_feat_d).init(
            jax.random.PRNGKey(7))
        if device_pipe:
            from s2sr_tpu.training.gan import make_device_pool_gan_step

            chunk_g = min(chunk, args.gan_steps)
            args.gan_steps -= args.gan_steps % chunk_g
            gan_run, disc, g_tx, d_tx = make_device_pool_gan_step(
                gcfg, args.crop, args.batch, chunk_g,
                blur_sigma=args.blur_sigma, noise_std=args.noise_std,
                jpeg_range=jpeg_range)
            g_opt = g_tx.init(params)
            d_opt = d_tx.init(d_params)
            key_g = jax.random.PRNGKey(777)
            mlist = []
            for _ in range(args.gan_steps // chunk_g):
                key_g, sub = jax.random.split(key_g)
                params, d_params, g_opt, d_opt, mm = gan_run(
                    params, d_params, g_opt, d_opt, pool_dev, sub)
                mlist.extend(
                    {k: float(np.asarray(mm[k])[i])
                     for k in ("g_loss", "d_loss", "pixel", "adv")}
                    for i in range(chunk_g))
            gan_metrics = mlist
        else:
            gan_step, disc, g_tx, d_tx = make_gan_train_step(gcfg)
            g_opt = g_tx.init(params)
            d_opt = d_tx.init(d_params)
            mlist = []
            for lr_b, hr_b in prefetch(sampler, args.gan_steps):
                params, d_params, g_opt, d_opt, m = gan_step(
                    params, d_params, g_opt, d_opt, lr_b, hr_b)
                mlist.append(m)
            gan_metrics = [
                {k: float(m[k]) for k in ("g_loss", "d_loss", "pixel",
                                          "adv")}
                for m in mlist]
        print(f"GAN: {args.gan_steps} steps, "
              f"g_loss {gan_metrics[0]['g_loss']:.4f} -> "
              f"{gan_metrics[-1]['g_loss']:.4f}, "
              f"d_loss {gan_metrics[-1]['d_loss']:.4f}, "
              f"pixel {gan_metrics[-1]['pixel']:.4f}")
        after_gan = evaluate(params)
        print(f"after GAN:        {after_gan}")
        # GAN-only runs checkpoint the post-GAN params (with a fresh L1
        # opt state — the GAN stage's G/D optimizers are stage-local,
        # and a resume would start a new stage anyway) so the GAN model
        # can be served/evaluated via eval_trained.py.
        if args.ckpt_dir and not args.steps:
            from s2sr_tpu.training.checkpoint import CheckpointManager
            from s2sr_tpu.training.train import make_optimizer

            mgr = CheckpointManager(args.ckpt_dir)
            mgr.save(start_step + args.gan_steps, params,
                     make_optimizer(config).init(params))
            mgr.wait()
            print(f"saved post-GAN params to {args.ckpt_dir} "
                  f"@ {start_step + args.gan_steps}")

    report = {
        "platform": platform,
        "config": {"feat": args.feat, "blocks": args.blocks,
                   "grow": args.grow, "scale": scale, "lr": args.lr,
                   "batch": args.batch, "crop_lr": args.crop,
                   "l1_steps": args.steps, "chunk": chunk,
                   "pipeline": args.pipeline, "remat": args.remat,
                   "gan_steps": args.gan_steps,
                   "pool": args.pool, "gan_weight": args.gan_weight,
                   "eval_lr_size": args.eval_size,
                   "eval_scenes": args.eval_scenes},
        "degradation": {"blur_sigma": args.blur_sigma,
                        "noise_std": args.noise_std,
                        "jpeg_range": list(jpeg_range) if jpeg_range
                        else None,
                        "second_order": bool(second_order)},
        "bicubic": baseline,
        "bicubic_degraded": baseline_deg,
        "model_init": at_init,
        "after_l1": after_l1,
        "after_l1_ema": after_l1_ema,
        "ema_decay": args.ema_decay or None,
        "after_l1_degraded": after_l1_deg,
        "after_gan": after_gan,
        "init_ckpt": args.init_ckpt or None,
        "l1_loss_first": float(loss_np[0]) if len(loss_np) else None,
        "l1_loss_last": float(loss_np[-1]) if len(loss_np) else None,
        "l1_loss_curve_every25": [float(x) for x in loss_np[::25]],
        "l1_steps_per_s_steady": round(steady_rate, 2),
        "gan_metrics_every10": gan_metrics[::10],
        "beats_bicubic": bool(after_l1["psnr"] > baseline["psnr"]),
    }
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(f"wrote {args.out}; beats_bicubic={report['beats_bicubic']}")


if __name__ == "__main__":
    main()
