"""CLI: train/fine-tune RRDBNet on synthetic (or directory) HR pairs.

New capability beyond the reference (no training there, SURVEY §2d).
Production formulation (BENCH_NOTES round-3 training sections):

- **device-resident pipeline** (default): the HR scene pool ships to
  HBM once and every batch is sampled inside a ``lax.scan``-chunked
  step — measured 68 steps/s vs 2.5 dispatch-bound on the demo model;
- **block-level remat** (default for ≥8 blocks): the 23-block flagship
  trains on one 16 GB chip (11.6 steps/s, ``TRAIN_FLAGSHIP.json``);
- cosine LR decay over the run, periodic orbax checkpoints + resume,
  optional ``--mesh "dp=4,sp=2"`` sharding (GSPMD collectives).

LR inputs are area-downsampled HR crops (the standard degradation for
first-stage Real-ESRGAN training).
"""
import argparse
import time
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Train an SR model (RRDBNet or SwinIR)")
    parser.add_argument("--family", choices=("rrdbnet", "swinir"),
                        default="rrdbnet",
                        help="model family; swinir trains through the "
                             "same L1 (and GAN) steps")
    parser.add_argument("--embed-dim", type=int, default=60,
                        help="swinir: embedding dim (SwinIR-M uses 180)")
    parser.add_argument("--depths", default="2,2",
                        help="swinir: per-RSTB block depths, e.g. "
                             "'6,6,6,6,6,6' for SwinIR-M")
    parser.add_argument("--heads", default="4,4",
                        help="swinir: per-RSTB attention heads")
    parser.add_argument("--window", type=int, default=8,
                        help="swinir: attention window")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--crop", type=int, default=48, help="LR crop size")
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--blocks", type=int, default=23)
    parser.add_argument("--feat", type=int, default=64)
    parser.add_argument("--grow", type=int, default=32)
    parser.add_argument("--chunk", type=int, default=32,
                        help="optimizer steps per device dispatch")
    parser.add_argument("--pipeline", choices=("device", "host"),
                        default="device")
    parser.add_argument("--remat", default=None,
                        action=argparse.BooleanOptionalAction,
                        help="rematerialise blocks on backward "
                             "(default: on for --blocks >= 8)")
    parser.add_argument("--decay-steps", type=int, default=None,
                        help="cosine-decay horizon (default: the total "
                             "planned steps incl. resume offset; 0 = "
                             "constant LR)")
    parser.add_argument("--pool", type=int, default=48,
                        help="synthetic HR pool scenes (ignored with "
                             "--data-dir)")
    parser.add_argument("--blur-sigma", type=float, default=0.0,
                        help="gaussian blur on the LR (the 'real' "
                             "degradation; 0 = area-only)")
    parser.add_argument("--noise-std", type=float, default=0.0,
                        help="gaussian noise std on the LR in [0,1] "
                             "units")
    parser.add_argument("--jpeg", default="",
                        help="JPEG compression on the LR as 'QLO,QHI' "
                             "(per-sample uniform quality, e.g. "
                             "'30,95' — the Real-ESRGAN recipe's third "
                             "degradation; needs --crop a multiple of "
                             "16)")
    parser.add_argument("--ema-decay", type=float, default=0.0,
                        help="weight EMA decay (Real-ESRGAN serves "
                             "params_ema; upstream uses 0.999; 0 = "
                             "off). Export the EMA with "
                             "convert_weights --from-ckpt --ema")
    parser.add_argument("--ckpt-dir", default="checkpoints/rrdbnet")
    parser.add_argument("--save-every", type=int, default=2000,
                        help="checkpoint every N steps")
    parser.add_argument("--data-dir", default=None,
                        help="directory of HR GeoTIFFs (default: synthetic)")
    parser.add_argument("--mesh", default="", help='e.g. "dp=4,sp=2"')
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()
    jpeg_range = None
    if args.jpeg:
        lo, hi = (float(v) for v in args.jpeg.split(","))
        jpeg_range = (lo, hi)

    import jax
    import jax.numpy as jnp

    from s2sr_tpu.fetch.synthetic import synthetic_fields
    from s2sr_tpu.parallel.mesh import build_mesh
    from s2sr_tpu.training.checkpoint import CheckpointManager
    from s2sr_tpu.training.train import (TrainConfig, batch_sharding,
                                         init_training,
                                         make_device_pool_train_step,
                                         make_train_step,
                                         restore_flexible)
    from s2sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    chunk = max(1, min(args.chunk, args.steps))
    args.steps -= args.steps % chunk
    remat = args.remat if args.remat is not None else args.blocks >= 8
    mgr = CheckpointManager(Path(args.ckpt_dir))
    start = 0 if not args.resume else (mgr.latest_step or 0)
    decay = (args.decay_steps if args.decay_steps is not None
             else start + args.steps)
    config = TrainConfig(family=args.family,
                         num_feat=args.feat, num_block=args.blocks,
                         num_grow_ch=args.grow,
                         embed_dim=args.embed_dim,
                         depths=tuple(int(v)
                                      for v in args.depths.split(",")),
                         heads=tuple(int(v)
                                     for v in args.heads.split(",")),
                         window=args.window,
                         learning_rate=args.lr,
                         lr_decay_steps=decay, remat=remat,
                         ema_decay=args.ema_decay)
    mesh = build_mesh(args.mesh) if args.mesh else None
    params, opt_state = init_training(config)
    if args.resume and mgr.latest_step is not None:
        params, opt_state, start, opt_ok = restore_flexible(mgr, config)
        print(f"resumed from step {start}"
              + ("" if opt_ok else
                 " (schedule kind changed — Adam moments transplanted, "
                 "schedule state reset)"))

    # --- HR pool ------------------------------------------------------
    crop_hr = args.crop * config.scale
    if args.data_dir:
        from s2sr_tpu.pipelines.io import load_rgb

        paths = sorted(p for p in Path(args.data_dir).iterdir()
                       if p.suffix.lower() in (".tif", ".tiff", ".png"))
        pool = [load_rgb(p)[0] for p in paths]
        if not pool:
            raise SystemExit(
                f"no .tif/.tiff/.png files in {args.data_dir}")
    else:
        pool = [synthetic_fields(size=(crop_hr * 2,) * 2, seed=1 + i)
                for i in range(args.pool)]
    min_side = min(min(p.shape[0], p.shape[1]) for p in pool)
    if min_side < crop_hr:
        raise SystemExit(f"pool images ({min_side}px) smaller than the "
                         f"HR crop ({crop_hr}px)")

    device_pipe = args.pipeline == "device" and chunk > 1
    shape = (f"{args.blocks} blocks / {args.feat} feat"
             if args.family == "rrdbnet" else
             f"swinir dim {args.embed_dim} depths {args.depths} "
             f"heads {args.heads} window {args.window}")
    print(f"training: {shape}, "
          f"{args.steps} steps @ chunk {chunk}, pipeline={args.pipeline}, "
          f"remat={remat}, decay to step {decay}, pool={len(pool)}")

    t_steady = None
    done = 0
    if device_pipe:
        # device pipeline needs one common pool shape: center-crop every
        # scene to the smallest square so the stack is rectangular
        side = min_side
        pool_np = np.stack([
            p[(p.shape[0] - side) // 2:(p.shape[0] + side) // 2,
              (p.shape[1] - side) // 2:(p.shape[1] + side) // 2]
            for p in pool]).astype(np.float32) / 255.0
        pool_dev = jnp.asarray(pool_np)
        run, _ = make_device_pool_train_step(
            config, args.crop, args.batch, chunk, mesh=mesh,
            blur_sigma=args.blur_sigma, noise_std=args.noise_std,
            jpeg_range=jpeg_range)
        key = jax.random.PRNGKey(start)
        for gi in range(args.steps // chunk):
            key, sub = jax.random.split(key)
            params, opt_state, lvec = run(params, opt_state, pool_dev, sub)
            done += chunk
            if gi == 0:
                np.asarray(lvec)
                t_steady = time.monotonic()
            if (gi + 1) % 10 == 0 or done == args.steps:
                rate = ((done - chunk) / (time.monotonic() - t_steady)
                        if done > chunk else 0.0)
                print(f"step {start + done}/{start + args.steps}: loss "
                      f"{float(np.asarray(lvec)[-1]):.4f} "
                      f"({rate:.1f} steps/s)", flush=True)
            if done % args.save_every < chunk and done != args.steps:
                mgr.save(start + done, params, opt_state)
    else:
        from s2sr_tpu.training.data import PairSampler

        step_fn, _ = make_train_step(config, mesh)
        sampler = PairSampler(hr_images=pool, crop_lr=args.crop,
                              scale=config.scale, batch_size=args.batch,
                              blur_sigma=args.blur_sigma,
                              noise_std=args.noise_std,
                              jpeg_range=jpeg_range, seed=start)

        for i in range(args.steps):
            lr_b, hr_b = (jnp.asarray(a) for a in sampler.sample())
            if mesh is not None:
                sh = batch_sharding(mesh)
                lr_b = jax.device_put(lr_b, sh)
                hr_b = jax.device_put(hr_b, sh)
            params, opt_state, loss = step_fn(params, opt_state, lr_b, hr_b)
            done = i + 1
            if done % 50 == 0 or done == args.steps:
                print(f"step {start + done}: loss {float(loss):.4f}",
                      flush=True)
            if done % args.save_every == 0 and done != args.steps:
                mgr.save(start + done, params, opt_state)

    mgr.save(start + args.steps, params, opt_state)
    mgr.wait()
    print(f"saved checkpoint at step {start + args.steps} -> {args.ckpt_dir}")


if __name__ == "__main__":
    main()
