"""CLI: fine-tune RRDBNet on synthetic (or directory) HR/LR pairs.

New capability beyond the reference (no training there, SURVEY §2d):
L1 fine-tuning with the sharded train step + orbax checkpoints.

LR inputs are area-downsampled HR crops (the standard bicubic-ish
degradation for first-stage Real-ESRGAN fine-tuning).
"""
import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description="Fine-tune RRDBNet")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--crop", type=int, default=64, help="LR crop size")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--blocks", type=int, default=23)
    parser.add_argument("--feat", type=int, default=64)
    parser.add_argument("--ckpt-dir", default="checkpoints/rrdbnet")
    parser.add_argument("--data-dir", default=None,
                        help="directory of HR GeoTIFFs (default: synthetic)")
    parser.add_argument("--mesh", default="", help='e.g. "dp=4,sp=2"')
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from s2sr_tpu.fetch.synthetic import synthetic_fields
    from s2sr_tpu.parallel.mesh import build_mesh
    from s2sr_tpu.training.checkpoint import CheckpointManager
    from s2sr_tpu.training.train import (TrainConfig, batch_sharding,
                                         init_training, make_train_step)

    config = TrainConfig(num_feat=args.feat, num_block=args.blocks,
                         learning_rate=args.lr)
    mesh = build_mesh(args.mesh) if args.mesh else None
    params, opt_state = init_training(config)
    step_fn, _ = make_train_step(config, mesh)
    mgr = CheckpointManager(Path(args.ckpt_dir))
    start = 0
    if args.resume and mgr.latest_step is not None:
        params, opt_state, start = mgr.restore(params, opt_state)
        print(f"resumed from step {start}")

    hr_sources = []
    if args.data_dir:
        from s2sr_tpu.pipelines.io import load_rgb

        for p in sorted(Path(args.data_dir).glob("*.tif")):
            hr_sources.append(load_rgb(p)[0])
    rng = np.random.default_rng(0)

    def sample_batch(step):
        crop_hr = args.crop * config.scale
        hrs = []
        for i in range(args.batch):
            if hr_sources:
                src = hr_sources[(step * args.batch + i) % len(hr_sources)]
            else:
                src = synthetic_fields(size=(crop_hr * 2, crop_hr * 2),
                                       seed=step * args.batch + i)
            y = rng.integers(0, src.shape[0] - crop_hr + 1)
            x = rng.integers(0, src.shape[1] - crop_hr + 1)
            hrs.append(src[y:y + crop_hr, x:x + crop_hr].astype(np.float32) / 255.0)
        hr = np.stack(hrs)
        s = config.scale
        lr_b = hr.reshape(args.batch, args.crop, s, args.crop, s, 3).mean((2, 4))
        return jnp.asarray(lr_b), jnp.asarray(hr)

    for step in range(start, start + args.steps):
        lr_b, hr_b = sample_batch(step)
        if mesh is not None:
            sh = batch_sharding(mesh)
            lr_b = jax.device_put(lr_b, sh)
            hr_b = jax.device_put(hr_b, sh)
        params, opt_state, loss = step_fn(params, opt_state, lr_b, hr_b)
        if step % 10 == 0 or step == start + args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}", flush=True)
    mgr.save(start + args.steps, params, opt_state)
    mgr.wait()
    print(f"saved checkpoint at step {start + args.steps} -> {args.ckpt_dir}")


if __name__ == "__main__":
    main()
