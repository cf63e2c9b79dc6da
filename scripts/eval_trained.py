"""End-to-end quality eval: TRAINED weights through the real serving path.

Every throughput number in BENCH_NOTES runs random-init weights, and the
released checkpoints are unreachable offline (BENCH_NOTES "weights gap").
This closes the loop the environment allows: take a checkpoint produced
by the in-repo training subsystem (scripts/train_demo.py --ckpt-dir),
write it through the engine's own weights format, build a real
``SREngine`` from that file, and measure PSNR/SSIM on held-out scenes
against the bicubic baseline — through ``enhance()`` (the product
serving path: uint8 in, halo tiling/bucketing, uint8 truncation out),
not a bare model forward.

``--bgr false`` by default: the demo checkpoints are trained on RGB
batches, unlike the released Real-ESRGAN weights (trained BGR,
reproduced by the engine's default flip — engine.py docstring).

Writes one JSON artifact (default EVAL_TRAINED.json).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt-dir", required=True,
                    help="CheckpointManager dir from train_demo.py")
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=23)
    ap.add_argument("--grow", type=int, default=32)
    ap.add_argument("--eval-size", type=int, default=192,
                    help="held-out LR eval size (HR = 4x)")
    ap.add_argument("--eval-scenes", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32", "int8"))
    ap.add_argument("--out", default="EVAL_TRAINED.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax

    from s2sr_tpu.fetch.synthetic import synthetic_fields
    from s2sr_tpu.models.engine import SREngine
    from s2sr_tpu.models.weights import save_params
    from s2sr_tpu.training.checkpoint import CheckpointManager
    from s2sr_tpu.training.data import area_downsample
    from s2sr_tpu.training.train import TrainConfig, restore_flexible
    from s2sr_tpu.utils.metrics import psnr, ssim

    mgr = CheckpointManager(args.ckpt_dir)
    cfg = TrainConfig(num_feat=args.feat, num_block=args.blocks,
                      num_grow_ch=args.grow, lr_decay_steps=1)
    params, _, step, _ = restore_flexible(mgr, cfg)
    print(f"restored step {step} from {args.ckpt_dir}")

    weights_dir = Path("/tmp/eval_trained_weights")
    weights_dir.mkdir(parents=True, exist_ok=True)
    save_params(params, weights_dir / "realesrgan_x4.npz")

    engine = SREngine("realesrgan_x4", weights_dir=weights_dir,
                      dtype=args.dtype, bgr_order=False)
    assert engine.pretrained, "engine must load the written weights"

    scale = engine.scale
    rows = []
    for i in range(args.eval_scenes):
        hr_u8 = synthetic_fields(size=(args.eval_size * scale,) * 2,
                                 seed=100_000 + i)
        lr_u8 = np.clip(np.round(
            area_downsample(hr_u8.astype(np.float32), scale)), 0, 255
        ).astype(np.uint8)
        sr_u8 = engine.enhance(lr_u8)           # the real serving path
        bi_u8 = cv2.resize(lr_u8, hr_u8.shape[1::-1],
                           interpolation=cv2.INTER_CUBIC)
        rows.append({
            "seed": 100_000 + i,
            "engine_psnr": psnr(sr_u8, hr_u8),
            "engine_ssim": ssim(sr_u8, hr_u8),
            "bicubic_psnr": psnr(bi_u8, hr_u8),
            "bicubic_ssim": ssim(bi_u8, hr_u8),
        })
        print(rows[-1])

    mean = {k: float(np.mean([r[k] for r in rows]))
            for k in rows[0] if k != "seed"}
    report = {
        "platform": jax.devices()[0].platform,
        "ckpt_step": int(step),
        "config": {"feat": args.feat, "blocks": args.blocks,
                   "grow": args.grow, "dtype": args.dtype,
                   "eval_lr_size": args.eval_size,
                   "eval_scenes": args.eval_scenes},
        "scenes": rows,
        "mean": mean,
        "beats_bicubic": bool(mean["engine_psnr"] > mean["bicubic_psnr"]),
    }
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(f"wrote {args.out}; beats_bicubic={report['beats_bicubic']} "
          f"(engine {mean['engine_psnr']:.2f} dB vs bicubic "
          f"{mean['bicubic_psnr']:.2f} dB)")


if __name__ == "__main__":
    main()
