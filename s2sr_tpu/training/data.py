"""Training data pipeline: HR/LR pair sampling with host-side prefetch.

The reference has no training and its only "loader" is whole-file
rasterio reads. Here: a background-thread pipeline that keeps N batches
ahead of the device — crop sampling + degradation on host threads,
`jax.device_put` overlapped with the training step (the standard
single-host input pipeline pattern; swap `device_put` for per-shard
puts under a mesh via ``sharding=``).

Degradation model: area-average ×s downsample (first-stage Real-ESRGAN
fine-tuning); optional gaussian blur + noise for the "real" degradation
pipeline.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..utils import setup_logging

logger = setup_logging("s2sr_tpu.data")


def area_downsample(hr: np.ndarray, scale: int) -> np.ndarray:
    """Area-average ×scale downsample of one (H, W, C) image — THE
    training degradation (the sampler applies the batched equivalent;
    the demo and trained-weights eval import this so train and eval
    degradations cannot drift apart)."""
    h, w, c = hr.shape
    return hr.reshape(h // scale, scale, w // scale, scale, c).mean((1, 3))


class PairSampler:
    """Random HR crops + synthetic LR counterparts."""

    def __init__(
        self,
        hr_images: Optional[List[np.ndarray]] = None,
        crop_lr: int = 64,
        scale: int = 4,
        batch_size: int = 8,
        blur_sigma: float = 0.0,
        noise_std: float = 0.0,
        jpeg_range: Optional[Tuple[float, float]] = None,
        seed: int = 0,
    ):
        self.hr_images = hr_images or []
        self.crop_lr = crop_lr
        self.scale = scale
        self.batch_size = batch_size
        self.blur_sigma = blur_sigma
        self.noise_std = noise_std
        # host sampler uses a REAL libjpeg round-trip (cv2); the device
        # sampler (train.make_pool_sampler) applies the DCT-quantization
        # model (ops/jpeg.py) — validated within ~0.6 dB of each other
        # in tests/test_jpeg.py
        self.jpeg_range = jpeg_range
        self.rng = np.random.default_rng(seed)
        self._synth_counter = 0

    @classmethod
    def from_directory(cls, directory: Path | str, **kwargs) -> "PairSampler":
        from ..pipelines.io import load_rgb

        images = []
        for p in sorted(Path(directory).glob("*.tif")):
            images.append(load_rgb(p)[0])
        if not images:
            raise FileNotFoundError(f"no .tif files in {directory}")
        return cls(hr_images=images, **kwargs)

    def _hr_source(self) -> np.ndarray:
        if self.hr_images:
            return self.hr_images[self.rng.integers(len(self.hr_images))]
        from ..fetch.synthetic import synthetic_fields

        self._synth_counter += 1
        size = self.crop_lr * self.scale * 2
        return synthetic_fields(size=(size, size), seed=self._synth_counter)

    def sample(self) -> Tuple[np.ndarray, np.ndarray]:
        """→ (lr [B, c, c, 3], hr [B, c·s, c·s, 3]) float32 in [0, 1]."""
        s = self.scale
        crop_hr = self.crop_lr * s
        hrs = []
        for _ in range(self.batch_size):
            src = self._hr_source()
            y = self.rng.integers(0, src.shape[0] - crop_hr + 1)
            x = self.rng.integers(0, src.shape[1] - crop_hr + 1)
            crop = src[y:y + crop_hr, x:x + crop_hr].astype(np.float32) / 255.0
            if self.rng.random() < 0.5:          # hflip augmentation
                crop = crop[:, ::-1]
            if self.rng.random() < 0.5:          # vflip
                crop = crop[::-1]
            hrs.append(crop)
        hr = np.stack(hrs)
        lr = hr.reshape(self.batch_size, self.crop_lr, s,
                        self.crop_lr, s, 3).mean(axis=(2, 4))
        if self.blur_sigma > 0:
            from scipy.ndimage import gaussian_filter

            lr = np.stack([gaussian_filter(im, (self.blur_sigma,
                                                self.blur_sigma, 0))
                           for im in lr])
        if self.noise_std > 0:
            lr = lr + self.rng.normal(0, self.noise_std, lr.shape)
        if self.jpeg_range is not None:
            import cv2

            lo, hi = self.jpeg_range
            out = []
            for im in lr:
                q = int(self.rng.uniform(lo, hi))
                u8 = np.clip(np.round(im * 255.0), 0, 255).astype(np.uint8)
                ok, enc = cv2.imencode(
                    ".jpg", u8[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, q])
                dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
                out.append(dec.astype(np.float32) / 255.0)
            lr = np.stack(out)
        return lr.astype(np.float32), hr


def prefetch(
    sampler: PairSampler,
    steps: int,
    buffer_size: int = 2,
    sharding=None,
) -> Iterator[Tuple]:
    """Iterator of device-resident (lr, hr) batches, produced ahead of
    consumption by a background thread."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()

    def producer() -> None:
        for _ in range(steps):
            if stop.is_set():
                return
            lr, hr = sampler.sample()
            if sharding is not None:
                batch = (jax.device_put(lr, sharding),
                         jax.device_put(hr, sharding))
            else:
                batch = (jax.device_put(lr), jax.device_put(hr))
            q.put(batch)
        q.put(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                return
            yield batch
    finally:
        stop.set()
