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
        crop_hr = crop_lr * scale
        for i, im in enumerate(self.hr_images):
            if im.shape[0] < crop_hr or im.shape[1] < crop_hr:
                raise ValueError(
                    f"HR image {i} is {im.shape[0]}x{im.shape[1]} but the "
                    f"HR crop needs {crop_hr}x{crop_hr} "
                    f"(crop_lr {crop_lr} x scale {scale})")
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
            # same kernel/border math as the device sampler's
            # ops.blur.gaussian_blur (cv2 auto ksize, reflect-101), so
            # host- and device-sampled degradations cannot drift
            from ..ops.blur import auto_ksize, gaussian_kernel_1d

            ksize = auto_ksize(self.blur_sigma)
            k = gaussian_kernel_1d(ksize, self.blur_sigma)
            pad = ksize // 2

            def blur1(im: np.ndarray) -> np.ndarray:
                xp = np.pad(im, ((pad, pad), (0, 0), (0, 0)), mode="reflect")
                x = sum(xp[i:i + im.shape[0]] * k[i] for i in range(ksize))
                xp = np.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
                return sum(xp[:, i:i + im.shape[1]] * k[i]
                           for i in range(ksize))

            lr = np.stack([blur1(im) for im in lr])
        if self.noise_std > 0:
            lr = lr + self.rng.normal(0, self.noise_std, lr.shape)
        if self.jpeg_range is not None:
            import cv2

            lo, hi = self.jpeg_range
            out = []
            for im in lr:
                # round-to-nearest (not floor) so the quality
                # distribution matches the device sampler's continuous
                # uniform as closely as integer JPEG quality allows
                q = int(round(self.rng.uniform(lo, hi)))
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

    def _put(item) -> bool:
        """Bounded put that gives up once the consumer is gone, so an
        early consumer exit can never leave the producer blocked on a
        full queue (pinning device batches for the process lifetime)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer() -> None:
        try:
            for _ in range(steps):
                if stop.is_set():
                    return
                lr, hr = sampler.sample()
                if sharding is not None:
                    batch = (jax.device_put(lr, sharding),
                             jax.device_put(hr, sharding))
                else:
                    batch = (jax.device_put(lr), jax.device_put(hr))
                if not _put(batch):
                    return
            _put(None)
        except BaseException as exc:  # surface in the consumer, don't hang it
            _put(exc)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                return
            if isinstance(batch, BaseException):
                raise batch
            yield batch
    finally:
        stop.set()
        thread.join(timeout=5.0)
