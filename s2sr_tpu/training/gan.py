"""Second-stage (GAN) fine-tuning: discriminator + perceptual losses.

Real-ESRGAN's full recipe is L1 + perceptual + adversarial; the
reference only *serves* the resulting weights. This module provides the
TPU-native training side:

- :class:`UNetDiscriminator` — the spectral-norm-free U-Net
  discriminator shape used by Real-ESRGAN (conv down ×3, conv up ×3
  with skip connections), NHWC,
- relativistic-average GAN losses (generator + discriminator),
- a feature-space perceptual loss using the *generator's own* frozen
  shallow features (an offline-friendly stand-in for VGG — no
  pretrained VGG exists in a zero-egress environment; swap
  ``perceptual_features`` for a VGG pytree when weights are available),
- :func:`make_gan_train_step` — jitted joint step over an optional
  ``(dp, sp)`` mesh, same sharding contract as the L1 step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .train import TrainConfig, batch_sharding

Params = Dict[str, Any]

_DIMS = ("NHWC", "HWIO", "NHWC")


def _conv(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), "SAME",
        dimension_numbers=_DIMS) + p["bias"]


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _up2(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


@dataclass
class GanConfig:
    base: TrainConfig = None
    num_feat_d: int = 32
    pixel_weight: float = 1.0
    perceptual_weight: float = 1.0
    gan_weight: float = 0.1
    lr_d: float = 1e-4

    def __post_init__(self):
        if self.base is None:
            self.base = TrainConfig()


class UNetDiscriminator:
    """U-Net discriminator (Real-ESRGAN's architecture family), NHWC."""

    def __init__(self, num_feat: int = 32):
        self.num_feat = num_feat

    def init(self, key) -> Params:
        import math

        nf = self.num_feat
        ks = iter(jax.random.split(key, 16))

        def conv_p(cin, cout, k=3):
            fan = k * k * cin
            return {
                "kernel": jax.random.normal(
                    next(ks), (k, k, cin, cout), jnp.float32
                ) * math.sqrt(2.0 / fan),
                "bias": jnp.zeros((cout,), jnp.float32),
            }

        return {
            "conv0": conv_p(3, nf),
            "down1": conv_p(nf, nf * 2),
            "down2": conv_p(nf * 2, nf * 4),
            "down3": conv_p(nf * 4, nf * 8),
            "up3": conv_p(nf * 8, nf * 4),
            "up2": conv_p(nf * 4, nf * 2),
            "up1": conv_p(nf * 2, nf),
            "out0": conv_p(nf, nf),
            "out1": conv_p(nf, 1),
        }

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]
        if h % 8 or w % 8:
            raise ValueError(
                f"UNetDiscriminator needs H,W multiples of 8 (3 stride-2 "
                f"stages with skip adds), got {h}x{w} — use a crop_hr "
                f"(crop_lr x scale) that is a multiple of 8")
        x0 = _lrelu(_conv(x, params["conv0"]))
        d1 = _lrelu(_conv(x0, params["down1"], stride=2))
        d2 = _lrelu(_conv(d1, params["down2"], stride=2))
        d3 = _lrelu(_conv(d2, params["down3"], stride=2))
        u3 = _lrelu(_conv(_up2(d3), params["up3"])) + d2
        u2 = _lrelu(_conv(_up2(u3), params["up2"])) + d1
        u1 = _lrelu(_conv(_up2(u2), params["up1"])) + x0
        out = _conv(_lrelu(_conv(u1, params["out0"])), params["out1"])
        return out            # (N, H, W, 1) logits


def perceptual_features(gen_params: Params, x: jnp.ndarray,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Shallow generator features as a frozen perceptual embedding
    (conv_first of the SR net, stop-gradient on its params)."""
    p = jax.lax.stop_gradient(gen_params["conv_first"])
    feat = jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=_DIMS) + p["bias"].astype(dtype)
    return _lrelu(feat)


def _gan_step_parts(config: GanConfig):
    """The raw (unjitted) GAN step + its optimizers/discriminator —
    shared by :func:`make_gan_train_step` (per-dispatch) and
    :func:`make_device_pool_gan_step` (scan-chunked)."""
    base = config.base
    disc = UNetDiscriminator(config.num_feat_d)
    from .train import make_optimizer

    g_tx = make_optimizer(base)   # honor base.lr_decay_steps (cosine)
    d_tx = optax.adam(config.lr_d)

    def generator_loss(g_params, d_params, lr_batch, hr_batch):
        from .train import model_apply

        sr = model_apply(base, g_params, lr_batch)
        pixel = jnp.mean(jnp.abs(sr - hr_batch))
        feat_sr = perceptual_features(g_params, sr)
        feat_hr = perceptual_features(g_params, hr_batch)
        perceptual = jnp.mean(jnp.abs(feat_sr - feat_hr))
        # relativistic average GAN (generator side)
        logits_fake = disc.apply(d_params, sr)
        logits_real = disc.apply(d_params, hr_batch)
        rel_f = logits_fake - jnp.mean(logits_real)
        rel_r = logits_real - jnp.mean(logits_fake)
        adv = 0.5 * (
            jnp.mean(jax.nn.softplus(-rel_f))     # fake should look real
            + jnp.mean(jax.nn.softplus(rel_r)))   # real should look fake
        total = (config.pixel_weight * pixel
                 + config.perceptual_weight * perceptual
                 + config.gan_weight * adv)
        return total, (sr, pixel, adv)

    def discriminator_loss(d_params, sr, hr_batch):
        logits_fake = disc.apply(d_params, jax.lax.stop_gradient(sr))
        logits_real = disc.apply(d_params, hr_batch)
        rel_r = logits_real - jnp.mean(logits_fake)
        rel_f = logits_fake - jnp.mean(logits_real)
        return 0.5 * (jnp.mean(jax.nn.softplus(-rel_r))
                      + jnp.mean(jax.nn.softplus(rel_f)))

    def step(g_params, d_params, g_opt, d_opt, lr_batch, hr_batch):
        (g_loss, (sr, pixel, adv)), g_grads = jax.value_and_grad(
            generator_loss, has_aux=True)(g_params, d_params,
                                          lr_batch, hr_batch)
        g_updates, g_opt = g_tx.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        d_loss, d_grads = jax.value_and_grad(discriminator_loss)(
            d_params, sr, hr_batch)
        d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, d_updates)
        metrics = {"g_loss": g_loss, "d_loss": d_loss,
                   "pixel": pixel, "adv": adv}
        return g_params, d_params, g_opt, d_opt, metrics

    return step, disc, g_tx, d_tx


def make_gan_train_step(config: GanConfig, mesh: Optional[Mesh] = None):
    """→ jitted ``step(g_params, d_params, g_opt, d_opt, lr, hr)`` →
    ``(g_params, d_params, g_opt, d_opt, metrics)``."""
    step, disc, g_tx, d_tx = _gan_step_parts(config)

    if mesh is None:
        return jax.jit(step), disc, g_tx, d_tx

    repl = NamedSharding(mesh, P())
    bsh = batch_sharding(mesh)
    jitted = jax.jit(step, in_shardings=(repl,) * 4 + (bsh, bsh),
                     out_shardings=(repl,) * 5)
    return jitted, disc, g_tx, d_tx


def make_device_pool_gan_step(
    config: GanConfig,
    crop_lr: int,
    batch: int,
    chunk: int,
    mesh: Optional[Mesh] = None,
    blur_sigma: float = 0.0,
    noise_std: float = 0.0,
    jpeg_range: Optional[Tuple[float, float]] = None,
):
    """Device-resident GAN trainer: K scanned G+D steps per dispatch,
    batches sampled on device from an HBM pool — the GAN twin of
    :func:`..training.train.make_device_pool_train_step`.

    → jitted ``run(g_params, d_params, g_opt, d_opt, pool, key)`` →
    ``(g_params, d_params, g_opt, d_opt, metrics)`` with each metric
    stacked ``(chunk,)``.
    """
    from .train import batch_sharding as _bsh, make_pool_sampler

    step, disc, g_tx, d_tx = _gan_step_parts(config)
    sample_batch = make_pool_sampler(config.base.scale, crop_lr, batch,
                                     blur_sigma, noise_std, jpeg_range)

    constrain = None
    if mesh is not None:
        bsh = _bsh(mesh)

        def constrain(b):
            return jax.lax.with_sharding_constraint(b, bsh)

    def run(g_params, d_params, g_opt, d_opt, pool, key):
        def body(carry, key_i):
            g_params, d_params, g_opt, d_opt = carry
            lr_b, hr_b = sample_batch(pool, key_i)
            if constrain is not None:
                lr_b, hr_b = constrain(lr_b), constrain(hr_b)
            g_params, d_params, g_opt, d_opt, m = step(
                g_params, d_params, g_opt, d_opt, lr_b, hr_b)
            return (g_params, d_params, g_opt, d_opt), m

        keys = jax.random.split(key, chunk)
        carry, metrics = jax.lax.scan(
            body, (g_params, d_params, g_opt, d_opt), keys)
        return (*carry, metrics)

    if mesh is None:
        return jax.jit(run), disc, g_tx, d_tx

    repl = NamedSharding(mesh, P())
    jitted = jax.jit(run, in_shardings=(repl,) * 6,
                     out_shardings=(repl,) * 5)
    return jitted, disc, g_tx, d_tx
