"""Sharded RRDBNet training step (fine-tuning on Sentinel-2 pairs).

New capability beyond the reference (which only serves frozen weights,
SURVEY §2d): an optax train step jit-compiled over a ``(dp, sp)`` device
mesh —

- ``dp``: batch axis (classic data parallelism),
- ``sp``: the image H axis (spatial/sequence parallelism — XLA GSPMD
  inserts the conv halo exchanges over ICI automatically),

with replicated parameters and an all-reduced gradient (inserted by
GSPMD from the sharding annotations, not hand-written collectives).
L1 (optionally Charbonnier) loss — the first-stage Real-ESRGAN
fine-tuning objective.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.rrdbnet import RRDBNet, rrdbnet_apply


@dataclass
class TrainConfig:
    # family: "rrdbnet" (the flagship CNN) or "swinir" (the registry's
    # transformer — the reference ships it untrained, swinir.py:494-635;
    # here it trains through the same L1/GAN steps)
    family: str = "rrdbnet"
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    # swinir-family shape (ignored for rrdbnet)
    embed_dim: int = 60
    depths: Tuple[int, ...] = (2, 2)
    heads: Tuple[int, ...] = (4, 4)
    window: int = 8
    scale: int = 4
    learning_rate: float = 1e-4
    charbonnier_eps: float = 0.0     # 0 → plain L1
    dtype: str = "bfloat16"
    # >0: cosine-decay the LR to ~0 over this many steps (from-scratch
    # runs converge past the bicubic baseline only with decay; pure
    # fine-tunes can leave it 0 for a constant LR)
    lr_decay_steps: int = 0
    # rematerialise RRDB blocks on backward — required to train the
    # 23-block flagship on one 16 GB chip (activations for ~345 convs
    # at batch 16 x 48^2 crops exceed HBM without it)
    remat: bool = False
    # >0: maintain an exponential moving average of the weights inside
    # the optimizer state (the Real-ESRGAN recipe — its released
    # checkpoints serve ``params_ema``, cnn_super_resolution.py:205-211;
    # 0.999 is the upstream value). Riding in opt_state means EVERY
    # trainer variant (L1/chunked/device-pool/GAN generator/pp/fsdp)
    # carries it, it checkpoints for free, and it shards like the
    # params under tp. Extract with :func:`ema_params`.
    ema_decay: float = 0.0


class EmaState(NamedTuple):
    """Optimizer-state slot holding the weight EMA pytree."""

    ema: dict


def _ema_of_params(decay: float) -> optax.GradientTransformation:
    """Chainable transform: passes updates through unchanged, tracking
    ``ema = decay·ema + (1-decay)·new_params`` (one fused lerp per
    step — scan-safe, mesh-safe)."""

    def init_fn(params):
        return EmaState(jax.tree.map(jnp.asarray, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ema transform requires params")
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_p)
        return updates, EmaState(ema)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params(opt_state):
    """The EMA weight pytree from an optimizer state built with
    ``ema_decay > 0`` — or None when the state carries no EMA."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if type(opt_state) is tuple:
        for s in opt_state:
            found = ema_params(s)
            if found is not None:
                return found
    return None


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    if config.lr_decay_steps > 0:
        sched = optax.cosine_decay_schedule(
            config.learning_rate, config.lr_decay_steps, alpha=0.02)
        tx = optax.adam(sched)
    else:
        tx = optax.adam(config.learning_rate)
    if config.ema_decay > 0:
        tx = optax.chain(tx, _ema_of_params(config.ema_decay))
    return tx


def _build_swinir(config: TrainConfig, dtype):
    from ..models.swinir import SwinIR

    return SwinIR(scale=config.scale, embed_dim=config.embed_dim,
                  depths=config.depths, num_heads=config.heads,
                  window_size=config.window, dtype=dtype,
                  remat=config.remat,
                  # training differentiates the forward — the fused
                  # Pallas attention is inference-only (no VJP)
                  fused_attn="0")


def model_apply(config: TrainConfig, params, x):
    """Family-dispatched differentiable forward (shared by the L1 and
    GAN steps): (B, h, w, 3) in [0,1] → (B, sh, sw, 3) float32."""
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    if config.family == "rrdbnet":
        return rrdbnet_apply(params, x, scale=config.scale, dtype=dtype,
                             remat=config.remat)
    if config.family == "swinir":
        return _build_swinir(config, dtype).apply(params, x)
    raise ValueError(f"unknown model family {config.family!r}")


def loss_from_pred(pred, hr_batch, config: TrainConfig):
    """Charbonnier (or plain L1) pixel loss on an already-computed
    prediction — shared by the standard step and the pipelined
    (``parallel.pipeline.make_pp_train_step``) forward."""
    diff = pred - hr_batch
    if config.charbonnier_eps > 0:
        return jnp.mean(jnp.sqrt(diff * diff + config.charbonnier_eps**2))
    return jnp.mean(jnp.abs(diff))


def loss_fn(params, lr_batch, hr_batch, config: TrainConfig):
    return loss_from_pred(model_apply(config, params, lr_batch),
                          hr_batch, config)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(N, H, W, C): N over dp, H over sp (both optional in the mesh)."""
    spec = [None, None, None, None]
    if "dp" in mesh.axis_names:
        spec[0] = "dp"
    if "sp" in mesh.axis_names:
        spec[1] = "sp"
    return NamedSharding(mesh, P(*spec))


def make_train_step(config: TrainConfig, mesh: Optional[Mesh] = None):
    """→ jitted ``step(params, opt_state, lr_batch, hr_batch)`` →
    ``(params, opt_state, loss)``. With a mesh, batches must be placed
    with :func:`batch_sharding`; params/opt state are replicated."""
    tx = make_optimizer(config)

    def step(params, opt_state, lr_batch, hr_batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, lr_batch, hr_batch, config
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step), tx

    repl = NamedSharding(mesh, P())
    bsh = batch_sharding(mesh)
    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, bsh, bsh),
        out_shardings=(repl, repl, repl),
    )
    return jitted, tx


def make_chunked_train_step(config: TrainConfig, mesh: Optional[Mesh] = None):
    """→ jitted ``run(params, opt_state, lr_chunk, hr_chunk)`` →
    ``(params, opt_state, losses)`` where the chunks carry a leading
    steps axis ``(K, N, h, w, 3)`` and K optimizer steps run as ONE
    ``lax.scan`` inside ONE executable.

    This is the dispatch-amortised trainer for per-dispatch-expensive
    links (the axon relay bills ~300 ms per dispatch: the plain
    per-step trainer measured 2.5 steps/s HOST-bound on a model whose
    step compute is ~15 ms — scanning K=32 steps per dispatch moves the
    ceiling to the device). Identical math to K calls of
    :func:`make_train_step`'s step; losses come back stacked (K,).

    With a mesh, chunks are sharded per :func:`batch_sharding` on the
    (N, h/H) axes — the leading K axis is the scan axis and never
    sharded.
    """
    tx = make_optimizer(config)

    def run(params, opt_state, lr_chunk, hr_chunk):
        def body(carry, batch):
            params, opt_state = carry
            lr_b, hr_b = batch
            loss, grads = jax.value_and_grad(loss_fn)(
                params, lr_b, hr_b, config)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (lr_chunk, hr_chunk))
        return params, opt_state, losses

    if mesh is None:
        return jax.jit(run), tx

    repl = NamedSharding(mesh, P())
    bsh = batch_sharding(mesh)
    csh = NamedSharding(mesh, P(None, *bsh.spec))
    jitted = jax.jit(
        run,
        in_shardings=(repl, repl, csh, csh),
        out_shardings=(repl, repl, repl),
    )
    return jitted, tx


def restore_flexible(mgr, config: TrainConfig):
    """Restore from a checkpoint whose LR-schedule kind may differ from
    ``config``'s → ``(params, opt_state, step, opt_restored)``.

    A cosine schedule adds ``ScaleByScheduleState`` to the Adam state,
    and ``ema_decay > 0`` adds an :class:`EmaState` slot — so a
    checkpoint trained with either cannot restore against a template
    without it (and vice versa). If ``config``'s own template
    mismatches, the checkpoint is read with an alternate template
    (schedule kind and/or EMA presence flipped), the Adam first/second
    moments (``ScaleByAdamState``) — and the weight EMA when both sides
    carry one — are transplanted into a fresh optimizer for ``config``,
    and ``opt_restored`` is False so callers can note the change;
    params always restore.
    """
    from dataclasses import replace

    params, opt_state = init_training(config)
    try:
        p, o, step = mgr.restore(params, opt_state)
        return p, o, step, True
    except ValueError:                   # opt-state tree mismatch
        pass
    flip_decay = {"lr_decay_steps": 0 if config.lr_decay_steps else 1}
    flip_ema = {"ema_decay": 0.0 if config.ema_decay else 0.999}
    for alt in (replace(config, **flip_decay),
                replace(config, **flip_ema),
                replace(config, **flip_decay, **flip_ema)):
        p_alt, o_alt = init_training(alt)
        try:
            p, o_alt, step = mgr.restore(p_alt, o_alt)
        except ValueError:
            continue

        fresh = make_optimizer(config).init(p)

        # transplant the restored Adam moments (and the weight EMA,
        # when the template has a slot for it) BY TYPE — an ema_decay>0
        # optimizer is a chain whose Adam state nests one level deeper
        # than the plain adam's, so structural zipping cannot align the
        # two; each state type occurs at most once.
        def find(state, typ):
            if isinstance(state, typ):
                return state
            if type(state) is tuple:
                for s in state:
                    hit = find(s, typ)
                    if hit is not None:
                        return hit
            return None

        donors = {typ: find(o_alt, typ)
                  for typ in (optax.ScaleByAdamState, EmaState)}

        def graft(f):
            for typ, donor in donors.items():
                if isinstance(f, typ) and donor is not None:
                    return donor
            if type(f) is tuple:
                return tuple(graft(x) for x in f)
            return f

        return p, graft(fresh), step, False
    raise ValueError(
        "checkpoint optimizer state matches no known template "
        "(tried ±cosine schedule, ±weight EMA)")


def make_pool_sampler(scale: int, crop_lr: int, batch: int,
                      blur_sigma: float = 0.0, noise_std: float = 0.0,
                      jpeg_range: Optional[Tuple[float, float]] = None,
                      second_order=None):
    """→ ``sample_batch(pool, key) -> (lr_b, hr_b)``: device-side crop
    sampling from an HBM-resident scene pool (uniform scene, uniform
    offset, 0.5 h/v-flips, area-×scale degradation; optional gaussian
    blur + noise + JPEG on the LR — the same "real" degradation knobs
    as the host :class:`..training.data.PairSampler`). ``jpeg_range``
    = (q_lo, q_hi): per-sample uniform JPEG quality through the
    device DCT-quantization model (:func:`..ops.jpeg.jpeg_degrade` —
    blocked DCT as batched MXU matmuls; requires ``crop_lr`` a
    multiple of 16). Shared by the L1
    (:func:`make_device_pool_train_step`) and GAN
    (:func:`..training.gan.make_device_pool_gan_step`) trainers."""
    crop_hr = crop_lr * scale
    if jpeg_range is not None and crop_lr % 16:
        raise ValueError("jpeg_range needs crop_lr a multiple of 16 "
                         f"(4:2:0 blocks), got {crop_lr}")
    # second_order: a DegradationConfig routes the LR synthesis through
    # the full Real-ESRGAN two-stage chain (training/degradation.py);
    # it REPLACES the simple blur/noise/jpeg knobs above
    if second_order is not None and crop_lr % 16:
        raise ValueError("second_order needs crop_lr a multiple of 16 "
                         f"(JPEG blocks at both stages), got {crop_lr}")

    def sample_batch(pool, key):
        n_scenes, H, W, _ = pool.shape  # don't shadow PartitionSpec P
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        idx = jax.random.randint(k1, (batch,), 0, n_scenes)
        ys = jax.random.randint(k2, (batch,), 0, H - crop_hr + 1)
        xs = jax.random.randint(k3, (batch,), 0, W - crop_hr + 1)
        flips = jax.random.bernoulli(k4, shape=(batch, 2))

        def crop_one(i, y, x, f):
            c = jax.lax.dynamic_slice(
                pool, (i, y, x, 0), (1, crop_hr, crop_hr, 3))[0]
            c = jnp.where(f[0], c[::-1], c)
            c = jnp.where(f[1], c[:, ::-1], c)
            return c

        hr_b = jax.vmap(crop_one)(idx, ys, xs, flips)
        if second_order is not None:
            from .degradation import second_order_degrade

            dkeys = jax.random.split(k5, batch)
            lr_b = jax.vmap(
                lambda im, k: second_order_degrade(
                    k, im, scale, second_order))(hr_b, dkeys)
            return lr_b, hr_b
        lr_b = hr_b.reshape(batch, crop_lr, scale, crop_lr, scale,
                            3).mean((2, 4))
        if blur_sigma > 0:
            from ..ops.blur import gaussian_blur

            lr_b = jax.vmap(lambda im: gaussian_blur(im, blur_sigma))(lr_b)
        if noise_std > 0:
            lr_b = lr_b + noise_std * jax.random.normal(
                k5, lr_b.shape, lr_b.dtype)
        if jpeg_range is not None:
            from ..ops.jpeg import jpeg_degrade

            q = jax.random.uniform(k6, (batch,),
                                   minval=jpeg_range[0],
                                   maxval=jpeg_range[1])
            lr_b = jax.vmap(jpeg_degrade)(jnp.clip(lr_b, 0.0, 1.0), q)
        return lr_b, hr_b

    return sample_batch


def make_device_pool_train_step(
    config: TrainConfig,
    crop_lr: int,
    batch: int,
    chunk: int,
    mesh: Optional[Mesh] = None,
    blur_sigma: float = 0.0,
    noise_std: float = 0.0,
    jpeg_range: Optional[Tuple[float, float]] = None,
    second_order=None,
):
    """Fully device-resident input pipeline + K-step scan trainer.

    → jitted ``run(params, opt_state, pool, key)`` →
    ``(params, opt_state, losses)`` where ``pool`` is the WHOLE training
    corpus ``(P, Hhr, Whr, 3) float32 in [0,1]`` shipped to HBM once,
    and each of the ``chunk`` scanned steps samples its batch ON DEVICE:
    scene index + crop offset via ``jax.random``, gathered HR crops
    (``vmap(dynamic_slice)``), h/v-flip augmentation (``jnp.where`` on
    reversed copies — branchless, shape-static), and the area-×s
    degradation as a reshape-mean. The host's only per-chunk work is
    splitting one PRNG key — this removes BOTH per-step dispatch
    overhead (the ~300 ms relay round-trip) and the host sampling
    bottleneck the chunked trainer exposed (~4 steps/s host-bound on
    the 1-core box vs device-bound here).

    Same L1/Charbonnier objective as :func:`make_train_step`; the
    sampling distribution matches :class:`..training.data.PairSampler`
    (uniform scene, uniform crop, 0.5 flips) but with JAX instead of
    numpy RNG, so streams differ.

    With a mesh, params/opt/pool are replicated and each step's sampled
    batch is sharded on (dp, sp) before the forward — GSPMD inserts the
    halo exchanges; sampling itself is replicated (cheap gathers).
    """
    tx = make_optimizer(config)
    sample_batch = make_pool_sampler(config.scale, crop_lr, batch,
                                     blur_sigma, noise_std, jpeg_range,
                                     second_order=second_order)

    constrain = None
    if mesh is not None:
        bsh = batch_sharding(mesh)

        def constrain(b):
            return jax.lax.with_sharding_constraint(b, bsh)

    def run(params, opt_state, pool, key):
        def body(carry, key_i):
            params, opt_state = carry
            lr_b, hr_b = sample_batch(pool, key_i)
            if constrain is not None:
                lr_b, hr_b = constrain(lr_b), constrain(hr_b)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, lr_b, hr_b, config)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, chunk)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys)
        return params, opt_state, losses

    if mesh is None:
        return jax.jit(run), tx

    repl = NamedSharding(mesh, P())
    jitted = jax.jit(
        run,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=(repl, repl, repl),
    )
    return jitted, tx


def init_training(
    config: TrainConfig, seed: int = 0
) -> Tuple[dict, optax.OptState]:
    if config.family == "swinir":
        net = _build_swinir(config, jnp.float32)
    else:
        net = RRDBNet(
            num_feat=config.num_feat, num_block=config.num_block,
            num_grow_ch=config.num_grow_ch, scale=config.scale,
        )
    params = net.init(jax.random.PRNGKey(seed))
    tx = make_optimizer(config)
    return params, tx.init(params)
