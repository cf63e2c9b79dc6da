"""Sharded training-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s2sr_tpu.training.train import (
    TrainConfig,
    batch_sharding,
    init_training,
    make_chunked_train_step,
    make_train_step,
)

TINY = TrainConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=2,
                   dtype="float32", learning_rate=1e-3)


def _data(batch=4, h=8, w=8, scale=2, seed=0):
    rng = np.random.default_rng(seed)
    lr = rng.random((batch, h, w, 3), np.float32)
    hr = rng.random((batch, h * scale, w * scale, 3), np.float32)
    return lr, hr


def test_unsharded_loss_decreases():
    params, opt_state = init_training(TINY)
    step, _ = make_train_step(TINY)
    lr, hr = _data()
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, lr, hr)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_chunked_step_matches_sequential():
    """K scanned optimizer steps in one dispatch == K sequential steps
    (same params, opt-state schedule count, and per-step losses)."""
    K = 4
    rng = np.random.default_rng(1)
    chunks = [_data(seed=s) for s in range(K)]
    lr_c = np.stack([c[0] for c in chunks])
    hr_c = np.stack([c[1] for c in chunks])

    params, opt_state = init_training(TINY)
    step, _ = make_train_step(TINY)
    seq_losses = []
    for lr, hr in chunks:
        params, opt_state, loss = step(params, opt_state, lr, hr)
        seq_losses.append(float(loss))

    params2, opt_state2 = init_training(TINY)
    run, _ = make_chunked_train_step(TINY)
    params2, opt_state2, losses = run(params2, opt_state2, lr_c, hr_c)

    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("mesh_shape", ["dp=4", "dp=2,sp=2"])
def test_chunked_step_sharded(mesh_shape):
    """Chunked trainer over a mesh: runs, losses finite, matches the
    unsharded chunked run."""
    from s2sr_tpu.parallel import build_mesh

    K = 2
    chunks = [_data(seed=s) for s in range(K)]
    lr_c = np.stack([c[0] for c in chunks])
    hr_c = np.stack([c[1] for c in chunks])

    params, opt_state = init_training(TINY)
    run, _ = make_chunked_train_step(TINY)
    p_ref, _, l_ref = run(params, opt_state, lr_c, hr_c)

    mesh = build_mesh(mesh_shape)
    run_m, _ = make_chunked_train_step(TINY, mesh=mesh)
    p_m, _, l_m = run_m(params, opt_state, lr_c, hr_c)
    np.testing.assert_allclose(np.asarray(l_m), np.asarray(l_ref),
                               rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_device_pool_train_step():
    """Device-resident pipeline: loss decreases, crops legal, losses
    finite; mesh variant matches shapes and stays finite."""
    from s2sr_tpu.training.train import make_device_pool_train_step

    rng = np.random.default_rng(0)
    pool = rng.random((3, 32, 32, 3)).astype(np.float32)
    params, opt_state = init_training(TINY)
    run, _ = make_device_pool_train_step(TINY, crop_lr=8, batch=4, chunk=6)
    key = jax.random.PRNGKey(0)
    p1, o1, losses = run(params, opt_state, pool, key)
    losses = np.asarray(losses)
    assert losses.shape == (6,) and np.all(np.isfinite(losses))
    # a second chunk continues to improve on average
    _, _, losses2 = run(p1, o1, pool, jax.random.PRNGKey(1))
    assert float(np.mean(np.asarray(losses2))) < float(np.mean(losses))


@pytest.mark.parametrize("mesh_shape", ["dp=4"])
def test_device_pool_train_step_sharded(mesh_shape):
    from s2sr_tpu.parallel import build_mesh
    from s2sr_tpu.training.train import make_device_pool_train_step

    rng = np.random.default_rng(0)
    pool = rng.random((2, 32, 32, 3)).astype(np.float32)
    params, opt_state = init_training(TINY)
    mesh = build_mesh(mesh_shape)
    run, _ = make_device_pool_train_step(TINY, crop_lr=8, batch=4,
                                         chunk=3, mesh=mesh)
    _, _, losses = run(params, opt_state, pool, jax.random.PRNGKey(0))
    losses = np.asarray(losses)
    assert losses.shape == (3,) and np.all(np.isfinite(losses))


def test_remat_matches_no_remat():
    """jax.checkpoint over the scanned blocks changes memory, not math:
    identical loss; grads agree to ulp level (the backward recompute
    reorders float arithmetic, so bitwise equality is not expected)."""
    from s2sr_tpu.training.train import loss_fn
    from dataclasses import replace

    params, _ = init_training(TINY)
    lr, hr = _data()
    cfg_r = replace(TINY, remat=True)
    l0, g0 = jax.value_and_grad(loss_fn)(params, lr, hr, TINY)
    l1, g1 = jax.value_and_grad(loss_fn)(params, lr, hr, cfg_r)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-12)


def test_pool_sampler_degradation_knobs():
    """Device sampler's blur/noise knobs actually change the LR and
    preserve shapes (parity with the host PairSampler options)."""
    from s2sr_tpu.training.train import make_pool_sampler

    rng = np.random.default_rng(0)
    pool = rng.random((2, 32, 32, 3)).astype(np.float32)
    key = jax.random.PRNGKey(5)
    plain = make_pool_sampler(2, 8, 4)(pool, key)
    blurred = make_pool_sampler(2, 8, 4, blur_sigma=1.0)(pool, key)
    noisy = make_pool_sampler(2, 8, 4, noise_std=0.05)(pool, key)
    # same key → same crops; HR identical, LR differs by the knob
    np.testing.assert_array_equal(np.asarray(plain[1]),
                                  np.asarray(blurred[1]))
    assert np.abs(np.asarray(plain[0]) - np.asarray(blurred[0])).max() > 1e-4
    assert np.abs(np.asarray(plain[0]) - np.asarray(noisy[0])).max() > 1e-3
    assert blurred[0].shape == plain[0].shape == (4, 8, 8, 3)


def test_device_pool_gan_step():
    """GAN twin of the device-pool trainer: K scanned G+D steps per
    dispatch, metrics stacked (K,), params actually move."""
    from s2sr_tpu.training.gan import (GanConfig, UNetDiscriminator,
                                       make_device_pool_gan_step)

    rng = np.random.default_rng(0)
    pool = rng.random((2, 32, 32, 3)).astype(np.float32)
    gcfg = GanConfig(base=TINY)
    g_params, _ = init_training(TINY)
    d_params = UNetDiscriminator(gcfg.num_feat_d).init(jax.random.PRNGKey(7))
    run, disc, g_tx, d_tx = make_device_pool_gan_step(
        gcfg, crop_lr=8, batch=2, chunk=3)
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
    g2, d2, _, _, m = run(g_params, d_params, g_opt, d_opt, pool,
                          jax.random.PRNGKey(0))
    for k in ("g_loss", "d_loss", "pixel", "adv"):
        v = np.asarray(m[k])
        assert v.shape == (3,) and np.all(np.isfinite(v))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(g_params), jax.tree.leaves(g2)))
    assert moved, "generator params did not update"


def test_lr_decay_schedule():
    """lr_decay_steps wires a cosine schedule through make_optimizer:
    the step still trains, and the schedule actually decays."""
    import optax

    cfg = TrainConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=2,
                      dtype="float32", learning_rate=1e-3,
                      lr_decay_steps=50)
    params, opt_state = init_training(cfg)
    step, _ = make_train_step(cfg)
    lr, hr = _data()
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, lr, hr)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    sched = optax.cosine_decay_schedule(cfg.learning_rate,
                                        cfg.lr_decay_steps, alpha=0.02)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(50)) == pytest.approx(0.02e-3, rel=1e-3)


@pytest.mark.parametrize("mesh_shape", [("dp", 8), ("dp_sp", None)])
def test_sharded_matches_unsharded(mesh_shape):
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual devices"
    if mesh_shape[0] == "dp":
        mesh = Mesh(np.array(devices[:8]), ("dp",))
    else:
        mesh = Mesh(np.array(devices[:8]).reshape(4, 2), ("dp", "sp"))

    lr, hr = _data(batch=8, h=16, w=16)

    params0, opt0 = init_training(TINY)
    step_ref, _ = make_train_step(TINY)
    p_ref, o_ref, loss_ref = step_ref(params0, opt0, lr, hr)

    params1, opt1 = init_training(TINY)
    step_sh, _ = make_train_step(TINY, mesh)
    bsh = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    p_sh, o_sh, loss_sh = step_sh(
        jax.device_put(params1, repl), jax.device_put(opt1, repl),
        jax.device_put(lr, bsh), jax.device_put(hr, bsh),
    )
    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_pair_sampler_and_prefetch():
    from s2sr_tpu.training.data import PairSampler, prefetch

    sampler = PairSampler(crop_lr=8, scale=2, batch_size=2, seed=1)
    lr, hr = sampler.sample()
    assert lr.shape == (2, 8, 8, 3) and hr.shape == (2, 16, 16, 3)
    assert 0.0 <= lr.min() and lr.max() <= 1.0
    # LR is the exact 2x2 area mean of HR
    want = hr.reshape(2, 8, 2, 8, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(lr, want, atol=1e-6)

    batches = list(prefetch(sampler, steps=3))
    assert len(batches) == 3
    for lr_b, hr_b in batches:
        assert lr_b.shape == (2, 8, 8, 3)


def test_prefetch_feeds_train_step():
    from s2sr_tpu.training.data import PairSampler, prefetch

    params, opt_state = init_training(TINY)
    step, _ = make_train_step(TINY)
    sampler = PairSampler(crop_lr=8, scale=2, batch_size=2, seed=2)
    losses = []
    for lr_b, hr_b in prefetch(sampler, steps=3):
        params, opt_state, loss = step(params, opt_state, lr_b, hr_b)
        losses.append(float(loss))
    assert len(losses) == 3 and all(np.isfinite(losses))


def test_gan_train_step():
    from s2sr_tpu.models.rrdbnet import RRDBNet
    from s2sr_tpu.training.gan import GanConfig, UNetDiscriminator, make_gan_train_step

    cfg = GanConfig(base=TINY, num_feat_d=4)
    step, disc, g_tx, d_tx = make_gan_train_step(cfg)
    net = RRDBNet(num_feat=TINY.num_feat, num_block=TINY.num_block,
                  num_grow_ch=TINY.num_grow_ch, scale=TINY.scale)
    g_params = net.init(jax.random.PRNGKey(0))
    d_params = disc.init(jax.random.PRNGKey(1))
    g_opt = g_tx.init(g_params)
    d_opt = d_tx.init(d_params)
    lr, hr = _data(batch=2, h=8, w=8)
    for _ in range(2):
        g_params, d_params, g_opt, d_opt, metrics = step(
            g_params, d_params, g_opt, d_opt, lr, hr)
    for key in ("g_loss", "d_loss", "pixel", "adv"):
        assert np.isfinite(float(metrics[key])), key


def test_discriminator_shapes():
    from s2sr_tpu.training.gan import UNetDiscriminator

    disc = UNetDiscriminator(num_feat=4)
    params = disc.init(jax.random.PRNGKey(0))
    out = disc.apply(params, np.zeros((2, 32, 32, 3), np.float32))
    assert out.shape == (2, 32, 32, 1)


# --- swinir family (model-generic trainer) ------------------------------

TINY_SWIN = TrainConfig(family="swinir", embed_dim=16, depths=(1, 1),
                        heads=(2, 2), window=4, scale=2,
                        dtype="float32", learning_rate=1e-3)


def test_swinir_family_loss_decreases():
    params, opt_state = init_training(TINY_SWIN)
    step, _ = make_train_step(TINY_SWIN)
    lr, hr = _data()
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, lr, hr)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_swinir_remat_grads_match():
    from dataclasses import replace

    from s2sr_tpu.training.train import loss_fn

    params, _ = init_training(TINY_SWIN)
    lr, hr = _data(batch=2)
    g_plain = jax.grad(loss_fn)(params, lr, hr, TINY_SWIN)
    g_remat = jax.grad(loss_fn)(params, lr, hr,
                                replace(TINY_SWIN, remat=True))
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_swinir_device_pool_trainer():
    from s2sr_tpu.training.train import make_device_pool_train_step

    run, _ = make_device_pool_train_step(TINY_SWIN, crop_lr=8, batch=2,
                                         chunk=2)
    params, opt = init_training(TINY_SWIN)
    rng = np.random.default_rng(3)
    pool = jax.numpy.asarray(rng.random((2, 64, 64, 3), np.float32))
    params, opt, losses = run(params, opt, pool, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(losses)))


def test_swinir_gan_step():
    from s2sr_tpu.training.gan import GanConfig, make_gan_train_step

    cfg = GanConfig(base=TINY_SWIN, num_feat_d=4)
    step, disc, g_tx, d_tx = make_gan_train_step(cfg)
    g_params, _ = init_training(TINY_SWIN)
    d_params = disc.init(jax.random.PRNGKey(1))
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
    lr, hr = _data(batch=2, h=8, w=8)
    g_params, d_params, g_opt, d_opt, metrics = step(
        g_params, d_params, g_opt, d_opt, lr, hr)
    for key in ("g_loss", "d_loss", "pixel", "adv"):
        assert np.isfinite(float(metrics[key])), key


def test_swinir_params_npz_roundtrip(tmp_path):
    """list-structured SwinIR params survive the .npz serializer
    (layers/blocks/upsample flatten with index keys)."""
    from s2sr_tpu.models.weights import load_params, save_params

    params, _ = init_training(TINY_SWIN, seed=5)
    path = save_params(params, tmp_path / "swin.npz")
    loaded = load_params(path)
    la, lb = (jax.tree_util.tree_leaves(t) for t in (params, loaded))
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert isinstance(loaded["layers"], list)
    assert isinstance(loaded["layers"][0]["blocks"], list)


@pytest.mark.parametrize("mesh_shape", [{"dp": 2}, {"dp": 2, "sp": 2}])
def test_swinir_sharded_matches_unsharded(mesh_shape):
    """SwinIR training over the mesh: GSPMD handles the window
    partition reshapes on the sharded H axis; result must equal the
    unsharded step."""
    import math

    devices = np.array(jax.devices()[:math.prod(mesh_shape.values())])
    mesh = Mesh(devices.reshape(tuple(mesh_shape.values())),
                tuple(mesh_shape))
    params, opt = init_training(TINY_SWIN)
    lr, hr = _data(batch=4, h=8, w=8)

    step_ref, _ = make_train_step(TINY_SWIN)
    p_ref, _, loss_ref = step_ref(params, opt, lr, hr)

    step_sh, _ = make_train_step(TINY_SWIN, mesh)
    sh = batch_sharding(mesh)
    lr_s = jax.device_put(lr, sh)
    hr_s = jax.device_put(hr, sh)
    p_sh, _, loss_sh = step_sh(params, opt, lr_s, hr_s)

    np.testing.assert_allclose(float(loss_ref), float(loss_sh),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_prefetch_propagates_producer_errors():
    """A failing sampler must raise in the consumer, not hang it."""
    from s2sr_tpu.training.data import prefetch

    class Boom:
        def sample(self):
            raise ValueError("bad sample")

    with pytest.raises(ValueError, match="bad sample"):
        list(prefetch(Boom(), steps=3))


def test_prefetch_early_exit_unblocks_producer():
    """Breaking out of the iterator must not leave the producer thread
    blocked forever in q.put (leaked thread + pinned device batches)."""
    import threading
    import time

    from s2sr_tpu.training.data import PairSampler, prefetch

    before = threading.active_count()
    it = prefetch(PairSampler(crop_lr=8, scale=2, batch_size=1, seed=3),
                  steps=50, buffer_size=1)
    next(it)
    it.close()                        # runs the generator's finally
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_pair_sampler_rejects_small_images():
    from s2sr_tpu.training.data import PairSampler

    tiny = np.zeros((20, 20, 3), np.uint8)
    with pytest.raises(ValueError, match="20x20"):
        PairSampler(hr_images=[tiny], crop_lr=16, scale=4)


def test_host_blur_matches_device_blur():
    """PairSampler's blur and the device sampler's ops.blur kernel are
    the same filter (cv2 auto ksize + reflect-101) — no host/device
    degradation drift."""
    import jax.numpy as jnp

    from s2sr_tpu.ops.blur import gaussian_blur
    from s2sr_tpu.training.data import PairSampler

    rng = np.random.default_rng(5)
    src = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    sampler = PairSampler(hr_images=[src], crop_lr=16, scale=2,
                          batch_size=2, blur_sigma=1.0, seed=4)
    lr, hr = sampler.sample()
    # recompute the un-blurred LR and push it through the device kernel
    clean = hr.reshape(2, 16, 2, 16, 2, 3).mean(axis=(2, 4))
    want = np.stack([np.asarray(gaussian_blur(jnp.asarray(im), 1.0))
                     for im in clean])
    np.testing.assert_allclose(lr, want, atol=1e-5)


def test_discriminator_rejects_non_multiple_of_8():
    from s2sr_tpu.training.gan import UNetDiscriminator

    disc = UNetDiscriminator(num_feat=8)
    params = disc.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="multiples of 8"):
        disc.apply(params, np.zeros((1, 44, 44, 3), np.float32))


def test_restore_flexible_transplants_adam_moments(tmp_path):
    """Schedule-kind change on resume keeps the checkpoint's Adam
    first/second moments instead of resetting them."""
    import optax

    from s2sr_tpu.training.checkpoint import CheckpointManager
    from s2sr_tpu.training.train import restore_flexible

    cfg_decay = TrainConfig(num_feat=8, num_block=1, num_grow_ch=4,
                            scale=2, dtype="float32", lr_decay_steps=10)
    params, opt_state = init_training(cfg_decay)
    step, _ = make_train_step(cfg_decay)
    lr, hr = _data()
    for _ in range(2):
        params, opt_state, _ = step(params, opt_state, lr, hr)
    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(2, params, opt_state)
    mgr.wait()

    cfg_const = TrainConfig(num_feat=8, num_block=1, num_grow_ch=4,
                            scale=2, dtype="float32", lr_decay_steps=0)
    p, opt, step_no, opt_ok = restore_flexible(
        CheckpointManager(tmp_path / "ckpt"), cfg_const)
    assert step_no == 2 and not opt_ok
    adam = next(s for s in opt if isinstance(s, optax.ScaleByAdamState))
    adam_ckpt = next(s for s in opt_state
                     if isinstance(s, optax.ScaleByAdamState))
    assert int(adam.count) == 2
    for got, want in zip(jax.tree.leaves(adam.mu),
                         jax.tree.leaves(adam_ckpt.mu)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert any(float(np.abs(v).max()) > 0 for v in jax.tree.leaves(adam.nu))


def test_ema_tracks_weights():
    """ema_decay>0 maintains ema = d*ema + (1-d)*params inside the
    optimizer state, initialized to the initial params — replayed by
    hand over 3 steps."""
    from dataclasses import replace

    from s2sr_tpu.training.train import ema_params

    cfg = replace(TINY, ema_decay=0.5)      # large (1-d) for visibility
    params0, opt_state = init_training(cfg)
    step, _ = make_train_step(cfg)
    lr, hr = _data()

    want = params0
    params = params0
    for _ in range(3):
        params, opt_state, _ = step(params, opt_state, lr, hr)
        want = jax.tree.map(lambda e, p: 0.5 * e + 0.5 * p, want, params)
    got = ema_params(opt_state)
    assert got is not None
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-7)
    # and the EMA genuinely lags the raw params
    diffs = [float(np.abs(np.asarray(g) - np.asarray(p)).max())
             for g, p in zip(jax.tree.leaves(got), jax.tree.leaves(params))]
    assert max(diffs) > 0


def test_ema_rides_scanned_and_gan_trainers():
    """The EMA lives in opt_state, so the scan-chunked, device-pool and
    GAN-generator trainers all carry it without signature changes."""
    from dataclasses import replace

    import jax.numpy as jnp

    from s2sr_tpu.training.gan import GanConfig, make_gan_train_step
    from s2sr_tpu.training.train import (ema_params,
                                         make_device_pool_train_step)

    cfg = replace(TINY, ema_decay=0.9)
    params, opt_state = init_training(cfg)
    run, _ = make_device_pool_train_step(cfg, crop_lr=8, batch=2, chunk=4)
    pool = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 32, 3), np.float32))
    params, opt_state, losses = run(params, opt_state, pool,
                                    jax.random.PRNGKey(0))
    ema = ema_params(opt_state)
    assert ema is not None and losses.shape == (4,)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(ema))

    gcfg = GanConfig(base=cfg)
    gstep, disc, g_tx, d_tx = make_gan_train_step(gcfg)
    d_params = disc.init(jax.random.PRNGKey(1))
    g_opt, d_opt = g_tx.init(params), d_tx.init(d_params)
    lr, hr = _data(batch=2, h=8, w=8)
    params, d_params, g_opt, d_opt, metrics = gstep(
        params, d_params, g_opt, d_opt, lr, hr)
    assert ema_params(g_opt) is not None
    assert np.isfinite(float(metrics["g_loss"]))


def test_restore_flexible_ema_both_directions(tmp_path):
    """An EMA checkpoint restores against a non-EMA template (EMA
    dropped) and vice versa (EMA slot freshly seeded), with Adam
    moments transplanted either way."""
    from dataclasses import replace

    import optax

    from s2sr_tpu.training.checkpoint import CheckpointManager
    from s2sr_tpu.training.train import ema_params, restore_flexible

    cfg_ema = replace(TINY, ema_decay=0.9)
    params, opt_state = init_training(cfg_ema)
    step, _ = make_train_step(cfg_ema)
    lr, hr = _data()
    for _ in range(2):
        params, opt_state, _ = step(params, opt_state, lr, hr)
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(2, params, opt_state)
    mgr.wait()

    # ema ckpt -> non-ema template: restores, EMA dropped
    p, opt, n, ok = restore_flexible(CheckpointManager(tmp_path / "ck"),
                                     TINY)
    assert n == 2 and not ok and ema_params(opt) is None

    def find_adam(state):
        if isinstance(state, optax.ScaleByAdamState):
            return state
        if type(state) is tuple:
            for s in state:
                f = find_adam(s)
                if f is not None:
                    return f
        return None

    assert int(find_adam(opt).count) == 2

    # ema ckpt -> ema template (same kind): exact restore
    p2, opt2, n2, ok2 = restore_flexible(
        CheckpointManager(tmp_path / "ck"), cfg_ema)
    assert n2 == 2 and ok2
    got = ema_params(opt2)
    want = ema_params(opt_state)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # non-ema ckpt -> ema template: EMA freshly seeded from params
    mgr2 = CheckpointManager(tmp_path / "ck2")
    params3, opt3 = init_training(TINY)
    step3, _ = make_train_step(TINY)
    params3, opt3, _ = step3(params3, opt3, lr, hr)
    mgr2.save(1, params3, opt3)
    mgr2.wait()
    p4, opt4, n4, ok4 = restore_flexible(
        CheckpointManager(tmp_path / "ck2"), cfg_ema)
    assert n4 == 1 and not ok4
    got4 = ema_params(opt4)
    assert got4 is not None
    for g, w in zip(jax.tree.leaves(got4), jax.tree.leaves(p4)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert int(find_adam(opt4).count) == 1
