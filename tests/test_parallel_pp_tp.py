"""Pipeline (pp) and tensor (tp) parallelism on the 8-device CPU mesh.

The reference has no distributed execution (SURVEY §2d); these pin the
TPU-native scale-out paths: GPipe microbatch pipelining of the RRDB
trunk (`parallel/pipeline.py`) and output-channel weight sharding
(`parallel/tensor.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from s2sr_tpu.models.rrdbnet import RRDBNet, rrdbnet_apply
from s2sr_tpu.parallel.pipeline import (
    pipeline_trunk_apply, rrdbnet_pipeline_apply,
)
from s2sr_tpu.parallel.tensor import shard_tree, tp_shardings


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _mesh(n, name):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def test_pipeline_trunk_matches_sequential(rng):
    """4-stage pipeline over 8 blocks == the sequential lax.scan trunk."""
    net = RRDBNet(num_feat=16, num_block=8, num_grow_ch=8, scale=2)
    params = net.init(jax.random.PRNGKey(0))
    feat = jnp.asarray(rng.random((4, 12, 12, 16)), jnp.float32)

    def blk(c, bp):
        from s2sr_tpu.models.rrdbnet import _rrdb
        return _rrdb(c, bp, jnp.float32), None

    want, _ = jax.lax.scan(blk, feat, params["body"])
    got = pipeline_trunk_apply(params["body"], feat, _mesh(4, "pp"),
                               dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_ragged_blocks_pad_identity(rng):
    """5 blocks over 4 stages: the 3 padded slots must be positionally
    masked out (a zero-weight RRDB is x*0.2+x, NOT an identity — the
    where(k < count) mask in the stage loop is load-bearing)."""
    net = RRDBNet(num_feat=16, num_block=5, num_grow_ch=8, scale=2)
    params = net.init(jax.random.PRNGKey(1))
    feat = jnp.asarray(rng.random((2, 8, 8, 16)), jnp.float32)

    def blk(c, bp):
        from s2sr_tpu.models.rrdbnet import _rrdb
        return _rrdb(c, bp, jnp.float32), None

    want, _ = jax.lax.scan(blk, feat, params["body"])
    got = pipeline_trunk_apply(params["body"], feat, _mesh(4, "pp"),
                               num_micro=2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_full_model_matches_apply(rng):
    """Full forward with a pipelined trunk == rrdbnet_apply (fp32)."""
    net = RRDBNet(num_feat=16, num_block=4, num_grow_ch=8, scale=4)
    params = net.init(jax.random.PRNGKey(2))
    x = jnp.asarray(rng.random((4, 10, 10, 3)), jnp.float32)
    want = rrdbnet_apply(params, x, scale=4, dtype=jnp.float32)
    got = rrdbnet_pipeline_apply(params, x, _mesh(4, "pp"),
                                 dtype=jnp.float32, scale=4)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_tp_sharded_forward_matches_replicated(rng):
    """Output-channel weight sharding over tp=8: same forward results,
    weights actually distributed (1/8 of each shardable leaf per dev)."""
    mesh = _mesh(8, "tp")
    net = RRDBNet(num_feat=16, num_block=2, num_grow_ch=8, scale=2)
    params = net.init(jax.random.PRNGKey(3))
    x = jnp.asarray(rng.random((2, 12, 12, 3)), jnp.float32)
    want = rrdbnet_apply(params, x, scale=2, dtype=jnp.float32)

    sharded = shard_tree(params, mesh)
    # conv_first kernel: (3,3,3,16) → 16 % 8 == 0 → sharded on C_out
    leaf = sharded["conv_first"]["kernel"]
    assert leaf.sharding.spec == (None, None, None, "tp")
    got = jax.jit(lambda p, v: rrdbnet_apply(p, v, scale=2,
                                             dtype=jnp.float32))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_tp_train_step_with_sharded_params_and_opt_state(rng):
    """dp-batch x tp-weights training step: params AND Adam mu/nu live
    sharded (the ZeRO-3/FSDP layout); one step runs, loss finite, and
    the updated params keep their tp sharding."""
    from s2sr_tpu.training.train import TrainConfig, init_training

    mesh = _mesh(8, "tp")
    config = TrainConfig(num_feat=16, num_block=2, num_grow_ch=8,
                         scale=2, dtype="float32")
    params, opt_state = init_training(config)
    params = shard_tree(params, mesh)
    opt_state = shard_tree(opt_state, mesh)

    import optax
    from s2sr_tpu.training.train import loss_fn, make_optimizer

    tx = make_optimizer(config)

    @jax.jit
    def step(p, s, lr, hr):
        loss, grads = jax.value_and_grad(loss_fn)(p, lr, hr, config)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    lr = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    hr = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    params2, opt_state2, loss = step(params, opt_state, lr, hr)
    assert np.isfinite(float(loss))
    spec = params2["conv_first"]["kernel"].sharding.spec
    assert tuple(spec)[-1] == "tp"


def test_pipeline_composes_with_dp(rng):
    """dp×pp 2-D mesh: the trunk pipelines over pp while the microbatch
    batch dim splits over dp — output equals the sequential trunk AND
    the pp-only pipeline (the ppermute ring stays within each dp
    slice's pp column)."""
    net = RRDBNet(num_feat=16, num_block=8, num_grow_ch=8, scale=2)
    params = net.init(jax.random.PRNGKey(2))
    feat = jnp.asarray(rng.random((8, 8, 8, 16)), jnp.float32)

    def blk(c, bp):
        from s2sr_tpu.models.rrdbnet import _rrdb
        return _rrdb(c, bp, jnp.float32), None

    want, _ = jax.lax.scan(blk, feat, params["body"])
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    got = pipeline_trunk_apply(params["body"], feat, mesh,
                               num_micro=2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_dp_rejects_indivisible_microbatch(rng):
    net = RRDBNet(num_feat=16, num_block=4, num_grow_ch=8, scale=2)
    params = net.init(jax.random.PRNGKey(3))
    feat = jnp.asarray(rng.random((3, 8, 8, 16)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    with pytest.raises(ValueError, match="not divisible by dp"):
        pipeline_trunk_apply(params["body"], feat, mesh, num_micro=3,
                             dtype=jnp.float32)


def test_pipeline_tp_weight_sharding_matches_sequential(rng):
    """pp×tp 2-D mesh: stage weights STORED sharded over tp (ZeRO-3
    along the pipeline) and all-gathered per stage — output equals the
    sequential trunk exactly (the gather reconstitutes the weights)."""
    net = RRDBNet(num_feat=16, num_block=8, num_grow_ch=8, scale=2)
    params = net.init(jax.random.PRNGKey(4))
    feat = jnp.asarray(rng.random((4, 10, 10, 16)), jnp.float32)

    def blk(c, bp):
        from s2sr_tpu.models.rrdbnet import _rrdb
        return _rrdb(c, bp, jnp.float32), None

    want, _ = jax.lax.scan(blk, feat, params["body"])
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("pp", "tp"))
    got = pipeline_trunk_apply(params["body"], feat, mesh,
                               dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_3d_dp_pp_tp_matches_sequential(rng):
    """The full 3-D composition on one mesh: batch over dp, depth over
    pp (GPipe), weight memory over tp (ZeRO-3 gather) — equals the
    sequential trunk."""
    net = RRDBNet(num_feat=16, num_block=4, num_grow_ch=8, scale=2)
    params = net.init(jax.random.PRNGKey(5))
    feat = jnp.asarray(rng.random((4, 8, 8, 16)), jnp.float32)

    def blk(c, bp):
        from s2sr_tpu.models.rrdbnet import _rrdb
        return _rrdb(c, bp, jnp.float32), None

    want, _ = jax.lax.scan(blk, feat, params["body"])
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("dp", "pp", "tp"))
    got = pipeline_trunk_apply(params["body"], feat, mesh,
                               num_micro=2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_pp_train_step_matches_sequential_step(rng):
    """One optimizer step through the PIPELINED forward (backward flows
    through the ppermute ring — GPipe backward by autodiff transpose)
    produces the same loss and updated params as make_train_step."""
    from s2sr_tpu.parallel.pipeline import make_pp_train_step
    from s2sr_tpu.training.train import (
        TrainConfig, init_training, make_train_step,
    )

    config = TrainConfig(num_feat=16, num_block=4, num_grow_ch=8,
                         scale=2, dtype="float32")
    params, opt_state = init_training(config)
    lr = jnp.asarray(rng.random((4, 8, 8, 3)), jnp.float32)
    hr = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)

    ref_step, _ = make_train_step(config)
    want_p, _, want_loss = ref_step(params, opt_state, lr, hr)

    pp_step, _ = make_pp_train_step(config, _mesh(4, "pp"))
    got_p, got_s, got_loss = pp_step(params, opt_state, lr, hr)

    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), got_p, want_p)


def test_pp_train_step_rejects_non_rrdb_family():
    from s2sr_tpu.parallel.pipeline import make_pp_train_step
    from s2sr_tpu.training.train import TrainConfig

    cfg = TrainConfig(family="swinir")
    with pytest.raises(ValueError, match="rrdbnet"):
        make_pp_train_step(cfg, _mesh(4, "pp"))


def test_fsdp_dp_tp_step_matches_unsharded(rng):
    """dp×tp composition ("ZeRO-3/FSDP"): batch over dp, weights+Adam
    moments over tp — one step produces the same params/loss as the
    unsharded step (collectives only re-associate sums)."""
    import optax

    from s2sr_tpu.parallel.tensor import make_fsdp_train_step
    from s2sr_tpu.training.train import (
        TrainConfig, init_training, loss_fn, make_optimizer,
    )

    config = TrainConfig(num_feat=16, num_block=2, num_grow_ch=8, scale=2,
                         dtype="float32")
    params, opt_state = init_training(config)
    lr = jnp.asarray(rng.random((4, 8, 8, 3)), jnp.float32)
    hr = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)

    tx = make_optimizer(config)

    @jax.jit
    def ref_step(p, s, a, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, a, b, config)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    want_p, _, want_loss = ref_step(params, opt_state, lr, hr)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    step, _ = make_fsdp_train_step(config, mesh, params, opt_state)
    got_p, got_s, got_loss = step(params, opt_state, lr, hr)

    np.testing.assert_allclose(float(got_loss), float(want_loss), atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), got_p, want_p)
    # the updated weights stay tp-sharded (chainable without resharding)
    spec = tuple(got_p["conv_first"]["kernel"].sharding.spec)
    assert spec and spec[-1] == "tp", spec
    # and the Adam moments shard the same way (the ZeRO-3 property)
    mu_spec = tuple(
        got_s[0].mu["conv_first"]["kernel"].sharding.spec)
    assert mu_spec and mu_spec[-1] == "tp", mu_spec
