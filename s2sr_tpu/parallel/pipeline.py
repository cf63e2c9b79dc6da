"""GPipe-style pipeline parallelism for the RRDB trunk over a ``pp`` mesh axis.

The reference has no distributed execution at all (SURVEY §2d); this is
the TPU-native scale-out story for the model's depth dimension: the 23
RRDB blocks split into contiguous stages, one stage resident per device
along the ``pp`` axis, with microbatches streamed through the classic
GPipe fill/steady/drain schedule. Inter-stage activation transfer is a
single ``lax.ppermute`` ring step per tick — XLA lowers it onto ICI.

Built with ``shard_map`` (per-device SPMD), not GSPMD auto-sharding:
pipeline schedules are explicitly staged programs, exactly the case
where manual collectives beat compiler propagation.

Exactness: stages are mathematically the same ``lax.scan`` over
``_rrdb`` blocks as the single-device trunk (`models/rrdbnet.py:294`),
so the pipelined trunk is bit-identical to the sequential one per
microbatch. A ragged block count (23 is prime) pads the stacked stage
params and *positionally masks* the padded slots — the block output is
discarded via ``where(k < count, out, carry)`` (a zero-weight RRDB is
NOT an identity: its residual is ``x·0.2 + x``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def _shmap(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pre-0.8 jax: experimental module, check_rep kwarg
    from jax.experimental.shard_map import shard_map as _shard_map

    def _shmap(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)

from ..models.rrdbnet import _rrdb


def _pad_body_to_stages(body_params, num_stages: int):
    """Pad the stacked block axis to a multiple of ``num_stages`` and
    reshape to a leading stage axis: every leaf (nb, ...) →
    (num_stages, nb_pad // num_stages, ...). Returns (staged, counts)
    where ``counts[i]`` is the number of REAL blocks in stage i — the
    padded slots carry zeros and are positionally masked out by the
    stage loop (a zero-weight RRDB is not an identity)."""
    nb = jax.tree.leaves(body_params)[0].shape[0]
    nb_pad = -(-nb // num_stages) * num_stages
    per = nb_pad // num_stages

    def prep(leaf):
        if nb_pad != nb:
            pad = jnp.zeros((nb_pad - nb,) + leaf.shape[1:], leaf.dtype)
            leaf = jnp.concatenate([leaf, pad], axis=0)
        return leaf.reshape((num_stages, per) + leaf.shape[1:])

    counts = jnp.asarray(
        [min(max(nb - i * per, 0), per) for i in range(num_stages)],
        jnp.int32)
    return jax.tree.map(prep, body_params), counts


def pipeline_trunk_apply(
    body_params,
    feat: jnp.ndarray,
    mesh: Mesh,
    *,
    num_micro: int | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Run the RRDB trunk over the mesh's ``pp`` axis.

    ``feat``: (B, H, W, C) post-``conv_first`` features. ``num_micro``
    microbatches must divide B (default: min(B, pp)). Returns the same
    (B, H, W, C) the sequential ``lax.scan`` trunk would.

    Composes with data parallelism: when the mesh also has a ``dp``
    axis, each microbatch's batch dimension is sharded over it — every
    dp slice runs the same GPipe schedule on its share of the batch
    (the ppermute ring stays within the slice's pp column), so a
    dp×pp mesh pipelines depth AND splits the batch with no extra
    collectives.

    Composes with tensor-axis weight sharding: when the mesh also has a
    ``tp`` axis, every stage-weight leaf whose output-channel (last) dim
    divides by |tp| is STORED sharded over it (each device holds
    1/|tp| of its stage's weights — the ZeRO-3 layout along the depth
    pipeline) and all-gathered over ICI once per stage before use. A
    dp×pp×tp mesh therefore splits batch, depth, and weight memory on
    one 3-D mesh. Math is unchanged — the gather reconstitutes the
    exact stage weights.
    """
    if "pp" not in mesh.axis_names:
        raise ValueError("mesh has no 'pp' axis")
    num_stages = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1) if "tp" in mesh.axis_names else 1
    b = feat.shape[0]
    if num_micro is None:
        # largest divisor of the batch ≤ the stage count (fills the
        # pipeline when possible; always valid — 1 divides everything)
        num_micro = max(d for d in range(1, min(b, num_stages) + 1)
                        if b % d == 0)
    if b % num_micro:
        raise ValueError(f"batch {b} not divisible by num_micro {num_micro}")
    dp = mesh.shape.get("dp", 1) if "dp" in mesh.axis_names else 1
    if (b // num_micro) % dp:
        raise ValueError(
            f"microbatch size {b // num_micro} not divisible by dp={dp}")
    staged, counts = _pad_body_to_stages(body_params, num_stages)
    per = jax.tree.leaves(staged)[0].shape[1]

    # tp weight sharding: leaf (S, per, ..., C) → P("pp", ..., "tp") when
    # C divides; the matching flags tree tells the per-device program
    # which leaves to all-gather back before the stage scan.
    def _tp_shardable(leaf):
        c = leaf.shape[-1]
        return tp > 1 and leaf.ndim >= 3 and c >= tp and c % tp == 0

    gather_flags = jax.tree.map(_tp_shardable, staged)
    param_specs = jax.tree.map(
        lambda leaf: P("pp", *([None] * (leaf.ndim - 2)), "tp")
        if _tp_shardable(leaf) else P("pp"),
        staged)
    micro = feat.reshape((num_micro, b // num_micro) + feat.shape[1:])
    m = num_micro
    ticks = m + num_stages - 1
    ring = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    def spmd(stage_params, x_micro, counts_):
        # stage_params: (1, nb_loc, ...) local slice → drop the stage axis
        my_stage = jax.tree.map(lambda a: a[0], stage_params)
        if tp > 1:
            # reconstitute the tp-sharded stage weights (ZeRO-3 gather):
            # one all-gather per stage, amortised over every microbatch
            my_stage = jax.tree.map(
                lambda w, g: jax.lax.all_gather(w, "tp", axis=-1,
                                                tiled=True) if g else w,
                my_stage, gather_flags)
        idx = jax.lax.axis_index("pp")
        my_count = counts_[idx]

        def apply_stage(h):
            def blk(carry, xs):
                bp, k = xs
                out = _rrdb(carry, bp, dtype)
                # padded slot: discard (zero-weight RRDB ≠ identity)
                return jnp.where(k < my_count, out, carry), None

            out, _ = jax.lax.scan(blk, h, (my_stage, jnp.arange(per)))
            return out

        zero_h = jnp.zeros_like(x_micro[0])

        def tick(carry, t):
            h_prev, outbuf = carry
            # ring-shift the previous tick's outputs one stage forward
            h_in = jax.lax.ppermute(h_prev, "pp", ring)
            # stage 0 injects microbatch t during the fill/steady phase
            mb = x_micro[jnp.clip(t, 0, m - 1)]
            h_cur = jnp.where(idx == 0, mb, h_in)
            h_out = apply_stage(h_cur)
            # last stage drains microbatch j = t - (S-1)
            j = t - (num_stages - 1)
            jc = jnp.clip(j, 0, m - 1)
            write = jnp.logical_and(idx == num_stages - 1, j >= 0)
            outbuf = outbuf.at[jc].set(
                jnp.where(write, h_out, outbuf[jc]))
            return (h_out, outbuf), None

        outbuf0 = jnp.zeros_like(x_micro)
        (_, outbuf), _ = jax.lax.scan(
            tick, (zero_h, outbuf0), jnp.arange(ticks))
        # replicate the last stage's buffer to every device
        keep = (idx == num_stages - 1).astype(outbuf.dtype)
        return jax.lax.psum(outbuf * keep, "pp")

    micro_spec = P(None, "dp") if dp > 1 else P()
    out = _shmap(
        spmd, mesh=mesh,
        in_specs=(param_specs, micro_spec, P()),
        out_specs=micro_spec,
    )(staged, micro, counts)
    return out.reshape(feat.shape)


def rrdbnet_pipeline_apply(params, x, mesh, *, num_micro=None,
                           dtype=jnp.float32, scale: int = 4):
    """Full RRDBNet forward with the trunk pipelined over ``pp``.

    Head/tail (conv_first, conv_body, upsample) run replicated — they
    are <10% of FLOPs; the 23-block trunk is the depth dimension worth
    staging. Matches ``rrdbnet_apply`` output for the same dtype.
    """
    from ..models import rrdbnet as rn

    feat = rn._conv(x, params["conv_first"], dtype)
    body = pipeline_trunk_apply(params["body"], feat, mesh,
                                num_micro=num_micro, dtype=dtype)
    body = rn._conv(body, params["conv_body"], dtype)
    feat = feat + body
    # tail exactly as rrdbnet_apply's mask-free monolithic upsample
    # (models/rrdbnet.py:306-318)
    f = rn._lrelu(rn._up_conv_fused(feat, params["conv_up1"], dtype))
    if scale == 4:
        f = rn._lrelu(rn._up_conv_fused(f, params["conv_up2"], dtype))
    f = rn._lrelu(rn._conv(f, params["conv_hr"], dtype))
    return rn._conv(f, params["conv_last"], dtype).astype(jnp.float32)


def make_pp_train_step(config, mesh: Mesh, *, num_micro: int | None = None):
    """Training step whose forward pipelines the trunk over ``pp``.

    The backward pass streams THROUGH the pipeline: autodiff transposes
    each forward ``ppermute`` ring step into the reverse-ring
    ``ppermute``, so activation gradients flow stage-to-stage backwards
    — the GPipe backward schedule derived by transformation rather than
    hand-written (the reference trains on a single CUDA device with no
    pipeline at all; this is the depth-scaling path a >1-chip pod would
    use). Composes with ``dp`` (batch split) and ``tp`` (ZeRO-3 stage
    weight sharding) on the same mesh via :func:`pipeline_trunk_apply`.

    Same contract as ``training.train.make_train_step``:
    ``step(params, opt_state, lr, hr) -> (params, opt_state, loss)``,
    gradients equal to the sequential step's (pinned in
    tests/test_parallel_pp_tp.py). RRDBNet family only — the pipeline
    stages are RRDB blocks.
    """
    import optax

    from ..training.train import loss_from_pred, make_optimizer

    if config.family != "rrdbnet":
        raise ValueError("pp pipelining stages RRDB blocks; family must "
                         f"be rrdbnet, got {config.family!r}")
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    tx = make_optimizer(config)

    def pp_loss(params, lr_batch, hr_batch):
        pred = rrdbnet_pipeline_apply(params, lr_batch, mesh,
                                      num_micro=num_micro, dtype=dtype,
                                      scale=config.scale)
        return loss_from_pred(pred, hr_batch, config)

    def step(params, opt_state, lr_batch, hr_batch):
        loss, grads = jax.value_and_grad(pp_loss)(params, lr_batch,
                                                  hr_batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step), tx
