"""Tensor parallelism: conv weights sharded on output channels over ``tp``.

The RRDBNet/SwinIR weight tensors are HWIO convs and (in, out) linears;
sharding their output-channel (last) dim over a ``tp`` mesh axis
partitions every matmul's N dimension. Shardings are declared with
``NamedSharding`` and GSPMD inserts the collectives (all-gather of
activations on the contraction side, or partial-sum + reduce-scatter —
its choice, profiled, over ICI) — the idiomatic TPU formulation rather
than hand-written NCCL-style point-to-point (the reference has no
distributed execution at all, SURVEY §2d).

Adam's ``mu``/``nu`` mirror the parameter tree, so the same shardings
apply to optimizer state: with dp×tp this is exactly the
weight-and-optimizer-sharded data-parallel layout ("ZeRO-3/FSDP on the
tp axis") — each device holds 1/|tp| of every weight, its optimizer
shard updates locally, and only activations cross the interconnect.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_shardings(tree, mesh: Mesh, axis: str = "tp"):
    """A sharding pytree for ``tree``: every leaf whose last dim divides
    by the ``axis`` size is sharded on that dim; everything else (odd
    channel counts, scalars like Adam's ``count``) replicates."""
    size = mesh.shape[axis]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[-1] >= size and shape[-1] % size == 0:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def shard_tree(tree, mesh: Mesh, axis: str = "tp"):
    """``device_put`` every leaf with its :func:`tp_shardings` spec."""
    return jax.tree.map(jax.device_put, tree, tp_shardings(tree, mesh, axis))


def make_fsdp_train_step(config, mesh: Mesh, params, opt_state):
    """dp×tp ("ZeRO-3/FSDP") training step on one 2-D mesh.

    The batch splits over ``dp`` while every weight AND its Adam
    moments shard on output channels over ``tp`` (each device holds
    1/|tp| of the model+optimizer); GSPMD inserts the activation
    all-gathers and gradient reduce-scatter/psum over ICI. ``params``/
    ``opt_state`` are templates used to build the sharding pytrees —
    pass them through :func:`shard_tree` (or let the explicit
    ``in_shardings`` reshard on first call). Outputs keep the sharded
    layout, so training steps chain without host round-trips.

    Returns ``(jitted_step, optimizer)`` with
    ``step(params, opt_state, lr, hr) -> (params, opt_state, loss)`` —
    the same contract as ``training.train.make_train_step``.
    """
    import optax

    from ..training.train import batch_sharding, loss_fn, make_optimizer

    tx = make_optimizer(config)

    def step(p, s, lr, hr):
        loss, grads = jax.value_and_grad(loss_fn)(p, lr, hr, config)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    psh = tp_shardings(params, mesh)
    osh = tp_shardings(opt_state, mesh)
    bsh = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(step, in_shardings=(psh, osh, bsh, bsh),
                     out_shardings=(psh, osh, repl))
    return jitted, tx
