"""SPMD data-parallel training step (the DDP equivalent, TPU-native).

Semantics mirror the reference's MMDistributedDataParallel setup
(apis/train.py:98-102): per-device (local) BatchNorm batch statistics
(broadcast_buffers=False), gradients mean-reduced across devices per step.
Implementation: ``jax.shard_map`` over the ``data`` mesh axis with explicit
``psum`` — the collective rides ICI, replacing NCCL all-reduce.
"""
from __future__ import annotations




import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..core.train import TrainState, loss_and_metrics
from .mesh import DATA_AXIS, GRAPH_AXIS


def make_dp_train_step(mesh, compute_dtype=None):
    """Returns a jitted (state, batch, rng) -> (state, metrics) SPMD step.

    state replicated, batch sharded on ``data``.  Inside each shard: local
    forward/backward with local BN stats, then psum-mean of grads and metrics
    (the DDP contract); running BN stats are pmean-synced so the replicated
    state stays identical across devices (divergence from the reference, which
    keeps rank-local stats and checkpoints rank 0's — ours averages, which only
    affects eval-mode stats and is strictly no worse).
    """

    def local_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_metrics(state.apply_fn, p, state.batch_stats,
                                       batch, rng, compute_dtype),
            has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(state.params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_jp_train_step(mesh, compute_dtype=None):
    """SPMD training step over a 2D (data x graph) mesh: batch sharded over
    ``data``, the skeleton's joints sharded over ``graph`` (joint-partition
    parallelism, SURVEY §2.9's novel axis).  Requires a model whose backbone
    was built with ``graph_axis=GRAPH_AXIS``; the batch arrives replicated
    over the graph axis and each device processes its joint shard, exchanging
    boundary information through the in-model ring collectives.

    Gradient reduction: every graph shard seeds its (identical, replicated)
    loss copy, so cotangents flowing through the in-model collectives arrive
    G-fold while purely replicated paths (head) arrive 1-fold — ``pmean``
    over the graph axis recovers the exact gradient for both (the replicated
    path averages identical copies; the sharded path divides the G-fold sum
    by G).  Verified against the single-device step in
    tests/test_joint_partition.py.
    """

    def local_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_metrics(state.apply_fn, p, state.batch_stats,
                                       batch, rng, compute_dtype),
            has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(state.params)
        grads = jax.lax.pmean(jax.lax.pmean(grads, GRAPH_AXIS), DATA_AXIS)
        new_stats = jax.lax.pmean(jax.lax.pmean(new_stats, GRAPH_AXIS),
                                  DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_jp_eval_step(mesh, apply_fn):
    """(params, batch_stats, x sharded on data, replicated on graph) ->
    logits sharded on data (identical across the graph axis)."""

    def local_eval(params, batch_stats, keypoint):
        return apply_fn({"params": params, "batch_stats": batch_stats},
                        keypoint, train=False)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_eval_step(mesh, apply_fn):
    """(params, batch_stats, keypoint sharded on data) -> logits sharded on data."""

    def local_eval(params, batch_stats, keypoint):
        return apply_fn({"params": params, "batch_stats": batch_stats},
                        keypoint, train=False)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)
