"""Training state, optimizer, schedules, and the jitted train/eval steps.

Replaces the reference's mmcv Runner + OptimizerHook machinery (pyskl/core/,
pyskl/apis/train.py) with pure functional JAX: one pytree TrainState, one
jitted step.  The optimizer reproduces the reference recipe exactly —
SGD lr=0.1, momentum 0.9 (Nesterov), coupled weight decay 5e-4 applied to all
params, CosineAnnealing to 0 by iteration (configs/_init_/lr_schedual.py:11,27).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..ops.common import Array
from .losses import cross_entropy, top_k_correct


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn)


def paramwise_mults(params, paramwise_cfg: Mapping):
    """Per-parameter (lr_mult, decay_mult) trees, mmcv
    DefaultOptimizerConstructor semantics (reference
    core/optimizer/sparse_constructor.py:15-120 and mmcv add_params):

    * ``custom_keys``: substring match on the dotted parameter path; the
      longest (then alphabetically first) matching key wins and overrides
      all other rules.
    * ``bias_lr_mult`` / ``bias_decay_mult``: 'bias' leaves outside norm
      layers.
    * ``norm_decay_mult``: all parameters of norm layers (detected by a 'bn'
      path component under our naming convention).
    """
    custom = paramwise_cfg.get("custom_keys", {})
    keys = sorted(custom, key=lambda k: (-len(k), k))
    bias_lr_mult = paramwise_cfg.get("bias_lr_mult", 1.0)
    bias_decay_mult = paramwise_cfg.get("bias_decay_mult", 1.0)
    norm_decay_mult = paramwise_cfg.get("norm_decay_mult", 1.0)

    def classify(path):
        name = ".".join(str(getattr(p, "key", p)) for p in path)
        for k in keys:
            if k in name:
                c = custom[k]
                return (c.get("lr_mult", 1.0), c.get("decay_mult", 1.0))
        is_norm = any("bn" in str(getattr(p, "key", "")).lower()
                      for p in path)
        is_bias = str(getattr(path[-1], "key", "")) == "bias"
        if is_norm:
            return (1.0, norm_decay_mult)
        if is_bias:
            return (bias_lr_mult, bias_decay_mult)
        return (1.0, 1.0)

    lr_tree = jax.tree_util.tree_map_with_path(
        lambda p, _: classify(p)[0], params)
    decay_tree = jax.tree_util.tree_map_with_path(
        lambda p, _: classify(p)[1], params)
    return lr_tree, decay_tree


def _add_decayed_weights_mult(weight_decay: float, mults):
    """add_decayed_weights with a per-leaf decay multiplier tree."""

    def update_fn(updates, state, params):
        assert params is not None
        updates = jax.tree.map(
            lambda u, p, m: u + weight_decay * m * p, updates, params, mults)
        return updates, state

    return optax.GradientTransformation(lambda _: optax.EmptyState(),
                                        update_fn)


def _scale_by_mults(mults):
    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, mults), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(),
                                        update_fn)


def make_optimizer(lr: float = 0.1, momentum: float = 0.9,
                   weight_decay: float = 5e-4, nesterov: bool = True,
                   total_steps: Optional[int] = None,
                   schedule: str = "cosine",
                   grad_clip: Optional[float] = None,
                   paramwise_cfg: Optional[Mapping] = None,
                   params=None,
                   ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """torch-SGD-equivalent chain: wd -> momentum(nesterov) -> lr schedule.

    With ``paramwise_cfg`` (requires ``params`` for path classification), the
    decay and lr are additionally scaled per parameter as torch param groups
    would (group base lr = lr * lr_mult; the schedule multiplies all groups
    uniformly, matching torch schedulers' relative scaling).
    """
    if schedule == "cosine":
        assert total_steps is not None
        sched = optax.cosine_decay_schedule(lr, decay_steps=total_steps, alpha=0.0)
    elif schedule == "constant":
        sched = optax.constant_schedule(lr)
    else:
        raise ValueError(schedule)
    lr_tree = decay_tree = None
    if paramwise_cfg:
        assert params is not None, "paramwise_cfg needs params"
        lr_tree, decay_tree = paramwise_mults(params, paramwise_cfg)
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        parts.append(_add_decayed_weights_mult(weight_decay, decay_tree)
                     if decay_tree is not None
                     else optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    if lr_tree is not None:
        parts.append(_scale_by_mults(lr_tree))
    parts.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*parts), sched


def init_model(model, rng: jax.Array, sample: Array):
    variables = model.init(rng, sample, train=False)
    return variables["params"], variables.get("batch_stats", FrozenDict())


def loss_and_metrics(apply_fn, params, batch_stats, batch: Mapping[str, Array],
                     dropout_rng: Optional[jax.Array] = None,
                     compute_dtype: Optional[str] = None):
    """Forward + CE loss + on-device top-k (reference heads/base.py:50-84).

    ``compute_dtype='bfloat16'``: mixed-precision training — master params
    stay f32 in the optimizer, a bf16 COPY enters the network (the cast's
    VJP accumulates the incoming bf16 grads into f32), activations and the
    fused dynamic-graph kernel run at the MXU bf16 rate, BatchNorm batch
    statistics and running stats stay f32 (ops/common.py accum_dtype), and
    the loss/metrics are computed from f32 logits.  bf16 keeps f32's
    exponent range, so no loss scaling is needed.  Quality is gated by
    tests/test_bf16_training.py (short) and the bf16 learning-curve run
    (slow marker).
    """
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    x = batch["keypoint"] if "keypoint" in batch else batch["imgs"]
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        params = jax.tree.map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, params)
        x = x.astype(cd)
    logits, mutated = apply_fn(
        {"params": params, "batch_stats": batch_stats},
        x, train=True, mutable=["batch_stats"], rngs=rngs)
    if compute_dtype is not None:
        # loss/metrics from f32 logits; never touch the dtype otherwise
        # (the f64 strict-parity tests run the whole step in float64)
        logits = logits.astype(jnp.float32)
    label = batch["label"]
    loss = cross_entropy(logits, label)
    metrics = dict(
        loss=loss,
        top1_acc=top_k_correct(logits, label, 1),
        top5_acc=top_k_correct(logits, label, 5),
    )
    return loss, (mutated["batch_stats"], metrics)


def train_step(state: TrainState, batch: Mapping[str, Array],
               dropout_rng: Optional[jax.Array] = None,
               compute_dtype: Optional[str] = None
               ) -> Tuple[TrainState, Dict[str, Array]]:
    """Single-device step: grad, SGD update, BN running-stat update.

    ``compute_dtype`` must be bound statically before jit (e.g.
    ``jax.jit(functools.partial(train_step, compute_dtype='bfloat16'))``);
    see :func:`loss_and_metrics` for the mixed-precision semantics."""
    grad_fn = jax.value_and_grad(
        lambda p: loss_and_metrics(state.apply_fn, p, state.batch_stats, batch,
                                   dropout_rng, compute_dtype), has_aux=True)
    (_, (new_stats, metrics)), grads = grad_fn(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=new_params,
                         batch_stats=new_stats, opt_state=new_opt), metrics


def eval_step(apply_fn, params, batch_stats, keypoint: Array) -> Array:
    """Forward in eval mode -> logits."""
    return apply_fn({"params": params, "batch_stats": batch_stats},
                    keypoint, train=False)
