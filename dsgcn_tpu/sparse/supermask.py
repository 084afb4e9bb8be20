"""Sparse (supermask / lottery-ticket) training subsystem.

TPU-native re-design of the reference sparse machinery:
  * ``GetSubnet`` straight-through top-k mask (sparse_mosules.py:41-54)
  * linear sparsity ramp (init_func.py:24-26)
  * score-vs-weight optimizer alternation (core/hooks/sparse_optimizer.py:9-94,
    core/optimizer/optimizers_builder.py:52-71)
  * group-lasso regularizer (stgcn_sparse.py:225-263)

Masks are computed on-device from per-layer score percentiles; the epoch-
dependent sparsity enters the jitted step as a scalar argument, so no
recompilation per epoch.
"""
from __future__ import annotations


from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..ops.common import Array, torch_default_bias, torch_default_kernel


def get_sparsity(sparsity: float, current_epoch, start_epoch: float,
                 end_epoch: float):
    """Linear sparsity ramp (reference init_func.py:24-26)."""
    frac = (current_epoch - start_epoch) / (end_epoch - start_epoch)
    return sparsity - sparsity * (1.0 - frac)


@jax.custom_vjp
def supermask(score: Array, sparsity) -> Array:
    """Binary mask keeping the top (1 - sparsity) fraction of scores, with a
    straight-through gradient to the scores (GetSubnet STE,
    sparse_mosules.py:41-54)."""
    thresh = jnp.quantile(score.reshape(-1), sparsity)
    return (score >= thresh).astype(score.dtype)


def _supermask_fwd(score, sparsity):
    return supermask(score, sparsity), None


def _supermask_bwd(_, g):
    return g, None   # straight-through: d mask / d score = identity


supermask.defvjp(_supermask_fwd, _supermask_bwd)


def score_init():
    """Kaiming-uniform score init (reference SparseConv2d init)."""
    return torch_default_kernel()


class SparseDense(nn.Module):
    """1x1 conv / dense with a supermask over the kernel.

    Forward takes the current ``sparsity`` (traced scalar); the kernel is
    multiplied by the STE mask of its score tensor (sparse_mosules.py:120-160
    SparseConv2d.forward equivalent).
    """
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, sparsity) -> Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_default_kernel(),
                            (in_features, self.features))
        score = self.param("score", score_init(), (in_features, self.features))
        mask = supermask(score, sparsity)
        y = jnp.einsum("...i,io->...o", x, kernel * mask)
        if self.use_bias:
            bias = self.param("bias", torch_default_bias(in_features),
                              (self.features,))
            y = y + bias
        return y


class SparseTemporalConv(nn.Module):
    """k x 1 temporal conv with supermask."""
    features: int
    kernel_size: int = 9
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, sparsity) -> Array:
        k, d = self.kernel_size, self.dilation
        pad = (k + (k - 1) * (d - 1) - 1) // 2
        in_features = x.shape[-1]
        shape = (k, 1, in_features, self.features)
        kernel = self.param("kernel", torch_default_kernel(), shape)
        score = self.param("score", score_init(), shape)
        mask = supermask(score, sparsity)
        y = jax.lax.conv_general_dilated(
            x, kernel * mask, window_strides=(self.stride, 1),
            padding=((pad, pad), (0, 0)), rhs_dilation=(d, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", torch_default_bias(in_features * k),
                              (self.features,))
            y = y + bias
        return y


def is_score_path(path) -> bool:
    return any(getattr(p, "key", None) == "score" for p in path)


def score_mask_tree(params) -> Any:
    """Pytree of 'score'/'main' labels for optax.multi_transform."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: "score" if is_score_path(p) else "main", params)


def make_sparse_optimizer(main_tx: optax.GradientTransformation,
                          score_tx: optax.GradientTransformation,
                          params, warmup_epochs: int = 0):
    """main/mask alternation (reference SparseOptimizer hook): before the
    warmup boundary only the main weights train; after it, both (or alternate —
    the reference switches which optimizer steps; we train scores after warmup
    and weights throughout, the common supermask recipe).

    Returns an optax.multi_transform over {'main','score'} labels plus a
    ``gate_score_grads(grads, epoch)`` helper zeroing score grads pre-warmup.
    """
    labels = score_mask_tree(params)
    tx = optax.multi_transform({"main": main_tx, "score": score_tx}, labels)

    def gate_score_grads(grads, current_epoch):
        def gate(path, g):
            if is_score_path(path):
                return jnp.where(current_epoch >= warmup_epochs, g,
                                 jnp.zeros_like(g))
            return g
        return jax.tree_util.tree_map_with_path(gate, grads)

    return tx, gate_score_grads


def group_lasso_penalty(params, weight: float = 1e-4,
                        sparsity=None) -> Array:
    """Group lasso over supermasked kernels, in the spirit of the reference's
    GSGL regularizer (stgcn_sparse.py:225-263 — which L2-norms the masked,
    flattened weights per stage).  This functional variant penalizes each
    output-channel group of every kernel that carries a sibling ``score``
    leaf (i.e. only sparse layers); with ``sparsity`` given, the kernel is
    masked by its supermask before the norm, as the reference masks weights
    with ``get_mask`` before norming.  Finer grouping (per output channel vs
    per stage) is a documented divergence, not reference parity."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    scores = {tuple(str(k) for k in p[:-1]): leaf for p, leaf in flat
              if getattr(p[-1], "key", None) == "score"}
    total = 0.0

    def visit(path, leaf):
        nonlocal total
        key = tuple(str(k) for k in path[:-1])
        if getattr(path[-1], "key", None) == "kernel" and key in scores:
            if sparsity is not None:
                leaf = leaf * supermask(scores[key], sparsity)
            flat = leaf.reshape(-1, leaf.shape[-1])
            total = total + jnp.sqrt(jnp.sum(flat ** 2, axis=0) + 1e-12).sum()
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return weight * total


# ---------------------------------------------------------------------------
# weight rerandomization (reference SparseModule.init_param_/rerandomize_,
# sparse_mosules.py:61-118: periodically re-draws the pruned weights so the
# mask search explores fresh weight values)
# ---------------------------------------------------------------------------

def _fan_in(shape) -> int:
    f = 1
    for s in shape[:-1]:
        f *= s
    return max(f, 1)


def draw_init(rng, shape, dtype=jnp.float32, init_mode: str = "kaiming_uniform",
              scale: float = 1.0) -> Array:
    """Fresh weight draw (init_param_, sparse_mosules.py:61-79)."""
    fan = _fan_in(shape)
    gain = float(np.sqrt(2.0))     # relu
    if init_mode == "kaiming_normal":
        w = jax.random.normal(rng, shape, dtype) * (gain / np.sqrt(fan))
    elif init_mode == "uniform":
        w = jax.random.uniform(rng, shape, dtype, -1.0, 1.0)
    elif init_mode == "kaiming_uniform":
        bound = gain * np.sqrt(3.0 / fan)
        w = jax.random.uniform(rng, shape, dtype, -bound, bound)
    elif init_mode == "signed_constant":
        std = gain / np.sqrt(fan)
        w = jnp.sign(jax.random.normal(rng, shape, dtype)) * std
    else:
        raise NotImplementedError(init_mode)
    return w * scale


def rerandomize_param(rng, param: Array, score: Array, sparsity,
                      rerand_rate: float = 1.0, mode: str = "bernoulli",
                      la: float = 0.1, mu: float = 0.0,
                      init_mode: str = "kaiming_uniform",
                      scale: float = 1.0) -> Array:
    """Re-draw a weight tensor outside its supermask (rerandomize_,
    sparse_mosules.py:83-118).

    bernoulli: kept weights unchanged; each pruned weight is replaced by a
    fresh draw with probability ``la``.  manual: pruned weights become
    ``la * old + mu * fresh``.  The mask uses sparsity * rerand_rate
    (sparse_mosules.py:213-214), i.e. a laxer mask than the forward one.
    """
    k1, k2 = jax.random.split(rng)
    mask = supermask(score, sparsity * rerand_rate)
    rnd = draw_init(k1, param.shape, param.dtype, init_mode, scale)
    if mode == "bernoulli":
        b = jax.random.bernoulli(k2, la, param.shape).astype(param.dtype)
        return param * mask + param * (1 - mask) * (1 - b) + \
            rnd * (1 - mask) * b
    if mode == "manual":
        return param * mask + param * (1 - mask) * la + rnd * (1 - mask) * mu
    raise NotImplementedError(mode)


def rerandomize_tree(rng, params, sparsity, **kw):
    """Apply rerandomize_param to every kernel that has a sibling 'score'
    (SparseDense / SparseTemporalConv subtrees); everything else unchanged."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    scores = {tuple(str(k) for k in p[:-1]): leaf for p, leaf in flat
              if getattr(p[-1], "key", None) == "score"}

    def visit(path, leaf):
        key = tuple(str(k) for k in path[:-1])
        if getattr(path[-1], "key", None) == "kernel" and key in scores:
            sub = jax.random.fold_in(rng, hash(key) % (2 ** 31))
            return rerandomize_param(sub, leaf, scores[key], sparsity, **kw)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


# ---------------------------------------------------------------------------
# global-threshold supermasks (reference sparse_mosules.py GetSubnet :41-54 +
# CTRGCN_sparse.get_threshold/percentile, ctrgcn_sparse.py:145-157): one
# percentile threshold over a POOL of score tensors, applied to every layer
# ---------------------------------------------------------------------------

@jax.custom_vjp
def supermask_at(score: Array, threshold) -> Array:
    """mask = (score >= threshold), straight-through to score
    (GetSubnet with an externally supplied threshold)."""
    return (score >= threshold).astype(score.dtype)


def _supermask_at_fwd(score, threshold):
    return supermask_at(score, threshold), None


def _supermask_at_bwd(_, g):
    return g, None


supermask_at.defvjp(_supermask_at_fwd, _supermask_at_bwd)


def torch_percentile(t: Array, q) -> Array:
    """torch kthvalue percentile (ctrgcn_sparse.py:155-157):
    k = 1 + round(0.01 * q * (n - 1)); returns the k-th smallest."""
    flat = jnp.sort(t.reshape(-1))
    n = flat.shape[0]
    k = 1 + jnp.round(0.01 * q * (n - 1)).astype(jnp.int32)
    return flat[jnp.clip(k - 1, 0, n - 1)]


def pooled_threshold(score_leaves, sparsity) -> Array:
    """Global percentile threshold over concatenated score tensors
    (get_threshold, ctrgcn_sparse.py:145-153)."""
    flat = jnp.concatenate([s.reshape(-1) for s in score_leaves])
    return torch_percentile(flat, sparsity * 100.0)


def sparsity_schedule(linear_sparsity: float, current_epoch, max_epoch,
                      warm_up: int = 0, sparse_decay: bool = False):
    """CTRGCN_sparse.forward's sparsity schedule (ctrgcn_sparse.py:122-132)."""
    if current_epoch < warm_up:
        return 0.0
    if sparse_decay:
        if current_epoch < max_epoch / 2.0:
            return get_sparsity(linear_sparsity, current_epoch, 0,
                                max_epoch / 2.0)
        return linear_sparsity
    return linear_sparsity
