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


def group_lasso_penalty(params, weight: float = 1e-4) -> Array:
    """Group-sparse group-lasso over masked kernels (reference
    stgcn_sparse.py:225-263 'GSGL'): sum of L2 norms of each output-channel
    group of every score-masked kernel."""
    total = 0.0

    def visit(path, leaf):
        nonlocal total
        if any(getattr(p, "key", None) == "kernel" for p in path):
            # sibling score => sparse layer; group = per output channel
            flat = leaf.reshape(-1, leaf.shape[-1])
            total = total + jnp.sqrt(jnp.sum(flat ** 2, axis=0) + 1e-12).sum()
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return weight * total
