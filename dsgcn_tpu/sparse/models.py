"""Sparse (supermask) STGCN backbone — the reference STGCN_sparse equivalent
(stgcn_sparse.py:78-263): every spatial/temporal conv carries a score tensor,
the forward takes the current sparsity (computed by the epoch ramp), and masks
are STE-thresholded per layer.

Divergence from the reference (documented): thresholds are per-layer score
quantiles rather than per-stage concatenated percentiles
(stgcn_sparse.py:184-192) — same sparsity level, locally adaptive masks.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..graph import Graph, GraphConfig
from ..models.backbones import DataBN, stage_plan
from ..ops.common import Array, BatchNorm, accum_dtype
from .supermask import SparseDense, SparseTemporalConv, get_sparsity


class SparseUnitGCN(nn.Module):
    """unit_gcn with a supermasked pre conv (reference unit_gcn_sparse,
    gcn_sparse.py:23)."""
    out_channels: int
    A_init: np.ndarray

    @nn.compact
    def __call__(self, x: Array, sparsity, *, train: bool) -> Array:
        K, V, _ = self.A_init.shape
        n, t, v, c = x.shape
        A = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
        y = SparseDense(self.out_channels * K, name="conv")(x, sparsity)
        y = y.reshape(n, t, v, K, self.out_channels)
        y = jnp.einsum("ntvkc,kvw->ntwc", y, A,
                       preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        return jax.nn.relu(y)


class SparseSTGCNBlock(nn.Module):
    """sparse gcn + sparse 9x1 tcn + residual (reference stgcn_sparse.py:78)."""
    out_channels: int
    A: np.ndarray
    stride: int = 1
    residual: bool = True

    @nn.compact
    def __call__(self, x: Array, sparsity, *, train: bool) -> Array:
        if not self.residual:
            res = 0.0
        elif x.shape[-1] == self.out_channels and self.stride == 1:
            res = x
        else:
            r = SparseTemporalConv(self.out_channels, kernel_size=1,
                                   stride=self.stride,
                                   name="residual")(x, sparsity)
            res = BatchNorm(name="residual_bn")(r, use_running_average=not train)
        y = SparseUnitGCN(self.out_channels, A_init=self.A,
                          name="gcn")(x, sparsity, train=train)
        y = SparseTemporalConv(self.out_channels, kernel_size=9,
                               stride=self.stride, name="tcn")(y, sparsity)
        y = BatchNorm(name="tcn_bn")(y, use_running_average=not train)
        return jax.nn.relu(y + res)


class SparseSTGCN(nn.Module):
    """10-stage sparse ST-GCN; forward threads the traced sparsity scalar so
    the epoch schedule needs no recompilation (reference threads
    current_epoch/max_epoch through train_step, epoch_based_sparse_runner.py:49)."""
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="spatial")
    in_channels: int = 3
    base_channels: int = 64
    ch_ratio: float = 2
    num_stages: int = 10
    inflate_stages: Tuple[int, ...] = (5, 8)
    down_stages: Tuple[int, ...] = (5, 8)
    data_bn_type: Optional[str] = "VC"
    target_sparsity: float = 0.5
    warmup_epochs: float = 0.0

    def epoch_sparsity(self, current_epoch, total_epochs):
        """Linear ramp to target_sparsity (init_func.py:24-26)."""
        return get_sparsity(self.target_sparsity, current_epoch,
                            self.warmup_epochs, total_epochs)

    @nn.compact
    def __call__(self, x: Array, sparsity, *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        graph = Graph.from_config(self.graph_cfg)
        A = graph.A.astype(np.float32)
        x = DataBN(self.data_bn_type, name="data_bn")(x, train=train)
        x = x.reshape(n * m, t, v, c)
        plan = stage_plan(self.in_channels, self.base_channels, self.ch_ratio,
                          self.num_stages, self.inflate_stages,
                          self.down_stages)
        for i, (in_c, out_c, stride, residual) in enumerate(plan):
            x = SparseSTGCNBlock(out_c, A=A, stride=stride, residual=residual,
                                 name=f"block{i}")(x, sparsity, train=train)
        return x.reshape((n, m) + x.shape[1:])
