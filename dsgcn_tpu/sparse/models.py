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


# ---------------------------------------------------------------------------
# CTRGCN_sparse family (reference ctrgcn_sparse.py:9-163 + gcn_sparse.py
# CTRGC_sparse :220-257, unit_ctrgcn_sparse :259-319, tcn_sparse.py
# unit_tcn_sparse :12-41, mstcn_sparse :43-160): every conv carries a score;
# masks come from a per-stage GLOBAL percentile threshold over the pooled
# qualifying scores (get_threshold, ctrgcn_sparse.py:145-153).
# ---------------------------------------------------------------------------

from .supermask import (pooled_threshold, sparsity_schedule,  # noqa: E402
                        supermask_at)
from ..ops.common import torch_default_bias, torch_default_kernel  # noqa: E402


class SparseDenseAt(nn.Module):
    """1x1 conv masked at an externally supplied score threshold
    (SparseConv2d.forward, sparse_mosules.py:203-210)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, threshold) -> Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_default_kernel(),
                            (in_features, self.features))
        score = self.param("score", torch_default_kernel(),
                           (in_features, self.features))
        y = jnp.einsum("...i,io->...o", x,
                       kernel * supermask_at(score, threshold),
                       preferred_element_type=accum_dtype(x.dtype)
                       ).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class SparseTemporalConvAt(nn.Module):
    """k x 1 temporal conv masked at a threshold (unit_tcn_sparse's conv)."""
    features: int
    kernel_size: int = 9
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array, threshold) -> Array:
        k, d = self.kernel_size, self.dilation
        pad = (k + (k - 1) * (d - 1) - 1) // 2
        in_features = x.shape[-1]
        shape = (k, 1, in_features, self.features)
        kernel = self.param("kernel", torch_default_kernel(), shape)
        score = self.param("score", torch_default_kernel(), shape)
        y = jax.lax.conv_general_dilated(
            x, (kernel * supermask_at(score, threshold)).astype(x.dtype),
            window_strides=(self.stride, 1), padding=((pad, pad), (0, 0)),
            rhs_dilation=(d, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return y + bias.astype(x.dtype)


class SparseCTRGC(nn.Module):
    """CTRGC with thresholded convs (CTRGC_sparse, gcn_sparse.py:220-257)."""
    out_channels: int
    rel_reduction: int = 8

    @nn.compact
    def __call__(self, x: Array, threshold, A, alpha) -> Array:
        c = x.shape[-1]
        rel = 8 if c <= 16 else c // self.rel_reduction
        x1 = SparseDenseAt(rel, name="conv1")(x, threshold).mean(axis=1)
        x2 = SparseDenseAt(rel, name="conv2")(x, threshold).mean(axis=1)
        x3 = SparseDenseAt(self.out_channels, name="conv3")(x, threshold)
        diff = jnp.tanh(x1[:, :, None, :] - x2[:, None, :, :])
        g = SparseDenseAt(self.out_channels, name="conv4")(diff, threshold)
        g = g * alpha + (A[None, :, :, None] if A is not None else 0.0)
        return jnp.einsum("nuwc,ntuc->ntwc", g, x3,
                          preferred_element_type=accum_dtype(x.dtype)
                          ).astype(x.dtype)


class SparseUnitCTRGCN(nn.Module):
    """unit_ctrgcn_sparse (gcn_sparse.py:259-319).  Faithful quirks: its
    trailing ``bn`` exists but is never applied in forward (:290-316), and
    the inner CTRGC convs are built with sparse_ratio=0 (:272) so their
    scores do NOT join the stage threshold pool — they are still masked at
    the global threshold at forward time."""
    out_channels: int
    A_init: np.ndarray

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        A = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
        alpha = self.param("alpha", nn.initializers.zeros_init(), (1,))
        y = None
        for i in range(self.A_init.shape[0]):
            z = SparseCTRGC(self.out_channels, name=f"convs{i}")(
                x, threshold, A[i], alpha[0])
            y = z if y is None else y + z
        if x.shape[-1] != self.out_channels:
            r = SparseDenseAt(self.out_channels, name="down_conv")(
                x, threshold)
            res = BatchNorm(name="down_bn")(r, use_running_average=not train)
        else:
            res = x
        # NOTE: no trailing bn on y (faithful; gcn_sparse.py:316)
        return jax.nn.relu(y + res)


class SparseMSTCN(nn.Module):
    """mstcn_sparse (tcn_sparse.py:43-160)."""
    out_channels: int
    mid_channels: Optional[float] = None
    ms_cfg: Tuple = ((3, 1), (3, 2), (3, 3), (3, 4), ("max", 3), "1x1")
    stride: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        from ..ops.common import max_pool_t
        num_branches = len(self.ms_cfg)
        if self.mid_channels is None:
            mid = self.out_channels // num_branches
            rem = self.out_channels - mid * (num_branches - 1)
        else:
            mid = int(self.out_channels * self.mid_channels)
            rem = mid
        outs = []
        for i, cfg in enumerate(self.ms_cfg):
            branch_c = rem if i == 0 else mid
            if cfg == "1x1":
                # strided 1x1 sparse conv (tcn_sparse.py:77)
                b = SparseTemporalConvAt(branch_c, kernel_size=1,
                                         stride=self.stride,
                                         name=f"branch{i}_conv")(x, threshold)
                outs.append(b)
                continue
            kind, val = cfg
            b = SparseDenseAt(branch_c, name=f"branch{i}_pre")(x, threshold)
            b = BatchNorm(name=f"branch{i}_bn")(b,
                                                use_running_average=not train)
            b = jax.nn.relu(b)
            if kind == "max":
                b = max_pool_t(b, window=val, stride=self.stride, padding=1)
            else:
                b = SparseTemporalConvAt(branch_c, kernel_size=kind,
                                         stride=self.stride, dilation=val,
                                         name=f"branch{i}_tcn")(b, threshold)
            outs.append(b)
        feat = jnp.concatenate(outs, axis=-1)
        feat = BatchNorm(name="transform_bn")(feat,
                                              use_running_average=not train)
        feat = jax.nn.relu(feat)
        feat = SparseDenseAt(self.out_channels,
                             name="transform_conv")(feat, threshold)
        feat = BatchNorm(name="bn")(feat, use_running_average=not train)
        if self.dropout > 0:
            feat = nn.Dropout(self.dropout, deterministic=not train)(feat)
        return feat


class SparseCTRGCNBlock(nn.Module):
    """ctrgcn_sparse.CTRGCNBlock (:9-70)."""
    out_channels: int
    A: np.ndarray
    stride: int = 1
    residual: bool = True

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        y = SparseUnitCTRGCN(self.out_channels, A_init=self.A,
                             name="gcn1")(x, threshold, train=train)
        y = SparseMSTCN(self.out_channels, stride=self.stride,
                        name="tcn1")(y, threshold, train=train)
        if not self.residual:
            res = 0.0
        elif x.shape[-1] == self.out_channels and self.stride == 1:
            res = x
        else:
            r = SparseTemporalConvAt(self.out_channels, kernel_size=1,
                                     stride=self.stride,
                                     name="residual")(x, threshold)
            res = BatchNorm(name="residual_bn")(
                r, use_running_average=not train)
        return jax.nn.relu(y + res)


def _block_score_pool(block_params):
    """Scores that join the stage threshold pool: every score EXCEPT the
    inner CTRGC convs' (built with sparse_ratio=0, gcn_sparse.py:272, so
    their ``p.sparsity != linear_sparsity``; ctrgcn_sparse.py:147-149)."""
    leaves = []

    def visit(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys[-1] == "score" and not any(k.startswith("convs")
                                           for k in keys):
            leaves.append(leaf)
        return leaf

    jax.tree_util.tree_map_with_path(visit, block_params)
    return leaves


class SparseCTRGCN(nn.Module):
    """CTRGCN_sparse backbone (ctrgcn_sparse.py:72-163): CTR-GCN stages with
    supermasked convs; each stage's mask threshold is the global percentile
    of its pooled scores at the scheduled sparsity.

    ``pool_all_scores``: the OUTER copy builds the inner CTRGC convs with
    sparse_ratio=0 so their scores stay out of the stage pool
    (gcn_sparse.py:272); the NESTED copy fixes that
    (pyskl/pyskl/.../gcn_sparse.py:291) — set True for nested semantics
    (SMoE/Assemble experts)."""
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="spatial")
    in_channels: int = 3
    base_channels: int = 64
    num_person: int = 2
    num_stages: int = 10
    inflate_stages: Tuple[int, ...] = (5, 8)
    down_stages: Tuple[int, ...] = (5, 8)
    linear_sparsity: float = 0.0
    warm_up: int = 0
    sparse_decay: bool = False
    pool_all_scores: bool = False

    def epoch_sparsity(self, current_epoch, max_epoch):
        return sparsity_schedule(self.linear_sparsity, current_epoch,
                                 max_epoch, self.warm_up, self.sparse_decay)

    @nn.compact
    def __call__(self, x: Array, sparsity, *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        graph = Graph.from_config(self.graph_cfg)
        A = graph.A.astype(np.float32)
        x = DataBN("MVC", name="data_bn")(x, train=train)
        x = x.reshape(n * m, t, v, c)
        plan = stage_plan(self.in_channels, self.base_channels, 2,
                          self.num_stages, self.inflate_stages,
                          self.down_stages)
        for i, (in_c, out_c, stride, residual) in enumerate(plan):
            blk = SparseCTRGCNBlock(out_c, A=A, stride=stride,
                                    residual=residual, name=f"block{i}")
            if self.is_initializing():
                x = blk(x, jnp.float32(-jnp.inf), train=train)
                continue
            pooler = (_all_score_pool if self.pool_all_scores
                      else _block_score_pool)
            pool = pooler(self.variables["params"][f"block{i}"])
            thr = pooled_threshold(pool, sparsity)
            x = blk(x, thr, train=train)
        return x.reshape((n, m) + x.shape[1:])


class SparseUnitGCNAt(nn.Module):
    """unit_gcn_sparse (gcn_sparse.py:23-99): pre-conv supermasked at the
    stage threshold, subset einsum against a trained A, BN + ReLU."""
    out_channels: int
    A_init: np.ndarray
    adaptive: Optional[str] = "init"

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        K = self.A_init.shape[0]
        n, t, v, c = x.shape
        assert self.adaptive == "init", \
            "reference STGCN_sparse uses the default adaptive='init'"
        A = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
        y = SparseDenseAt(self.out_channels * K, name="conv")(x, threshold)
        y = y.reshape(n, t, v, K, self.out_channels)
        y = jnp.einsum("ntvkc,kvw->ntwc", y, A.astype(x.dtype),
                       preferred_element_type=accum_dtype(x.dtype)
                       ).astype(x.dtype)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        return jax.nn.relu(y)


class SparseSTGCNBlockExact(nn.Module):
    """STGCN_sparse block (stgcn_sparse.py:20-76)."""
    out_channels: int
    A: np.ndarray
    stride: int = 1
    residual: bool = True

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        y = SparseUnitGCNAt(self.out_channels, A_init=self.A,
                            name="gcn")(x, threshold, train=train)
        y = SparseTemporalConvAt(self.out_channels, kernel_size=9,
                                 stride=self.stride,
                                 name="tcn_conv")(y, threshold)
        y = BatchNorm(name="tcn_bn")(y, use_running_average=not train)
        if not self.residual:
            res = 0.0
        elif x.shape[-1] == self.out_channels and self.stride == 1:
            res = x
        else:
            # faithful quirk: the reference calls self.residual(x) WITHOUT the
            # stage threshold (stgcn_sparse.py:72), so the residual conv is
            # masked at threshold 0 (scores >= 0), not the sparsity target
            r = SparseTemporalConvAt(self.out_channels, kernel_size=1,
                                     stride=self.stride,
                                     name="residual")(x, 0.0)
            res = BatchNorm(name="residual_bn")(
                r, use_running_average=not train)
        return jax.nn.relu(y + res)


def _all_score_pool(block_params):
    leaves = []

    def visit(path, leaf):
        if str(getattr(path[-1], "key", "")) == "score":
            leaves.append(leaf)
        return leaf

    jax.tree_util.tree_map_with_path(visit, block_params)
    return leaves


class SparseSTGCNExact(nn.Module):
    """STGCN_sparse backbone with the reference's global per-stage percentile
    thresholds (stgcn_sparse.py:78-212; all of the stage's scores pool, since
    every sparse conv shares the configured ratio).  The committed default
    gcn_type='unit_gcn' is unusable (plain unit_gcn rejects sparse_ratio,
    stgcn_sparse.py:41); the working configuration is
    gcn_type='unit_gcn_sparse' + tcn_type='unit_tcn_sparse'.

    ``global_threshold``: the NESTED copy pools scores over ALL stages for a
    single threshold (pyskl/pyskl/.../stgcn_sparse.py:182 passes self.gcn,
    not self.gcn[i]) — set True for nested semantics (SMoE/Assemble
    experts); the outer copy thresholds per stage (default)."""
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="spatial")
    in_channels: int = 3
    base_channels: int = 64
    num_person: int = 2
    num_stages: int = 10
    inflate_stages: Tuple[int, ...] = (5, 8)
    down_stages: Tuple[int, ...] = (5, 8)
    linear_sparsity: float = 0.0
    warm_up: int = 0
    sparse_decay: bool = False
    global_threshold: bool = False

    def epoch_sparsity(self, current_epoch, max_epoch):
        return sparsity_schedule(self.linear_sparsity, current_epoch,
                                 max_epoch, self.warm_up, self.sparse_decay)

    @nn.compact
    def __call__(self, x: Array, sparsity, *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        graph = Graph.from_config(self.graph_cfg)
        A = graph.A.astype(np.float32)
        x = DataBN("VC", name="data_bn")(x, train=train)
        x = x.reshape(n * m, t, v, c)
        plan = stage_plan(self.in_channels, self.base_channels, 2,
                          self.num_stages, self.inflate_stages,
                          self.down_stages)
        thr_global = None
        if self.global_threshold and not self.is_initializing():
            pool = _all_score_pool(self.variables["params"])
            thr_global = pooled_threshold(pool, sparsity)
        for i, (in_c, out_c, stride, residual) in enumerate(plan):
            blk = SparseSTGCNBlockExact(out_c, A=A, stride=stride,
                                        residual=residual, name=f"block{i}")
            if self.is_initializing():
                x = blk(x, jnp.float32(-jnp.inf), train=train)
                continue
            if thr_global is not None:
                x = blk(x, thr_global, train=train)
                continue
            pool = _all_score_pool(self.variables["params"][f"block{i}"])
            thr = pooled_threshold(pool, sparsity)
            x = blk(x, thr, train=train)
        return x.reshape((n, m) + x.shape[1:])
