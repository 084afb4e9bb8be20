"""Nested-copy sparse family: AAGCN_sparse, DGSTGCN_sparse, Assemble_sparse
(reference `pyskl/pyskl/models/gcns/{aagcn_sparse,dggcn_sparse,
Assemble_sparse}.py`, the research extras that exist only in the nested
duplicate — SURVEY §0.1).

TPU-first reformulation shared with sparse/models.py: channels-last arrays,
supermasks thresholded at traced scalars (`supermask_at`), per-stage
percentile thresholds over each block's pooled scores
(`aagcn_sparse.py:171-179`, torch-kthvalue semantics via
`torch_percentile`).  Faithful quirks are reproduced and noted inline; the
one deliberate divergence: the reference's duck-typed residual call runs
`unit_tcn_sparse` TWICE per step (`dggcn_sparse.py:69-77` try+else), which
double-updates its BN running stats in train mode — we call it once (the
second call is a torch-side accident, not semantics; eval outputs agree
exactly).
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
from ..ops.gcn import ACTS, _dispatch_contract
from .models import (SparseDenseAt, SparseMSTCN, SparseTemporalConvAt,
                     _all_score_pool)
from .supermask import pooled_threshold, sparsity_schedule


class SparseUnitTCN(nn.Module):
    """unit_tcn_sparse = thresholded k x 1 conv + BN (+dropout)
    (tcn_sparse.py:12-41; identical file in both copies)."""
    out_channels: int
    kernel_size: int = 9
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        y = SparseTemporalConvAt(self.out_channels, self.kernel_size,
                                 self.stride, self.dilation,
                                 name="conv")(x, threshold)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


# ---------------------------------------------------------------------------
# AAGCN_sparse (nested aagcn_sparse.py:12-232)
# ---------------------------------------------------------------------------


class SparseUnitAAGCN(nn.Module):
    """Nested unit_aagcn_sparse (pyskl/pyskl/.../gcn_sparse.py:101-218):
    adaptive per-subset data-dependent graph with every conv supermasked at
    the stage threshold; the nested copy fixes the outer copy's down-path
    channel bug (in->out, :147) and threads the threshold through all convs
    (:186-219).  Attention chain convs are plain (not sparse) — reference
    builds them as nn.Conv1d/Linear (:133-141)."""
    out_channels: int
    A_init: np.ndarray
    coff_embedding: int = 4
    adaptive: bool = True
    attention: bool = True

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        from ..ops.gcn import AttentionChain
        K, V, _ = self.A_init.shape
        n, t, v, c = x.shape
        inter_c = self.out_channels // self.coff_embedding

        y = None
        if self.adaptive:
            A = self.param("A", lambda k: jnp.asarray(self.A_init,
                                                      jnp.float32))
            alpha = self.param("alpha", nn.initializers.zeros_init(), (1,))
            for i in range(K):
                a = SparseDenseAt(inter_c, name=f"conv_a{i}")(x, threshold)
                b = SparseDenseAt(inter_c, name=f"conv_b{i}")(x, threshold)
                # tanh(A1 @ A2 / (inter_c*T)) (gcn_sparse.py:186-188)
                g = jnp.tanh(jnp.einsum(
                    "ntvc,ntwc->nvw", a, b,
                    preferred_element_type=accum_dtype(x.dtype))
                    / (inter_c * t)).astype(x.dtype)
                Ai = A[i] + g * alpha[0]
                z = jnp.einsum("ntvc,nvw->ntwc", x, Ai,
                               preferred_element_type=accum_dtype(x.dtype)
                               ).astype(x.dtype)
                z = SparseDenseAt(self.out_channels,
                                  name=f"conv_d{i}")(z, threshold)
                y = z if y is None else y + z
        else:
            A = jnp.asarray(self.A_init, x.dtype)
            for i in range(K):
                z = jnp.einsum("ntvc,vw->ntwc", x, A[i],
                               preferred_element_type=accum_dtype(x.dtype)
                               ).astype(x.dtype)
                z = SparseDenseAt(self.out_channels,
                                  name=f"conv_d{i}")(z, threshold)
                y = z if y is None else y + z

        if c != self.out_channels:
            r = SparseDenseAt(self.out_channels,
                              name="down_conv")(x, threshold)
            res = BatchNorm(name="down_bn")(r, use_running_average=not train)
        else:
            res = x
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        y = jax.nn.relu(y + res)
        if self.attention:
            y = AttentionChain(self.out_channels, name="att")(y)
        return y


class SparseAAGCNBlock(nn.Module):
    """Nested AAGCNBlock (aagcn_sparse.py:12-63): sparse gcn + sparse 9x1 tcn;
    faithful quirk: the residual conv is called WITHOUT the stage threshold
    (`res = self.residual(x)`, :59 -> default sparsity=0), so it is masked at
    threshold 0 regardless of the sparsity target."""
    out_channels: int
    A_init: np.ndarray
    stride: int = 1
    residual: bool = True
    gcn_adaptive: bool = True
    gcn_attention: bool = True

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        if not self.residual:
            res = 0.0
        elif x.shape[-1] == self.out_channels and self.stride == 1:
            res = x
        else:
            res = SparseUnitTCN(self.out_channels, kernel_size=1,
                                stride=self.stride, name="residual")(
                x, 0.0, train=train)
        y = SparseUnitAAGCN(self.out_channels, A_init=self.A_init,
                            adaptive=self.gcn_adaptive,
                            attention=self.gcn_attention,
                            name="gcn")(x, threshold, train=train)
        y = SparseUnitTCN(self.out_channels, kernel_size=9,
                          stride=self.stride, name="tcn")(
            y, threshold, train=train)
        return jax.nn.relu(y + res)


class SparseAAGCN(nn.Module):
    """Nested AAGCN_sparse backbone (aagcn_sparse.py:65-232): MVC data_bn,
    10 stages, per-stage percentile threshold over the block's pooled scores
    (:142-179).  forward(x, sparsity) with the epoch ramp computed by
    `epoch_sparsity` (the reference threads current/max epoch)."""
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="spatial")
    in_channels: int = 3
    base_channels: int = 64
    num_person: int = 2
    num_stages: int = 10
    inflate_stages: Tuple[int, ...] = (5, 8)
    down_stages: Tuple[int, ...] = (5, 8)
    data_bn_type: Optional[str] = "MVC"
    linear_sparsity: float = 0.0
    warm_up: int = 0
    sparse_decay: bool = False
    gcn_adaptive: bool = True
    gcn_attention: bool = True

    def epoch_sparsity(self, current_epoch, max_epoch):
        return sparsity_schedule(self.linear_sparsity, current_epoch,
                                 max_epoch, self.warm_up, self.sparse_decay)

    @nn.compact
    def __call__(self, x: Array, sparsity, *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        graph = Graph.from_config(self.graph_cfg)
        A = graph.A.astype(np.float32)
        x = DataBN(self.data_bn_type, name="data_bn")(x, train=train)
        x = x.reshape(n * m, t, v, c)
        plan = stage_plan(self.in_channels, self.base_channels, 2,
                          self.num_stages, self.inflate_stages,
                          self.down_stages)
        for i, (in_c, out_c, stride, residual) in enumerate(plan):
            blk = SparseAAGCNBlock(out_c, A_init=A, stride=stride,
                                   residual=residual,
                                   gcn_adaptive=self.gcn_adaptive,
                                   gcn_attention=self.gcn_attention,
                                   name=f"block{i}")
            if self.is_initializing():
                x = blk(x, jnp.float32(-jnp.inf), train=train)
                continue
            pool = _all_score_pool(self.variables["params"][f"block{i}"])
            thr = pooled_threshold(pool, sparsity)
            x = blk(x, thr, train=train)
        return x.reshape((n, m) + x.shape[1:])


# ---------------------------------------------------------------------------
# DGSTGCN_sparse (nested dggcn_sparse.py:12-312)
# ---------------------------------------------------------------------------


class SparseDGGCN(nn.Module):
    """Nested dggcn_sparse (pyskl/pyskl/.../gcn_sparse.py:357-531): the
    DG-STGCN dynamic-group GCN with supermasked pre/post/conv1/conv2/down
    1x1 convs, trained A, CTR diff graph and ADA outer-product graph with
    per-subset alpha/beta gates, and the 4-way contraction dispatch."""
    out_channels: int
    A_init: np.ndarray
    ratio: Optional[float] = 0.25
    ctr: Optional[str] = "T"
    ada: Optional[str] = "T"
    subset_wise: bool = False
    ada_act: str = "softmax"
    ctr_act: str = "tanh"

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        K, V, _ = self.A_init.shape
        n, t, v, c = x.shape
        ratio = self.ratio if self.ratio is not None else 1.0 / K
        mid = int(ratio * self.out_channels)

        if c != self.out_channels:
            r = SparseDenseAt(self.out_channels,
                              name="down_conv")(x, threshold)
            res = BatchNorm(name="down_bn")(r, use_running_average=not train)
        else:
            res = x

        A_param = self.param("A", lambda k: jnp.asarray(self.A_init,
                                                        jnp.float32))
        A6 = A_param[None, :, None, None]

        pre = SparseDenseAt(mid * K, name="pre_conv")(x, threshold)
        pre = BatchNorm(name="pre_bn")(pre, use_running_average=not train)
        pre_x = jax.nn.relu(pre).reshape(n, t, v, K, mid)

        alpha = self.param("alpha", nn.initializers.zeros_init(), (K,))
        beta = self.param("beta", nn.initializers.zeros_init(), (K,))

        x1 = x2 = None
        if self.ctr is not None or self.ada is not None:
            tmp = x
            if not (self.ctr == "NA" or self.ada == "NA"):
                tmp = tmp.mean(axis=1, keepdims=True)
            tq = tmp.shape[1]
            x1 = SparseDenseAt(mid * K, name="conv1")(tmp, threshold)
            x2 = SparseDenseAt(mid * K, name="conv2")(tmp, threshold)
            # to reference layout (N, K, C, Tq, V)
            x1 = jnp.transpose(x1.reshape(n, tq, v, K, mid), (0, 3, 4, 1, 2))
            x2 = jnp.transpose(x2.reshape(n, tq, v, K, mid), (0, 3, 4, 1, 2))

        if self.ctr is not None:
            diff = x1[..., :, None] - x2[..., None, :]
            g = ACTS[self.ctr_act](diff)
            g = g * (alpha[None, :, None, None, None, None]
                     if self.subset_wise else alpha[0])
            A6 = g + A6
        if self.ada is not None:
            g = jnp.einsum("nkctv,nkctw->nktvw", x1, x2,
                           preferred_element_type=accum_dtype(x.dtype)
                           ).astype(x.dtype)[:, :, None]
            g = ACTS[self.ada_act](g)
            g = g * (beta[None, :, None, None, None, None]
                     if self.subset_wise else beta[0])
            A6 = g + A6

        y = _dispatch_contract(pre_x, A6, self.ctr, self.ada)
        y = y.reshape(n, t, v, K * mid)
        y = SparseDenseAt(self.out_channels, name="post_conv")(y, threshold)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        return jax.nn.relu(y + res)


class SparseDGBlock(nn.Module):
    """Nested DGBlock (dggcn_sparse.py:12-86): sparse dggcn + mstcn_sparse;
    the residual 1x1 unit_tcn_sparse IS thresholded here (the duck-typed
    call succeeds, :70-75 — unlike the AAGCN/STGCN blocks)."""
    out_channels: int
    A_init: np.ndarray
    stride: int = 1
    residual: bool = True
    gcn_ratio: Optional[float] = 0.25
    gcn_ctr: Optional[str] = "T"
    gcn_ada: Optional[str] = "T"
    gcn_subset_wise: bool = False
    tcn_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, threshold, *, train: bool) -> Array:
        if not self.residual:
            res = 0.0
        elif x.shape[-1] == self.out_channels and self.stride == 1:
            res = x
        else:
            res = SparseUnitTCN(self.out_channels, kernel_size=1,
                                stride=self.stride, name="residual")(
                x, threshold, train=train)
        y = SparseDGGCN(self.out_channels, A_init=self.A_init,
                        ratio=self.gcn_ratio, ctr=self.gcn_ctr,
                        ada=self.gcn_ada, subset_wise=self.gcn_subset_wise,
                        name="gcn")(x, threshold, train=train)
        y = SparseMSTCN(self.out_channels, stride=self.stride,
                        dropout=self.tcn_dropout, name="tcn")(
            y, threshold, train=train)
        return jax.nn.relu(y + res)


class SparseDGSTGCN(nn.Module):
    """Nested DGSTGCN_sparse backbone (dggcn_sparse.py:89-312): VC data_bn,
    ch_ratio channel plan, per-stage percentile thresholds (:199-217)."""
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="random",
                                         num_filter=8, init_off=0.04,
                                         init_std=0.02)
    in_channels: int = 3
    base_channels: int = 64
    ch_ratio: float = 2
    num_stages: int = 10
    inflate_stages: Tuple[int, ...] = (5, 8)
    down_stages: Tuple[int, ...] = (5, 8)
    data_bn_type: Optional[str] = "VC"
    num_person: int = 2
    linear_sparsity: float = 0.0
    warm_up: int = 0
    sparse_decay: bool = False
    gcn_ratio: Optional[float] = 0.25
    gcn_ctr: Optional[str] = "T"
    gcn_ada: Optional[str] = "T"
    gcn_subset_wise: bool = False

    def epoch_sparsity(self, current_epoch, max_epoch):
        return sparsity_schedule(self.linear_sparsity, current_epoch,
                                 max_epoch, self.warm_up, self.sparse_decay)

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
            blk = SparseDGBlock(out_c, A_init=A, stride=stride,
                                residual=residual, gcn_ratio=self.gcn_ratio,
                                gcn_ctr=self.gcn_ctr, gcn_ada=self.gcn_ada,
                                gcn_subset_wise=self.gcn_subset_wise,
                                name=f"block{i}")
            if self.is_initializing():
                x = blk(x, jnp.float32(-jnp.inf), train=train)
                continue
            pool = _all_score_pool(self.variables["params"][f"block{i}"])
            thr = pooled_threshold(pool, sparsity)
            x = blk(x, thr, train=train)
        return x.reshape((n, m) + x.shape[1:])


# ---------------------------------------------------------------------------
# Assemble_sparse (nested Assemble_sparse.py:14-256)
# ---------------------------------------------------------------------------


class AssembleSparse(nn.Module):
    """Multi-backbone sparse assembly (nested Assemble_sparse.py:102-256):
    B parallel branch streams — one sparse block family per entry of
    ``model_list`` — evolve independently through the 10-stage plan, each on
    its slice of the stacked adjacency (A reshaped to (B, K/B, V, V),
    :40-41), with per-(stage, branch) percentile thresholds at that branch's
    ratio (:64-80).  Shared MVC data_bn; output stacked
    (B, N, M, T', V, C').

    The nested recognizer glue (RecongnizerGCN_Assemble.py:39-42) calls
    ``cls_head.loss(x, cls_score, gt_label)`` — a 3-arg signature no
    committed head implements, so the reference's Assemble training path is
    broken as committed; the backbone contract above is the reproducible
    part.
    """
    model_list: Tuple[str, ...]
    sparse_ratio: Tuple[float, ...]
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="spatial")
    in_channels: int = 3
    base_channels: int = 64
    num_person: int = 2
    num_stages: int = 10
    inflate_stages: Tuple[int, ...] = (5, 8)
    down_stages: Tuple[int, ...] = (5, 8)
    warm_up: int = 0
    sparse_decay: bool = False

    def _branch_block(self, family, A_i, out_c, stride, residual, name):
        from .models import SparseCTRGCNBlock, SparseSTGCNBlockExact
        if family == "ST-GCN":
            return SparseSTGCNBlockExact(out_c, A=A_i, stride=stride,
                                         residual=residual, name=name)
        if family == "AA-GCN":
            return SparseAAGCNBlock(out_c, A_init=A_i, stride=stride,
                                    residual=residual, name=name)
        if family == "CTR-GCN":
            return SparseCTRGCNBlock(out_c, A=A_i, stride=stride,
                                     residual=residual, name=name)
        if family == "DG-GCN":
            return SparseDGBlock(out_c, A_init=A_i, stride=stride,
                                 residual=residual, name=name)
        raise ValueError(f"unknown branch family {family!r}")

    @nn.compact
    def __call__(self, x: Array, current_epoch, max_epoch,
                 *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        B = len(self.model_list)
        graph = Graph.from_config(self.graph_cfg)
        A = graph.A.astype(np.float32)
        K = A.shape[0]
        assert K % B == 0, (K, B)
        A = A.reshape(B, K // B, v, v)
        x = DataBN("MVC", name="data_bn")(x, train=train)
        x = x.reshape(n * m, t, v, c)
        plan = stage_plan(self.in_channels, self.base_channels, 2,
                          self.num_stages, self.inflate_stages,
                          self.down_stages)
        streams = [x] * B
        for i, (in_c, out_c, stride, residual) in enumerate(plan):
            # faithful quirk: AssembleBlock never forwards its residual flag
            # to the branch blocks (Assemble_sparse.py:44-61 builds them
            # without residual=...), so even the first stage keeps the
            # default residual=True (a 3->64 down-projection)
            for j, family in enumerate(self.model_list):
                name = f"stage{i}_branch{j}"
                blk = self._branch_block(family, A[j], out_c, stride,
                                         True, name)
                if self.is_initializing():
                    streams[j] = blk(streams[j], jnp.float32(-jnp.inf),
                                     train=train)
                    continue
                sp = sparsity_schedule(self.sparse_ratio[j], current_epoch,
                                       max_epoch, self.warm_up,
                                       self.sparse_decay)
                pool = _all_score_pool(self.variables["params"][name])
                thr = pooled_threshold(pool, sp)
                streams[j] = blk(streams[j], thr, train=train)
        out = [s.reshape((n, m) + s.shape[1:]) for s in streams]
        return jnp.stack(out, axis=0)


def assemble_regularize(params, model_list: Tuple[str, ...],
                        sparse_ratio: Tuple[float, ...], lam: float,
                        penalty: str = "GSGL"):
    """Assemble_sparse.regularize (Assemble_sparse.py:217-256): GSGL over
    each (branch, stage) block's pruned (score <= threshold) weights —
    single-append here, unlike the SMoE variant's double-append quirk."""
    from .smoe import _stage_mask_penalty
    return _stage_mask_penalty(
        [(params[k], sparse_ratio[int(k.split("_branch")[1])])
         for k in sorted(params) if "_branch" in k],
        lam, penalty)
