"""Skeleton-GCN backbones: STGCN (+STGCN++), AAGCN, CTRGCN, DGSTGCN (DG/DS-GCN).

All share the 10-stage template of the reference (stgcn.py:100-128): channel
inflation x2 and temporal stride 2 at stages 5 and 8, block = spatial GCN ->
temporal conv (+ residual, ReLU).  Input ``(N, M, T, V, C)`` channels-last,
output ``(N, M, T/4, V, C_out)``.

Per-stage overrides follow the reference convention: any block-arg whose value
is a tuple of length ``num_stages`` is split across stages (stgcn.py:101-104);
``gcn_``/``tcn_`` prefixes route args to the spatial/temporal unit
(dgstgcn.py:24-26).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from ..graph import Graph, GraphConfig
from ..ops.common import Array, PointConv, TorchBN
from ..ops.gcn import (DGGCN, DGHGCN, DGPHGCN1, UnitAAGCN, UnitAAHGCN,
                       UnitGCNEdge, UnitGTGCN,
                       UnitCTRGCN, UnitCTRHGCN, UnitGCN)
from ..ops.tcn import (CTRMSTCN, DGMSTCN, GCMLP, MSTCN, UnitMLP, UnitTCN,
                       UnitTCNEdge)

EPS = 1e-4


def split_stage_kwargs(kwargs: Mapping[str, Any], num_stages: int):
    """Tuple-valued kwargs of length num_stages become per-stage values."""
    lw = [dict(kwargs) for _ in range(num_stages)]
    for k, v in kwargs.items():
        if isinstance(v, tuple) and len(v) == num_stages:
            for i in range(num_stages):
                lw[i][k] = v[i]
    return lw


def route_prefix(kwargs: Mapping[str, Any]):
    """Split block kwargs into (gcn_kwargs, tcn_kwargs); bare 'act'/'norm'/'g1x1'
    go to both (dgstgcn.py:17-26)."""
    kwargs = dict(kwargs)
    for arg in ("act", "norm", "g1x1"):
        if arg in kwargs:
            v = kwargs.pop(arg)
            kwargs.setdefault("gcn_" + arg, v)
            kwargs.setdefault("tcn_" + arg, v)
    gcn_kwargs = {k[4:]: v for k, v in kwargs.items() if k.startswith("gcn_")}
    tcn_kwargs = {k[4:]: v for k, v in kwargs.items() if k.startswith("tcn_")}
    rest = {k: v for k, v in kwargs.items()
            if not (k.startswith("gcn_") or k.startswith("tcn_"))}
    assert not rest, f"invalid block args: {rest}"
    return gcn_kwargs, tcn_kwargs


class DataBN(nn.Module):
    """Input batchnorm over flattened joint-channel features per frame
    (reference stgcn.py:93-98: BatchNorm1d('VC' or 'MVC'))."""
    kind: Optional[str] = "VC"   # 'VC' | 'MVC' | None

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        if self.kind is None:
            return x
        n, m, t, v, c = x.shape
        bn = TorchBN(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name="bn")
        if self.kind == "MVC":
            y = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(n, t, m * v * c)
            y = bn(y)
            y = jnp.transpose(y.reshape(n, t, m, v, c), (0, 2, 1, 3, 4))
        else:
            y = x.reshape(n * m, t, v * c)
            y = bn(y)
            y = y.reshape(n, m, t, v, c)
        return y


def _make_tcn(tcn_type: str, out_channels: int, stride: int,
              tcn_kwargs: Dict[str, Any], name: str = "tcn") -> nn.Module:
    if tcn_type == "unit_tcn":
        return UnitTCN(out_channels, kernel_size=9, stride=stride, name=name,
                       **tcn_kwargs)
    if tcn_type == "mstcn":
        kw = {k: (tuple(map(tuple_ify, v)) if k == "ms_cfg" else v)
              for k, v in tcn_kwargs.items()}
        return MSTCN(out_channels, stride=stride, name=name, **kw)
    if tcn_type == "dgmstcn":
        kw = {k: (tuple(map(tuple_ify, v)) if k == "ms_cfg" else v)
              for k, v in tcn_kwargs.items()}
        return DGMSTCN(out_channels, stride=stride, name=name, **kw)
    if tcn_type == "unitmlp":
        return UnitMLP(out_channels, kernel_size=9, stride=stride, name=name,
                       **tcn_kwargs)
    if tcn_type == "msmlp":
        kw = {k: (tuple(map(tuple_ify, v)) if k == "ms_cfg" else v)
              for k, v in tcn_kwargs.items()}
        return MSTCN(out_channels, stride=stride, branch_kind="mlp",
                     name=name, **kw)
    if tcn_type == "gcmlp":
        kw = {k: (tuple(map(tuple_ify, v)) if k == "ms_cfg" else v)
              for k, v in tcn_kwargs.items()}
        return GCMLP(out_channels, stride=stride, name=name, **kw)
    if tcn_type == "dgmsmlp":
        kw = {k: (tuple(map(tuple_ify, v)) if k == "ms_cfg" else v)
              for k, v in tcn_kwargs.items()}
        return DGMSTCN(out_channels, stride=stride, branch_kind="mlp",
                       name=name, **kw)
    raise ValueError(f"unknown tcn type {tcn_type!r}")


def tuple_ify(v):
    return tuple(v) if isinstance(v, list) else v


class ResidualTCN(nn.Module):
    """Block residual path: identity, zero, or strided 1x1 unit_tcn."""
    out_channels: int
    stride: int
    enabled: bool = True
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array | float:
        if not self.enabled:
            return 0.0
        if x.shape[-1] == self.out_channels and self.stride == 1:
            return x
        return UnitTCN(self.out_channels, kernel_size=1, stride=self.stride,
                       bn_axis=self.bn_axis, name="down")(x, train=train)


class STGCNBlock(nn.Module):
    """unit_gcn + temporal conv + residual (reference STGCNBlock, stgcn.py:16-68)."""
    out_channels: int
    A: np.ndarray
    stride: int = 1
    residual: bool = True
    gcn_kwargs: FrozenDict = FrozenDict()
    tcn_type: str = "unit_tcn"
    tcn_kwargs: FrozenDict = FrozenDict()

    @nn.compact
    def __call__(self, x: Array, *, train: bool,
                 A_ext: Optional[Array] = None) -> Array:
        res = ResidualTCN(self.out_channels, self.stride, self.residual,
                          name="residual")(x, train=train)
        y = UnitGCN(self.out_channels, A_init=self.A, name="gcn",
                    **self.gcn_kwargs)(x, train=train, A_ext=A_ext)
        y = _make_tcn(self.tcn_type, self.out_channels, self.stride,
                      dict(self.tcn_kwargs))(y, train=train)
        return jax.nn.relu(y + res)


class STGINBlock(nn.Module):
    """unit_gcnedge + unit_tcnedge with threaded edge representations
    (reference STGINBlock, stgin.py:17-72)."""
    out_channels: int
    A: np.ndarray
    stride: int = 1
    residual: bool = True
    gcn_kwargs: FrozenDict = FrozenDict()
    tcn_kwargs: FrozenDict = FrozenDict()

    @nn.compact
    def __call__(self, x: Array, edge_t: Array, edge_s: Array, *,
                 train: bool):
        res = ResidualTCN(self.out_channels, self.stride, self.residual,
                          name="residual")(x, train=train)
        y, edge_s, edge_t = UnitGCNEdge(
            self.out_channels, A_init=self.A, name="gcn",
            **self.gcn_kwargs)(x, edge_s, edge_t, train=train)
        y, edge_t, edge_s = UnitTCNEdge(
            self.out_channels, stride=self.stride, name="tcn",
            **self.tcn_kwargs)(y, edge_t, edge_s, train=train)
        return jax.nn.relu(y + res), edge_t, edge_s


class GTGCNBlock(nn.Module):
    """unit_gtgcn + temporal conv + residual (reference MEGA-era GTGCNBlock,
    gtgcn.py:11-64)."""
    out_channels: int
    A: np.ndarray
    stride: int = 1
    residual: bool = True
    edge_type: Optional[np.ndarray] = None
    node_type: Optional[np.ndarray] = None
    gcn_kwargs: FrozenDict = FrozenDict()
    tcn_type: str = "unit_tcn"
    tcn_kwargs: FrozenDict = FrozenDict()

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        res = ResidualTCN(self.out_channels, self.stride, self.residual,
                          name="residual")(x, train=train)
        y = UnitGTGCN(self.out_channels, A_init=self.A,
                      edge_type=self.edge_type, node_type=self.node_type,
                      name="gcn1", **self.gcn_kwargs)(x, train=train)
        y = _make_tcn(self.tcn_type, self.out_channels, self.stride,
                      dict(self.tcn_kwargs), name="tcn1")(y, train=train)
        return jax.nn.relu(y + res)


class AAGCNBlock(nn.Module):
    """unit_aagcn / unit_aahgcn + temporal conv (reference aagcn.py:12-55)."""
    out_channels: int
    A: np.ndarray
    stride: int = 1
    residual: bool = True
    gcn_type: str = "unit_aagcn"
    edge_type: Optional[np.ndarray] = None
    node_type: Optional[np.ndarray] = None
    gcn_kwargs: FrozenDict = FrozenDict()
    tcn_type: str = "unit_tcn"
    tcn_kwargs: FrozenDict = FrozenDict()

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        res = ResidualTCN(self.out_channels, self.stride, self.residual,
                          name="residual")(x, train=train)
        if self.gcn_type == "unit_aahgcn":
            y = UnitAAHGCN(self.out_channels, A_init=self.A,
                           edge_type=self.edge_type, node_type=self.node_type,
                           name="gcn", **self.gcn_kwargs)(x, train=train)
        else:
            y = UnitAAGCN(self.out_channels, A_init=self.A, name="gcn",
                          **self.gcn_kwargs)(x, train=train)
        y = _make_tcn(self.tcn_type, self.out_channels, self.stride,
                      dict(self.tcn_kwargs))(y, train=train)
        return jax.nn.relu(y + res)


class CTRGCNBlock(nn.Module):
    """unit_ctrgcn / unit_ctrhgcn + CTR multi-scale TCN (reference
    ctrgcn.py:9-61)."""
    in_channels: int
    out_channels: int
    A: np.ndarray
    stride: int = 1
    residual: bool = True
    kernel_size: int = 5
    dilations: Tuple[int, ...] = (1, 2)
    tcn_dropout: float = 0.0
    gcn_type: str = "unit_ctrgcn"
    semantic_index: bool = False
    edge_type: Optional[np.ndarray] = None
    node_type: Optional[np.ndarray] = None
    gcn_kwargs: FrozenDict = FrozenDict()

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        res = ResidualTCN(self.out_channels, self.stride, self.residual,
                          name="residual")(x, train=train)
        if self.gcn_type == "unit_ctrhgcn":
            y = UnitCTRHGCN(self.in_channels, self.out_channels,
                            A_init=self.A, edge_type=self.edge_type,
                            node_type=self.node_type,
                            semantic_index=self.semantic_index, name="gcn",
                            **self.gcn_kwargs)(x, train=train)
        else:
            y = UnitCTRGCN(self.in_channels, self.out_channels, A_init=self.A,
                           name="gcn", **self.gcn_kwargs)(x, train=train)
        y = CTRMSTCN(self.out_channels, kernel_size=self.kernel_size,
                     stride=self.stride, dilations=self.dilations,
                     residual=False, tcn_dropout=self.tcn_dropout,
                     name="tcn")(y, train=train)
        return jax.nn.relu(y + res)


class DGBlock(nn.Module):
    """{dggcn | dgphgcn1} + {unit_tcn | mstcn | dgmstcn} (reference dgstgcn.py:12-65)."""
    out_channels: int
    A: np.ndarray
    edge_type: Optional[np.ndarray]
    node_type: Optional[np.ndarray]
    stride: int = 1
    residual: bool = True
    gcn_type: str = "dggcn"
    gcn_kwargs: FrozenDict = FrozenDict()
    tcn_type: str = "dgmstcn"
    tcn_kwargs: FrozenDict = FrozenDict()
    graph_axis: Optional[str] = None   # joint-partition mesh axis
    remat_tcn: bool = False            # backbone remat='tcn' (selective)

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        res = ResidualTCN(self.out_channels, self.stride, self.residual,
                          bn_axis=self.graph_axis,
                          name="residual")(x, train=train)
        if self.gcn_type == "dggcn":
            y = DGGCN(self.out_channels, A_init=self.A, name="gcn",
                      graph_axis=self.graph_axis,
                      **self.gcn_kwargs)(x, train=train)
        elif self.gcn_type == "dghgcn":
            assert self.graph_axis is None
            y = DGHGCN(self.out_channels, A_init=self.A,
                       edge_type=self.edge_type, node_type=self.node_type,
                       name="gcn", **self.gcn_kwargs)(x, train=train)
        elif self.gcn_type == "dgphgcn1":
            y = DGPHGCN1(self.out_channels, A_init=self.A,
                         edge_type=self.edge_type, node_type=self.node_type,
                         name="gcn", graph_axis=self.graph_axis,
                         **self.gcn_kwargs)(x, train=train)
        else:
            raise ValueError(f"unknown gcn type {self.gcn_type!r}")
        tcn_kwargs = dict(self.tcn_kwargs)
        if self.graph_axis is not None:
            assert self.tcn_type in ("dgmstcn", "unit_tcn")
            tcn_kwargs["graph_axis" if self.tcn_type == "dgmstcn"
                       else "bn_axis"] = self.graph_axis
        tcn = _make_tcn(self.tcn_type, self.out_channels, self.stride,
                        tcn_kwargs)
        if self.remat_tcn and train:
            y = _remat_call(tcn, y)
        else:
            y = tcn(y, train=train)
        return jax.nn.relu(y + res)


def stage_plan(in_channels: int, base_channels: int, ch_ratio: float,
               num_stages: int, inflate_stages, down_stages):
    """Yields (in_c, out_c, stride, residual) per stage (reference stgcn.py:113-128).

    When in_channels == base_channels the first (non-residual) stem stage is
    dropped, leaving num_stages - 1 blocks.
    """
    plan = []
    if in_channels != base_channels:
        plan.append((in_channels, base_channels, 1, False))
    cur = base_channels
    inflate = 0
    for i in range(2, num_stages + 1):
        stride = 1 + (i in down_stages)
        if i in inflate_stages:
            inflate += 1
        out = int(base_channels * ch_ratio ** inflate + EPS)
        plan.append((cur, out, stride, True))
        cur = out
    return plan


def _remat_call(mod: nn.Module, x: Array) -> Array:
    """Rematerialized module call, transparent to the param tree: the lifted
    function transform runs on ``mod``'s own scope, so remat on/off produces
    the SAME variable paths (checkpoints interchangeable).  ``train=True``
    rides the closure as a static Python constant — remat only ever wraps
    the training path."""
    return nn.remat(lambda m, z: m(z, train=True))(mod, x)


class _BackboneBase(nn.Module):
    """Shared stage loop; subclasses provide make_block(i, in_c, out_c, stride, res, kwargs)."""
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="spatial")
    in_channels: int = 3
    base_channels: int = 64
    ch_ratio: float = 2
    num_person: int = 2
    num_stages: int = 10
    inflate_stages: Tuple[int, ...] = (5, 8)
    down_stages: Tuple[int, ...] = (5, 8)
    data_bn_type: Optional[str] = "VC"
    # True: remat the WHOLE block (inputs-only residency — max memory
    # saving, recomputes the fused aggregation kernel in the backward).
    # 'tcn': remat only the multi-branch TCN region (DGBlock) — keeps the
    # custom-VJP aggregation un-rematted (its backward already avoids
    # storing the graph tensor) while dropping the TCN branch intermediates,
    # the bulk of the per-block activation footprint (VERDICT r4 #4).
    remat: Any = False
    block_args: FrozenDict = FrozenDict()
    # joint-partition (graph-axis) SPMD: when set, __call__ must run inside a
    # shard_map whose mesh has this axis; the input arrives replicated over
    # it, data_bn runs on the full skeleton (its features are per-joint, so
    # stats stay exact), each device then takes its joint shard through the
    # stages, and the output is all-gathered back to the full joint set.
    # The shard count must divide V (5 or 25 for NTU's 25 joints — the body-
    # part granularity suggested in SURVEY §7).
    graph_axis: Optional[str] = None
    # joint-padded eval mode (VERDICT r4 #3): pad the joint axis 25 -> 32
    # ONCE after data_bn and run every stage at the f32-sublane-aligned
    # width (measured Pallas copy floor 244 GB/s vs 139 at V=25 — README
    # roofline); the output is sliced back so callers and the param tree
    # are unchanged.  Supported by DGSTGCN only (blocks must mask padded
    # joints out of graph aggregation — ops/gcn.py v_pad).
    joint_pad: int = 0
    _supports_joint_pad = False

    def _graph(self) -> Graph:
        return Graph.from_config(self.graph_cfg)

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        graph = self._graph()
        A = graph.A.astype(np.float32)
        x = DataBN(self.data_bn_type, name="data_bn")(x, train=train)
        x = x.reshape(n * m, t, v, c)
        v_real = v
        if self.joint_pad:
            assert self._supports_joint_pad, \
                f"{type(self).__name__} does not support joint_pad"
            assert not train, "joint-padded mode is eval-only"
            assert self.graph_axis is None and self.joint_pad >= v
            x = jnp.pad(x, ((0, 0), (0, 0), (0, self.joint_pad - v), (0, 0)))
        if self.graph_axis is not None:
            gsz = jax.lax.axis_size(self.graph_axis)
            gi = jax.lax.axis_index(self.graph_axis)
            assert v % gsz == 0, \
                f"graph-axis shards ({gsz}) must divide V ({v})"
            x = jax.lax.dynamic_slice_in_dim(x, gi * (v // gsz), v // gsz,
                                             axis=2)

        lw = split_stage_kwargs(self.block_args, self.num_stages)
        lw[0].pop("tcn_dropout", None)
        lw[0].pop("g1x1", None)
        lw[0].pop("gcn_g1x1", None)
        plan = stage_plan(self.in_channels, self.base_channels, self.ch_ratio,
                          self.num_stages, self.inflate_stages, self.down_stages)
        offset = self.num_stages - len(plan)  # 0 or 1 (stem dropped)
        for i, (in_c, out_c, stride, residual) in enumerate(plan):
            kwargs = dict(lw[i + offset])
            kwargs["_lw_index"] = i + offset
            blk = self.make_block(i, graph, A, in_c, out_c, stride, residual,
                                  kwargs)
            if self.remat is True and train:
                x = _remat_call(blk, x)
            else:
                x = blk(x, train=train)
        if self.graph_axis is not None:
            x = jax.lax.all_gather(x, self.graph_axis, axis=2, tiled=True)
        if self.joint_pad and self.joint_pad > v_real:
            x = x[:, :, :v_real]
        return x.reshape((n, m) + x.shape[1:])

    def make_block(self, i, graph, A, in_c, out_c, stride, residual, kwargs):
        raise NotImplementedError


class STGCN(_BackboneBase):
    """ST-GCN and STGCN++ (reference stgcn.py:71-153).

    STGCN++ = block_args dict(gcn_adaptive='init', gcn_with_res=True,
    tcn_type='mstcn') per configs/stgcn++/STGCN++_model.py.
    """

    def make_block(self, i, graph, A, in_c, out_c, stride, residual, kwargs):
        kwargs.pop("_lw_index", None)
        gcn_kwargs, tcn_kwargs = route_prefix(kwargs)
        tcn_type = tcn_kwargs.pop("type", "unit_tcn")
        return STGCNBlock(out_c, A=A, stride=stride, residual=residual,
                          gcn_kwargs=FrozenDict(gcn_kwargs), tcn_type=tcn_type,
                          tcn_kwargs=FrozenDict(tcn_kwargs), name=f"block{i}")


class STGIN(_BackboneBase):
    """ST-GIN backbone (reference stgin.py:74-162): the STGCN stage plan with
    edge-representation blocks.  Spatial edges start as pairwise coordinate
    differences, temporal edges as frame diffs through a 1x1 embed
    (stgin.py:149-156).  Only the committed-working configuration
    (gcn_type='unit_gcnedge', tcn_type='unit_tcnedge') exists; with the
    default gcn_type='unit_gcn' the reference block crashes
    (unit_gcn.forward takes 2-3 args, stgin.py:66)."""

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        graph = self._graph()
        A = graph.A.astype(np.float32)
        x = DataBN(self.data_bn_type, name="data_bn")(x, train=train)
        x = x.reshape(n * m, t, v, c)

        # spatial edges: x_u - x_v (stgin.py:149-151)
        edge_s = x[:, :, :, None, :] - x[:, :, None, :, :]   # (NM,T,V,V,C)
        # temporal edges: forward diff, last frame zero, 1x1 embed (:153-156)
        diff = jnp.concatenate(
            [jnp.diff(x, axis=1), jnp.zeros_like(x[:, :1])], axis=1)
        edge_t = PointConv(self.base_channels, name="edge_conv")(diff)

        lw = split_stage_kwargs(self.block_args, self.num_stages)
        lw[0].pop("tcn_dropout", None)
        plan = stage_plan(self.in_channels, self.base_channels, self.ch_ratio,
                          self.num_stages, self.inflate_stages,
                          self.down_stages)
        offset = self.num_stages - len(plan)
        for i, (in_c, out_c, stride, residual) in enumerate(plan):
            kwargs = dict(lw[i + offset])
            gcn_kwargs, tcn_kwargs = route_prefix(kwargs)
            gcn_kwargs.pop("type", None)
            tcn_kwargs.pop("type", None)
            x, edge_t, edge_s = STGINBlock(
                out_c, A=A, stride=stride, residual=residual,
                gcn_kwargs=FrozenDict(gcn_kwargs),
                tcn_kwargs=FrozenDict(tcn_kwargs),
                name=f"block{i}")(x, edge_t, edge_s, train=train)
        return x.reshape((n, m) + x.shape[1:])


class STGCNGC(_BackboneBase):
    """STGCN_GC (reference stgcn_gc.py:68-149): the STGCN trunk with an
    externally supplied adjacency fed to every block's unit_gcn
    (e.g. a Granger-causality matrix from the Causalmetrix pipeline,
    pose_related.py:107).  Requires gcn_adaptive in (None, 'offset',
    'importance') — the reference crashes with the default 'init'
    (gcn.py:57-58 assigns the fed tensor onto an nn.Parameter)."""

    @nn.compact
    def __call__(self, x: Array, A_ext: Array, *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        graph = self._graph()
        A = graph.A.astype(np.float32)
        x = DataBN(self.data_bn_type, name="data_bn")(x, train=train)
        x = x.reshape(n * m, t, v, c)
        lw = split_stage_kwargs(self.block_args, self.num_stages)
        lw[0].pop("tcn_dropout", None)
        plan = stage_plan(self.in_channels, self.base_channels, self.ch_ratio,
                          self.num_stages, self.inflate_stages,
                          self.down_stages)
        offset = self.num_stages - len(plan)
        for i, (in_c, out_c, stride, residual) in enumerate(plan):
            kwargs = dict(lw[i + offset])
            gcn_kwargs, tcn_kwargs = route_prefix(kwargs)
            tcn_type = tcn_kwargs.pop("type", "unit_tcn")
            gcn_kwargs.pop("type", None)
            x = STGCNBlock(out_c, A=A, stride=stride, residual=residual,
                           gcn_kwargs=FrozenDict(gcn_kwargs),
                           tcn_type=tcn_type,
                           tcn_kwargs=FrozenDict(tcn_kwargs),
                           name=f"block{i}")(x, train=train, A_ext=A_ext)
        return x.reshape((n, m) + x.shape[1:])


class GTGCN(_BackboneBase):
    """Graph-transformer GCN backbone (reference gtgcn.py:68-141): STGCN
    stage plan with unit_gtgcn spatial units (semantic k/q attention over
    node/edge types)."""

    def make_block(self, i, graph, A, in_c, out_c, stride, residual, kwargs):
        kwargs.pop("_lw_index", None)
        gcn_kwargs, tcn_kwargs = route_prefix(kwargs)
        tcn_type = tcn_kwargs.pop("type", "unit_tcn")
        gcn_kwargs.pop("type", None)
        nt = np.array(graph.node_type) if graph.node_type is not None else None
        return GTGCNBlock(out_c, A=A, stride=stride, residual=residual,
                          edge_type=graph.edge_type, node_type=nt,
                          gcn_kwargs=FrozenDict(gcn_kwargs),
                          tcn_type=tcn_type,
                          tcn_kwargs=FrozenDict(tcn_kwargs),
                          name=f"block{i}")


class AAGCN(_BackboneBase):
    """2s-AGCN backbone (reference aagcn.py:57-142); data_bn_type defaults MVC."""
    data_bn_type: Optional[str] = "MVC"

    def make_block(self, i, graph, A, in_c, out_c, stride, residual, kwargs):
        kwargs.pop("_lw_index", None)
        gcn_kwargs, tcn_kwargs = route_prefix(kwargs)
        tcn_type = tcn_kwargs.pop("type", "unit_tcn")
        gcn_type = gcn_kwargs.pop("type", "unit_aagcn")
        nt = np.array(graph.node_type) if graph.node_type is not None else None
        return AAGCNBlock(out_c, A=A, stride=stride, residual=residual,
                          gcn_type=gcn_type, edge_type=graph.edge_type,
                          node_type=nt,
                          gcn_kwargs=FrozenDict(gcn_kwargs), tcn_type=tcn_type,
                          tcn_kwargs=FrozenDict(tcn_kwargs), name=f"block{i}")


class CTRGCN(_BackboneBase):
    """CTR-GCN backbone (reference ctrgcn.py:69-123); data_bn MVC, CTR-MSTCN."""
    data_bn_type: Optional[str] = "MVC"

    semantic_stage: Tuple[int, ...] = tuple(range(1, 11))

    def make_block(self, i, graph, A, in_c, out_c, stride, residual, kwargs):
        lw_index = kwargs.pop("_lw_index", i)
        gcn_kwargs, tcn_kwargs = route_prefix(dict(kwargs))
        gcn_type = gcn_kwargs.pop("type", "unit_ctrgcn")
        tcn_kwargs.pop("type", None)
        extra = {k: tuple_ify(v) for k, v in tcn_kwargs.items()}
        nt = np.array(graph.node_type) if graph.node_type is not None else None
        # reference: stage number (1-based) in semantic_stage (ctrgcn.py:98-105)
        semantic_index = (lw_index + 1) in self.semantic_stage
        return CTRGCNBlock(in_c, out_c, A=A, stride=stride, residual=residual,
                           gcn_type=gcn_type, semantic_index=semantic_index,
                           edge_type=graph.edge_type, node_type=nt,
                           gcn_kwargs=FrozenDict(gcn_kwargs), name=f"block{i}",
                           **extra)


class DGSTGCN(_BackboneBase):
    """DG-STGCN / DS-GCN backbone (reference dgstgcn.py:74-170).

    DS-GCN = graph mode='random' (trained A), gcn_type='dgphgcn1' with semantic
    attentions, tcn_type='dgmstcn' (configs/dsstgcn/DSSTGCN_model.py).
    The per-stage 'gcn_stage' list toggles semantics on listed stages
    (dgstgcn.py:115-120).
    """
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="random", seed=0)
    _supports_joint_pad = True

    def make_block(self, i, graph, A, in_c, out_c, stride, residual, kwargs):
        kwargs = dict(kwargs)
        lw_index = kwargs.pop("_lw_index", i)
        gcn_stage = kwargs.pop("gcn_stage", None)
        gcn_kwargs, tcn_kwargs = route_prefix(kwargs)
        if gcn_stage is not None:
            # reference checks the lw list index (dgstgcn.py:115-120)
            gcn_kwargs["stage"] = lw_index in gcn_stage
        gcn_type = gcn_kwargs.pop("type", "dggcn")
        tcn_type = tcn_kwargs.pop("type", "dgmstcn")
        if self.joint_pad:
            assert gcn_type in ("dggcn", "dgphgcn1"), \
                f"joint_pad unsupported for gcn_type={gcn_type!r}"
            assert tcn_type in ("dgmstcn", "mstcn", "unit_tcn"), \
                f"joint_pad unsupported for tcn_type={tcn_type!r}"
            gcn_kwargs["v_pad"] = self.joint_pad
            if tcn_type == "dgmstcn":
                tcn_kwargs["v_pad"] = self.joint_pad
        et = graph.edge_type
        nt = np.array(graph.node_type) if graph.node_type is not None else None
        return DGBlock(out_c, A=A, edge_type=et, node_type=nt, stride=stride,
                       residual=residual, gcn_type=gcn_type,
                       gcn_kwargs=FrozenDict(gcn_kwargs), tcn_type=tcn_type,
                       tcn_kwargs=FrozenDict(tcn_kwargs),
                       remat_tcn=self.remat == "tcn",
                       graph_axis=self.graph_axis, name=f"block{i}")
