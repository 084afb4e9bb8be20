"""Spatial graph-convolution ops (channels-last, MXU-friendly).

Each op is the TPU-native re-design of a reference unit (file:line cites into
/root/reference/pyskl/models/gcns/utils/gcn.py).  Activations are
``(N, T, V, C)``; the reference uses ``(N, C, T, V)`` — all einsums below are
the transposed equivalents, verified elementwise by tests/test_ops_parity.py
against the actual reference modules with copied weights.

Key reformulations for XLA/TPU:
  * 1x1 convs -> Dense matmuls over the trailing C axis (MXU).
  * ``torch.diagonal`` type-gathers -> static per-joint ``take`` on the
    type axis (types are compile-time constants, so XLA folds the gather).
  * ``index_select`` over the 15·V·V expanded edge tensor -> a static
    ``take_along_axis`` with the precomputed (V, V) edge-class matrix.
  * All graph contractions are dense batched matmuls over the (N·T) batch.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import (Array, BatchNorm, PointConv, accum_dtype,
                     bn_scale_init, branch_init, kaiming_normal_fan_out,
                     torch_default_bias, torch_default_kernel)

ACTS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    # reference nn.Softmax(-2): softmax over the source-joint (row) axis of the
    # (..., u, v) graph (gcn.py:1498)
    "softmax": lambda x: jax.nn.softmax(x, axis=-2),
}


def _type_gather(x: Array, node_type: np.ndarray, type_axis: int) -> Array:
    """out[..., v] = x[..., node_type[v], ..., v]: per-joint gather on the type axis.

    Equivalent to the reference ``torch.diagonal(x[:, :, node_type, ...], dim1, dim2)``
    trick (gcn.py:729-730, 2232, 2258).  ``x`` has a trailing joint axis V and a
    ``type_axis`` of size num_types; the result drops the type axis.
    """
    V = x.shape[-1]
    nt = jnp.asarray(node_type, jnp.int32)
    # move type axis next to last, then take per joint
    x = jnp.moveaxis(x, type_axis, -2)          # (..., P, V)
    idx = jnp.broadcast_to(nt[None, :], (1, V))  # (1, V)
    idx = jnp.broadcast_to(nt, x.shape[:-2] + (1, V))
    return jnp.take_along_axis(x, idx, axis=-2)[..., 0, :]


def _edge_class_select(x: Array, edge_type: np.ndarray) -> Array:
    """out[..., u, w] = x[..., class(u, w), u, w].

    ``x``: (..., E, V, V) per-edge-class maps; ``edge_type``: static (V, V) int
    class matrix.  Replaces the reference's runtime ``index_select`` over the
    flattened 15·V·V tensor (gcn.py:2281-2287) with a static gather.
    """
    E = x.shape[-3]
    et = jnp.asarray(edge_type, jnp.int32)      # (V, V)
    idx = jnp.broadcast_to(et, x.shape[:-3] + et.shape)[..., None, :, :]
    return jnp.take_along_axis(x, idx, axis=-3)[..., 0, :, :]


class UnitGCN(nn.Module):
    """ST-GCN / STGCN++ spatial conv (reference unit_gcn, gcn.py:22-97).

    x: (N, T, V, C_in) -> (N, T, V, C_out).
    """
    out_channels: int
    A_init: np.ndarray                      # (K, V, V)
    adaptive: Optional[str] = "init"        # None | init | offset | importance
    conv_pos: str = "pre"
    with_res: bool = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool,
                 A_ext: Optional[Array] = None) -> Array:
        assert self.adaptive in (None, "init", "offset", "importance")
        assert self.conv_pos in ("pre", "post")
        K, V, _ = self.A_init.shape
        n, t, v, c = x.shape

        res = 0.0
        if self.with_res:
            if c != self.out_channels:
                r = PointConv(self.out_channels, name="down_conv")(x)
                res = BatchNorm(name="down_bn")(r, use_running_average=not train)
            else:
                res = x

        if self.adaptive == "init":
            # reference: feeding a runtime A into an adaptive='init' unit_gcn
            # raises (gcn.py:57-58 assigns a plain tensor to a Parameter)
            assert A_ext is None, \
                "external A requires adaptive in (None, offset, importance)"
            A = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
        else:
            A = jnp.asarray(self.A_init, jnp.float32) if A_ext is None \
                else A_ext.astype(jnp.float32)
            if self.adaptive == "offset":
                PA = self.param("PA", nn.initializers.uniform(2e-6), (K, V, V))
                A = A + (PA - 1e-6)  # uniform(0, 2e-6) shifted to U(-1e-6, 1e-6)
            elif self.adaptive == "importance":
                PA = self.param("PA", nn.initializers.ones_init(), (K, V, V))
                A = A * PA

        if self.conv_pos == "pre":
            y = PointConv(self.out_channels * K, name="conv")(x)
            y = y.reshape(n, t, v, K, self.out_channels)
            # reference: einsum('nkctv,kvw->nctw') (gcn.py:88)
            y = jnp.einsum("ntvkc,kvw->ntwc", y, A,
                           preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
        else:
            # reference: einsum('nctv,kvw->nkctw') then 1x1 over K*C (gcn.py:90-92)
            y = jnp.einsum("ntvc,kvw->ntwkc", x, A,
                           preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
            y = y.reshape(n, t, v, K * c)
            y = PointConv(self.out_channels, name="conv")(y)

        y = BatchNorm(name="bn")(y, use_running_average=not train)
        return jax.nn.relu(y + res)


class AttentionChain(nn.Module):
    """Spatial -> temporal -> channel SE-attention used by AAGCN (gcn.py:445-458)."""
    out_channels: int

    @nn.compact
    def __call__(self, y: Array) -> Array:
        n, t, v, c = y.shape
        # spatial attention: mean over T -> (N, V, C) -> conv over V -> (N, V, 1)
        ker_joint = v if v % 2 else v - 1
        pad = (ker_joint - 1) // 2
        se = y.mean(axis=1)
        se1 = nn.Conv(1, kernel_size=(ker_joint,), padding=((pad, pad),),
                      kernel_init=nn.initializers.xavier_normal(),
                      bias_init=nn.initializers.zeros_init(), name="conv_sa")(se)
        y = y * jax.nn.sigmoid(se1)[:, None, :, :] + y
        # temporal attention: mean over V -> (N, T, C) -> conv over T (k=9, pad=4)
        se = y.mean(axis=2)
        se1 = nn.Conv(1, kernel_size=(9,), padding=((4, 4),),
                      kernel_init=nn.initializers.zeros_init(),
                      bias_init=nn.initializers.zeros_init(), name="conv_ta")(se)
        y = y * jax.nn.sigmoid(se1)[:, :, None, :] + y
        # channel attention: global mean -> (N, C) -> bottleneck MLP
        se = y.mean(axis=(1, 2))
        se1 = jax.nn.relu(nn.Dense(
            c // 2, kernel_init=nn.initializers.kaiming_normal(),
            bias_init=nn.initializers.zeros_init(), name="fc1c")(se))
        se2 = jax.nn.sigmoid(nn.Dense(
            c, kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(), name="fc2c")(se1))
        return y * se2[:, None, None, :] + y


class UnitAAGCN(nn.Module):
    """2s-AGCN adaptive unit (reference unit_aagcn, gcn.py:349-461)."""
    out_channels: int
    A_init: np.ndarray
    coff_embedding: int = 4
    adaptive: bool = True
    attention: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        K, V, _ = self.A_init.shape
        n, t, v, c = x.shape
        inter_c = self.out_channels // self.coff_embedding

        y = None
        if self.adaptive:
            A = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
            alpha = self.param("alpha", nn.initializers.zeros_init(), (1,))
            for i in range(K):
                a = PointConv(inter_c, name=f"conv_a{i}",
                              kernel_init=kaiming_normal_fan_out(),
                              bias_init=nn.initializers.zeros_init())(x)   # (N,T,V,R)
                b = PointConv(inter_c, name=f"conv_b{i}",
                              kernel_init=kaiming_normal_fan_out(),
                              bias_init=nn.initializers.zeros_init())(x)
                # reference gcn.py:429-431: tanh(A1 @ A2 / (R*T))
                g = jnp.tanh(jnp.einsum("ntvc,ntwc->nvw", a, b,
                                        preferred_element_type=accum_dtype(x.dtype))
                             / (inter_c * t)).astype(x.dtype)
                Ai = A[i] + g * alpha[0]
                z = jnp.einsum("ntvc,nvw->ntwc", x, Ai,
                               preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
                z = PointConv(self.out_channels, name=f"conv_d{i}",
                              kernel_init=branch_init(K))(z)
                y = z if y is None else y + z
        else:
            A = jnp.asarray(self.A_init, jnp.float32)
            for i in range(K):
                z = jnp.einsum("ntvc,vw->ntwc", x, A[i],
                               preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
                z = PointConv(self.out_channels, name=f"conv_d{i}",
                              kernel_init=branch_init(K))(z)
                y = z if y is None else y + z

        if c != self.out_channels:
            r = PointConv(self.out_channels, name="down_conv",
                          kernel_init=kaiming_normal_fan_out())(x)
            res = BatchNorm(name="down_bn")(r, use_running_average=not train)
        else:
            res = x
        y = BatchNorm(name="bn", scale_init=bn_scale_init(1e-6))(
            y, use_running_average=not train)
        y = jax.nn.relu(y + res)

        if self.attention:
            y = AttentionChain(self.out_channels, name="att")(y)
        return y


class UnitAAHGCN(nn.Module):
    """Heterogeneous (semantic) AAGCN unit (reference unit_aahgcn,
    gcn.py:462-632) — AAGCN with per-node-type Q/K projections and optional
    per-edge-class attention on the data-dependent graph."""
    out_channels: int
    A_init: np.ndarray
    edge_type: Optional[np.ndarray] = None
    node_type: Optional[np.ndarray] = None
    node_att: bool = False
    edge_att: bool = False
    num_types: int = 5
    edge_num: int = 15
    coff_embedding: int = 4
    adaptive: bool = True
    attention: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        K, V, _ = self.A_init.shape
        n, t, v, c = x.shape
        inter_c = self.out_channels // self.coff_embedding
        P, E = self.num_types, self.edge_num

        y = None
        if self.adaptive:
            A = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
            alpha = self.param("alpha", nn.initializers.zeros_init(), (1,))
            for i in range(K):
                if self.node_att:
                    # per-node-type Q/K channels, gathered per joint
                    # (gcn.py:573-581)
                    a = PointConv(inter_c * P, name=f"conv_a{i}",
                                  kernel_init=kaiming_normal_fan_out(),
                                  bias_init=nn.initializers.zeros_init())(x)
                    b = PointConv(inter_c * P, name=f"conv_b{i}",
                                  kernel_init=kaiming_normal_fan_out(),
                                  bias_init=nn.initializers.zeros_init())(x)
                    a = a.reshape(n, t, v, inter_c, P)
                    b = b.reshape(n, t, v, inter_c, P)
                    a = jnp.moveaxis(a, 2, -1)     # (n,t,inter,P,V)
                    b = jnp.moveaxis(b, 2, -1)
                    a = _type_gather(a, self.node_type, type_axis=3)  # (n,t,inter,V)
                    b = _type_gather(b, self.node_type, type_axis=3)
                    a = jnp.moveaxis(a, -1, 2)     # (n,t,V,inter)
                    b = jnp.moveaxis(b, -1, 2)
                else:
                    a = PointConv(inter_c, name=f"conv_a{i}",
                                  kernel_init=kaiming_normal_fan_out(),
                                  bias_init=nn.initializers.zeros_init())(x)
                    b = PointConv(inter_c, name=f"conv_b{i}",
                                  kernel_init=kaiming_normal_fan_out(),
                                  bias_init=nn.initializers.zeros_init())(x)
                g = jnp.tanh(jnp.einsum("ntvc,ntwc->nvw", a, b,
                                        preferred_element_type=accum_dtype(x.dtype))
                             / (inter_c * t)).astype(x.dtype)
                if self.edge_att:
                    # expand to edge_num classes via a 1->E conv on the (V, V)
                    # graph and keep each edge's class (gcn.py:582-593)
                    es = PointConv(E, name=f"conv_edge{i}",
                                   kernel_init=kaiming_normal_fan_out(),
                                   bias_init=nn.initializers.zeros_init())(
                                       g[..., None])          # (n,V,V,E)
                    es = jnp.moveaxis(es, -1, 1)              # (n,E,V,V)
                    g = _edge_class_select(es, self.edge_type)  # (n,V,V)
                Ai = A[i] + g * alpha[0]
                z = jnp.einsum("ntvc,nvw->ntwc", x, Ai,
                               preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
                z = PointConv(self.out_channels, name=f"conv_d{i}",
                              kernel_init=branch_init(K))(z)
                y = z if y is None else y + z
        else:
            A = jnp.asarray(self.A_init, jnp.float32)
            for i in range(K):
                z = jnp.einsum("ntvc,vw->ntwc", x, A[i],
                               preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
                z = PointConv(self.out_channels, name=f"conv_d{i}",
                              kernel_init=branch_init(K))(z)
                y = z if y is None else y + z

        if c != self.out_channels:
            r = PointConv(self.out_channels, name="down_conv",
                          kernel_init=kaiming_normal_fan_out())(x)
            res = BatchNorm(name="down_bn")(r, use_running_average=not train)
        else:
            res = x
        y = BatchNorm(name="bn", scale_init=bn_scale_init(1e-6))(
            y, use_running_average=not train)
        y = jax.nn.relu(y + res)
        if self.attention:
            y = AttentionChain(self.out_channels, name="att")(y)
        return y


class CTRGC(nn.Module):
    """Channel-wise topology refinement unit (reference CTRGC, gcn.py:634-659)."""
    in_channels: int
    out_channels: int
    rel_reduction: int = 8

    @nn.compact
    def __call__(self, x: Array, A: Optional[Array], alpha: Array) -> Array:
        rel = 8 if self.in_channels <= 16 else self.in_channels // self.rel_reduction
        ki = kaiming_normal_fan_out()
        zb = nn.initializers.zeros_init()
        x1 = PointConv(rel, name="conv1", kernel_init=ki, bias_init=zb)(x).mean(axis=1)  # (N,V,R)
        x2 = PointConv(rel, name="conv2", kernel_init=ki, bias_init=zb)(x).mean(axis=1)
        x3 = PointConv(self.out_channels, name="conv3", kernel_init=ki, bias_init=zb)(x)
        # (N, U, W, R): pairwise channel-difference topology (gcn.py:655)
        diff = jnp.tanh(x1[:, :, None, :] - x2[:, None, :, :])
        g = PointConv(self.out_channels, name="conv4", kernel_init=ki, bias_init=zb)(diff)
        g = g * alpha + (A[None, :, :, None] if A is not None else 0.0)
        # reference einsum('ncuv,nctu->nctv') (gcn.py:658)
        return jnp.einsum("nuwc,ntuc->ntwc", g, x3,
                          preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)


class CTRHGC(nn.Module):
    """Semantic CTR-GC unit (reference CTRHGC, gcn.py:668-776): per-node-type
    Q/K, per-edge-class attention over the diff topology, target-specific
    per-type value conv, optional global ada graph."""
    in_channels: int
    out_channels: int
    edge_type: Optional[np.ndarray] = None
    node_type: Optional[np.ndarray] = None
    rel_reduction: int = 8
    node_attention: bool = True
    edge_attention: bool = False
    target_specific: bool = False
    full_channels: bool = False
    add_type: bool = False
    ada: bool = False
    num_types: int = 5
    edge_num: int = 15
    semantic_index: bool = False

    @nn.compact
    def __call__(self, x: Array, A: Optional[Array], alpha: Array) -> Array:
        n, t, v, c = x.shape
        rel = 8 if self.in_channels <= 16 else self.in_channels // self.rel_reduction
        P, E = self.num_types, self.edge_num
        ki = kaiming_normal_fan_out()
        zb = nn.initializers.zeros_init()
        node_att = self.node_attention and self.semantic_index
        edge_att = self.edge_attention and self.semantic_index
        tgt = self.target_specific and self.semantic_index

        qk_feats = rel * (P if node_att else 1)
        x1 = PointConv(qk_feats, name="conv1", kernel_init=ki, bias_init=zb)(x)
        x2 = PointConv(qk_feats, name="conv2", kernel_init=ki, bias_init=zb)(x)
        x3 = PointConv(self.out_channels, name="conv3", kernel_init=ki,
                       bias_init=zb)(x)
        if node_att:
            # (gcn.py:727-730): gather own-type channels per joint, then T-mean
            def gather(arr):
                a = arr.reshape(n, t, v, rel, P)
                a = jnp.moveaxis(a, 2, -1)                 # (n,t,rel,P,V)
                a = _type_gather(a, self.node_type, type_axis=3)
                return a.mean(axis=1)                      # (n,rel,V)
            x1, x2 = gather(x1), gather(x2)
        else:
            x1 = jnp.moveaxis(x1.mean(axis=1), 1, 2)       # (n,rel,V)
            x2 = jnp.moveaxis(x2.mean(axis=1), 1, 2)

        diff = jnp.tanh(x1[..., :, None] - x2[..., None, :])   # (n,rel,V,V)
        conv4 = PointConv(self.out_channels, name="conv4", kernel_init=ki,
                          bias_init=zb)
        if edge_att:
            # (gcn.py:736-749): expand diff to edge classes, static select;
            # conv4 is SHARED between the class-merge and add_type paths
            out_f = self.out_channels if self.full_channels else rel
            d = jnp.moveaxis(diff, 1, -1)                  # (n,V,V,rel)
            es = PointConv(E * out_f, name="edge_att_conv", kernel_init=ki,
                           bias_init=zb)(d)
            es = es.reshape(n, v, v, E, out_f)
            es = jnp.transpose(es, (0, 4, 3, 1, 2))        # (n,out_f,E,V,V)
            ea = _edge_class_select(es, self.edge_type)    # (n,out_f,V,V)
            if not self.full_channels:
                ea = jnp.moveaxis(conv4(jnp.moveaxis(ea, 1, -1)), -1, 1)
            if self.add_type:
                ea = ea + jnp.moveaxis(conv4(jnp.moveaxis(diff, 1, -1)), -1, 1)
            edge_graph = ea
        else:
            edge_graph = jnp.moveaxis(conv4(jnp.moveaxis(diff, 1, -1)), -1, 1)

        G = edge_graph * alpha + (A[None, None] if A is not None else 0.0)
        if self.ada:
            beta = self.param("beta", nn.initializers.zeros_init(), (1,))
            ada_graph = jnp.einsum("ncv,ncw->nvw", x1, x2)[:, None]
            G = ada_graph * beta[0] + G

        if tgt:
            # per-node-type value conv, gathered per joint (gcn.py:762-766)
            xn = PointConv(P * self.out_channels, name="nodeconv",
                           kernel_init=ki, bias_init=zb)(x)
            xn = xn.reshape(n, t, v, P, self.out_channels)
            xn = jnp.moveaxis(xn, 2, -1)                   # (n,t,P,out,V)
            xn = _type_gather(xn, self.node_type, type_axis=2)  # (n,t,out,V)
            x3 = x3 + jnp.moveaxis(xn, 2, -1)              # -> (n,t,V,out)

        # reference einsum('ncuv,nctu->nctv') (gcn.py:768)
        return jnp.einsum("ncuw,ntuc->ntwc", G, x3,
                          preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)


class UnitCTRHGCN(nn.Module):
    """K-subset semantic CTR-GC wrapper (reference unit_ctrhgcn,
    gcn.py:778-880).

    Reproduces the reference's branch-toggle quirk: the loop's local-variable
    shadowing (gcn.py:807-836) means branch 0 runs with node_attention forced
    False and the given edge_attention, branches 1+ with both False.
    """
    in_channels: int
    out_channels: int
    A_init: np.ndarray
    edge_type: Optional[np.ndarray] = None
    node_type: Optional[np.ndarray] = None
    semantic_index: bool = False
    rel_reduction: int = 8
    node_attention: bool = False
    edge_attention: bool = False
    target_specific: bool = False
    full_channels: bool = False
    add_type: bool = False
    ada: bool = False
    num_types: int = 5
    edge_num: int = 15

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        K = self.A_init.shape[0]
        A = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
        alpha = self.param("alpha", nn.initializers.zeros_init(), (K,))
        y = None
        for i in range(K):
            node_att = False                       # forced off for all i
            edge_att = self.edge_attention if i == 0 else False
            z = CTRHGC(self.in_channels, self.out_channels,
                       edge_type=self.edge_type, node_type=self.node_type,
                       rel_reduction=self.rel_reduction,
                       node_attention=node_att, edge_attention=edge_att,
                       target_specific=self.target_specific,
                       full_channels=self.full_channels,
                       add_type=self.add_type, ada=self.ada,
                       num_types=self.num_types, edge_num=self.edge_num,
                       semantic_index=self.semantic_index,
                       name=f"convs{i}")(x, A[i], alpha[i])
            y = z if y is None else y + z
        y = BatchNorm(name="bn", scale_init=bn_scale_init(1e-6))(
            y, use_running_average=not train)
        if self.in_channels != self.out_channels:
            r = PointConv(self.out_channels, name="down_conv")(x)
            res = BatchNorm(name="down_bn")(r, use_running_average=not train)
        else:
            res = x
        return jax.nn.relu(y + res)


class UnitCTRGCN(nn.Module):
    """K-subset CTR-GC wrapper (reference unit_ctrgcn, gcn.py:882-929)."""
    in_channels: int
    out_channels: int
    A_init: np.ndarray

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        K = self.A_init.shape[0]
        A = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
        alpha = self.param("alpha", nn.initializers.zeros_init(), (1,))
        y = None
        for i in range(K):
            z = CTRGC(self.in_channels, self.out_channels, name=f"convs{i}")(
                x, A[i], alpha[0])
            y = z if y is None else y + z
        y = BatchNorm(name="bn", scale_init=bn_scale_init(1e-6))(
            y, use_running_average=not train)
        if self.in_channels != self.out_channels:
            r = PointConv(self.out_channels, name="down_conv")(x)
            res = BatchNorm(name="down_bn")(r, use_running_average=not train)
        else:
            res = x
        return jax.nn.relu(y + res)


class DGGCN(nn.Module):
    """DG-STGCN dynamic-group GCN (reference dggcn, gcn.py:1445-1584).

    CTR branch: channel-wise diff graph; ADA branch: frame/sample outer-product
    graph; both added to the trained A with per-subset gates alpha/beta.
    """
    out_channels: int
    A_init: np.ndarray
    ratio: Optional[float] = 0.25
    ctr: Optional[str] = "T"       # None | 'NA' | 'T'
    ada: Optional[str] = "T"
    subset_wise: bool = False
    ada_act: str = "softmax"
    ctr_act: str = "tanh"
    use_pallas: bool = False       # fused VMEM graph-build+aggregate kernel
    pallas_interpret: bool = False
    # eval-time kernel choice, decided by END-TO-END model A/B on v5e
    # (benchmarks/dyn_kernel_ab.py — in-isolation kernel rankings invert
    # inside the model):
    #   'bd'    block-diagonal dense-matmul aggregation (pallas/bd_agg.py);
    #           pre/post stay XLA flat matmuls.  Wins every dsgcn (K=3)
    #           stage: 967 vs 686 fps b16 against mega, despite losing the
    #           isolated-kernel probe at the wide stage.
    #   'bdps'  per-subset bd (K folded into the grid batch dim) — the
    #           bounded-inflation form for K=8 widths; e2e ~= fused on
    #           dgstgcn (530 fps b16), kept as an explicit option.
    #   'mega'  whole-block kernel (pallas/dggcn_block.py), minimum HBM
    #           traffic but serialized skinny aggregation matmuls.
    #   'fused' graph-build+aggregate kernel (pallas/dyn_graph.py) with XLA
    #           pre/post.  Wins dgstgcn (K=8): 577/703 fps b16/b256 vs
    #           mega's 529/663.
    #   'auto'  bd while the full-BD matmul dim V*K*mid stays MXU-friendly
    #           (<= 2400, i.e. every K=3 stage), else fused.
    eval_kernel: str = "auto"
    graph_axis: Optional[str] = None   # joint-partition mesh axis
    # joint-padded eval mode (VERDICT r4 #3): the input arrives zero-padded
    # to v_pad joints (32 for NTU's 25 — the f32 sublane tile), A/gates stay
    # at their trained V=25 shapes and are padded at trace time, pre_x is
    # masked at the padded joints and the ada softmax source-masks them
    # in-kernel, so aggregation is EXACT on the real joints (reference
    # gcn.py:2341-2361) while every V-dim HBM tensor moves at the aligned
    # 244 GB/s copy floor instead of 139 GB/s (README roofline).
    v_pad: int = 0

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        K, V, _ = self.A_init.shape
        n, t, v, c = x.shape
        if self.v_pad:
            assert not train and self.graph_axis is None and v == self.v_pad \
                and V <= v, (self.v_pad, v, V, train)
        ratio = self.ratio if self.ratio is not None else 1.0 / K
        mid = int(ratio * self.out_channels)

        if c != self.out_channels:
            r = PointConv(self.out_channels, name="down_conv")(x)
            res = BatchNorm(name="down_bn", axis_name=self.graph_axis)(
                r, use_running_average=not train)
        else:
            res = x

        A_param = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
        if self.v_pad and v > V:
            # pad at trace time: the param tree keeps the trained (K, V, V)
            A_use = jnp.zeros((K, v, v), A_param.dtype).at[:, :V, :V] \
                .set(A_param)
        else:
            A_use = A_param
        # graph accumulator in reference shape (N, K, Cq, Tq, V, V)
        A6 = A_use[None, :, None, None]

        pre = PointConv(mid * K, name="pre_conv")(x)
        pre = BatchNorm(name="pre_bn", axis_name=self.graph_axis)(
            pre, use_running_average=not train)
        pre = jax.nn.relu(pre)
        if self.v_pad and v > V:
            # zero the padded joints' values: their contribution to every
            # aggregation target must vanish (conv bias + BN affine made
            # them nonzero).  Fuses into the relu above.
            vmask = jnp.asarray(np.arange(v) < V, x.dtype)
            pre = pre * vmask[None, None, :, None]
        pre_x = pre.reshape(n, t, v, K, mid)

        alpha = self.param("alpha", nn.initializers.zeros_init(), (K,))
        beta = self.param("beta", nn.initializers.zeros_init(), (K,))

        if self.graph_axis is not None:
            assert self.ctr == "T" and self.ada == "T" and \
                self.ctr_act == "tanh" and self.ada_act == "softmax", \
                "joint-partition mode supports the standard ctr/ada='T' form"
            y = self._jp_aggregate(x, pre_x, A_param, alpha, beta, K, mid,
                                   train)
            y = PointConv(self.out_channels, name="post_conv")(y)
            y = BatchNorm(name="bn", axis_name=self.graph_axis)(
                y, use_running_average=not train)
            return jax.nn.relu(y + res)

        x1 = x2 = None
        if self.ctr is not None or self.ada is not None:
            tmp = x
            if not (self.ctr == "NA" or self.ada == "NA"):
                tmp = tmp.mean(axis=1, keepdims=True)     # (N, 1, V, C)
            tq = tmp.shape[1]
            x1 = PointConv(mid * K, name="conv1")(tmp).reshape(n, tq, v, K, mid)
            x2 = PointConv(mid * K, name="conv2")(tmp).reshape(n, tq, v, K, mid)
            # to reference layout (N, K, C, Tq, V)
            x1 = jnp.transpose(x1, (0, 3, 4, 1, 2))
            x2 = jnp.transpose(x2, (0, 3, 4, 1, 2))

        if (self.use_pallas and self.ctr == "T" and self.ada == "T"
                and self.ctr_act == "tanh" and self.ada_act == "softmax"):
            from .pallas.dyn_graph import fused_dyn_graph_agg
            a_vec = _gate_vec(alpha, K, 0, K, self.subset_wise)
            b_vec = _gate_vec(beta, K, 0, K, self.subset_wise)
            is_eval = not train and not self.is_initializing()
            v_real = V if (self.v_pad and v > V) else -1
            ek = self.eval_kernel
            if ek == "auto":
                # bd while the densified matmul stays MXU-friendly; at the
                # widest K=8 stage (Cm=64, T=25) grouped-bd (g=32) beats the
                # fused kernel 60 vs 100 us/sample (MXU fill at 25 rows caps
                # the factored form); elsewhere fused wins e2e.  Dispatch by
                # the REAL joint count — padding must not flip the measured
                # kernel choice.
                if V * K * mid <= 2400:
                    ek = "bd"
                elif mid >= 64:
                    ek = "bdg"
                else:
                    ek = "fused"
            if is_eval and ek == "mega":
                if v_real > 0:
                    raise ValueError(
                        "eval_kernel='mega' does not support joint-padded "
                        "mode (v_pad); use 'auto'/'bd'/'fused'")
                # eval: whole block in one kernel (the pre_x/res tensors
                # computed above become dead code and DCE away)
                from .pallas.dggcn_block import fused_dggcn_block_eval
                w_pre, b_pre, w_post, b_post, w_down, b_down = \
                    _fold_block_params(self, c != self.out_channels)
                return fused_dggcn_block_eval(
                    x, x1[..., 0, :], x2[..., 0, :], w_pre, b_pre, A_param,
                    a_vec, b_vec, w_post, b_post, w_down, b_down,
                    K=K, Cm=mid, interpret=self.pallas_interpret)
            if is_eval and ek in ("bd", "bdps", "bdg"):
                # 'bd': one dense MXU-shaped aggregation matmul;
                # 'bdps'/'bdg': K (and for bdg channel groups of size g=32)
                # folded into the grid batch dim — the bounded-inflation
                # forms at dgstgcn's K=8 widths where full-BD's K*Cm-fold
                # FLOP inflation explodes
                from .pallas.bd_agg import (bd_dyn_graph_agg,
                                            bd_dyn_graph_agg_subset)
                x1t = jnp.transpose(x1[..., 0, :], (0, 1, 3, 2))
                kwg = {}
                if ek != "bd":
                    fn = bd_dyn_graph_agg_subset
                    if ek == "bdg":
                        kwg["g"] = min(32, mid)
                else:
                    fn = bd_dyn_graph_agg
                y = fn(
                    pre_x.reshape(n, t, v * K * mid), x1t, x2[..., 0, :],
                    A_use, a_vec, b_vec, K=K, Cm=mid, **kwg, v_real=v_real,
                    interpret=self.pallas_interpret).reshape(n, t, v, K * mid)
            elif (is_eval and ek == "fusedpre" and not self.v_pad
                  and c >= 64):
                # OPT-IN (measured SLOWER e2e on v5e: dgstgcn 524/774 fps
                # b16/b64 vs 710/827 with the plain fused kernel): the
                # IN-KERNEL pre-conv variant computes pre = relu(BN(conv(x)))
                # inside the kernel from BN-folded weights, so the
                # (N, T, V, K*mid) pre tensor never round-trips HBM — but
                # the per-tile (Tt*V, C)x(C, K*mid) matmul serializes
                # against the block DMA and loses more than the saved
                # traffic, while XLA's separate pre-conv runs as one big
                # fused batched matmul.  Kept as a tested option (interpret
                # parity in tests/test_pallas_module_integration.py) — the
                # arithmetic may flip on hardware with different DMA/MXU
                # ratios.  (c >= 64: at the 3-channel stem the x block's
                # 3-lane DMA costs more than the saved pre round-trip.)
                from .pallas.dyn_graph import fused_dyn_graph_agg_eval
                from .pallas.ms_tcn import fold_bn
                sbn = self.scope.push("pre_bn", reuse=True) \
                    .push("bn", reuse=True)
                a_f, b_f = fold_bn(sbn.get_variable("params", "scale"),
                                   sbn.get_variable("params", "bias"),
                                   sbn.get_variable("batch_stats", "mean"),
                                   sbn.get_variable("batch_stats", "var"))
                spc = self.scope.push("pre_conv", reuse=True)
                w_p = spc.get_variable("params", "kernel")
                b_p = spc.get_variable("params", "bias")
                w_p = (w_p * a_f[None]).astype(x.dtype)
                b_p = (b_p * a_f + b_f).astype(jnp.float32)
                y = fused_dyn_graph_agg_eval(
                    x, w_p, b_p, x1[..., 0, :], x2[..., 0, :], A_use,
                    a_vec, b_vec, K=K, Cm=mid,
                    interpret=self.pallas_interpret)
            else:
                y = fused_dyn_graph_agg(
                    pre_x.reshape(n, t, v, K * mid), x1[..., 0, :],
                    x2[..., 0, :], A_use, a_vec, b_vec, None, None, None,
                    K, mid, -1, 15, self.pallas_interpret, v_real)
            y = PointConv(self.out_channels, name="post_conv")(y)
            y = BatchNorm(name="bn")(y, use_running_average=not train)
            return jax.nn.relu(y + res)

        if self.ctr is not None:
            diff = x1[..., :, None] - x2[..., None, :]    # (N,K,C,Tq,V,V)
            g = ACTS[self.ctr_act](diff)
            g = g * (alpha[None, :, None, None, None, None] if self.subset_wise
                     else alpha[0])
            A6 = g + A6

        if self.ada is not None:
            # einsum('nkctv,nkctw->nktvw') (gcn.py:1551)
            g = jnp.einsum("nkctv,nkctw->nktvw", x1, x2,
                           preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
            g = g[:, :, None]                              # (N,K,1,Tq,V,V)
            if self.v_pad and v > V and self.ada_act == "softmax":
                # joint-padded mode: padded sources out of the softmax
                src = jax.lax.broadcasted_iota(jnp.int32, g.shape, g.ndim - 2)
                g = jnp.where(src < V, g, jnp.asarray(-1e30, g.dtype))
            g = ACTS[self.ada_act](g)
            g = g * (beta[None, :, None, None, None, None] if self.subset_wise
                     else beta[0])
            A6 = g + A6

        self.sow("intermediates", "dynamic_graph", A6)
        y = _dispatch_contract(pre_x, A6, self.ctr, self.ada)
        y = y.reshape(n, t, v, K * mid)
        y = PointConv(self.out_channels, name="post_conv")(y)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        return jax.nn.relu(y + res)

    def _jp_aggregate(self, x, pre_x, A_param, alpha, beta, K, mid, train):
        """Joint-partitioned dynamic-graph build + ring aggregation.

        Runs inside shard_map with the joint axis sharded over
        ``self.graph_axis`` (shard count must divide V — 5 or 25 for NTU).
        Queries x1 are all-gathered (tiny: (N, K, mid, V)); the large pre_x
        tensor never replicates — it circulates the ring while each device
        builds only the (Vsrc, Wlocal) chunk of the per-sample dynamic graph
        it is about to contract (diff/ADA graphs, reference gcn.py:2296-2361),
        overlapping the ppermute with the chunk contraction.
        """
        axis = self.graph_axis
        G = jax.lax.axis_size(axis)
        g = jax.lax.axis_index(axis)
        n, t, vl, _, _ = pre_x.shape
        V = A_param.shape[-1]
        assert vl * G == V, (vl, G, V)

        tmp = x.mean(axis=1, keepdims=True)               # (N, 1, Vl, C)
        x1 = PointConv(mid * K, name="conv1")(tmp).reshape(n, vl, K, mid)
        x2 = PointConv(mid * K, name="conv2")(tmp).reshape(n, vl, K, mid)
        x1 = jnp.transpose(x1, (0, 2, 3, 1))              # (N, K, mid, Vl)
        x2 = jnp.transpose(x2, (0, 2, 3, 1))
        x1f = jax.lax.all_gather(x1, axis, axis=-1, tiled=True)  # (N,K,mid,V)

        # ADA graph: softmax over the full source axis, local target columns
        raw = jnp.einsum("nkcv,nkcw->nkvw", x1f, x2,
                         preferred_element_type=accum_dtype(x.dtype))
        ada = jax.nn.softmax(raw, axis=-2).astype(x.dtype)  # (N, K, V, Wl)
        A_cols = jax.lax.dynamic_slice_in_dim(
            A_param, g * vl, vl, axis=2).astype(x.dtype)    # (K, V, Wl)

        if self.subset_wise:
            al = alpha[None, :, None, None, None]
            be = beta[None, :, None, None]
        else:
            al, be = alpha[0], beta[0]

        perm = [(j, (j - 1) % G) for j in range(G)]

        def step(i, carry):
            y, pre_cur = carry                       # pre_cur from (g+i)%G
            src = (g + i) % G
            x1_src = jax.lax.dynamic_slice_in_dim(x1f, src * vl, vl, axis=-1)
            ctr = jnp.tanh(x1_src[..., :, None] - x2[..., None, :])
            ada_src = jax.lax.dynamic_slice_in_dim(ada, src * vl, vl, axis=-2)
            A_src = jax.lax.dynamic_slice_in_dim(A_cols, src * vl, vl, axis=1)
            Gc = ctr * al + (ada_src * be + A_src[None])[:, :, None]
            # issue the transfer, then contract the chunk we already hold
            pre_next = jax.lax.ppermute(pre_cur, axis, perm)
            y = y + jnp.einsum(
                "ntvkc,nkcvw->ntwkc", pre_cur, Gc,
                preferred_element_type=accum_dtype(x.dtype))
            return y, pre_next

        # accumulate the ring in the accum dtype and cast ONCE after the
        # loop: a bf16 carry would take G roundings vs the unsharded single
        # f32-accumulated contraction (ADVICE r3)
        y0 = jnp.zeros((n, t, vl, K, mid), accum_dtype(x.dtype))
        y, _ = jax.lax.fori_loop(0, G, step, (y0, pre_x))
        return y.astype(x.dtype).reshape(n, t, vl, K * mid)


def _dispatch_contract(pre_x: Array, A6: Array, ctr, ada) -> Array:
    """The reference 4-way einsum dispatch on graph dims (gcn.py:1560-1580).

    pre_x: (N, T, V, K, C); A6: (N, K, Cq, Tq, V, V) with Cq in {1, C}, Tq in {1, T}.
    Returns (N, T, W, K, C).
    """
    if ctr is None and ada is None:
        A = A6[0, :, 0, 0]                                   # (K, V, V)
        return jnp.einsum("ntvkc,kvw->ntwkc", pre_x, A,
                          preferred_element_type=accum_dtype(pre_x.dtype)).astype(pre_x.dtype)
    cq, tq = A6.shape[2], A6.shape[3]
    if cq == 1 and tq == 1:
        A = A6[:, :, 0, 0]                                   # (N, K, V, V)
        out = jnp.einsum("ntvkc,nkvw->ntwkc", pre_x, A,
                         preferred_element_type=accum_dtype(pre_x.dtype))
    elif cq == 1:
        A = A6[:, :, 0]                                      # (N, K, T, V, V)
        out = jnp.einsum("ntvkc,nktvw->ntwkc", pre_x, A,
                         preferred_element_type=accum_dtype(pre_x.dtype))
    elif tq == 1:
        A = A6[:, :, :, 0]                                   # (N, K, C, V, V)
        out = jnp.einsum("ntvkc,nkcvw->ntwkc", pre_x, A,
                         preferred_element_type=accum_dtype(pre_x.dtype))
    else:
        out = jnp.einsum("ntvkc,nkctvw->ntwkc", pre_x, A6,
                         preferred_element_type=accum_dtype(pre_x.dtype))
    return out.astype(pre_x.dtype)


class DGHGCN(nn.Module):
    """Semantic DG-GCN without subset decomposition (reference dghgcn,
    gcn.py:1586-1806) — the DGBlock default gcn_type.  Semantic node/edge
    attentions apply to ALL K subsets; target-specific values are added after
    aggregation (gcn.py:1791-1795)."""
    out_channels: int
    A_init: np.ndarray
    edge_type: Optional[np.ndarray] = None
    node_type: Optional[np.ndarray] = None
    ratio: Optional[float] = 0.25
    ctr: Optional[str] = "T"
    ada: Optional[str] = "T"
    node_attention: bool = False
    edge_attention: bool = False
    ada_attention: bool = False
    target_specific: bool = False
    add_type: bool = False
    num_types: int = 5
    edge_num: int = 15
    subset_wise: bool = False
    ada_act: str = "softmax"
    ctr_act: str = "tanh"

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        K, V, _ = self.A_init.shape
        n, t, v, c = x.shape
        ratio = self.ratio if self.ratio is not None else 1.0 / K
        mid = int(ratio * self.out_channels)
        P, E = self.num_types, self.edge_num

        if c != self.out_channels:
            r = PointConv(self.out_channels, name="down_conv")(x)
            res = BatchNorm(name="down_bn")(r, use_running_average=not train)
        else:
            res = x

        A_param = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
        A6 = A_param[None, :, None, None]
        alpha = self.param("alpha", nn.initializers.zeros_init(), (K,))
        beta = self.param("beta", nn.initializers.zeros_init(), (K,))

        p = PointConv(mid * K, name="pre_conv")(x)
        p = BatchNorm(name="pre_bn")(p, use_running_average=not train)
        pre_x = jax.nn.relu(p).reshape(n, t, v, K, mid)

        x1 = x2 = None
        if self.ctr is not None or self.ada is not None:
            tmp = x
            if not (self.ctr == "NA" or self.ada == "NA"):
                tmp = tmp.mean(axis=1, keepdims=True)
            tq = tmp.shape[1]
            feats = K * mid * (P if self.node_attention else 1)
            x1 = PointConv(feats, name="conv1")(tmp)
            x2 = PointConv(feats, name="conv2")(tmp)
            if self.node_attention:
                # view (n, K, mid, P, T', v) + per-joint type gather
                # (gcn.py:1710-1713)
                def gather(arr):
                    a = arr.reshape(n, tq, v, K, mid, P)
                    a = jnp.moveaxis(a, 2, -1)            # (n,tq,K,mid,P,V)
                    a = _type_gather(a, self.node_type, type_axis=4)
                    return jnp.transpose(a, (0, 2, 3, 1, 4))  # (n,K,mid,tq,V)
                x1, x2 = gather(x1), gather(x2)
            else:
                x1 = jnp.transpose(x1.reshape(n, tq, v, K, mid),
                                   (0, 3, 4, 1, 2))
                x2 = jnp.transpose(x2.reshape(n, tq, v, K, mid),
                                   (0, 3, 4, 1, 2))

        if self.ctr is not None:
            diff = x1[..., :, None] - x2[..., None, :]   # (n,K,mid,tq,V,V)
            if self.edge_attention:
                assert diff.shape[3] == 1
                d2 = jnp.moveaxis(diff[:, :, :, 0].reshape(n, K * mid, V, V),
                                  1, -1)                 # (n,V,V,K*mid)
                es = PointConv(E * K * mid, name="edge_linears")(d2)
                es = es.reshape(n, V, V, K, E, mid)
                es = jnp.transpose(es, (0, 3, 5, 4, 1, 2))   # (n,K,mid,E,V,V)
                ea = _edge_class_select(es, self.edge_type)  # (n,K,mid,V,V)
                g = ea[:, :, :, None]
                if self.add_type:
                    g = diff + g
            else:
                g = diff
            g = ACTS[self.ctr_act](g)
            g = g * (alpha[None, :, None, None, None, None] if self.subset_wise
                     else alpha[0])
            A6 = g + A6

        if self.ada is not None:
            g = jnp.einsum("nkctv,nkctw->nktvw", x1, x2,
                           preferred_element_type=accum_dtype(pre_x.dtype)).astype(x.dtype)
            g = g[:, :, None]
            if self.ada_attention:
                assert g.shape[3] == 1
                gs = jnp.moveaxis(g[:, :, 0, 0], 1, -1)      # (n,V,V,K)
                gs = PointConv(E * K, name="ada_linears")(gs)
                gs = gs.reshape(n, V, V, K, E)
                gs = jnp.transpose(gs, (0, 3, 4, 1, 2))
                g = _edge_class_select(gs, self.edge_type)[:, :, None, None]
            g = ACTS[self.ada_act](g)
            g = g * (beta[None, :, None, None, None, None] if self.subset_wise
                     else beta[0])
            A6 = g + A6

        self.sow("intermediates", "dynamic_graph", A6)
        y = _dispatch_contract(pre_x, A6, self.ctr, self.ada)
        y = y.reshape(n, t, v, K * mid)
        if self.target_specific:
            # per-type output head gathered by joint type (gcn.py:1791-1795)
            xn = PointConv(P * self.out_channels, name="nodeconv")(y)
            xn = xn.reshape(n, t, v, P, self.out_channels)
            xn = jnp.moveaxis(xn, 2, -1)                 # (n,t,P,out,V)
            xn = _type_gather(xn, self.node_type, type_axis=2)
            y = PointConv(self.out_channels, name="post_conv")(y) \
                + jnp.moveaxis(xn, 2, -1)
        else:
            y = PointConv(self.out_channels, name="post_conv")(y)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        return jax.nn.relu(y + res)


class DGPHGCN1(nn.Module):
    """The DS-GCN dynamic *semantic* spatial graph conv (reference dgphgcn1,
    gcn.py:2074-2365) — the paper's core op.

    Adds to DGGCN: subset decomposition into semantic/normal groups, per-node-
    type Q/K projections, per-edge-class attention on the CTR diff graph, and
    optional target-specific values / ada-graph edge attention.  All semantic
    gathers are static (types are compile-time constants).

    Faithfully reproduces reference quirks needed for parity: x2_sem is computed
    with conv1_se (gcn.py:2253-2254) and concatenated into x2 as x1_sem
    (gcn.py:2272); the edge-attention diff uses the *last normal* subset slice
    [norm_num-sem : norm_num] (gcn.py:2279).
    """
    out_channels: int
    A_init: np.ndarray
    edge_type: np.ndarray            # (V, V) int classes
    node_type: np.ndarray            # (V,) int part ids
    ratio: Optional[float] = 0.125
    decompose: bool = False
    ctr: Optional[str] = "T"
    ada: Optional[str] = "T"
    node_attention: bool = False
    edge_attention: bool = False
    ada_attention: bool = False
    target_specific: bool = False
    add_type: bool = False
    sub_att: bool = True
    stage: bool = True
    num_types: int = 5
    edge_num: int = 15
    subset_wise: bool = True
    ada_act: str = "softmax"
    ctr_act: str = "tanh"
    use_pallas: bool = False       # fused VMEM graph-build+aggregate kernel
    pallas_interpret: bool = False
    eval_kernel: str = "auto"      # 'bd' | 'mega' | 'auto' — see DGGCN
    graph_axis: Optional[str] = None   # joint-partition mesh axis
    v_pad: int = 0                 # joint-padded eval mode — see DGGCN.v_pad

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        node_attention, edge_attention = self.node_attention, self.edge_attention
        target_specific, decompose = self.target_specific, self.decompose
        subset_wise = self.subset_wise
        if not self.stage:   # gcn.py:2122-2127
            node_attention = edge_attention = target_specific = decompose = False
            subset_wise = False

        K, V, _ = self.A_init.shape
        n, t, v, c = x.shape
        if self.v_pad:
            assert not train and self.graph_axis is None and v == self.v_pad \
                and V <= v, (self.v_pad, v, V, train)
        padded = bool(self.v_pad) and v > V
        # padded joints carry node type 0 — their Q/K/value gathers are
        # arbitrary but masked out of every aggregation (pre_x zeroed below,
        # ada softmax source-masked in-kernel)
        node_type_use = (np.concatenate(
            [np.asarray(self.node_type), np.zeros(v - V, np.int64)])
            if padded and self.node_type is not None
            else self.node_type)
        ratio = self.ratio if self.ratio is not None else 1.0 / K
        mid = int(ratio * self.out_channels)
        P, E = self.num_types, self.edge_num

        if decompose:
            sem = math.ceil(K / 3)
            norm = K - sem
        else:
            sem, norm = 0, K

        if c != self.out_channels:
            r = PointConv(self.out_channels, name="down_conv")(x)
            res = BatchNorm(name="down_bn", axis_name=self.graph_axis)(
                r, use_running_average=not train)
        else:
            res = x

        A_param = self.param("A", lambda k: jnp.asarray(self.A_init, jnp.float32))
        if padded:
            A_use = jnp.zeros((K, v, v), A_param.dtype).at[:, :V, :V] \
                .set(A_param)
        else:
            A_use = A_param
        A6 = A_use[None, :, None, None]

        n_gates = K if self.sub_att else 3
        alpha = self.param("alpha", nn.initializers.zeros_init(), (n_gates,))
        beta = self.param("beta", nn.initializers.zeros_init(), (n_gates,))

        # ---- values (pre_x) -------------------------------------------------
        if target_specific and decompose:
            # gcn.py:2228-2234: per-node-type value conv for the semantic subsets
            xn = PointConv(sem * P * mid, name="nodeconv_conv")(x)
            xn = BatchNorm(name="nodeconv_bn")(xn, use_running_average=not train)
            xn = jax.nn.relu(xn)
            xn = xn.reshape(n, t, v, sem, P, mid)
            xn = jnp.moveaxis(xn, 2, -1)                      # (n,t,sem,P,mid,V)
            xn = _type_gather(xn, node_type_use, type_axis=3)  # (n,t,sem,mid,V)
            xn = jnp.moveaxis(xn, -1, 2)                      # (n,t,V,sem,mid)
            xr = PointConv(norm * mid, name="pre_conv")(x)
            xr = BatchNorm(name="pre_bn")(xr, use_running_average=not train)
            xr = jax.nn.relu(xr).reshape(n, t, v, norm, mid)
            pre_x = jnp.concatenate([xn, xr], axis=3)         # order: (sem?, norm) — gcn.py:2234
        else:
            p = PointConv(mid * K, name="pre_conv")(x)
            p = BatchNorm(name="pre_bn", axis_name=self.graph_axis)(
                p, use_running_average=not train)
            pre_x = jax.nn.relu(p).reshape(n, t, v, K, mid)
        if padded:
            # zero the padded joints' values (see DGGCN.v_pad)
            vmask = jnp.asarray(np.arange(v) < V, x.dtype)
            pre_x = pre_x * vmask[None, None, :, None, None]

        # ---- joint-partition (graph-axis) path ------------------------------
        if self.graph_axis is not None:
            assert (self.ctr == "T" and self.ada == "T"
                    and not self.ada_attention
                    and not (target_specific and decompose)
                    and self.ctr_act == "tanh"
                    and self.ada_act == "softmax"), \
                "joint-partition mode supports the flagship DS-GCN form " \
                "(ctr/ada='T', tanh/softmax, no ada_attention/target_specific)"
            y = self._jp_aggregate(x, pre_x, A_param, alpha, beta, K, mid,
                                   sem, norm, node_attention, edge_attention,
                                   subset_wise)
            y = PointConv(self.out_channels, name="post_conv")(y)
            y = BatchNorm(name="bn", axis_name=self.graph_axis)(
                y, use_running_average=not train)
            return jax.nn.relu(y + res)

        # ---- queries/keys ---------------------------------------------------
        x1 = x2 = None
        if self.ctr is not None or self.ada is not None:
            tmp = x
            if not (self.ctr == "NA" or self.ada == "NA"):
                tmp = tmp.mean(axis=1, keepdims=True)
            tq = tmp.shape[1]
            x1n = PointConv(norm * mid, name="conv1")(tmp).reshape(n, tq, v, norm, mid)
            x2n = PointConv(norm * mid, name="conv2")(tmp).reshape(n, tq, v, norm, mid)
            # -> reference layout (N, K', C, Tq, V)
            x1n = jnp.transpose(x1n, (0, 3, 4, 1, 2))
            x2n = jnp.transpose(x2n, (0, 3, 4, 1, 2))
            if decompose:
                conv1_se = PointConv(sem * mid * (P if node_attention else 1),
                                     name="conv1_se")
                # reference bug kept: x2_sem also uses conv1_se (gcn.py:2253-2254)
                x1s = conv1_se(tmp)
                x2s = x1s
                if node_attention:
                    x1s = x1s.reshape(n, tq, v, sem, mid, P)
                    x1s = jnp.moveaxis(x1s, 2, -1)            # (n,tq,sem,mid,P,V)
                    x1s = _type_gather(x1s, node_type_use, type_axis=4)  # (n,tq,sem,mid,V)
                    x1s = jnp.transpose(x1s, (0, 2, 3, 1, 4))  # (n,sem,mid,tq,V)
                    x2s = x1s
                else:
                    x1s = x1s.reshape(n, tq, v, sem, mid)
                    x1s = jnp.transpose(x1s, (0, 3, 4, 1, 2))
                    x2s = x1s
                x1 = jnp.concatenate([x1n, x1s], axis=1)      # (N, K, mid, tq, V)
                # reference concatenates x1_sem into x2 too (gcn.py:2272)
                x2 = jnp.concatenate([x2n, x1s], axis=1)
            else:
                x1, x2 = x1n, x2n

        # ---- fused Pallas path (graph build + aggregation in VMEM) ----------
        active_edge = edge_attention and decompose
        if (self.use_pallas and self.ctr == "T" and self.ada == "T"
                and not self.ada_attention and self.ctr_act == "tanh"
                and self.ada_act == "softmax"
                and (not active_edge or sem == 1)):
            from .pallas.dyn_graph import edge_onehot, fused_dyn_graph_agg
            if active_edge:
                ew, eb = _ConvParams(mid, E * mid, name="edge_linears")()
                sel_np = edge_onehot(np.asarray(self.edge_type), E)
                if padded:
                    # padded joints select no edge class: their ea entries
                    # collapse to the bias field, and their aggregation
                    # contributions are already masked via pre_x
                    sel_np = np.pad(sel_np,
                                    ((0, 0), (0, v - V), (0, v - V)))
                sel = jnp.asarray(sel_np)
                edge_k = norm - sem
            else:
                ew = eb = sel = None
                edge_k = -1
            a_vec = _gate_vec(alpha, K, sem, norm, subset_wise)
            b_vec = _gate_vec(beta, K, sem, norm, subset_wise)
            is_eval = not train and not self.is_initializing()
            v_real = V if padded else -1
            ek = self.eval_kernel
            if ek == "auto":
                # dispatch by the REAL joint count (padding must not flip
                # the measured kernel choice — see DGGCN)
                ek = "bd" if V * K * mid <= 2400 else "fused"
            if padded and ek == "mega":
                raise ValueError(
                    "eval_kernel='mega' does not support joint-padded mode "
                    "(v_pad); use 'auto'/'bd'/'fused'")

            if (is_eval and ek == "mega"
                    and not (target_specific and decompose)):
                # eval: whole block in one kernel (the simple pre_x path and
                # the res/post tensors computed above become dead code and
                # DCE away; the semantic x1/x2 queries stay XLA — tiny)
                from .pallas.dggcn_block import fused_dggcn_block_eval
                w_pre, b_pre, w_post, b_post, w_down, b_down = \
                    _fold_block_params(self, c != self.out_channels)
                return fused_dggcn_block_eval(
                    x, x1[..., 0, :], x2[..., 0, :], w_pre, b_pre, A_param,
                    a_vec, b_vec, w_post, b_post, w_down, b_down,
                    K=K, Cm=mid, edge_w=ew, edge_b=eb, edge_sel=sel,
                    edge_k=edge_k, edge_num=E,
                    interpret=self.pallas_interpret)

            if is_eval and ek == "bd":
                # 'bd' aggregation: pre/post stay XLA; the edge-attention
                # ctr enters via host-projected p1/p2 (linear in the
                # queries) and a constant transposed bias field.  Works for
                # the target_specific pre_x too (it is XLA-built above).
                from .pallas.bd_agg import bd_dyn_graph_agg
                x1t = jnp.transpose(x1[..., 0, :], (0, 1, 3, 2))
                kw = dict(K=K, Cm=mid, edge_k=edge_k, edge_num=E)
                if active_edge:
                    q1 = x1[:, edge_k, :, 0]              # (N, Cm, V)
                    q2 = x2[:, edge_k, :, 0]
                    p1 = jnp.einsum("ncv,cf->nfv", q1, ew).reshape(
                        n, E, mid, v)
                    p2 = jnp.einsum("ncv,cf->nfv", q2, ew).reshape(
                        n, E, mid, v)
                    ebias = jnp.einsum("evw,ec->vcw", sel,
                                       eb.reshape(E, mid))
                    kw.update(p1t=jnp.transpose(p1, (0, 1, 3, 2)), p2=p2,
                              edge_sel=sel, ebias=ebias)
                y = bd_dyn_graph_agg(
                    pre_x.reshape(n, t, v * K * mid), x1t, x2[..., 0, :],
                    A_use, a_vec, b_vec, interpret=self.pallas_interpret,
                    v_real=v_real, **kw).reshape(n, t, v, K * mid)
            else:
                y = fused_dyn_graph_agg(
                    pre_x.reshape(n, t, v, K * mid), x1[..., 0, :],
                    x2[..., 0, :], A_use, a_vec, b_vec, ew, eb, sel, K,
                    mid, edge_k, E, self.pallas_interpret, v_real)
            y = PointConv(self.out_channels, name="post_conv")(y)
            y = BatchNorm(name="bn")(y, use_running_average=not train)
            return jax.nn.relu(y + res)

        if padded:
            raise NotImplementedError(
                "joint-padded mode (v_pad) requires the Pallas eval path "
                "(use_pallas with ctr/ada='T', tanh/softmax)")

        # ---- CTR (diff) graph ----------------------------------------------
        if self.ctr is not None:
            if decompose:
                if edge_attention:
                    # slice [norm-sem : norm] per reference gcn.py:2279
                    d = (x1[:, norm - sem:norm, ..., :, None]
                         - x2[:, norm - sem:norm, ..., None, :])  # (n,sem,mid,tq,V,V)
                    assert d.shape[3] == 1, "edge attention requires T-pooled graphs"
                    d2 = d[:, :, :, 0]                        # (n,sem,mid,V,V)
                    d2 = d2.reshape(n, sem * mid, V, V)
                    d2 = jnp.moveaxis(d2, 1, -1)              # (n,V,V,sem*mid)
                    es = PointConv(E * sem * mid, name="edge_linears")(d2)
                    es = es.reshape(n, V, V, sem, E, mid)
                    es = jnp.transpose(es, (0, 3, 5, 4, 1, 2))  # (n,sem,mid,E,V,V)
                    ea = _edge_class_select(es, self.edge_type)  # (n,sem,mid,V,V)
                    g_sem = ea[:, :, :, None]                  # (n,sem,mid,1,V,V)
                else:
                    g_sem = (x1[:, sem:norm, ..., :, None]
                             - x2[:, sem:norm, ..., None, :])
                g_norm = (x1[:, 0:norm - sem, ..., :, None]
                          - x2[:, 0:norm - sem, ..., None, :])
                g_node = (x1[:, norm:, ..., :, None]
                          - x2[:, norm:, ..., None, :])
                g = jnp.concatenate([g_norm, g_sem, g_node], axis=1)
            else:
                g = x1[..., :, None] - x2[..., None, :]
            g = ACTS[self.ctr_act](g)
            g = g * _gate(alpha, K, sem, norm, subset_wise)
            A6 = g + A6

        # ---- ADA (outer-product) graph -------------------------------------
        if self.ada is not None:
            g = jnp.einsum("nkctv,nkctw->nktvw", x1, x2,
                           preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
            g = g[:, :, None]                                  # (N,K,1,Tq,V,V)
            if self.ada_attention:
                assert g.shape[3] == 1, "ada attention requires T-pooled graphs"
                gs = g[:, :, 0, 0]                             # (N,K,V,V)
                gs = jnp.moveaxis(gs, 1, -1)                   # (N,V,V,K)
                gs = PointConv(E * K, name="ada_linears")(gs)
                gs = gs.reshape(n, V, V, K, E)
                gs = jnp.transpose(gs, (0, 3, 4, 1, 2))        # (N,K,E,V,V)
                ga = _edge_class_select(gs, self.edge_type)    # (N,K,V,V)
                g = ga[:, :, None, None]
            g = ACTS[self.ada_act](g)
            g = g * _gate(beta, K, sem, norm, subset_wise)
            A6 = g + A6

        self.sow("intermediates", "dynamic_graph", A6)
        y = _dispatch_contract(pre_x, A6, self.ctr, self.ada)
        y = y.reshape(n, t, v, K * mid)
        y = PointConv(self.out_channels, name="post_conv")(y)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        return jax.nn.relu(y + res)

    def _jp_aggregate(self, x, pre_x, A_param, alpha, beta, K, mid, sem,
                      norm, node_attention, edge_attention, subset_wise):
        """Joint-partitioned DS-GCN dynamic-graph build + ring aggregation
        (the graph-axis analog of DGGCN._jp_aggregate, extended with the
        semantic machinery of dgphgcn1, reference gcn.py:2241-2361).

        Runs inside shard_map with the joint axis sharded contiguously over
        ``self.graph_axis`` (shard count divides V: 5 or 25 for NTU).  All
        semantic structure stays shard-local or rides the ring:

        * node-type Q/K gathers (gcn.py:2255-2259) are per-joint static
          selections -> a dynamically-sliced one-hot over the LOCAL joints;
        * the per-edge-class attention (gcn.py:2277-2294) is linear in the
          diff, so it is reformulated as class projections P1/P2 of the
          semantic queries (the same trick as the Pallas kernel) and gathered
          with dynamically-sliced blocks of the static class-mask;
        * queries x1 are all-gathered once (tiny (N, K, mid, V)); the large
          pre_x value tensor never replicates — it circulates the ring while
          each device builds only the (V_src, W_local) graph chunk it is
          about to contract, the ppermute issued before the chunk matmul so
          transfer overlaps compute.
        """
        axis = self.graph_axis
        G = jax.lax.axis_size(axis)
        g = jax.lax.axis_index(axis)
        n, t, vl, _, _ = pre_x.shape
        V = A_param.shape[-1]
        assert vl * G == V, (vl, G, V)
        P, E = self.num_types, self.edge_num
        acc = accum_dtype(x.dtype)

        tmp = x.mean(axis=1, keepdims=True)              # (n, 1, vl, c)
        x1n = PointConv(norm * mid, name="conv1")(tmp).reshape(n, vl, norm, mid)
        x2n = PointConv(norm * mid, name="conv2")(tmp).reshape(n, vl, norm, mid)
        x1n = jnp.transpose(x1n, (0, 2, 3, 1))           # (n, norm, mid, vl)
        x2n = jnp.transpose(x2n, (0, 2, 3, 1))
        if sem:
            feats = sem * mid * (P if node_attention else 1)
            x1s = PointConv(feats, name="conv1_se")(tmp)
            if node_attention:
                # per-LOCAL-joint type gather: one-hot rows sliced at the
                # shard offset (node types are compile-time constants)
                oh = jnp.asarray(
                    np.eye(P, dtype=np.float32)[np.asarray(self.node_type)])
                z = jnp.zeros((), g.dtype)
                oh_l = jax.lax.dynamic_slice(oh, (g * vl, z),
                                             (vl, P)).astype(x.dtype)
                a = x1s.reshape(n, vl, sem, mid, P)
                x1s_t = jnp.einsum("nvsmp,vp->nsmv", a, oh_l)
            else:
                x1s_t = jnp.transpose(x1s.reshape(n, vl, sem, mid),
                                      (0, 2, 3, 1))
            x1 = jnp.concatenate([x1n, x1s_t], axis=1)   # (n, K, mid, vl)
            # reference quirk: x2_sem is x1_sem too (gcn.py:2253-2254, 2272)
            x2 = jnp.concatenate([x2n, x1s_t], axis=1)
        else:
            x1, x2 = x1n, x2n
        x1f = jax.lax.all_gather(x1, axis, axis=-1, tiled=True)  # (n,K,mid,V)

        # ADA graph: softmax over the FULL source axis, local target columns
        raw = jnp.einsum("nkcv,nkcw->nkvw", x1f, x2,
                         preferred_element_type=acc)
        ada = jax.nn.softmax(raw, axis=-2).astype(x.dtype)   # (n, K, V, vl)
        A_cols = jax.lax.dynamic_slice_in_dim(
            A_param, g * vl, vl, axis=2).astype(x.dtype)     # (K, V, vl)

        a_vec = _gate_vec(alpha, K, sem, norm, subset_wise).astype(x.dtype)
        b_vec = _gate_vec(beta, K, sem, norm, subset_wise).astype(x.dtype)

        use_edge = bool(edge_attention and sem)
        # the ring builds subset j's ctr from subset j's queries; that matches
        # the reference's concat order (gcn.py:2277-2299) exactly when the
        # middle slice [sem:norm] (no-edge) / [norm-sem:norm] (edge) is the
        # identity placement — always true at K=3 (sem=1, norm=2), the only
        # decomposed form the paper/config zoo uses
        assert not (sem and not use_edge) or sem == norm - sem, \
            "jp decompose without edge attention needs sem == norm - sem"
        if use_edge:
            from .pallas.dyn_graph import edge_onehot
            sel = jnp.asarray(edge_onehot(np.asarray(self.edge_type), E),
                              x.dtype)                       # (E, V, V)
            ew, eb = _ConvParams(sem * mid, E * sem * mid,
                                 name="edge_linears")()
            # class projections of the semantic-diff queries (subsets
            # [norm-sem, norm), gcn.py:2279); output channel order of the
            # reference reshape (n, V, V, sem, E, mid)
            q1 = x1f[:, norm - sem:norm].reshape(n, sem * mid, V)
            q2 = x2[:, norm - sem:norm].reshape(n, sem * mid, vl)
            P1 = jnp.einsum("ncv,ce->nev", q1, ew).reshape(n, sem, E, mid, V)
            P2 = jnp.einsum("ncw,ce->new", q2, ew).reshape(n, sem, E, mid, vl)
            z = jnp.zeros((), g.dtype)
            sel_cols = jax.lax.dynamic_slice(
                sel, (z, z, g * vl), (E, V, vl))             # (E, V, vl)
            bias_field = jnp.einsum(
                "evw,sec->scvw", sel_cols,
                eb.reshape(sem, E, mid).astype(x.dtype))     # (sem,mid,V,vl)

        perm = [(j, (j - 1) % G) for j in range(G)]

        def step(i, carry):
            y, pre_cur = carry                   # pre_cur from shard (g+i)%G
            src = (g + i) % G
            x1_src = jax.lax.dynamic_slice_in_dim(x1f, src * vl, vl, axis=-1)
            ctr = jnp.tanh(x1_src[..., :, None] - x2[..., None, :])
            if use_edge:
                P1_src = jax.lax.dynamic_slice_in_dim(P1, src * vl, vl,
                                                      axis=-1)
                z = jnp.zeros((), src.dtype)
                sel_blk = jax.lax.dynamic_slice(
                    sel_cols, (z, src * vl, z), (E, vl, vl))
                bias_blk = jax.lax.dynamic_slice(
                    bias_field, (z, z, src * vl, z), (sem, mid, vl, vl))
                ea = (jnp.einsum("evw,nsecv->nscvw", sel_blk, P1_src)
                      - jnp.einsum("evw,nsecw->nscvw", sel_blk, P2)
                      + bias_blk[None])
                ctr = ctr.at[:, norm - sem:norm].set(jnp.tanh(ea))
            ada_src = jax.lax.dynamic_slice_in_dim(ada, src * vl, vl, axis=2)
            A_src = jax.lax.dynamic_slice_in_dim(A_cols, src * vl, vl, axis=1)
            Gc = (ctr * a_vec[None, :, None, None, None]
                  + (ada_src * b_vec[None, :, None, None]
                     + A_src[None])[:, :, None])
            # issue the transfer, then contract the chunk we already hold
            pre_next = jax.lax.ppermute(pre_cur, axis, perm)
            y = y + jnp.einsum("ntvkc,nkcvw->ntwkc", pre_cur, Gc,
                               preferred_element_type=acc)
            return y, pre_next

        # accumulate the ring in the accum dtype and cast ONCE after the
        # loop: a bf16 carry would take G roundings vs the unsharded single
        # f32-accumulated contraction (ADVICE r3)
        y0 = jnp.zeros((n, t, vl, K, mid), acc)
        y, _ = jax.lax.fori_loop(0, G, step, (y0, pre_x))
        return y.astype(x.dtype).reshape(n, t, vl, K * mid)


class _ConvParams(nn.Module):
    """Raw 1x1-conv parameters with PointConv-compatible variable naming, for
    kernels that need the weights directly (param paths stay checkpoint-
    compatible with the non-Pallas PointConv path)."""
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_default_kernel(),
                       (self.in_features, self.features))
        b = self.param("bias", torch_default_bias(self.in_features),
                       (self.features,))
        return k, b


def _fold_block_params(mod, changes_channels: bool):
    """Read the pre/post(/down) conv+BN params a DG/DS-GCN block's unfused
    path lays down at init (identical tree in both modes; eval never
    mutates) and fold each BatchNorm into its conv — for the mega-fused
    eval block (ops/pallas/dggcn_block.py)."""
    from .pallas.ms_tcn import fold_bn

    sc = mod.scope

    def conv(name):
        s = sc.push(name, reuse=True)
        return (s.get_variable("params", "kernel"),
                s.get_variable("params", "bias"))

    def bn(name):
        s = sc.push(name, reuse=True).push("bn", reuse=True)
        return fold_bn(s.get_variable("params", "scale"),
                       s.get_variable("params", "bias"),
                       s.get_variable("batch_stats", "mean"),
                       s.get_variable("batch_stats", "var"))

    a, b = bn("pre_bn")
    w_pre, b_pre = conv("pre_conv")
    w_pre, b_pre = w_pre * a[None], b_pre * a + b
    a, b = bn("bn")
    w_post, b_post = conv("post_conv")
    w_post, b_post = w_post * a[None], b_post * a + b
    if changes_channels:
        a, b = bn("down_bn")
        w_down, b_down = conv("down_conv")
        w_down, b_down = w_down * a[None], b_down * a + b
    else:
        w_down = b_down = None
    return w_pre, b_pre, w_post, b_post, w_down, b_down


def _gate_vec(gates: Array, K: int, sem: int, norm: int,
              subset_wise: bool) -> Array:
    """Effective per-subset (K,) gate vector, incl. the repeat_interleave
    grouping for the 3-gate (sub_att=False) case (reference gcn.py:2302-2309)."""
    if not subset_wise:
        return jnp.full((K,), gates[0], gates.dtype)
    if K == gates.shape[0]:
        return gates
    rep = math.ceil(K / 3)
    return jnp.repeat(gates, rep)[2 * sem - norm:]


def _gate(gates: Array, K: int, sem: int, norm: int, subset_wise: bool) -> Array:
    if not subset_wise:
        return gates[0]
    return _gate_vec(gates, K, sem, norm,
                     subset_wise)[None, :, None, None, None, None]


class GTGC(nn.Module):
    """Graph-transformer graph conv (reference GTGC, gcn.py:1054-1222).

    Heterogeneous mutual attention: per-(subset, node-type) key/query
    projections are semantically gathered per joint, time-averaged, and their
    pairwise difference forms an edge-attention field (optionally refined by
    per-edge-class projections).  ``A_eff = alpha * edge_att + A (+ beta *
    global k.q attention)``; aggregation contracts the source-joint axis of
    the pre-projected features against A_eff per (subset, channel).
    """
    out_channels: int
    edge_attention: bool = False
    target_specific: bool = False
    num_types: int = 5
    reduce: int = 8
    edge_num: int = 15
    global_attention: bool = False
    node_type: Optional[np.ndarray] = None
    edge_type: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, x: Array, A: Array, *, train: bool) -> Array:
        n, t, v, c = x.shape
        K = A.shape[0]
        Cm = self.out_channels // self.reduce
        P = self.num_types
        acc = accum_dtype(x.dtype)

        pre = PointConv(K * Cm, name="pre_conv")(x)
        pre = BatchNorm(name="pre_bn")(pre, use_running_average=not train)
        pre = jax.nn.relu(pre).reshape(n, t, v, K, Cm)

        # (N, T, V, K, Cm, P): torch channel order ((k*Cm + c)*P + p)
        # (gcn.py:1094-1095 view(B, K, Cm, P, T, V))
        k_all = PointConv(K * Cm * P, name="k_linears")(x).reshape(
            n, t, v, K, Cm, P)
        q_all = PointConv(K * Cm * P, name="q_linears")(x).reshape(
            n, t, v, K, Cm, P)
        nt_oh = jnp.asarray(np.eye(P, dtype=np.float32)[
            np.asarray(self.node_type)], x.dtype)        # (V, P)
        # semantic gather + time mean (gcn.py:1096-1099) -> (N, K, Cm, V)
        k_sem = jnp.einsum("ntvkcp,vp->nkcv", k_all, nt_oh,
                           preferred_element_type=acc).astype(x.dtype) / t
        q_sem = jnp.einsum("ntvkcp,vp->nkcv", q_all, nt_oh,
                           preferred_element_type=acc).astype(x.dtype) / t

        # diff[b,k,c,u,w] = k[u] - q[w] (gcn.py:1106)
        diff = k_sem[..., :, None] - q_sem[..., None, :]

        if self.edge_attention:
            # per-edge-class projection of the diff field (gcn.py:1168-1178)
            flat = jnp.moveaxis(diff, (1, 2), (3, 4)).reshape(
                n, v, v, K * Cm)
            es = PointConv(K * self.edge_num * Cm, name="edge_linears")(flat)
            es = es.reshape(n, v, v, K, self.edge_num, Cm)
            eo = jnp.asarray(np.eye(self.edge_num, dtype=np.float32)[
                np.asarray(self.edge_type, np.int64)], x.dtype)   # (V, V, E)
            edge_att = jnp.einsum("nuwkec,uwe->nkcuw", es, eo,
                                  preferred_element_type=acc).astype(x.dtype)
        else:
            edge_att = jax.nn.relu(diff)                 # (gcn.py:1196)

        alpha = self.param("alpha", nn.initializers.zeros_init(), (1,))
        A_eff = edge_att * alpha[0] + A[None, :, None].astype(x.dtype)
        if self.global_attention:
            beta = self.param("beta", nn.initializers.zeros_init(), (1,))
            glo = jnp.einsum("nkcv,nkcw->nkvw", k_sem, q_sem,
                             preferred_element_type=acc).astype(x.dtype)
            A_eff = A_eff + glo[:, :, None] * beta[0]

        # aggregate source joints u (gcn.py:1212/1219)
        y = jnp.einsum("ntukc,nkcuv->ntvkc", pre, A_eff,
                       preferred_element_type=acc).astype(x.dtype)
        y = y.reshape(n, t, v, K * Cm)
        if self.target_specific:
            y = PointConv(P * self.out_channels, name="out_linears")(y)
            y = y.reshape(n, t, v, P, self.out_channels)
            y = jnp.einsum("ntvpo,vp->ntvo", y, nt_oh,
                           preferred_element_type=acc).astype(x.dtype)
        else:
            y = PointConv(self.out_channels, name="out_linears")(y)
        return y


class UnitGTGCN(nn.Module):
    """unit_gtgcn (reference gcn.py:1224-1294): GTGC + BN + residual-down +
    ReLU, with adaptive A handling (init: trained A; offset/importance: a
    (V, V) PA broadcast-added/multiplied; the forward's A argument is always
    shadowed by the module's own A, gcn.py:1281-1284)."""
    out_channels: int
    A_init: np.ndarray
    adaptive: Optional[str] = "init"
    edge_attention: bool = False
    target_specific: bool = False
    global_attention: bool = False
    num_types: int = 5
    reduce: int = 8
    edge_num: int = 15
    residual: bool = True
    node_type: Optional[np.ndarray] = None
    edge_type: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        assert self.adaptive in (None, "init", "offset", "importance")
        A0 = jnp.asarray(self.A_init, jnp.float32)
        if self.adaptive == "init":
            A = self.param("A", lambda k, s: A0, A0.shape)
        elif self.adaptive == "offset":
            PA = self.param("PA", nn.initializers.uniform(2e-6), A0.shape[1:])
            A = A0 + (PA - 1e-6)
        elif self.adaptive == "importance":
            PA = self.param("PA", nn.initializers.ones_init(), A0.shape[1:])
            A = A0 * PA
        else:
            A = A0
        y = GTGC(self.out_channels, edge_attention=self.edge_attention,
                 target_specific=self.target_specific,
                 global_attention=self.global_attention,
                 num_types=self.num_types, reduce=self.reduce,
                 edge_num=self.edge_num, node_type=self.node_type,
                 edge_type=self.edge_type, name="convs")(x, A, train=train)
        y = BatchNorm(name="bn")(y, use_running_average=not train)
        if self.residual:
            if x.shape[-1] != self.out_channels:
                d = PointConv(self.out_channels, name="down_conv")(x)
                d = BatchNorm(name="down_bn")(d, use_running_average=not train)
            else:
                d = x
            y = y + d
        return jax.nn.relu(y)


class UnitGCNEdge(nn.Module):
    """unit_gcnedge (reference gcn.py:212-323): graph conv with explicit edge
    representations.

    Spatial edges carry features e[u, v]; each layer concatenates
    (x_u, x_v, e_uv), projects per subset, aggregates nodes via A and edges
    via an A-weighted sum over targets, and re-emits updated spatial and
    temporal edge representations.  Only ``conv_pos='pre'`` is implemented —
    the reference's 'post' branch is internally shape-inconsistent
    (gcn.py:298-305: (n,K,c,t,w) + (n,c,t,v,w)) and unused by STGIN.

    NOTE (faithful quirk): the reference reuses ONE BatchNorm for the node
    output, the spatial-edge output, and the temporal-edge output
    (gcn.py:313); in train mode torch updates its running stats three times
    per step, whereas here the last write wins — eval-mode behavior (and
    weight-copy parity) is identical.
    """
    out_channels: int
    A_init: np.ndarray
    adaptive: Optional[str] = "importance"
    conv_pos: str = "pre"
    with_res: bool = False

    @nn.compact
    def __call__(self, x: Array, edge_s: Array, edge_t: Array, *,
                 train: bool):
        assert self.conv_pos == "pre", \
            "reference 'post' branch is dead code (gcn.py:298-305)"
        n, t, v, c = x.shape
        K = self.A_init.shape[0]
        acc = accum_dtype(x.dtype)
        A0 = jnp.asarray(self.A_init, jnp.float32)
        if self.adaptive == "init":
            A = self.param("A", lambda k, s: A0, A0.shape)
        elif self.adaptive == "offset":
            PA = self.param("PA", nn.initializers.uniform(2e-6), A0.shape)
            A = A0 + (PA - 1e-6)
        elif self.adaptive == "importance":
            PA = self.param("PA", nn.initializers.ones_init(), A0.shape)
            A = A0 * PA
        else:
            A = A0
        A = A.astype(x.dtype)

        res = 0.0
        if self.with_res:
            if c != self.out_channels:
                d = PointConv(self.out_channels, name="down_conv")(x)
                res = BatchNorm(name="down_bn")(d,
                                                use_running_average=not train)
            else:
                res = x

        # (x_u, x_v, e_uv) concat (node_edge_node, gcn.py:318-323)
        e = edge_s.reshape(n, t, v, v, c)
        xu = jnp.broadcast_to(x[:, :, :, None, :], (n, t, v, v, c))
        xv = jnp.broadcast_to(x[:, :, None, :, :], (n, t, v, v, c))
        edge_cat = jnp.concatenate([xu, xv, e], axis=-1)

        node = PointConv(self.out_channels * K, name="conv")(x)
        node = node.reshape(n, t, v, K, self.out_channels)
        efull = PointConv(self.out_channels * K, name="edge_conv")(edge_cat)
        efull = efull.reshape(n, t, v, v, K, self.out_channels)

        node_only = jnp.einsum("ntvko,kvw->ntwo", node, A,
                               preferred_element_type=acc).astype(x.dtype)
        edge_only = jnp.einsum("ntvwko,kvw->ntvo", efull, A,
                               preferred_element_type=acc).astype(x.dtype)
        y = node_only + edge_only

        edge_s_out = efull.sum(axis=4)                   # (n, t, v, v, out)

        if edge_t.shape[-1] != self.out_channels:
            edge_t = PointConv(self.out_channels, name="edge_conv_T")(edge_t)

        bn = BatchNorm(name="bn")
        y = jax.nn.relu(bn(y, use_running_average=not train) + res)
        es = jax.nn.relu(bn(edge_s_out.reshape(n, t, v * v, -1),
                            use_running_average=not train))
        et = jax.nn.relu(bn(edge_t, use_running_average=not train))
        return y, es.reshape(n, t, v, v, -1), et
