"""MS-G3D ops: multi-scale GCN, temporal-window unfolding, ST-GCN3D blocks.

TPU-native equivalents of reference msg3d_utils.py (MLP :12, MSGCN :31,
UnfoldTemporalWindows :152, ST_MSGCN :176, MSG3DBlock :235, MW_MSG3DBlock :289).
Multi-scale adjacency powers are precomputed on the host (k_adjacency +
normalize) and baked in as constants; the k-scale aggregation is one dense
einsum batched over (N, T).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..graph import k_adjacency, normalize_digraph
from .common import Array, BatchNorm, PointConv


def multi_scale_adjacency(A: np.ndarray, num_scales: int) -> np.ndarray:
    """Stack of normalized k-hop ring adjacencies (msg3d_utils.py:42-43)."""
    powers = [k_adjacency(A, k, with_self=True) for k in range(num_scales)]
    return np.stack([normalize_digraph(g) for g in powers]).astype(np.float32)


def uniform_eps_init(scale: float = 1e-6):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class MLP(nn.Module):
    """1x1 conv -> BN -> act chain (msg3d_utils.py:12-28)."""
    out_channels: Tuple[int, ...]
    act: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        for i, c in enumerate(self.out_channels):
            if self.dropout > 1e-3:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = PointConv(c, name=f"conv{i}")(x)
            x = BatchNorm(name=f"bn{i}")(x, use_running_average=not train)
            if self.act:
                x = jax.nn.relu(x)
        return x


class MSGCN(nn.Module):
    """Multi-scale spatial GCN (msg3d_utils.py:31-60): K adjacency powers with
    a trainable epsilon offset PA, concat over scales, MLP merge."""
    num_scales: int
    out_channels: int
    A_binary: np.ndarray           # (V, V) binary adjacency
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n, t, v, c = x.shape
        A_scales = multi_scale_adjacency(self.A_binary, self.num_scales)
        PA = self.param("PA", uniform_eps_init(), A_scales.shape)
        A = jnp.asarray(A_scales) + PA
        # reference einsum('kvu,nctv->nkctu') (msg3d_utils.py:56)
        support = jnp.einsum("kvu,ntvc->ntukc", A, x)
        support = support.reshape(n, t, v, self.num_scales * c)
        return MLP((self.out_channels,), dropout=self.dropout,
                   name="mlp")(support, train=train)


def unfold_temporal_windows(x: Array, window_size: int, window_stride: int,
                            window_dilation: int = 1) -> Array:
    """(N, T, V, C) -> (N, NW, window*V, C) sliding temporal windows
    (msg3d_utils.py:152-173); window-major ordering on the joint axis."""
    n, t, v, c = x.shape
    pad = (window_size + (window_size - 1) * (window_dilation - 1) - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    nw = (t + 2 * pad - (window_dilation * (window_size - 1) + 1)) \
        // window_stride + 1
    slices = [
        jax.lax.dynamic_slice_in_dim(xp, w * window_dilation, 1 + (nw - 1)
                                     * window_stride, axis=1)
        [:, ::window_stride]
        for w in range(window_size)
    ]
    xw = jnp.stack(slices, axis=2)              # (N, NW, wsize, V, C)
    return xw.reshape(n, nw, window_size * v, c)


class STMSGCN(nn.Module):
    """Spatio-temporal multi-scale GCN over the windowed graph
    (msg3d_utils.py:176-232)."""
    out_channels: int
    A_binary: np.ndarray
    num_scales: int
    window_size: int
    residual: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n, t, vw, c = x.shape
        V = self.A_binary.shape[0]
        A_with_I = self.A_binary + np.eye(V, dtype=self.A_binary.dtype)
        A_large = np.tile(A_with_I, (self.window_size, self.window_size))
        A_scales = multi_scale_adjacency(A_large, self.num_scales)
        PA = self.param("PA", uniform_eps_init(), A_scales.shape)
        A = jnp.asarray(A_scales) + PA

        res = 0.0
        if self.residual:
            res = x if c == self.out_channels else MLP(
                (self.out_channels,), act=False, name="residual")(x, train=train)
        agg = jnp.einsum("kvu,ntvc->ntukc", A, x)
        agg = agg.reshape(n, t, vw, self.num_scales * c)
        out = MLP((self.out_channels,), dropout=self.dropout,
                  name="mlp")(agg, train=train)
        return jax.nn.relu(out + res)


class MSG3DBlock(nn.Module):
    """Windowed 3D graph conv block (msg3d_utils.py:235-286)."""
    in_channels: int
    out_channels: int
    A_binary: np.ndarray
    num_scales: int
    window_size: int
    window_stride: int
    window_dilation: int = 1
    embed_factor: int = 1

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n = x.shape[0]
        V = self.A_binary.shape[0]
        embed_in = embed_out = self.out_channels // self.embed_factor
        if self.embed_factor == 1:
            embed_in = embed_out = self.in_channels
            if self.in_channels == 3:
                embed_out = self.out_channels
        else:
            x = MLP((embed_in,), name="in1x1")(x, train=train)

        xw = unfold_temporal_windows(x, self.window_size, self.window_stride,
                                     self.window_dilation)
        xw = STMSGCN(embed_out, self.A_binary, self.num_scales,
                     self.window_size, name="st_msgcn")(xw, train=train)
        nw = xw.shape[1]
        xw = xw.reshape(n, nw, self.window_size, V, embed_out)
        # collapse the window dim: Conv3d kernel (1, wsize, 1) (msg3d_utils:281)
        kernel = self.param(
            "out_conv_kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.window_size, embed_out, self.out_channels))
        bias = self.param("out_conv_bias", nn.initializers.zeros_init(),
                          (self.out_channels,))
        y = jnp.einsum("ntwvc,wco->ntvo", xw, kernel) + bias
        return BatchNorm(name="out_bn")(y, use_running_average=not train)


class MWMSG3DBlock(nn.Module):
    """Multi-window sum of MSG3DBlocks (msg3d_utils.py:289-317)."""
    in_channels: int
    out_channels: int
    A_binary: np.ndarray
    num_scales: int
    window_sizes: Tuple[int, ...] = (3, 5)
    window_stride: int = 1
    window_dilations: Tuple[int, ...] = (1, 1)

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        out = 0.0
        for i, (ws, wd) in enumerate(zip(self.window_sizes,
                                         self.window_dilations)):
            out = out + MSG3DBlock(
                self.in_channels, self.out_channels, self.A_binary,
                self.num_scales, ws, self.window_stride, wd,
                name=f"gcn3d{i}")(x, train=train)
        return out
