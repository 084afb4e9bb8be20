"""Granger-causality graph learner (reference causal_GC.py gc_sparse
:376-618 / GCGCN gcgcn.py:10-45).

A cMLP-style per-joint autoregressive bank: for every target joint a causal
Conv1d over all source-joint time series; the norm of those first-layer
weights IS the Granger-causality graph (GC_pool, causal_GC.py:556-575).
Outputs (prediction_mse, gc_matrix, gsgl_penalty).

Faithful quirks: the committed GCGCN default time_serious=9 crashes for 25
joints (the Conv1d bank's in_channels must equal V, causal_GC.py:411);
time_serious=V is the working configuration.  The multi-branch buffer is
reinterpreted from (joint, time) to (time, joint) order by a raw reshape
(causal_GC.py:474) — reproduced bit-for-bit.  gc_gcn (causal_GC.py:276-375)
is unconstructible dead code (NameError on undefined mid_channels at :291).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import (Array, BatchNorm, PointConv, accum_dtype,
                     torch_default_bias, torch_default_kernel)


def _causal_conv1d(x_ncw: Array, w_oiw: Array, b: Array, dilation: int
                   ) -> Array:
    """Left-padded (causal) Conv1d in torch NCW layout."""
    k = w_oiw.shape[-1]
    pad = k + (k - 1) * (dilation - 1) - 1
    y = jax.lax.conv_general_dilated(
        x_ncw, w_oiw.astype(x_ncw.dtype), window_strides=(1,),
        padding=((pad, 0),), rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=accum_dtype(x_ncw.dtype))
    return y.astype(x_ncw.dtype) + b.astype(x_ncw.dtype)[None, :, None]


class GCSparse(nn.Module):
    """gc_sparse (causal_GC.py:376-618); input (N*M, T, V, C) channels-last."""
    in_channels: int = 3
    mid_channels: int = 50
    feature_hidden: Tuple[int, ...] = (10, 100, 10, 1)
    causal_hidden: Tuple[int, ...] = (100,)
    ms_cfg: Tuple[Tuple[int, int], ...] = ((3, 1), (3, 2), (3, 3), (3, 4))
    gl_lam: float = 1e-2

    @nn.compact
    def __call__(self, x: Array, *, train: bool):
        b0, t, v, c = x.shape
        mid = self.mid_channels
        nb = len(self.ms_cfg)
        out_ch = mid * nb

        # torch layout for the buffer-order-sensitive part
        xt = jnp.transpose(x, (0, 3, 1, 2))              # (B0, C, T, V)
        x_temp = xt.reshape(b0 * c, t, v).transpose(0, 2, 1)  # (BC, V, T)

        # per-joint causal conv banks (causal_GC.py:410-412, 464-469)
        branch_ws = []
        preds = []
        for i, (k, d) in enumerate(self.ms_cfg):
            w = self.param(f"branch{i}_w", torch_default_kernel(),
                           (v, mid, v, k))               # (joint, mid, V, k)
            bias = self.param(f"branch{i}_b", torch_default_bias(v * k),
                              (v, mid))
            branch_ws.append(w)
            out = _causal_conv1d(x_temp, w.reshape(v * mid, v, k),
                                 bias.reshape(v * mid), d)  # (BC, V*mid, T)
            # joint-major cat along time (causal_GC.py:469: cat(..., dim=2))
            out = out.reshape(b0 * c, v, mid, t).transpose(0, 2, 1, 3)
            preds.append(out.reshape(b0 * c, mid, v * t))
        predic = jnp.stack(preds)                        # (nb, BC, mid, V*T)

        # raw (joint,time)->(time,joint) buffer reinterpretation (:474)
        predic = predic.transpose(1, 0, 2, 3).reshape(b0 * c, nb * mid, -1)
        predic = predic.reshape(b0 * c, -1, t, v).reshape(b0, c, -1, t, v)

        # feature chain -> per-joint SE gate (causal_GC.py:477-484)
        feat = x                                          # (B0, T, V, C)
        for i, ch in enumerate(self.feature_hidden):
            feat = PointConv(ch, name=f"feature{i}_conv")(feat)
            feat = BatchNorm(name=f"feature{i}_bn")(
                feat, use_running_average=not train)
            feat = jax.nn.relu(feat)
        gate = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b0, t, v)
        gate = gate.transpose(0, 2, 1).mean(-1)           # (B0, V)

        h = gate[:, None, :]                              # (B0, 1, V)
        chain = tuple(self.causal_hidden) + (out_ch,)
        for i, ch in enumerate(chain):
            h = PointConv(ch, name=f"causal{i}_conv")(h)
            h = BatchNorm(name=f"causal{i}_bn")(
                h, use_running_average=not train)
            h = jax.nn.relu(h)
        sel = h[:, 0, :]                                  # (B0, out_ch)

        # causal selection + channel reduction (:487-496)
        predic = predic * sel[:, None, :, None, None]
        predic = predic.reshape(b0 * c, out_ch, t, v)
        predic = jax.nn.relu(predic)
        fw = self.param("follow_w", torch_default_kernel(), (v, out_ch))
        fb = self.param("follow_b", torch_default_bias(out_ch), (v,))
        predic_final = jnp.einsum(
            "bcts,sc->bst", predic, fw,
            preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype) \
            + fb[None, :, None]                           # (BC, V, T)

        # Granger prediction loss (elementwise MSE, :499-526)
        predic_loss = (predic_final[:, :, :-1] - x_temp[:, :, 1:]) ** 2

        # GC matrix from first-layer weight norms x the SE gate (:556-575,
        # :508-516); gc_pool (nb*mid, V, V, k) with per-branch k
        k0 = self.ms_cfg[0][0]
        assert all(k == k0 for k, _ in self.ms_cfg), \
            "GC_pool stacks branch weights; reference requires equal kernels"
        gcs = jnp.stack([w for w in branch_ws])           # (nb, V, mid, V, k)
        gc_pool = gcs.transpose(0, 2, 1, 3, 4).reshape(nb * mid, v, v, k0)
        gc = gc_pool[None] * sel[:, :, None, None, None]  # (B0,out,V,V,k)

        # GSGL penalty (:577-599)
        gsgl = self.gl_lam * (
            jnp.sqrt((gc ** 2).sum(axis=(1, -1))).sum()
            + jnp.sqrt((gc ** 2).sum(axis=1)).sum())

        gc = jnp.max(gc, axis=1)
        gc = jnp.max(gc, axis=-1)                         # (B0, V, V)
        return predic_loss, gc, gsgl


class GCGCN(nn.Module):
    """GCGCN backbone (gcgcn.py:10-45): fold persons, run GCSparse, reshape
    the causality graph to (N, M, V, V)."""
    in_channels: int = 3
    num_person: int = 2
    mid_channels: int = 50
    feature_hidden: Tuple[int, ...] = (10, 100, 10, 1)
    causal_hidden: Tuple[int, ...] = (100,)
    ms_cfg: Tuple[Tuple[int, int], ...] = ((3, 1), (3, 2), (3, 3), (3, 4))

    @nn.compact
    def __call__(self, x: Array, *, train: bool):
        n, m, t, v, c = x.shape
        loss, gc, gsgl = GCSparse(
            self.in_channels, self.mid_channels, self.feature_hidden,
            self.causal_hidden, self.ms_cfg,
            name="net")(x.reshape(n * m, t, v, c), train=train)
        return loss, gc.reshape(n, m, v, v), gsgl


class GCComponent(nn.Module):
    """gc_component (causal_GC.py:619-842) / GCGCN_component backbone
    (gcgcn_componen.py:10-50): VAR-style Granger learner with a shared
    generator weight modulated per edge by a tanh difference attention.

    ``weight_norm`` is the reference's init-time snapshot of the generator
    norms (causal_GC.py:654-656) — held in the 'constants' collection.
    Returns (gc (N,M,V,V), prediction_mse, gsgl_penalty, ridge_penalty).
    """
    in_channels: int = 3
    causal_channel: int = 100
    feature_update: Tuple[int, ...] = (64, 128, 1)
    feature_hidden: Tuple[int, ...] = (100, 10, 1)
    time_len: int = 9
    gl_lam: float = 1e-4
    ridge_lam: float = 1e-4

    @nn.compact
    def __call__(self, x: Array, *, train: bool):
        n, m, t, v, c = x.shape
        b0 = n * m
        cc = self.causal_channel
        tl = self.time_len
        xcl = x.reshape(b0, t, v, c)

        feat = xcl
        for i, ch in enumerate(self.feature_update):
            feat = PointConv(ch, name=f"feature{i}_conv")(feat)
            feat = BatchNorm(name=f"feature{i}_bn")(
                feat, use_running_average=not train)
            feat = jax.nn.relu(feat)
        x1 = PointConv(cc, name="conv1")(feat).mean(axis=1)   # (B0, V, cc)
        x2 = PointConv(cc, name="conv2")(feat).mean(axis=1)
        x1 = jnp.transpose(x1, (0, 2, 1))                     # (B0, cc, V)
        x2 = jnp.transpose(x2, (0, 2, 1))
        cm = jnp.tanh(x1[..., None] - x2[..., None, :])       # (B0,cc,V,V)

        weight = self.param("weight", torch_default_kernel(), (cc, v, tl))
        wnorm = self.variable(
            "constants", "weight_norm",
            lambda: jnp.sqrt((weight ** 2).sum(axis=0))).value  # (V, tl)

        # torch-layout series (causal_GC.py:714): (1, B0*V, T)
        ft = jnp.transpose(feat, (0, 3, 1, 2))                # (B0, 1, T, V)
        series = ft.reshape(b0, t, v).transpose(0, 2, 1).reshape(1, b0 * v, t)

        wg = weight / wnorm[None]                             # (cc, V, tl)
        preds = []
        for i in range(v):
            idx = cm[:, :, :, i, None]                        # (B0,cc,V,1)
            wr = (idx * wg[None]).reshape(b0 * cc, v, tl)
            ret = jax.lax.conv_general_dilated(
                series, wr.astype(series.dtype), window_strides=(1,),
                padding="VALID", feature_group_count=b0,
                dimension_numbers=("NCH", "OIH", "NCH"),
                preferred_element_type=accum_dtype(x.dtype)
            ).astype(x.dtype)                                 # (1, B0*cc, T')
            preds.append(ret[0])
        predics = jnp.stack(preds)                            # (V, B0*cc, T')
        tp = predics.shape[-1]
        predics = predics.reshape(v, b0, cc, tp).transpose(1, 0, 2, 3)
        predics = predics.reshape(b0, v, cc, tp)              # grouped by V

        ridge = 0.0
        hidden = cc
        for j, ch in enumerate(self.feature_hidden):
            fw = self.param(f"follow{j}_w", torch_default_kernel(),
                            (v, ch, hidden))
            fb = self.param(f"follow{j}_b", torch_default_bias(hidden),
                            (v, ch))
            predics = jnp.einsum(
                "bvct,voc->bvot", predics, fw,
                preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype) \
                + fb[None, :, :, None]
            predics = jax.nn.relu(predics)
            ridge = ridge + (fw ** 2).sum()
            hidden = ch
        prediction = predics.reshape(b0, v * self.feature_hidden[-1], tp)
        ridge = self.ridge_lam * ridge

        x_comp = series.reshape(b0, v, t)
        predic_loss = jnp.mean(
            (x_comp[:, :, tl:] - prediction[:, :, :-1]) ** 2)

        # GSGL on the attention field (causal_GC.py:736, 770-785)
        gl1 = jnp.sqrt((cm ** 2).sum(axis=1))                 # (B0, V, V)
        gsgl = self.gl_lam * (
            jnp.sqrt((gl1 ** 2).sum(axis=1)).sum() + gl1.sum())

        gc = cm[..., None] * weight[None, :, :, None, :]      # (B0,cc,V,V,tl)
        gc = jnp.sqrt((gc ** 2).sum(axis=1))                  # (B0, V, V, tl)
        gc = jnp.sqrt((gc ** 2).sum(axis=-1))                 # (B0, V, V)
        return gc.reshape(n, m, v, v), predic_loss, gsgl, ridge
