"""Necks: feature readouts between backbone and head.

Reference: pyskl/models/necks/Simple_neck.py:15-107 (SimpleNeck with the
node_precost auxiliary body-part loss), greadout.py:15-156 (ReadoutNeck
prototype-assignment readout), gread.py:45-158 (GlobalAttention/Set2Set
segment readouts), pre_train.py:17-259, Causal_neck.py:16-130.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.losses import cross_entropy
from ..ops.common import Array


class SimpleNeck(nn.Module):
    """Global average pooling (GCN mode) with an optional auxiliary per-joint
    body-part classification loss (Simple_neck.py:94-107)."""
    in_channels: int
    dropout: float = 0.5
    num_types: int = 5

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        # (N, M, T, V, C) -> (N, C)
        pooled = x.mean(axis=(2, 3)).mean(axis=1)
        if self.dropout > 0:
            pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        return pooled

    def node_precost(self, x: Array, node_type: np.ndarray) -> Array:
        """Auxiliary 5-way body-part classification per joint: encourages the
        backbone to keep joints' semantic identity (Simple_neck.py:94-107)."""
        n, m, t, v, c = x.shape
        feat = x.mean(axis=2).reshape(n * m * v, c)
        logits = nn.Dense(self.num_types, name="fc_node")(feat)
        labels = jnp.tile(jnp.asarray(node_type, jnp.int32), n * m)
        return cross_entropy(logits, labels)


class SemanticNeck(nn.Module):
    """Person-validity-weighted pooling (reference Simple_neck.py:110-190):
    GCN mode pools (T, V) then averages persons weighted by ``index``
    (per-person scalar weights, Simple_neck.py:187) instead of a plain mean.

    The reference's dispatch is dead code — recognizergcn.py:33 compares the
    built *module* to the string 'SemanticNeck', which is always False, so
    upstream never actually routes through it.  Here ``index=None`` derives
    the weights the way that dead branch would have
    (``x.sum(-1).sum(-1).sum(-1)``, recognizergcn.py:34), making the neck
    usable as a drop-in readout.
    """
    in_channels: int
    dropout: float = 0.5
    mode: str = "GCN"

    @nn.compact
    def __call__(self, x: Array, index: Array = None, *,
                 train: bool) -> Array:
        if x.ndim == 2:
            return x
        if self.mode == "GCN":
            # ours: (N, M, T, V, C); reference: (N, M, C, T, V)
            if index is None:
                index = x.sum(axis=(2, 3, 4))          # (N, M)
            pooled = x.mean(axis=(2, 3))               # (N, M, C)
            w = index[..., None]
            return (pooled * w).sum(axis=1) / index.sum(axis=1, keepdims=True)
        # 3D / 2D modes: plain global pooling (index unused upstream too)
        return x.mean(axis=tuple(range(1, x.ndim - 1)))


class Set2Set(nn.Module):
    """Set2Set segment readout (reference necks/gread.py:99-158, the
    "Order Matters" iterative content-based attention): ``processing_steps``
    rounds of (LSTM query -> per-segment softmax attention -> readout),
    output is ``[q, r]`` with 2x the input channels.  The LSTM matches torch
    ``nn.LSTM(2C, C, 1)`` exactly: gate order (i, f, g, o), two bias vectors,
    U(+-1/sqrt(C)) init."""
    in_channels: int
    processing_steps: int = 2

    @nn.compact
    def __call__(self, x: Array, seg: Array, num_segments: int) -> Array:
        c = self.in_channels
        bound = 1.0 / np.sqrt(c)

        def unif(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w_ih = self.param("w_ih", unif, (4 * c, 2 * c))
        w_hh = self.param("w_hh", unif, (4 * c, c))
        b_ih = self.param("b_ih", unif, (4 * c,))
        b_hh = self.param("b_hh", unif, (4 * c,))

        h = jnp.zeros((num_segments, c), x.dtype)
        cell = jnp.zeros((num_segments, c), x.dtype)
        q_star = jnp.zeros((num_segments, 2 * c), x.dtype)
        for _ in range(self.processing_steps):
            gates = q_star @ w_ih.T + b_ih + h @ w_hh.T + b_hh
            gi, gf, gg, go = jnp.split(gates, 4, axis=1)
            cell = jax.nn.sigmoid(gf) * cell \
                + jax.nn.sigmoid(gi) * jnp.tanh(gg)
            h = jax.nn.sigmoid(go) * jnp.tanh(cell)
            e = (x * h[seg]).sum(axis=1)
            a = _segment_softmax(e, seg, num_segments)
            r = jax.ops.segment_sum(a[:, None] * x, seg, num_segments)
            q_star = jnp.concatenate([h, r], axis=1)
        return q_star


class ReadoutNeck(nn.Module):
    """Prototype-assignment readout (reference necks/greadout.py:15-156):
    every (sample, frame, joint) row — person-meaned — is assigned to its
    nearest of ``num_position`` prototypes by cosine distance, each
    (sample, prototype) segment is pooled with ``read_op`` (sum / mean /
    max / attention / set2set; set2set doubles C), and positions are then
    averaged per sample.  ``get_aligncost`` is the soft-min assignment
    distance accumulated per (sample, prototype) and normalized by occupancy
    (greadout.py:122-148).  Faithful quirk: the reference constructor stores
    a dropout ratio the forward never applies — reproduced."""
    in_channels: int
    num_position: int = 25
    read_op: str = "mean"    # sum | mean | max | attention | set2set
    gamma: float = 0.1
    dropout: float = 0.5

    def setup(self):
        from ..ops.common import torch_default_kernel, torch_default_bias
        self.protos = self.param("protos", nn.initializers.xavier_normal(),
                                 (self.num_position, self.in_channels))
        if self.read_op == "attention":
            self.gate = nn.Dense(
                1, kernel_init=torch_default_kernel(),
                bias_init=torch_default_bias(self.in_channels), name="gate")
        elif self.read_op == "set2set":
            self.s2s = Set2Set(self.in_channels, name="set2set")
        elif self.read_op not in ("sum", "mean", "max"):
            raise ValueError(self.read_op)

    def _gread(self, x, seg, num_segments):
        if self.read_op == "sum":
            return jax.ops.segment_sum(x, seg, num_segments)
        if self.read_op == "mean":
            s = jax.ops.segment_sum(x, seg, num_segments)
            cnt = jax.ops.segment_sum(jnp.ones(x.shape[0]), seg, num_segments)
            return s / jnp.maximum(cnt, 1.0)[:, None]
        if self.read_op == "max":
            m = jax.ops.segment_max(x, seg, num_segments)
            return jnp.where(jnp.isfinite(m), m, 0.0)
        if self.read_op == "attention":
            w = _segment_softmax(self.gate(x)[:, 0], seg, num_segments)
            return jax.ops.segment_sum(x * w[:, None], seg, num_segments)
        return self.s2s(x, seg, num_segments)

    def _distance(self, rows: Array) -> Array:
        """1 - cosine similarity to every prototype (greadout.py:118).
        torch.cosine_similarity clamps EACH norm to eps=1e-8 separately
        (normalize-then-dot), not the product — verified on the installed
        torch."""
        eps = 1e-8
        rn = rows / jnp.maximum(
            jnp.linalg.norm(rows, axis=1, keepdims=True), eps)
        pn = self.protos / jnp.maximum(
            jnp.linalg.norm(self.protos, axis=1, keepdims=True), eps)
        return 1.0 - rn @ pn.T

    def _rows(self, x: Array):
        n, m, t, v, c = x.shape
        rows = x.mean(axis=1).reshape(n * t * v, c)   # (t, v) row order
        batch = jnp.repeat(jnp.arange(n), t * v)
        return rows, batch, n

    def __call__(self, x: Array, *, train: bool) -> Array:
        rows, batch, n = self._rows(x)
        d = self._distance(rows)
        seg = self.num_position * batch + jnp.argmin(d, axis=1)
        pooled = self._gread(rows, seg, self.num_position * n)
        return pooled.reshape(n, self.num_position, -1).mean(axis=1)

    def get_aligncost(self, x: Array) -> Array:
        """Soft-min prototype distance per row, accumulated per
        (sample, prototype) and divided by that cell's occupancy
        (greadout.py:122-148)."""
        rows, batch, n = self._rows(x)
        d = self._distance(rows)
        onehot = jax.nn.one_hot(jnp.argmin(d, axis=1), self.num_position,
                                dtype=rows.dtype)
        counts = jax.ops.segment_sum(onehot, batch, n)        # (N, P)
        if self.gamma == 0:
            dmin = d.min(axis=1)
        else:
            dmin = -self.gamma * jnp.log(
                jnp.exp(-d / self.gamma).sum(axis=1) + 1e-12)
        d_loss = jax.ops.segment_sum(dmin[:, None] * onehot, batch, n)
        return jnp.mean(d_loss / (counts + 1e-12))


def build_neck(cfg):
    cfg = dict(cfg)
    typ = cfg.pop("type")
    return NECKS[typ](**cfg)


class CMLP(nn.Module):
    """Neural-GC cMLP (reference necks/causalnn.py:8-96): one small causal MLP
    per joint — Conv1d(V -> hidden, k=lag) then 1x1 layers down to 1."""
    num_series: int = 25
    lag: int = 9
    hidden: Tuple[int, ...] = (100,)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: (B, T, V) -> per-joint one-step predictions (B, T-lag+1, V)."""
        from ..ops.common import accum_dtype, torch_default_kernel, \
            torch_default_bias
        b, t, v = x.shape
        h0 = self.hidden[0]
        acc = accum_dtype(x.dtype)
        w0 = self.param("l0_w", torch_default_kernel(),
                        (v, h0, v, self.lag))     # per-target first layers
        b0 = self.param("l0_b", torch_default_bias(v * self.lag), (v, h0))
        xn = jnp.transpose(x, (0, 2, 1))          # (B, V, T)
        y = jax.lax.conv_general_dilated(
            xn, w0.reshape(v * h0, v, self.lag).astype(x.dtype),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=acc).astype(x.dtype)
        y = y + b0.reshape(v * h0).astype(x.dtype)[None, :, None]
        y = y.reshape(b, v, h0, -1)
        prev = h0
        for li, ch in enumerate(tuple(self.hidden[1:]) + (1,)):
            y = jax.nn.relu(y)
            w = self.param(f"l{li + 1}_w", torch_default_kernel(),
                           (v, ch, prev))
            bb = self.param(f"l{li + 1}_b", torch_default_bias(prev), (v, ch))
            y = jnp.einsum("bvct,voc->bvot", y, w,
                           preferred_element_type=acc).astype(x.dtype) \
                + bb[None, :, :, None]
            prev = ch
        return jnp.transpose(y[:, :, 0, :], (0, 2, 1))   # (B, T', V)

    def ridge(self, params, lam: float):
        """Ridge on all post-first layers (causalnn.py:96-98), summed over
        the V per-joint networks."""
        total = 0.0
        for k, p in params.items():
            if k.endswith("_w") and not k.startswith("l0"):
                total = total + (p ** 2).sum()
        return lam * total


class CausalNeck(nn.Module):
    """CausalNeck (reference necks/Causal_neck.py:16-130): SimpleHead-style
    pooling that also returns the raw feature, an auxiliary per-joint
    body-part classifier, and a Neural-GC smoothness cost over a cMLP bank."""
    in_channels: int
    dropout: float = 0.5
    mode: str = "GCN"
    num_series: int = 25
    lag: int = 9
    lam_ridge: float = 1e-2

    def setup(self):
        self.fc_cls = nn.Dense(5,
                               kernel_init=nn.initializers.normal(0.01),
                               name="fc_cls")
        self.cmlp = CMLP(self.num_series, self.lag, (100,), name="cMLP")

    def __call__(self, x: Array, *, train: bool):
        """x: (N, M, T, V, C) -> (pooled (N, C), feature)."""
        feature = x
        pooled = x.mean(axis=(2, 3)).mean(axis=1)
        return pooled, feature

    def node_precost(self, x: Array, node_type) -> Array:
        """Per-joint body-part CE, mean (Causal_neck.py:97-111)."""
        n, m, t, v, c = x.shape
        h = x.mean(axis=2).reshape(-1, c)          # (N*M*V, C)
        logits = self.fc_cls(h)
        labels = jnp.tile(jnp.asarray(node_type, jnp.int32), n * m)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()

    def init_components(self, x: Array, node_type):
        """Trace every submodule once (for .init); returns all outputs."""
        out = self(x, train=False)
        return out, self.node_precost(x, node_type), self.gc_cost(x)

    def gc_cost(self, x: Array) -> Array:
        """Neural-GC smooth loss: per-joint one-step prediction MSE + ridge
        (Causal_neck.py:112-126).  x: (N, M, T, V, C) person-meaned."""
        h = x.mean(axis=1)                         # (N, T, V, C)
        n, t, v, c = h.shape
        series = jnp.transpose(h, (0, 3, 1, 2)).reshape(-1, t, v)
        pred = self.cmlp(series[:, :-1])           # (B, T-lag, V)
        target = series[:, self.lag:]
        loss = jnp.mean((pred - target) ** 2, axis=(0, 1)).sum()
        ridge = self.cmlp.ridge(
            self.variables["params"]["cMLP"], self.lam_ridge)
        return loss + ridge


def _segment_softmax(score: Array, seg: Array, num_segments: int) -> Array:
    smax = jax.ops.segment_max(score, seg, num_segments)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    e = jnp.exp(score - smax[seg])
    denom = jax.ops.segment_sum(e, seg, num_segments)
    return e / (denom[seg] + 1e-16)


class PretrainNeck(nn.Module):
    """Hierarchical prototype readout for masked-pretraining
    (reference necks/pre_train.py:17-259).

    Rows (one per (sample, frame, joint)) are assigned to the nearest
    prototype by cosine distance per hierarchy level, pooled per
    (sample, prototype) segment with the chosen readout, and the level's
    soft-min distance is the alignment cost.  Also exposes the reference's
    contrastive (intra/inter NCE) and masked node-type losses.

    Faithful quirks: the reference's prototypes are a plain python list of
    nn.Parameters — never registered, so they stay frozen at their random
    init (pre_train.py:56-60); here they are proper (trainable) params.  The
    batch rebuild hardcodes 0.4 while segment sizes use ``declay``
    (pre_train.py:113-118) — faithful, so declay != 0.4 scrambles segments
    exactly as upstream.  node_precost's mask contract is a (N, M, T, V, 1)
    joint-validity mask whose t=0 slice is used (pre_train.py:171-173).
    """
    in_channels: int
    num_position: int
    read_op: str = "mean"
    num_hierarchy: int = 3
    declay: float = 0.4
    gamma: float = 0.1

    def setup(self):
        self.protos = [
            self.param(f"proto{i}",
                       nn.initializers.xavier_normal(),
                       (int(self.num_position * self.declay ** i),
                        self.in_channels))
            for i in range(self.num_hierarchy)]
        if self.read_op == "attention":
            self.gate = nn.Dense(1, name="gate")
        elif self.read_op == "set2set":
            # pre_train.py:73-74; like the reference, only usable with
            # num_hierarchy == 1 (set2set doubles C, the next level's
            # attention query is still C-dim -> upstream crashes too)
            self.s2s = Set2Set(self.in_channels, name="set2set")
        self.fc_cls = nn.Dense(5, kernel_init=nn.initializers.normal(0.01),
                               name="fc_cls")

    def _gread(self, x, seg, num_segments):
        if self.read_op == "sum":
            return jax.ops.segment_sum(x, seg, num_segments)
        if self.read_op == "mean":
            s = jax.ops.segment_sum(x, seg, num_segments)
            cnt = jax.ops.segment_sum(jnp.ones(x.shape[0]), seg, num_segments)
            return s / jnp.maximum(cnt, 1.0)[:, None]
        if self.read_op == "max":
            m = jax.ops.segment_max(x, seg, num_segments)
            return jnp.where(jnp.isfinite(m), m, 0.0)
        if self.read_op == "attention":
            w = _segment_softmax(self.gate(x)[:, 0], seg, num_segments)
            return jax.ops.segment_sum(x * w[:, None], seg, num_segments)
        if self.read_op == "set2set":
            return self.s2s(x, seg, num_segments)
        raise ValueError(self.read_op)

    def _assign(self, x, level):
        p = self.protos[level]
        xn = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-8)
        pn = p / (jnp.linalg.norm(p, axis=1, keepdims=True) + 1e-8)
        d = 1.0 - xn @ pn.T
        return d, jnp.argmin(d, axis=1)

    def _rows(self, x):
        n, m, t, v, c = x.shape
        h = x.mean(axis=1)                       # person mean (pre_train:104)
        rows = h.reshape(n * t * v, c)           # (n, t, v) row order
        batch = jnp.repeat(jnp.arange(n), t * v)
        return rows, batch, n

    def __call__(self, x: Array, *, train: bool) -> Array:
        rows, batch, n = self._rows(x)
        for i in range(self.num_hierarchy):
            p_i = int(self.num_position * self.declay ** i)
            _, idx = self._assign(rows, i)
            seg = p_i * batch + idx
            rows = self._gread(rows, seg, p_i * n)
            p_re = int(self.num_position * 0.4 ** i)   # sic (pre_train:116)
            batch = jnp.minimum(jnp.arange(rows.shape[0]) // max(p_re, 1),
                                n - 1)
        p_last = int(self.num_position * 0.4 ** (self.num_hierarchy - 1))
        return rows.reshape(n, p_last, -1).mean(axis=1)

    def init_components(self, x, node_type, mask):
        return (self(x, train=False), self.get_aligncost(x),
                self.node_precost(x, node_type, mask),
                self.get_intracost(x, x), self.get_intercost(x, x))

    def get_aligncost(self, x: Array):
        """Per-level soft-min prototype distance, summed (pre_train:185-240)."""
        rows, batch, n = self._rows(x)
        total = 0.0
        for i in range(self.num_hierarchy):
            p_i = int(self.num_position * self.declay ** i)
            d, idx = self._assign(rows, i)
            if self.gamma == 0:
                dmin = d.min(axis=1)
            else:
                dmin = -self.gamma * jnp.log(
                    jnp.exp(-d / self.gamma).sum(axis=1) + 1e-12)
            total = total + jax.ops.segment_sum(dmin, batch, n).mean()
            seg = p_i * batch + idx
            rows = self._gread(rows, seg, p_i * n)
            p_re = int(self.num_position * 0.4 ** i)
            batch = jnp.minimum(jnp.arange(rows.shape[0]) // max(p_re, 1),
                                n - 1)
        return total

    def node_precost(self, x: Array, node_type, mask: Array) -> Array:
        """Masked per-joint body-part CE (pre_train:159-174); ``mask`` is
        (N, M, T, V, 1) — the t=0 slice gates each joint's loss."""
        n, m, t, v, c = x.shape
        h = x.mean(axis=2).reshape(-1, c)
        logits = self.fc_cls(h)
        labels = jnp.tile(jnp.asarray(node_type, jnp.int32), n * m)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        per = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        mk = mask[:, :, 0].reshape(-1).astype(jnp.float32)
        return (per * mk).sum() / (mk.sum() + 1e-12)

    def get_intracost(self, x: Array, x_modify: Array, tau: float = 0.1):
        """Row-level NCE between a clip and its augmentation
        (pre_train:128-141).

        Faithful quirk: the reference einsum is ``'bnc,bmt->bnm'``
        (pre_train.py:133) — the mislabeled ``t`` makes it an OUTER PRODUCT
        of per-row channel sums rather than an inner product; reproduced."""
        n, m, t, v, c = x.shape
        a = x.reshape(n * m, t * v, c)
        b = x_modify.reshape(n * m, t * v, c)
        sim = a.sum(-1)[:, :, None] * b.sum(-1)[:, None, :]
        sim = sim / (jnp.linalg.norm(sim, axis=1, keepdims=True) + 1e-12)
        sim = jnp.exp(sim / tau)
        eye = jnp.eye(sim.shape[1])[None]
        pos = (sim * eye).sum(axis=1) / (sim.sum(axis=1) + 1e-6)
        return -jnp.log(pos + 1e-12).mean()

    def get_intercost(self, x: Array, x_modify: Array, tau: float = 0.1):
        """Clip-level NCE (pre_train:143-157)."""
        a = x.mean(axis=(2, 3)).mean(axis=1)
        b = x_modify.mean(axis=(2, 3)).mean(axis=1)
        sim = jnp.einsum("bc,dc->bd", a, b)
        sim = sim / (jnp.linalg.norm(sim, axis=1, keepdims=True) + 1e-12)
        sim = jnp.exp(sim / tau)
        eye = jnp.eye(sim.shape[0])
        pos = (sim * eye).sum(axis=0)
        neg = (sim * (1 - eye)).sum(axis=0)
        return -jnp.log(pos / (pos + neg + 1e-6) + 1e-12).mean()


# config-buildable necks (reference necks/__init__.py; CausalNeck returns a
# (pooled, feature) tuple consumed by the GC flow, so it is composed by
# core/flows.py rather than dropped into RecognizerGCN)
NECKS = {"SimpleNeck": SimpleNeck, "SemanticNeck": SemanticNeck,
         "ReadoutNeck": ReadoutNeck, "PretrainNeck": PretrainNeck}
