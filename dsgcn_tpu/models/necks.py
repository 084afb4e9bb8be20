"""Necks: feature readouts between backbone and head.

Reference: pyskl/models/necks/Simple_neck.py:15-107 (SimpleNeck with the
node_precost auxiliary body-part loss), greadout.py:15 (ReadoutNeck joint
readouts).
"""
from __future__ import annotations



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


class ReadoutNeck(nn.Module):
    """Joint-dimension readout: mean / max / sum / attention over V
    (reference greadout.py:15)."""
    in_channels: int
    mode: str = "mean"    # mean | max | sum | attention

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        # (N, M, T, V, C): pool T first, read out V, then persons
        x = x.mean(axis=2)                       # (N, M, V, C)
        if self.mode == "mean":
            x = x.mean(axis=2)
        elif self.mode == "max":
            x = x.max(axis=2)
        elif self.mode == "sum":
            x = x.sum(axis=2)
        elif self.mode == "attention":
            gate = nn.Dense(1, name="att_gate")(x)          # (N, M, V, 1)
            w = jax.nn.softmax(gate, axis=2)
            x = (x * w).sum(axis=2)
        else:
            raise ValueError(self.mode)
        return x.mean(axis=1)                    # (N, C)


NECKS = {"SimpleNeck": SimpleNeck, "ReadoutNeck": ReadoutNeck}


def build_neck(cfg):
    cfg = dict(cfg)
    typ = cfg.pop("type")
    return NECKS[typ](**cfg)
