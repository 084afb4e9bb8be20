"""Classification heads (reference pyskl/models/heads/simple_head.py)."""
from __future__ import annotations

import math


import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.common import Array, torch_default_bias


class GCNHead(nn.Module):
    """GCN-mode SimpleHead (simple_head.py:83-96, GCNHead at :125-140).

    Pools (N, M, T, V, C) -> mean over (T, V) then mean over persons M,
    optional dropout, linear classifier with normal(std=0.01) init.
    """
    num_classes: int
    in_channels: int
    dropout: float = 0.0
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        assert x.ndim == 5, "expect (N, M, T, V, C)"
        x = x.mean(axis=(2, 3))    # (N, M, C)
        x = x.mean(axis=1)         # (N, C)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(self.init_std),
            bias_init=nn.initializers.zeros_init(),
            name="fc_cls")(x)


class SimpleHead3D(nn.Module):
    """3D-CNN-mode SimpleHead (simple_head.py:77-82): global avg-pool + fc."""
    num_classes: int
    in_channels: int
    dropout: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        # (N, T, H, W, C) -> (N, C)
        x = x.mean(axis=tuple(range(1, x.ndim - 1)))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        bias_init=nn.initializers.zeros_init(),
                        name="fc_cls")(x)
