"""Classification heads (reference pyskl/models/heads/simple_head.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.common import Array


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
        # already-pooled (N, C) input (e.g. from a neck readout) skips
        # pooling, mirroring simple_head.py:68 `if len(x.shape) != 2`
        if x.ndim != 2:
            assert x.ndim == 5, "expect (N, M, T, V, C) or (N, C)"
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
    """3D-CNN-mode SimpleHead (simple_head.py:77-82): global avg-pool + fc.
    A tuple/list input (SlowFast pathways, simple_head.py:79-80) is pooled
    per-pathway and concatenated on channels."""
    num_classes: int
    in_channels: int
    dropout: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x, *, train: bool) -> Array:
        if isinstance(x, (tuple, list)):
            x = jnp.concatenate(
                [item.mean(axis=tuple(range(1, item.ndim - 1)))
                 for item in x], axis=-1)
        else:
            x = x.mean(axis=tuple(range(1, x.ndim - 1)))  # (N,T,H,W,C)->(N,C)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        bias_init=nn.initializers.zeros_init(),
                        name="fc_cls")(x)


# I3DHead (simple_head.py:100-117) and SlowFastHead (simple_head.py:119-121)
# are SimpleHead in 3D mode; the tuple-concat path covers SlowFast.
I3DHead = SimpleHead3D
SlowFastHead = SimpleHead3D


class TSNHead(nn.Module):
    """2D-mode SimpleHead (simple_head.py:70-77, TSNHead at :143-159):
    input (N, S, H, W, C) segments -> spatial pool -> segment mean -> fc."""
    num_classes: int
    in_channels: int
    dropout: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        assert x.ndim == 5, "expect (N, S, H, W, C)"
        x = x.mean(axis=(2, 3)).mean(axis=1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        bias_init=nn.initializers.zeros_init(),
                        name="fc_cls")(x)


# fixed per-joint body-part labels (simple_head.py:198-201)
NODE_LABELS = {
    "nturgb+d": (0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
                 0, 1, 1, 2, 2),
    "coco": (0, 0, 0, 0, 0, 1, 2, 1, 2, 1, 2, 3, 4, 3, 4, 3, 4),
}


class HGTHead(nn.Module):
    """Classification head with an auxiliary node-type classifier
    (reference simple_head.py:162-245, DS-GCN's semantic supervision).

    Returns ``(cls_score, node_cls_loss)``: the action logits plus the
    cross-entropy of predicting each joint's body part from its pooled
    feature.
    """
    num_classes: int
    in_channels: int
    pose_type: str = "nturgb+d"
    dropout: float = 0.5
    init_std: float = 0.01
    num_parts: int = 5

    @nn.compact
    def __call__(self, x: Array, *, train: bool):
        assert x.ndim == 5, "expect (N, M, T, V, C)"
        n, m, t, v, c = x.shape
        drop = (lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)) \
            if self.dropout > 0 else (lambda h: h)

        pooled = x.mean(axis=(2, 3)).mean(axis=1)           # (N, C)
        cls_score = nn.Dense(self.num_classes,
                             kernel_init=nn.initializers.normal(self.init_std),
                             bias_init=nn.initializers.zeros_init(),
                             name="fc_cls")(drop(pooled))

        # node-type branch (simple_head.py:233-243): pool T, mean persons
        nodes = x.mean(axis=2).mean(axis=1)                 # (N, V, C)
        node_score = nn.Dense(self.num_parts,
                              kernel_init=nn.initializers.normal(self.init_std),
                              bias_init=nn.initializers.zeros_init(),
                              name="node_cls")(drop(nodes))  # (N, V, P)
        labels = jnp.asarray(NODE_LABELS[self.pose_type], jnp.int32)
        assert labels.shape[0] == v
        logp = jax.nn.log_softmax(node_score.astype(jnp.float32), axis=-1)
        node_loss = -jnp.take_along_axis(
            logp, jnp.broadcast_to(labels[None, :, None], (n, v, 1)),
            axis=-1).mean()
        return cls_score, node_loss


class ClsHead(nn.Module):
    """Pre-pooled-feature head (simple_head.py:247-296): dropout + fc on
    an (N, C) input."""
    num_classes: int
    in_channels: int
    dropout: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        assert x.ndim == 2
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        bias_init=nn.initializers.zeros_init(),
                        name="fc_cls")(x)


class GCHead(nn.Module):
    """Graph-classification head over adjacency matrices
    (simple_head.py:298-366): (N, M, V, V) -> flatten -> person mean -> fc."""
    num_classes: int
    in_channels: int
    dropout: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        assert x.ndim == 4, "expect (N, M, V, V)"
        n, m = x.shape[:2]
        x = x.reshape(n, m, -1).mean(axis=1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(self.init_std),
                        bias_init=nn.initializers.zeros_init(),
                        name="fc_cls")(x)


class RGBPoseHead(nn.Module):
    """Two-stream head for RGBPoseConv3D (reference heads/rgbpose_head.py:9-79):
    pool each pathway, separate dropout + fc; returns dict of logits."""
    num_classes: int
    in_channels: tuple  # (rgb_C, pose_C)
    dropout: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x, *, train: bool):
        x_rgb, x_pose = x
        x_rgb = x_rgb.mean(axis=tuple(range(1, x_rgb.ndim - 1)))
        x_pose = x_pose.mean(axis=tuple(range(1, x_pose.ndim - 1)))
        if self.dropout > 0:
            drop = nn.Dropout(self.dropout, deterministic=not train)
            x_rgb, x_pose = drop(x_rgb), drop(x_pose)
        dense = lambda name: nn.Dense(
            self.num_classes, kernel_init=nn.initializers.normal(self.init_std),
            bias_init=nn.initializers.zeros_init(), name=name)
        return {"rgb": dense("fc_rgb")(x_rgb),
                "pose": dense("fc_pose")(x_pose)}
