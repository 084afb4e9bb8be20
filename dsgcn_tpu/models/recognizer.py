"""Recognizer: backbone + head, with train/test forward semantics.

Reference: pyskl/models/recognizers/recognizergcn.py (forward_train :20-51,
forward_test :53-107) and base.py average_clip (:93-116).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.common import Array


class RecognizerGCN(nn.Module):
    """Composes a GCN backbone and a classification head.

    ``__call__`` takes ``(N, M, T, V, C)`` and returns logits ``(N, classes)``.
    Clip folding/averaging for multi-clip test is done by the caller
    (:func:`forward_test`) so the jitted forward stays single-clip.
    """
    backbone: nn.Module
    head: nn.Module
    compute_dtype: Optional[str] = None   # e.g. 'bfloat16' for MXU-rate matmuls

    def __call__(self, keypoint: Array, *, train: bool) -> Array:
        if self.compute_dtype is not None:
            keypoint = keypoint.astype(self.compute_dtype)
        feat = self.backbone(keypoint, train=train)
        logits = self.head(feat, train=train)
        if self.compute_dtype is not None:
            logits = logits.astype(jnp.float32)
        return logits

    def extract_feat(self, keypoint: Array, *, train: bool = False) -> Array:
        return self.backbone(keypoint, train=train)


def extract_pooled_feat(model, variables, keypoint: Array,
                        pool_opt: str = "nmtv",
                        score_ext: bool = False) -> Array:
    """Pooled backbone features / per-location class scores for analysis
    (reference recognizergcn.py:53-107 feat_ext/score_ext).

    keypoint: (N, M, T, V, C); pool_opt: subset of 'nmtv' dims to mean over
    ('none' keeps all).  With score_ext, the classifier weights are applied
    per location before pooling (recognizergcn.py:88-93).
    """
    feat = model.backbone.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables.get("batch_stats", {}).get("backbone", {})},
        keypoint, train=False)                       # (N, M, T', V, C')
    dim_idx = dict(n=0, m=1, t=2, v=3)
    if score_ext:
        head_p = variables["params"]["head"]["fc_cls"]
        feat = jnp.einsum("nmtvc,co->nmtvo", feat, head_p["kernel"]) \
            + head_p["bias"]
    if pool_opt != "none":
        for d in pool_opt:
            feat = feat.mean(axis=dim_idx[d], keepdims=True)
    return feat


def average_clip(cls_score: Array, mode: Optional[str] = "prob") -> Array:
    """Average class scores over clips: (N, nc, K) -> (N, K)
    (reference base.py:93-116)."""
    if mode is None:
        return cls_score
    if mode == "prob":
        return jax.nn.softmax(cls_score, axis=2).mean(axis=1)
    if mode == "score":
        return cls_score.mean(axis=1)
    raise ValueError(f"average_clips={mode!r} not supported")
