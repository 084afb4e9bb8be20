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
    neck: Optional[nn.Module] = None      # readout between backbone and head
    compute_dtype: Optional[str] = None   # e.g. 'bfloat16' for MXU-rate matmuls

    def __call__(self, keypoint: Array, *, train: bool) -> Array:
        if self.compute_dtype is not None:
            keypoint = keypoint.astype(self.compute_dtype)
        feat = self.backbone(keypoint, train=train)
        if self.neck is not None:
            # x = self.neck(x) before the head, as in the reference's
            # neck-bearing recognizers (recognizergcnR.py:30-31,
            # Recognizergcn_gc.py:37-39); the head sees the pooled (N, C)
            feat = self.neck(feat, train=train)
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


class Recognizer3D(nn.Module):
    """3D-CNN recognizer (reference recognizers/recognizer3d.py:10-85):
    backbone over (N, T, H, W, C) volumes + any 3D head.

    Multi-clip folding and score averaging stay outside the jitted forward
    (callers fold (N, S, ...) -> (N*S, ...) and use :func:`average_clip`),
    mirroring how the reference reshapes in forward_test (:31-33).  With
    feat_ext the pooled backbone feature is returned instead of logits
    (:58-78).
    """
    backbone: nn.Module
    head: nn.Module
    compute_dtype: Optional[str] = None

    def __call__(self, x: Array, *, train: bool, feat_ext: bool = False):
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        feat = self.backbone(x, train=train)
        if feat_ext:
            if isinstance(feat, (tuple, list)):
                pooled = jnp.concatenate(
                    [f.mean(axis=tuple(range(1, f.ndim - 1))) for f in feat],
                    axis=-1)
            else:
                pooled = feat.mean(axis=tuple(range(1, feat.ndim - 1)))
            return pooled.astype(jnp.float32)
        logits = self.head(feat, train=train)
        if self.compute_dtype is not None:
            logits = logits.astype(jnp.float32)
        return logits


class Recognizer2D(nn.Module):
    """2D-CNN recognizer over frame segments (reference recognizer2d.py:9-58):
    (N, S, H, W, C) -> fold segments -> 2D backbone -> unfold -> 2D head
    (segment-mean pooling inside the head)."""
    backbone: nn.Module
    head: nn.Module
    compute_dtype: Optional[str] = None

    def __call__(self, x: Array, *, train: bool, feat_ext: bool = False):
        n, s = x.shape[:2]
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        flat = x.reshape((n * s,) + x.shape[2:])
        feat = self.backbone(flat, train=train)          # (N*S, H', W', C')
        feat = feat.reshape((n, s) + feat.shape[1:])
        if feat_ext:
            return feat.mean(axis=(2, 3)).mean(axis=1).astype(jnp.float32)
        logits = self.head(feat, train=train)
        if self.compute_dtype is not None:
            logits = logits.astype(jnp.float32)
        return logits


class MMRecognizer3D(nn.Module):
    """Multimodal RGB + pose recognizer (reference mm_recognizer3d.py:6-62):
    dual-input backbone (RGBPoseConv3D) + RGBPoseHead; returns the dict of
    per-stream logits {'rgb': ..., 'pose': ...}."""
    backbone: nn.Module
    head: nn.Module
    compute_dtype: Optional[str] = None

    def __call__(self, imgs: Array, heatmap_imgs: Array, *, train: bool):
        if self.compute_dtype is not None:
            imgs = imgs.astype(self.compute_dtype)
            heatmap_imgs = heatmap_imgs.astype(self.compute_dtype)
        feats = self.backbone(imgs, heatmap_imgs, train=train)
        scores = self.head(feats, train=train)
        if self.compute_dtype is not None:
            scores = {k: v.astype(jnp.float32) for k, v in scores.items()}
        return scores
