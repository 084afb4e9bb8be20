"""Classification losses (reference pyskl/models/losses/cross_entropy_loss.py)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.common import Array


def cross_entropy(cls_score: Array, label: Array,
                  class_weight: Optional[Array] = None,
                  loss_weight: float = 1.0) -> Array:
    """Hard- or soft-label cross entropy.

    Hard labels: int (N,) -> standard CE (cross_entropy_loss.py:42-78).
    Soft labels: float (N, K) -> -sum(logsoftmax * label) per sample
    (cross_entropy_loss.py:55-66), used for multi-stream score fusion training.
    """
    logp = jax.nn.log_softmax(cls_score, axis=-1)
    if label.ndim == cls_score.ndim:
        lsm = -(logp * label)
        if class_weight is not None:
            lsm = lsm * class_weight[None]
        loss = lsm.sum(axis=-1)
        if class_weight is not None:
            loss = loss / (class_weight[None] * label).sum(axis=-1)
        loss = loss.mean()
    else:
        picked = jnp.take_along_axis(logp, label[:, None], axis=-1)[:, 0]
        if class_weight is not None:
            w = class_weight[label]
            loss = -(picked * w).sum() / w.sum()
        else:
            loss = -picked.mean()
    return loss * loss_weight


def bce_with_logits(cls_score: Array, label: Array,
                    class_weight: Optional[Array] = None,
                    loss_weight: float = 1.0) -> Array:
    """Binary CE with logits for multi-label targets
    (reference cross_entropy_loss.py BCELossWithLogits)."""
    logp = jax.nn.log_sigmoid(cls_score)
    lognp = jax.nn.log_sigmoid(-cls_score)
    loss = -(label * logp + (1.0 - label) * lognp)
    if class_weight is not None:
        loss = loss * class_weight[None]
    return loss.mean() * loss_weight


def top_k_correct(cls_score: Array, label: Array, k: int) -> Array:
    """Fraction of samples whose true label is in the top-k scores
    (on-device metric, reference heads/base.py:66-72)."""
    topk = jnp.argsort(cls_score, axis=-1)[:, -k:]
    hit = (topk == label[:, None]).any(axis=-1)
    return hit.mean()


def mm_cross_entropy(scores: dict, labels, loss_weights=None):
    """Weighted per-stream CE for multimodal recognizers (reference
    mm_recognizer3d.py:26-34): total = sum_k w_k * CE(scores[k], labels).

    Returns (total_loss, {name_loss: value})."""
    import jax.numpy as jnp
    if loss_weights is None:
        loss_weights = {k: 1.0 for k in scores}
    parts = {}
    total = 0.0
    for name, score in scores.items():
        w = loss_weights.get(name, 1.0) if isinstance(loss_weights, dict) \
            else loss_weights
        l = cross_entropy(score, labels)
        parts[f"{name}_loss_cls"] = l * w
        total = total + l * w
    return total, parts
