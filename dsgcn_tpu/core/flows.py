"""Training flows of the reference's variant recognizers, as pure functions.

TPU-native consolidation of the thin recognizer subclasses
(reference pyskl/models/recognizers/):
  * recognizergcnPre.py:22-78  -> mask_keypoints + pretrain_losses
  * Recognizergcn_gc.py:19-52  -> gc_recognizer_losses
  * recognizergcn_gt.py:19-44  -> plain train path (RecognizerGCN + neck)
  * RecongnizerGCNcau.py:19-44 -> consumes the dead STGCN_causal backbone
    (see COVERAGE); its loss shape is CE + causal_loss[-1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .losses import cross_entropy

NTU_NODE_TYPE = (0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
                 0, 1, 1, 2, 2)


def mask_keypoints(rng, keypoint, ratio: float = 0.5):
    """Random joint masking for masked pretraining
    (recognizergcnPre.py:29-39): zero int(ratio*V) joints per (sample,
    person), then — faithful quirk — set every exact-zero coordinate to 1.0
    (recognizergcnPre.py:39 ``keypoint_mask[keypoint_mask==0]=1.0``, which
    also rewrites naturally-zero coords).

    Returns (masked_keypoint, mask) with mask shaped (N, M, T, V, 1).
    """
    n, m, t, v, c = keypoint.shape
    sample = int(ratio * v)
    keys = jax.random.split(rng, n * m)
    perms = jax.vmap(lambda k: jax.random.permutation(k, v))(keys)
    drop = perms[:, :sample]                                   # (NM, S)
    mask = jnp.ones((n * m, v))
    mask = mask.at[jnp.arange(n * m)[:, None], drop].set(0.0)
    mask = jnp.broadcast_to(mask[:, None, :, None],
                            (n * m, t, v, 1)).reshape(n, m, t, v, 1)
    masked = keypoint * mask
    masked = jnp.where(masked == 0, 1.0, masked)
    return masked, mask


def pretrain_losses(neck, neck_variables, feats, feats_masked, mask,
                    node_type=NTU_NODE_TYPE):
    """Masked-pretraining objective (recognizergcnPre.py:52-74):
    node-type CE on the masked view + clip-level NCE between views."""
    from ..models.necks import PretrainNeck
    node = neck.apply(neck_variables, feats_masked, node_type, mask,
                      method=PretrainNeck.node_precost)
    graph = neck.apply(neck_variables, feats, feats_masked,
                       method=PretrainNeck.get_intercost)
    return {"node_loss": node, "graph_loss": graph,
            "loss_cls": node + graph}


def gc_recognizer_losses(outputs, logits, labels):
    """Granger-causality recognizer objective (Recognizergcn_gc.py:26-52):
    CE on the GCHead logits over the causality graph + the backbone's
    prediction/GSGL/ridge terms.  ``outputs`` = (gc, predic_loss, panelty,
    ridge) from GCGCN_component (or (loss, gc, gsgl) from GCGCN)."""
    if len(outputs) == 4:
        _, predic, panelty, ridge = outputs
        extra = {"predic_loss": jnp.mean(predic), "panelty_loss": panelty,
                 "ridge_loss": ridge}
    else:
        predic, _, gsgl = outputs
        extra = {"predic_loss": jnp.mean(predic), "panelty_loss": gsgl}
    ce = cross_entropy(logits, labels)
    total = ce + sum(extra.values())
    return total, {"loss_cls": ce, **extra}


def smoe_recognizer_losses(cls_logits, labels, important_loss, *,
                           current_epoch=0, warm_up=0, lam="gradual",
                           penalty_value=None):
    """SMoE recognizer objective (RecognizerGCN_sMoE.py:22-70): CE on the
    ClsHead logits over the gate-combined pooled feature, plus the gating
    balance loss, plus — ONLY while current_epoch <= warm_up — the GSGL
    regularizer scaled by lam ('gradual' ramps lam = min(epoch/warm_up, 1),
    :46-62).  ``penalty_value`` is smoe_regularize(...) evaluated at lam=1
    (scaling applied here so the lam schedule stays host-side)."""
    losses = {"loss_cls": cross_entropy(cls_logits, labels),
              "important_loss": important_loss}
    if penalty_value is not None and current_epoch <= warm_up:
        if lam == "gradual":
            lam = min(current_epoch / max(warm_up, 1), 1.0)
        losses["panelty_loss"] = lam * penalty_value   # reference spelling
    losses["loss"] = sum(losses.values())
    return losses


def gcnr_losses(cls_logits, labels, align_cost):
    """RecognizerGCNR objective (recognizergcnR.py:22-52): CE on the head
    over the neck's hierarchical readout + the neck's soft-min alignment
    cost as 'neck_loss' (get_aligncost).  Pairs with PretrainNeck /
    MultiModuleHook-style alternating optimizers (make_sparse_optimizer)."""
    loss_cls = cross_entropy(cls_logits, labels)
    return {"loss_cls": loss_cls, "neck_loss": align_cost,
            "loss": loss_cls + align_cost}
