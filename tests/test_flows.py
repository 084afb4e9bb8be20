"""Variant-recognizer training flows (reference recognizergcnPre.py:22-78,
Recognizergcn_gc.py:19-52)."""
import numpy as np

import jax
import jax.numpy as jnp

from dsgcn_tpu.core.flows import (NTU_NODE_TYPE, gc_recognizer_losses,
                                  mask_keypoints, pretrain_losses)
from dsgcn_tpu.models.builder import build_backbone, build_head
from dsgcn_tpu.models.necks import PretrainNeck

RNG = np.random.default_rng(41)


def test_mask_keypoints_semantics():
    kp = jnp.asarray(RNG.standard_normal((2, 2, 4, 25, 3)).astype(np.float32))
    masked, mask = mask_keypoints(jax.random.PRNGKey(0), kp, ratio=0.5)
    assert mask.shape == (2, 2, 4, 25, 1)
    m = np.asarray(mask[:, :, 0, :, 0])
    assert (m.sum(axis=-1) == 13).all()       # 25 - int(0.5*25)=12 dropped
    got = np.asarray(masked)
    # faithful quirk: masked coords become exactly 1.0 (not 0)
    dropped = np.asarray(mask) == 0
    assert (got[np.broadcast_to(dropped, got.shape)] == 1.0).all()


def test_pretrain_flow_end_to_end():
    """Backbone -> PretrainNeck masked-pretraining losses."""
    bb = build_backbone(dict(type="STGCN", num_stages=3, inflate_stages=[2],
                             down_stages=[2],
                             graph_cfg=dict(layout="nturgb+d",
                                            mode="spatial")))
    kp = jnp.asarray(RNG.standard_normal((2, 2, 8, 25, 3)).astype(np.float32))
    v = bb.init(jax.random.PRNGKey(0), kp, train=False)
    feats = bb.apply(v, kp, train=False)
    masked, mask = mask_keypoints(jax.random.PRNGKey(1), kp)
    feats_m = bb.apply(v, masked, train=False)

    neck = PretrainNeck(in_channels=feats.shape[-1], num_position=20)
    nv = neck.init(jax.random.PRNGKey(2), feats, NTU_NODE_TYPE, mask,
                   method=PretrainNeck.init_components)
    losses = pretrain_losses(neck, nv, feats, feats_m, mask)
    assert set(losses) == {"node_loss", "graph_loss", "loss_cls"}
    assert np.isfinite(float(losses["loss_cls"]))
    np.testing.assert_allclose(
        float(losses["loss_cls"]),
        float(losses["node_loss"]) + float(losses["graph_loss"]), rtol=1e-6)


def test_gc_recognizer_flow():
    """GCGCN_component -> GCHead -> composite GC objective."""
    bb = build_backbone(dict(type="GCGCN_component"))
    head = build_head(dict(type="GCHead", num_classes=7, in_channels=625,
                           dropout=0))
    kp = jnp.asarray(RNG.standard_normal((2, 2, 20, 25, 3)).astype(np.float32))
    v = bb.init(jax.random.PRNGKey(0), kp, train=False)
    outputs = bb.apply(v, kp, train=False)
    hv = head.init(jax.random.PRNGKey(1), outputs[0], train=False)
    logits = head.apply(hv, outputs[0], train=False)
    assert logits.shape == (2, 7)

    total, parts = gc_recognizer_losses(outputs, logits,
                                        jnp.asarray([1, 3]))
    assert {"loss_cls", "predic_loss", "panelty_loss",
            "ridge_loss"} <= set(parts)
    np.testing.assert_allclose(float(total),
                               sum(float(x) for x in parts.values()),
                               rtol=1e-5)
