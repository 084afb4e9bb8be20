"""Recognizer variants (reference recognizers/recognizer{2d,3d}.py,
mm_recognizer3d.py) through the builder surface."""
import numpy as np

import jax
import jax.numpy as jnp

from dsgcn_tpu.core.losses import mm_cross_entropy
from dsgcn_tpu.models.builder import build_model

RNG = np.random.default_rng(5)


def test_recognizer2d_segments():
    m = build_model(dict(
        type="Recognizer2D",
        backbone=dict(type="PoTion", in_channels=17, channels=[8, 16],
                      num_layers=[1, 1]),
        cls_head=dict(type="TSNHead", num_classes=9, in_channels=16)))
    x = jnp.asarray(RNG.standard_normal((2, 3, 16, 16, 17)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (2, 9)
    assert m.apply(v, x, train=False, feat_ext=True).shape == (2, 16)


def test_recognizer3d_feat_ext():
    m = build_model(dict(
        type="Recognizer3D",
        backbone=dict(type="X3D", gamma_w=1.0, gamma_b=2.0, gamma_d=1.0,
                      num_stages=2, stage_blocks=[1, 1],
                      spatial_strides=[2, 2], se_ratio=0.5),
        cls_head=dict(type="I3DHead", num_classes=9, in_channels=96)))
    x = jnp.zeros((1, 4, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 9)
    assert m.apply(v, x, train=False, feat_ext=True).shape == (1, 96)


def test_mm_recognizer3d_and_loss():
    m = build_model(dict(
        type="MMRecognizer3D",
        backbone=dict(type="RGBPoseConv3D"),
        cls_head=dict(type="RGBPoseHead", num_classes=9,
                      in_channels=[2048, 512])))
    imgs = jnp.zeros((1, 8, 32, 32, 3))
    hm = jnp.zeros((1, 32, 8, 8, 17))
    v = m.init(jax.random.PRNGKey(0), imgs, hm, train=False)
    scores = m.apply(v, imgs, hm, train=False)
    assert set(scores) == {"rgb", "pose"}
    assert scores["rgb"].shape == (1, 9)

    total, parts = mm_cross_entropy(scores, jnp.array([3]),
                                    dict(rgb=1.0, pose=0.5))
    # zero-input random-head logits are uniform -> CE == log(9)
    np.testing.assert_allclose(float(parts["rgb_loss_cls"]), np.log(9),
                               rtol=1e-4)
    np.testing.assert_allclose(float(total),
                               float(parts["rgb_loss_cls"])
                               + float(parts["pose_loss_cls"]), rtol=1e-6)
