"""Pixel-branch augmentation parity (reference
datasets/pipelines/augmentations.py: RandomCrop :124-239, Normalize :612-695,
ThreeCrop :769-838, TenCrop :840-920; imgs paths of CenterCrop/Flip/Resize)."""
import numpy as np
import pytest

import ref_loader
from dsgcn_tpu.data import pose_aug

RNG = np.random.default_rng(21)


@pytest.fixture(scope="module")
def refaug():
    return ref_loader.load_ref_augmentations()


def _frames(t=4, h=24, w=32, c=3, dtype=np.uint8):
    if dtype == np.uint8:
        return [RNG.integers(0, 255, (h, w, c), dtype=np.uint8)
                for _ in range(t)]
    return [RNG.standard_normal((h, w, c)).astype(np.float32)
            for _ in range(t)]


def _results(imgs, **kw):
    d = dict(imgs=[i.copy() for i in imgs],
             img_shape=imgs[0].shape[:2], modality="RGB")
    d.update(kw)
    return d


def test_random_crop_parity(refaug):
    imgs = _frames()
    kp = RNG.uniform(0, 20, (1, 4, 17, 2)).astype(np.float32)

    np.random.seed(99)
    want = refaug.RandomCrop(16)(_results(imgs, keypoint=kp.copy()))

    rng = np.random.RandomState(99)
    got = pose_aug.RandomCrop(16)(_results(imgs, keypoint=kp.copy()), rng)

    np.testing.assert_array_equal(got["crop_bbox"], want["crop_bbox"])
    np.testing.assert_array_equal(np.stack(got["imgs"]),
                                  np.stack(want["imgs"]))
    np.testing.assert_allclose(got["keypoint"], want["keypoint"])
    np.testing.assert_allclose(got["crop_quadruple"], want["crop_quadruple"])
    assert got["img_shape"] == tuple(want["img_shape"])


def test_normalize_rgb_parity(refaug):
    imgs = _frames()
    mean, std = [104.0, 117.0, 128.0], [57.0, 58.0, 59.0]
    want = refaug.Normalize(mean, std, to_bgr=True)(_results(imgs))
    got = pose_aug.Normalize(mean, std, to_bgr=True)(_results(imgs))
    np.testing.assert_allclose(got["imgs"], want["imgs"], rtol=1e-5, atol=1e-5)


def test_normalize_flow_parity(refaug):
    flow = [RNG.standard_normal((24, 32)).astype(np.float32)
            for _ in range(8)]
    want = refaug.Normalize([128, 128], [32, 32])(
        dict(imgs=[f.copy() for f in flow], img_shape=(24, 32),
             modality="Flow"))
    got = pose_aug.Normalize([128, 128], [32, 32])(
        dict(imgs=[f.copy() for f in flow], img_shape=(24, 32),
             modality="Flow"))
    np.testing.assert_allclose(got["imgs"], want["imgs"], rtol=1e-6)


def test_three_crop_parity(refaug):
    imgs = _frames(h=24, w=40)
    want = refaug.ThreeCrop(24)(_results(imgs))
    got = pose_aug.ThreeCrop(24)(_results(imgs))
    assert len(got["imgs"]) == len(want["imgs"]) == 12
    np.testing.assert_array_equal(np.stack(got["imgs"]),
                                  np.stack(want["imgs"]))
    np.testing.assert_array_equal(got["crop_bbox"], want["crop_bbox"])


def test_ten_crop_parity(refaug):
    imgs = _frames(h=24, w=32)
    want = refaug.TenCrop(16)(_results(imgs))
    got = pose_aug.TenCrop(16)(_results(imgs))
    assert len(got["imgs"]) == len(want["imgs"]) == 40
    np.testing.assert_array_equal(np.stack(got["imgs"]),
                                  np.stack(want["imgs"]))
    np.testing.assert_array_equal(got["crop_bbox"], want["crop_bbox"])


def test_center_crop_imgs_parity(refaug):
    imgs = _frames(h=24, w=32)
    kp = RNG.uniform(0, 20, (1, 4, 17, 2)).astype(np.float32)
    want = refaug.CenterCrop(16)(_results(imgs, keypoint=kp.copy()))
    got = pose_aug.CenterCrop(16)(_results(imgs, keypoint=kp.copy()))
    np.testing.assert_array_equal(np.stack(got["imgs"]),
                                  np.stack(want["imgs"]))
    np.testing.assert_allclose(got["keypoint"], want["keypoint"])


def test_flip_imgs_parity(refaug):
    imgs = _frames()
    # force-flip both sides
    np.random.seed(0)
    want = refaug.Flip(flip_ratio=1.0, left_kp=[1], right_kp=[2])(
        _results(imgs, keypoint=RNG.uniform(1, 20, (1, 4, 17, 2)).astype(
            np.float32)))
    got = pose_aug.Flip(flip_ratio=1.0, left_kp=[1], right_kp=[2])(
        _results(imgs, keypoint=want["keypoint"].copy()), np.random.RandomState(0))
    np.testing.assert_array_equal(np.stack(got["imgs"]),
                                  np.stack(want["imgs"]))


def test_resize_imgs_shared_primitive(refaug):
    """Resize pixel path: both sides resize through the same numpy bilinear
    primitive (cv2 absent), so this checks the scale/shape wiring."""
    imgs = _frames(h=24, w=32)
    want = refaug.Resize((16, 12), keep_ratio=False)(_results(imgs))
    got = pose_aug.Resize((16, 12), keep_ratio=False)(_results(imgs))
    assert np.stack(got["imgs"]).shape == np.stack(want["imgs"]).shape \
        == (4, 12, 16, 3)
    np.testing.assert_allclose(np.stack(got["imgs"]).astype(np.float32),
                               np.stack(want["imgs"]).astype(np.float32),
                               atol=1.0)


def test_pipeline_registry_has_pixel_transforms():
    from dsgcn_tpu.data.transforms import TRANSFORMS
    for name in ("RandomCrop", "Normalize", "ThreeCrop", "TenCrop"):
        assert name in TRANSFORMS, name
