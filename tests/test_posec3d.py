"""PoseC3D pathway: heatmap generation parity vs reference + SlowOnly smoke."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_loader
from dsgcn_tpu.data.heatmap import GeneratePoseTarget

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def ref_hm():
    import importlib
    ref_loader._install_stubs()
    pipes = ref_loader.load_ref_pipelines()
    return importlib.import_module("refds.pipelines.heatmap_related")


def _sample(m=2, t=4, v=17, h=48, w=56):
    kp = RNG.uniform(0, [w - 1, h - 1], size=(m, t, v, 2)).astype(np.float32)
    score = RNG.uniform(0.2, 1.0, size=(m, t, v)).astype(np.float32)
    return dict(keypoint=kp, keypoint_score=score, img_shape=(h, w))


@pytest.mark.parametrize("kwargs", [
    dict(with_kp=True),
    dict(with_kp=True, sigma=2.0),
    dict(with_kp=False, with_limb=True),
    dict(with_kp=True, double=True),
    dict(with_kp=True, use_score=False),
])
def test_generate_pose_target_parity(ref_hm, kwargs):
    s = _sample()
    ref = ref_hm.GeneratePoseTarget(**kwargs)
    want = ref(dict(s))["imgs"]                       # (T, C, H, W)
    ours = GeneratePoseTarget(channels_last=False, **kwargs)
    got = ours(dict(s))["imgs"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_posec3d_slowonly_forward():
    from dsgcn_tpu.models.cnns import RecognizerPoseC3D, posec3d_slowonly
    model = RecognizerPoseC3D(backbone=posec3d_slowonly(), num_classes=60)
    x = jnp.zeros((1, 8, 56, 56, 17))                 # (N, T, H, W, V)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(v, x, train=False)
    assert y.shape == (1, 60)
    # feature dims: 3 stages from base 32 -> 32*4*4 = 512 channels
    feat = model.backbone.apply(
        {"params": v["params"]["backbone"],
         "batch_stats": v["batch_stats"]["backbone"]}, x, train=False)
    assert feat.shape == (1, 4, 7, 7, 512)


def test_posec3d_trains():
    from dsgcn_tpu.models.cnns import RecognizerPoseC3D, posec3d_slowonly
    model = RecognizerPoseC3D(backbone=posec3d_slowonly(depth=50,
                                                        stage_blocks=(1, 1, 1)),
                              num_classes=5)
    x = jnp.asarray(RNG.standard_normal((2, 4, 32, 32, 17)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    y, muts = model.apply(v, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})
    assert y.shape == (2, 5)
    g = jax.grad(lambda p: model.apply(
        {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}
    )[0].sum())(v["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_posec3d_full_pipeline():
    """UniformSample -> PoseDecode -> PoseCompact -> Resize -> RRC -> Resize ->
    Flip -> GeneratePoseTarget (the pyskl posec3d practice)."""
    from dsgcn_tpu.data.transforms import build_pipeline
    pipe = build_pipeline([
        dict(type="UniformSampleFrames", clip_len=8),
        dict(type="PoseDecode"),
        dict(type="PoseCompact", hw_ratio=1.0, allow_imgpad=True),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="RandomResizedCrop", area_range=(0.56, 1.0)),
        dict(type="Resize", scale=(56, 56), keep_ratio=False),
        dict(type="Flip", flip_ratio=0.5),
        dict(type="GeneratePoseTarget", sigma=0.6, use_score=True),
        dict(type="FormatHeatmapInput"),
        dict(type="Collect", keys=["imgs", "label"]),
    ])
    kp = RNG.uniform(10, 200, size=(2, 40, 17, 2)).astype(np.float32)
    score = RNG.uniform(0.3, 1.0, size=(2, 40, 17)).astype(np.float32)
    out = pipe(dict(keypoint=kp, keypoint_score=score, img_shape=(240, 320),
                    total_frames=40, start_index=0, label=7),
               rng=np.random.RandomState(0))
    assert out["imgs"].shape == (1, 8, 56, 56, 17)
    assert out["imgs"].max() > 0
