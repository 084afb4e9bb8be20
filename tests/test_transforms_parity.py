"""Parity of data-pipeline transforms vs the reference pipeline classes."""
import numpy as np
import pytest

import ref_loader
from dsgcn_tpu.data import transforms as T


@pytest.fixture(scope="module")
def refpipe():
    return ref_loader.load_ref_pipelines()


def _fake_sample(m=2, t=48, v=25, c=3, seed=0, empty_frames=()):
    rng = np.random.default_rng(seed)
    kp = rng.standard_normal((m, t, v, c)).astype(np.float32)
    for i in empty_frames:
        kp[0, i] = 0
    return dict(keypoint=kp.copy(), total_frames=t, label=3, start_index=0)


@pytest.mark.parametrize("align_spine", [True, False])
@pytest.mark.parametrize("empty", [(), (0, 5, 7)])
def test_prenormalize3d(refpipe, align_spine, empty):
    ref = refpipe["pose_related"].PreNormalize3D(align_spine=align_spine)
    ours = T.PreNormalize3D(align_spine=align_spine)
    a = ref(_fake_sample(empty_frames=empty))
    b = ours(_fake_sample(empty_frames=empty))
    np.testing.assert_allclose(b["keypoint"], a["keypoint"], rtol=1e-6, atol=1e-6)
    assert a["total_frames"] == b["total_frames"]


def test_prenormalize3d_second_body_denser(refpipe):
    # body 0 has more empty frames than body 1 -> bodies swapped
    s = _fake_sample()
    s["keypoint"][0, :30] = 0
    ref = refpipe["pose_related"].PreNormalize3D()
    ours = T.PreNormalize3D()
    a = ref({**s, "keypoint": s["keypoint"].copy()})
    b = ours({**s, "keypoint": s["keypoint"].copy()})
    np.testing.assert_allclose(b["keypoint"], a["keypoint"], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("feats", [["j"], ["b"], ["jm"], ["bm"], ["j", "b"],
                                   ["j", "b", "jm", "bm"]])
def test_gen_ske_feat(refpipe, feats):
    ref = refpipe["pose_related"].GenSkeFeat(dataset="nturgb+d", feats=feats)
    ours = T.GenSkeFeat(dataset="nturgb+d", feats=feats)
    a = ref(_fake_sample())
    b = ours(_fake_sample())
    np.testing.assert_allclose(b["keypoint"], a["keypoint"], rtol=1e-6, atol=0)


@pytest.mark.parametrize("num_frames,clip_len,num_clips", [
    (300, 100, 1), (300, 100, 10), (80, 100, 10), (150, 100, 10),
    (5, 60, 10), (60, 60, 1), (61, 60, 2),
])
def test_uniform_sample_test_mode_bit_parity(refpipe, num_frames, clip_len,
                                             num_clips):
    """Test-mode clip indices must be bit-identical to the reference (seed=255)."""
    ref = refpipe["sampling"].UniformSampleFrames(
        clip_len=clip_len, num_clips=num_clips, test_mode=True)
    ours = T.UniformSampleFrames(clip_len=clip_len, num_clips=num_clips,
                                 test_mode=True)
    s = dict(total_frames=num_frames, start_index=0)
    a = ref(dict(s))
    b = ours(dict(s))
    np.testing.assert_array_equal(b["frame_inds"], a["frame_inds"])
    assert b["num_clips"] == a["num_clips"]
    assert b["clip_len"] == a["clip_len"]


def test_uniform_sample_train_mode_same_rng_sequence(refpipe):
    """Train mode consumes the same RNG call sequence as the reference."""
    for num_frames in (30, 90, 150, 400):
        ref = refpipe["sampling"].UniformSampleFrames(clip_len=60, num_clips=1)
        ours = T.UniformSampleFrames(clip_len=60, num_clips=1)
        np.random.seed(7)
        a = ref(dict(total_frames=num_frames, start_index=0))
        b = ours(dict(total_frames=num_frames, start_index=0),
                 rng=np.random.RandomState(7))
        np.testing.assert_array_equal(b["frame_inds"], a["frame_inds"])


def test_random_rot_same_rng_sequence(refpipe):
    ref = refpipe["pose_related"].RandomRot(theta=0.2)
    ours = T.RandomRot(theta=0.2)
    np.random.seed(3)
    a = ref(_fake_sample())
    b = ours(_fake_sample(), rng=np.random.RandomState(3))
    np.testing.assert_allclose(b["keypoint"], a["keypoint"], rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("m", [1, 2, 3])
@pytest.mark.parametrize("nc", [1, 4])
def test_format_gcn_input(refpipe, m, nc):
    ref = refpipe["pose_related"].FormatGCNInput(num_person=2)
    ours = T.FormatGCNInput(num_person=2)
    t = 48
    s = _fake_sample(m=m, t=t)
    s["num_clips"] = nc
    a = ref({**s, "keypoint": s["keypoint"].copy()})
    b = ours({**s, "keypoint": s["keypoint"].copy()})
    np.testing.assert_array_equal(b["keypoint"], a["keypoint"])
    assert b["keypoint"].shape == (nc, 2, t // nc, 25, 3)


def test_full_train_pipeline_shapes():
    """The DS-GCN train pipeline (configs/dsstgcn/ntu60_xsub_3dkp/j.py:10-19)."""
    pipe = T.build_pipeline([
        dict(type="PreNormalize3D", align_spine=False),
        dict(type="RandomRot", theta=0.2),
        dict(type="GenSkeFeat", feats=["j"]),
        dict(type="UniformSample", clip_len=60),
        dict(type="PoseDecode"),
        dict(type="FormatGCNInput"),
        dict(type="Collect", keys=["keypoint", "label"], meta_keys=[]),
    ])
    out = pipe(_fake_sample(), rng=np.random.RandomState(0))
    assert out["keypoint"].shape == (1, 2, 60, 25, 3)
    assert out["label"] == 3


def test_full_test_pipeline_shapes():
    pipe = T.build_pipeline([
        dict(type="PreNormalize3D", align_spine=False),
        dict(type="GenSkeFeat", feats=["j"]),
        dict(type="UniformSample", clip_len=60, num_clips=10, test_mode=True),
        dict(type="PoseDecode"),
        dict(type="FormatGCNInput"),
        dict(type="Collect", keys=["keypoint", "label"], meta_keys=[]),
    ])
    out = pipe(_fake_sample())
    assert out["keypoint"].shape == (10, 2, 60, 25, 3)
