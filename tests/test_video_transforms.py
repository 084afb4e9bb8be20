"""Video-branch transforms parity (reference loading.py ArrayDecode :122-180,
sampling.py SampleFrames :284-470, UniformSample_order :195-282)."""
import numpy as np
import pytest

import ref_loader
from dsgcn_tpu.data import video as vid
from dsgcn_tpu.data.transforms import UniformSampleOrder

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def refsampling():
    return ref_loader.load_ref_pipelines()["sampling"]


@pytest.fixture(scope="module")
def refloading():
    ref_loader._install_stubs()
    import importlib
    ref_loader.load_ref_pipelines()
    return importlib.import_module("refds.pipelines.loading")


@pytest.mark.parametrize("test_mode,total,clip_len,interval,num_clips", [
    (False, 100, 8, 2, 3),
    (False, 10, 8, 2, 3),      # short video
    (True, 100, 8, 2, 3),
    (True, 100, 8, 1, 1),
])
def test_sample_frames_parity(refsampling, test_mode, total, clip_len,
                              interval, num_clips):
    # reference uses the removed np.int alias (sampling.py:440) — restore it
    # for the oracle call
    had = hasattr(np, "int")
    if not had:
        np.int = int
    try:
        ref = refsampling.SampleFrames(clip_len, frame_interval=interval,
                                       num_clips=num_clips,
                                       test_mode=test_mode)
        np.random.seed(7)
        want = ref(dict(total_frames=total, start_index=0))
    finally:
        if not had:
            del np.int

    ours = vid.SampleFrames(clip_len, frame_interval=interval,
                            num_clips=num_clips, test_mode=test_mode)
    got = ours(dict(total_frames=total, start_index=0),
               np.random.RandomState(7))
    np.testing.assert_array_equal(got["frame_inds"], want["frame_inds"])
    assert got["clip_len"] == want["clip_len"]
    assert got["frame_interval"] == want["frame_interval"]


def test_sample_frames_twice_and_jitter(refsampling):
    had = hasattr(np, "int")
    if not had:
        np.int = int
    try:
        ref = refsampling.SampleFrames(6, frame_interval=2, num_clips=2,
                                       test_mode=True, twice_sample=True)
        np.random.seed(3)
        want = ref(dict(total_frames=60, start_index=0))
    finally:
        if not had:
            del np.int
    ours = vid.SampleFrames(6, frame_interval=2, num_clips=2, test_mode=True,
                            twice_sample=True)
    got = ours(dict(total_frames=60, start_index=0), np.random.RandomState(3))
    np.testing.assert_array_equal(got["frame_inds"], want["frame_inds"])

    # temporal jitter (random path) parity under identical RNG streams
    ref = refsampling.SampleFrames(6, frame_interval=3, num_clips=2,
                                   temporal_jitter=True)
    np.random.seed(11)
    if not had:
        np.int = int
    try:
        want = ref(dict(total_frames=80, start_index=0))
    finally:
        if not had:
            del np.int
    ours = vid.SampleFrames(6, frame_interval=3, num_clips=2,
                            temporal_jitter=True)
    got = ours(dict(total_frames=80, start_index=0),
               np.random.RandomState(11))
    np.testing.assert_array_equal(got["frame_inds"], want["frame_inds"])


def test_array_decode_parity(refloading):
    arr = RNG.integers(0, 255, (20, 8, 8, 3), dtype=np.uint8)
    inds = np.array([0, 3, 7, 19])
    want = refloading.ArrayDecode()(dict(array=arr, frame_inds=inds.copy(),
                                         modality="RGB"))
    got = vid.ArrayDecode()(dict(array=arr, frame_inds=inds.copy(),
                                 modality="RGB"))
    np.testing.assert_array_equal(np.stack(got["imgs"]),
                                  np.stack(want["imgs"]))
    # flow mode
    want = refloading.ArrayDecode()(dict(array=arr, frame_inds=inds.copy(),
                                         modality="Flow"))
    got = vid.ArrayDecode()(dict(array=arr, frame_inds=inds.copy(),
                                 modality="Flow"))
    np.testing.assert_array_equal(np.stack(got["imgs"]),
                                  np.stack(want["imgs"]))


@pytest.mark.parametrize("total,clip_len", [(100, 20), (30, 20), (12, 20)])
def test_uniform_sample_order_parity(refsampling, total, clip_len):
    ref = refsampling.UniformSample_order(clip_len=clip_len, num_clips=1)
    np.random.seed(5)
    want = ref(dict(total_frames=total, start_index=0))
    ours = UniformSampleOrder(clip_len=clip_len, num_clips=1)
    got = ours(dict(total_frames=total, start_index=0),
               np.random.RandomState(5))
    np.testing.assert_array_equal(got["frame_inds"], want["frame_inds"])


def test_raw_frame_decode(tmp_path):
    from PIL import Image
    for i in (0, 1, 2, 3):
        Image.fromarray(
            RNG.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
                tmp_path / f"img_{i:05}.jpg")
    out = vid.RawFrameDecode()(dict(frame_dir=str(tmp_path),
                                    frame_inds=np.array([0, 2])))
    assert len(out["imgs"]) == 2 and out["imgs"][0].shape == (8, 8, 3)


def test_decord_gated():
    with pytest.raises(ImportError, match="ArrayDecode"):
        vid.DecordInit()(dict(filename="x.mp4"))
