"""Native C++ pipeline kernels: exactness vs the NumPy implementation, and
equality of the transform with use_native on/off."""
import numpy as np
import pytest

from dsgcn_tpu.data import native
from dsgcn_tpu.data.transforms import BONE_PAIRS, JointToBone, PreNormalize3D

RNG = np.random.default_rng(5)

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native lib unavailable (no g++)")


def _sample(m=2, t=48, v=25, empty=(), body1_empty=()):
    kp = RNG.standard_normal((m, t, v, 3)).astype(np.float32)
    for i in empty:
        kp[0, i] = 0
    for i in body1_empty:
        kp[1, i] = 0
    return kp


@pytest.mark.parametrize("align_spine", [True, False])
@pytest.mark.parametrize("empty,body1_empty", [
    ((), ()), ((0, 3, 7), ()), ((0, 1, 2, 3, 4, 5), (9,)),
])
def test_native_prenormalize_matches_python(align_spine, empty, body1_empty):
    kp = _sample(empty=empty, body1_empty=body1_empty)
    py = PreNormalize3D(align_spine=align_spine, use_native=False)(
        dict(keypoint=kp.copy(), total_frames=kp.shape[1]))
    nt = PreNormalize3D(align_spine=align_spine, use_native=True)(
        dict(keypoint=kp.copy(), total_frames=kp.shape[1]))
    assert py["total_frames"] == nt["total_frames"]
    np.testing.assert_allclose(nt["keypoint"], py["keypoint"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(nt["body_center"], py["body_center"],
                               rtol=1e-6, atol=0)


def test_native_single_body():
    kp = _sample(m=1, empty=(2, 5))
    py = PreNormalize3D(use_native=False)(
        dict(keypoint=kp.copy(), total_frames=kp.shape[1]))
    nt = PreNormalize3D(use_native=True)(
        dict(keypoint=kp.copy(), total_frames=kp.shape[1]))
    np.testing.assert_allclose(nt["keypoint"], py["keypoint"],
                               rtol=1e-5, atol=1e-6)


def test_native_joint_to_bone():
    kp = _sample()
    want = JointToBone()(dict(keypoint=kp.copy()))["keypoint"]
    got = native.joint_to_bone(kp, BONE_PAIRS["nturgb+d"])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_native_speedup_sanity():
    """Native path should not be slower than Python on realistic sizes."""
    import time
    kp = _sample(t=300)
    py = PreNormalize3D(use_native=False)
    nt = PreNormalize3D(use_native=True)
    d = dict(keypoint=kp, total_frames=300)
    for f in (py, nt):
        f(dict(d, keypoint=kp.copy()))   # warm
    t0 = time.perf_counter()
    for _ in range(20):
        py(dict(d, keypoint=kp.copy()))
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        nt(dict(d, keypoint=kp.copy()))
    t_nt = time.perf_counter() - t0
    assert t_nt < t_py * 1.5, (t_py, t_nt)
