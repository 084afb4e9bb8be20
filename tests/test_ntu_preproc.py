"""NTU .skeleton preprocessing parity vs reference tools/data/ntu_preproc.py
(parse :14-53, spread_denoising :56-94, gen_keypoint_array :97-151)."""
import importlib.util
import sys

import numpy as np
import pytest

sys.path.insert(0, "tools/data")
import ntu_preproc as ours  # noqa: E402

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def refmod():
    """The reference script executes its pipeline at module level from line
    ~138 (reads ntu120_missing.txt etc. from CWD), so exec only the function
    definitions with minimal import shims."""
    import types
    src = open("/root/reference/tools/data/ntu_preproc.py").read()
    cut = src.index("root = 'nturgb+d_skeletons'")
    ns = {}
    shims = ("import numpy as np\nimport copy as cp\nimport os\n"
             "import os.path as osp\n"
             "def mrlines(fname, sp='\\n'):\n"
             "    with open(fname) as f:\n"
             "        return [x.rstrip() for x in f.read().split(sp)]\n"
             "def dump(*a, **k):\n    pass\n"
             "def tqdm(x):\n    return x\n")
    body = "\n".join(ln for ln in src[:cut].splitlines()
                     if not (ln.startswith("import") or ln.startswith("from")))
    exec(shims + body, ns)
    return types.SimpleNamespace(**ns)


def _write_skeleton(path, bodies_per_frame):
    """bodies_per_frame: list of {body_id: (25, 3) array}."""
    lines = [str(len(bodies_per_frame))]
    for frame in bodies_per_frame:
        lines.append(str(len(frame)))
        for bid, joints in frame.items():
            lines.append(f"{bid} 0 0 0 0 0 0 0 0 0")
            lines.append("25")
            for j in joints:
                lines.append(f"{j[0]:.6f} {j[1]:.6f} {j[2]:.6f} "
                             "0 0 0 0 0 0 0 2")
    path.write_text("\n".join(lines))


def _person(t, seed, scale=1.0, offset=0.0):
    r = np.random.default_rng(seed)
    base = r.standard_normal((25, 3)).astype(np.float32)
    base[:, 1] *= 4.0   # person-shaped: tall in y (spread_denoising keeps it)
    walk = np.cumsum(r.standard_normal((t, 25, 3)).astype(np.float32) * 0.05,
                     axis=0)
    return (base[None] + walk) * scale + offset


@pytest.mark.parametrize("case", ["single", "two_full", "short_second",
                                  "three_bodies"])
def test_parse_and_assemble_parity(refmod, tmp_path, case):
    t = 30
    if case == "single":
        frames = [{100: p} for p in _person(t, 1)]
    elif case == "two_full":
        p1, p2 = _person(t, 2), _person(t, 3, offset=1.5)
        frames = [{100: a, 200: b} for a, b in zip(p1, p2)]
    elif case == "short_second":
        p1, p2 = _person(t, 4), _person(8, 5, offset=1.0)
        frames = [{100: p1[i], **({200: p2[i]} if i < 8 else {})}
                  for i in range(t)]
    else:
        p1, p2, p3 = _person(t, 6), _person(t, 7, offset=1.0), \
            _person(15, 8, offset=-1.0)
        frames = [{100: p1[i], 200: p2[i],
                   **({300: p3[i - 15]} if i >= 15 else {})}
                  for i in range(t)]

    name = "S001C001P001R001A001"
    _write_skeleton(tmp_path / f"{name}.skeleton", frames)

    ref_bd = refmod.parse_skeleton_file(name, root=str(tmp_path))
    our_bd = ours.parse_skeleton_file(name, str(tmp_path))
    assert set(ref_bd) == set(our_bd)
    for k in ref_bd:
        np.testing.assert_allclose(our_bd[k]["kpt"], ref_bd[k]["kpt"],
                                   rtol=1e-6)
        np.testing.assert_allclose(our_bd[k]["motion"], ref_bd[k]["motion"],
                                   rtol=1e-5)
        assert our_bd[k]["start"] == ref_bd[k]["start"]

    np.random.seed(0)
    want = refmod.gen_keypoint_array(ref_bd)
    got = ours.gen_keypoint_array(our_bd)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gen_anno_label_and_dtype(refmod, tmp_path):
    frames = [{7: p} for p in _person(20, 9)]
    name = "S001C002P003R001A017"
    _write_skeleton(tmp_path / f"{name}.skeleton", frames)
    got = ours.gen_anno((name, str(tmp_path)))
    assert got["label"] == 16
    assert got["keypoint"].dtype == np.float16
    assert got["total_frames"] == got["keypoint"].shape[1]
