"""custom_2d_skeleton scaffold: end-to-end keypoint pickles from stub
detector/pose backends (VERDICT round-1 item 8), incl. sharded
extraction+merge and the compressed format feeding DecompressPose."""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.data.custom_2d_skeleton import (extract_one, filter_dets, main,
                                           parse_video_list)
from tools.data.stub_backends import detect, pose

RNG = np.random.default_rng(17)


def _videos(tmp_path, n=5, t=6, h=48, w=64):
    paths = []
    for i in range(n):
        arr = RNG.integers(0, 255, (t, h, w, 3)).astype(np.uint8)
        p = tmp_path / f"vid{i}.npy"
        np.save(p, arr)
        paths.append(str(p))
    lst = tmp_path / "list.txt"
    lst.write_text("".join(f"{p} {i % 3}\n" for i, p in enumerate(paths)))
    return lst


def test_filter_dets_semantics():
    dets = np.array([[0, 0, 100, 100, 0.9],     # big, confident -> kept
                     [0, 0, 100, 100, 0.5],     # low score -> dropped
                     [0, 0, 10, 10, 0.95]])     # small area -> dropped
    out = filter_dets(dets, 0.7, 1600)
    assert out.shape == (1, 5)


def test_end_to_end_dense(tmp_path):
    lst = _videos(tmp_path)
    out = tmp_path / "annos.pkl"
    main(["--video-list", str(lst), "--out", str(out),
          "--det-area-thr", "100"])
    annos = pickle.load(open(out, "rb"))
    assert len(annos) == 5
    a = annos[0]
    assert a["label"] == 0 and a["total_frames"] == 6
    assert a["keypoint"].shape[1:] == (6, 17, 2)
    assert a["keypoint_score"].shape == a["keypoint"].shape[:-1]
    assert a["img_shape"] == (48, 64)
    assert "filename" not in a


def test_end_to_end_sharded_merge_preserves_order(tmp_path):
    lst = _videos(tmp_path)
    dense = tmp_path / "dense.pkl"
    main(["--video-list", str(lst), "--out", str(dense),
          "--det-area-thr", "100"])
    for shard in range(2):
        main(["--video-list", str(lst), "--out", str(tmp_path / "m.pkl"),
              "--det-area-thr", "100", "--shard", str(shard),
              "--num-shards", "2", "--tmpdir", str(tmp_path / "parts")])
    main(["--video-list", str(lst), "--out", str(tmp_path / "m.pkl"),
          "--num-shards", "2", "--tmpdir", str(tmp_path / "parts"),
          "--merge"])
    merged = pickle.load(open(tmp_path / "m.pkl", "rb"))
    want = pickle.load(open(dense, "rb"))
    assert [a["frame_dir"] for a in merged] == [a["frame_dir"] for a in want]
    for a, b in zip(merged, want):
        np.testing.assert_array_equal(a["keypoint"], b["keypoint"])


def test_compressed_flows_through_decompress_pose(tmp_path):
    """--compress emits the K400-style format DecompressPose consumes."""
    from dsgcn_tpu.data.transforms import DecompressPose

    frames = [RNG.integers(0, 255, (48, 64, 3)).astype(np.uint8)
              for _ in range(5)]
    anno = extract_one(dict(frame_dir="x", label=1), frames, detect, pose,
                       score_thr=0.5, area_thr=100, compress=True)
    assert anno["keypoint"].ndim == 3 and anno["keypoint"].shape[1:] == (17, 3)
    assert len(anno["frame_inds"]) == len(anno["keypoint"])

    out = DecompressPose()(dict(anno))
    assert out["keypoint"].shape[1] == out["total_frames"]
    assert out["keypoint"].shape[2:] == (17, 2)
    assert out["keypoint_score"].shape == out["keypoint"].shape[:-1]
