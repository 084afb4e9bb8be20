"""Gesture stack: handmp hand graph, GestureDataset, committed gesture config
(reference demo/stgcnpp_gesture.py + datasets/gesture_dataset.py)."""
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsgcn_tpu.configs.config import Config
from dsgcn_tpu.data.dataset import GESTURE_LABEL_NAMES, GestureDataset
from dsgcn_tpu.graph import Graph
from dsgcn_tpu.models.builder import build_model

RNG = np.random.default_rng(3)


def test_handmp_graph():
    """MediaPipe hand layout: 21 nodes / 20 bones, 5-finger parts.  No
    reference oracle exists — the fork's Graph never defines 'handmp'
    (graph.py:97-147) though its own gesture demo config requires it."""
    g = Graph(layout="handmp", mode="spatial")
    assert g.num_node == 21
    assert len(g.inward) == 20
    assert g.A.shape == (3, 21, 21)
    # every non-wrist joint reaches the wrist through inward edges
    parents = dict((i, j) for i, j in g.inward)
    for v in range(1, 21):
        seen, cur = set(), v
        while cur != 0:
            assert cur not in seen
            seen.add(cur)
            cur = parents[cur]
    assert len(g.node_type) == 21 and set(g.node_type) == {0, 1, 2, 3, 4}


@pytest.fixture(scope="module")
def gesture_pkl(tmp_path_factory):
    root = tmp_path_factory.mktemp("gesture")
    annos, names = [], []
    for i in range(12):
        name = f"clip{i:03d}"
        t = 16
        kp = RNG.standard_normal((1, t, 21, 3)).astype(np.float32)
        kp[..., 2] = RNG.uniform(0.2, 1.0, (1, t, 21))
        kp[0, :3, :, 2] = 0.0      # 3 leading empty frames -> squeezed
        annos.append(dict(
            frame_dir=name, label=i % 4, keypoint=kp, total_frames=t,
            hand_score=RNG.uniform(size=(1, t)).astype(np.float32),
            hand_lr=np.zeros((1, t), np.int64), valid_frames=t - 3))
        names.append(name)
    split = dict(train=names[:6], val=names[6:9], test=names[9:])
    path = os.path.join(root, "gesture.pkl")
    with open(path, "wb") as f:
        pickle.dump(dict(split=split, annotations=annos), f)
    return path


PIPE = [
    dict(type="PreNormalize2D", threshold=0, mode="auto"),
    dict(type="GenSkeFeat", dataset="handmp", feats=["j"]),
    dict(type="UniformSample", clip_len=10, num_clips=1, test_mode=True),
    dict(type="PoseDecode"),
    dict(type="FormatGCNInput", num_person=1),
    dict(type="Collect", keys=["keypoint", "label"]),
]


def test_gesture_dataset_squeeze_and_splits(gesture_pkl):
    """Empty-frame squeezing, 2D slicing, split union, subset filter
    (gesture_dataset.py:63-103)."""
    ds = GestureDataset(gesture_pkl, PIPE, split="train", test_mode=True)
    assert len(ds) == 6
    item = ds.video_infos[0]
    assert item["keypoint"].shape == (1, 13, 21, 2)   # 3 empty frames dropped
    assert item["total_frames"] == 13
    assert item["hand_score"].shape == (1, 13)

    both = GestureDataset(gesture_pkl, PIPE, split="train+val", test_mode=True)
    assert len(both) == 9

    sub = GestureDataset(gesture_pkl, PIPE, split="train+val", subset=[0, 1],
                         test_mode=True)
    assert set(a["label"] for a in sub.video_infos) == {0, 1}

    out = ds.prepare(0)
    assert out["keypoint"].shape == (1, 1, 10, 21, 2)


def test_gesture_dataset_evaluate(gesture_pkl):
    ds = GestureDataset(gesture_pkl, PIPE, split="test", test_mode=True)
    scores = np.zeros((len(ds), 40), np.float32)
    for i, lab in enumerate(ds.labels):
        scores[i, lab] = 1.0
    res = ds.evaluate(scores)
    assert res["top1_acc"] == 1.0 and res["top5_acc"] == 1.0
    assert all(v == 1.0 for v in res["per_class"].values())
    assert len(GESTURE_LABEL_NAMES) == 40


def test_gesture_config_committed():
    """configs/gesture/stgcnpp_hand.py builds and runs end-to-end on a
    (N, M, T, 21, 2) hand clip."""
    cfg = Config.fromfile("configs/gesture/stgcnpp_hand.py")
    model = build_model(cfg["model"])
    x = jnp.asarray(RNG.standard_normal((1, 1, 10, 21, 2)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(v, x, train=False)
    assert y.shape == (1, 40)
