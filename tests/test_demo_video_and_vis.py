"""Hardening for round-1 smoke-level corners (VERDICT item 10): pose
tracking semantics, the demo video->pose->recognizer path with stub
backends, and output-correctness checks for the visualization utilities."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dsgcn_tpu.utils.tracking import dist_ske, pose_tracking

RNG = np.random.default_rng(23)


def _ske(x, y, score=0.9, v=17):
    out = np.zeros((v, 3), np.float32)
    out[:, 0] = x + np.arange(v) * 0.1
    out[:, 1] = y + np.arange(v) * 0.1
    out[:, 2] = score
    return out


def test_tracking_keeps_identity_across_frames():
    """Two people crossing in id order: assignment keeps each track on its
    own (nearest) skeleton, and tracks sort by length."""
    t = 6
    frames = []
    for i in range(t):
        a = _ske(0 + i, 0)
        b = _ske(100 - i, 50)
        # detections arrive in swapped order on odd frames
        frames.append(np.stack([b, a] if i % 2 else [a, b]))
    kp, score = pose_tracking(frames)
    assert kp.shape == (2, t, 17, 2) and score.shape == (2, t, 17)
    # each track's x must be monotone (no identity switches)
    xs0 = kp[0, :, 0, 0].astype(np.float64)
    xs1 = kp[1, :, 0, 0].astype(np.float64)
    assert (np.diff(xs0) > 0).all() or (np.diff(xs0) < 0).all()
    assert (np.diff(xs1) > 0).all() or (np.diff(xs1) < 0).all()


def test_tracking_longest_tracks_win_and_empty_frames_ok():
    t = 8
    frames = [np.zeros((0, 17, 3))] * 2
    for i in range(2, t):
        dets = [_ske(i, 0)]
        if i >= 5:
            dets.append(_ske(50, 50))
        frames.append(np.stack(dets))
    kp, score = pose_tracking(frames, max_tracks=2)
    # person 0 (6 frames) must be track 0; person 1 (3 frames) track 1
    assert (np.abs(kp[0, 2:, 0, 0]) > 0).all()
    assert (kp[0, :2] == 0).all()
    assert (np.abs(kp[1, 5:, 0, 0]) > 0).all() and (kp[1, :5] == 0).all()


def test_tracking_no_detections():
    kp, score = pose_tracking([np.zeros((0, 17, 3))] * 4)
    assert kp is None and score is None


def test_dist_ske_zero_for_identical():
    s = _ske(3, 4)
    assert dist_ske(s, s) == 0.0
    assert dist_ske(s, _ske(5, 4)) > 0


def test_demo_video_path_end_to_end(tmp_path):
    """--video flow: frames -> stub detect/pose -> tracking -> recognizer
    anno; run through a coco-layout recognizer forward."""
    import jax
    from demo.demo_skeleton import video_to_anno
    from dsgcn_tpu.apis import inference_recognizer
    from dsgcn_tpu.core.train import TrainState, init_model, make_optimizer
    from dsgcn_tpu.models.builder import build_model

    vid = tmp_path / "clip.npy"
    np.save(vid, RNG.integers(0, 255, (10, 48, 64, 3)).astype(np.uint8))
    anno = video_to_anno(str(vid), "tools.data.stub_backends:detect",
                         "tools.data.stub_backends:pose")
    assert anno["keypoint"].shape[1:] == (10, 17, 3)
    assert anno["total_frames"] == 10

    cfg = dict(
        model=dict(type="RecognizerGCN",
                   backbone=dict(type="STGCN", num_stages=3,
                                 inflate_stages=[3], down_stages=[3],
                                 graph_cfg=dict(layout="coco",
                                                mode="spatial")),
                   cls_head=dict(type="GCNHead", num_classes=5,
                                 in_channels=128)),
        data=dict(test=dict(pipeline=[
            dict(type="PreNormalize2D"),
            dict(type="GenSkeFeat", dataset="coco", feats=["j"]),
            dict(type="UniformSampleFrames", clip_len=8, num_clips=1,
                 test_mode=True),
            dict(type="PoseDecode"),
            dict(type="FormatGCNInput", num_person=2),
            dict(type="Collect", keys=["keypoint", "label"]),
        ])))
    anno["img_shape"] = (48, 64)
    model = build_model(cfg["model"])
    import jax.numpy as jnp
    params, stats = init_model(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 2, 8, 17, 3)))
    tx, _ = make_optimizer(lr=0.1, total_steps=1)
    state = TrainState.create(model.apply, params, stats, tx)
    results = inference_recognizer(model, state, anno, cfg=cfg)
    assert len(results) == 5
    assert abs(sum(s for _, s in results) - 1.0) < 1e-4   # softmax probs


def test_vis_2d_pose_draws_the_skeleton(tmp_path):
    """Output correctness: the rendered PNG contains non-background marks and
    scales with the number of rendered frames."""
    from PIL import Image
    from dsgcn_tpu.utils.visualize import vis_2d_pose

    kp = RNG.standard_normal((1, 4, 25, 2)).astype(np.float32)
    p1 = vis_2d_pose(kp, frames=(0,), out_path=str(tmp_path / "a.png"))
    p2 = vis_2d_pose(kp, frames=(0, 1, 2),
                     out_path=str(tmp_path / "b.png"))
    im1 = np.asarray(Image.open(p1).convert("L"))
    im2 = np.asarray(Image.open(p2).convert("L"))
    assert (im1 < 200).mean() > 0.005      # drawn marks exist
    assert im2.shape[1] > 2 * im1.shape[1]  # one vs three panels

    # an all-zero person is skipped: strictly fewer dark pixels
    kp0 = np.zeros_like(kp)
    p3 = vis_2d_pose(kp0, frames=(0,), out_path=str(tmp_path / "c.png"))
    im3 = np.asarray(Image.open(p3).convert("L"))
    assert (im3 < 200).sum() < (im1 < 200).sum()


def test_confusion_matrix_figure_normalizes_rows(tmp_path):
    from PIL import Image
    from dsgcn_tpu.utils.visualize import confusion_matrix_figure

    cm = np.array([[8, 2], [1, 9]], np.float64)
    p = confusion_matrix_figure(cm, out_path=str(tmp_path / "cm.png"))
    img = np.asarray(Image.open(p))
    assert img.ndim == 3 and img.shape[0] > 100


def test_videodataset_e2e_rawframe_loader(tmp_path):
    """VideoDataset end-to-end with real frame decode (VERDICT item 10):
    text annos -> RawFrameDecode pipeline -> Loader batches -> Recognizer2D
    forward."""
    from PIL import Image

    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.data.dataset import Loader, VideoDataset
    from dsgcn_tpu.models.builder import build_model

    for c in range(2):
        d = tmp_path / f"clip{c}"
        d.mkdir()
        for i in range(8):
            arr = RNG.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:05}.jpg")
    ann = tmp_path / "annos.txt"
    ann.write_text("".join(f"clip{c} 8 {c}\n" for c in range(2)))

    pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1,
             num_clips=4),
        dict(type="RawFrameDecode", filename_tmpl="img_{:05}.jpg"),
        dict(type="Resize", scale=(16, 16), keep_ratio=False),
        dict(type="Normalize", mean=[127.5] * 3, std=[127.5] * 3),
        dict(type="FormatShape", input_format="NTHWC"),
        dict(type="Collect", keys=["imgs", "label"]),
    ]
    ds = VideoDataset(str(ann), pipeline, data_prefix=str(tmp_path) + "/")
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=0)
    batch = next(iter(loader.epoch(0)))
    assert batch["imgs"].shape == (2, 4, 16, 16, 3)
    assert list(batch["label"]) == [0, 1]
    # real pixels survived decode+resize+normalize: values centered, not 0
    assert 0.05 < np.abs(batch["imgs"]).mean() < 1.0

    model = build_model(dict(
        type="Recognizer2D",
        backbone=dict(type="ResNet3d", depth=18, num_stages=2,
                      stage_blocks=[1, 1], base_channels=8,
                      conv1_kernel=[1, 7, 7], spatial_strides=[1, 2],
                      temporal_strides=[1, 1]),
        cls_head=dict(type="TSNHead", num_classes=3, in_channels=16)))
    x = jnp.asarray(batch["imgs"])
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(v, x, train=False)
    assert logits.shape == (2, 3)
