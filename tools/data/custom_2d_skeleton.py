#!/usr/bin/env python
"""2D skeleton extraction scaffold with pluggable detector/pose backends
(TPU-native equivalent of reference tools/data/custom_2d_skeleton.py:17-193).

The reference hardwires mmdet FasterRCNN + mmpose HRNet (not in this image).
Here the inference backends are pluggable callables resolved from
``module:function`` specs, so any detector/pose stack — an ONNX runtime, a
jax model, a remote service, or a test stub — plugs into the same
distributed-extraction scaffold:

    detector(frame: ndarray[H, W, 3]) -> ndarray[N, 5]   (x1, y1, x2, y2, score)
    pose(frame, boxes: ndarray[N, 5]) -> ndarray[N, 17, 3]  (x, y, score)

Sharded extraction: run one process per shard with ``--shard i
--num-shards n`` (each writes ``tmpdir/part_i.pkl``), then ``--merge`` to
interleave parts in source order (reference :178-189 semantics).  Videos are
read from .npy/.npz frame arrays or frame directories (decord-free; decord
is used for real video files when available).

Usage:
  python tools/data/custom_2d_skeleton.py --video-list list.txt --out out.pkl \
      --det-backend mypkg.det:detect --pose-backend mypkg.pose:topdown
  # K400-style compressed annos (consumed by the DecompressPose transform):
  ... --compress
"""
import argparse
import importlib
import os
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np


def load_backend(spec: str):
    """'module.sub:callable' -> the callable."""
    mod, _, fn = spec.partition(":")
    assert fn, f"backend spec {spec!r} must be 'module:callable'"
    return getattr(importlib.import_module(mod), fn)


def read_frames(path: str):
    """Frames for a 'video': .npy/.npz array (T, H, W, 3), a directory of
    image files, or a video file via decord when installed."""
    if path.endswith(".npy"):
        return list(np.load(path))
    if path.endswith(".npz"):
        data = np.load(path)
        return list(data[list(data.keys())[0]])
    if osp.isdir(path):
        from PIL import Image
        names = sorted(os.listdir(path))
        return [np.asarray(Image.open(osp.join(path, n)).convert("RGB"))
                for n in names]
    try:
        import decord
    except ImportError as e:
        raise ImportError(f"reading {path!r} needs decord (not shipped); "
                          "use .npy/.npz arrays or frame dirs") from e
    vid = decord.VideoReader(path)
    return [x.asnumpy() for x in vid]


def filter_dets(dets: np.ndarray, score_thr: float, area_thr: float):
    """Score + box-area filtering (reference :157-164)."""
    dets = np.asarray(dets, np.float32).reshape(-1, 5)
    dets = dets[dets[:, 4] >= score_thr]
    areas = (dets[:, 3] - dets[:, 1]) * (dets[:, 2] - dets[:, 0])
    assert np.all(areas >= 0)
    return dets[areas >= area_thr]


def extract_one(anno, frames, detector, pose, score_thr=0.7, area_thr=1600,
                compress=False, num_joints=17):
    """Detect -> top-down pose per frame -> packed anno
    (reference pose_inference, :56-85)."""
    det_results = [filter_dets(detector(f), score_thr, area_thr)
                   for f in frames]
    total_frames = len(frames)
    num_person = max((len(d) for d in det_results), default=0)
    anno = dict(anno)
    anno["img_shape"] = frames[0].shape[:2]
    anno["total_frames"] = total_frames
    anno["num_person_raw"] = num_person

    if compress:
        kp, frame_inds = [], []
        for i, (f, d) in enumerate(zip(frames, det_results)):
            for item in np.asarray(pose(f, d)).reshape(-1, num_joints, 3):
                kp.append(item)
                frame_inds.append(i)
        anno["keypoint"] = (np.stack(kp).astype(np.float16) if kp
                            else np.zeros((0, num_joints, 3), np.float16))
        anno["frame_inds"] = np.array(frame_inds, dtype=np.int16)
    else:
        kp = np.zeros((max(num_person, 1), total_frames, num_joints, 3),
                      np.float32)
        for i, (f, d) in enumerate(zip(frames, det_results)):
            for j, item in enumerate(
                    np.asarray(pose(f, d)).reshape(-1, num_joints, 3)):
                kp[j, i] = item
        anno["keypoint"] = kp[..., :2].astype(np.float16)
        anno["keypoint_score"] = kp[..., 2].astype(np.float16)
    return anno


def parse_video_list(path: str):
    """Lines '<video>' or '<video> <label>' (reference :102-134)."""
    annos = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            assert len(parts) in (1, 2)
            a = dict(frame_dir=osp.basename(parts[0]).split(".")[0],
                     filename=parts[0])
            if len(parts) == 2:
                a["label"] = int(parts[1])
            annos.append(a)
    return annos


def merge_parts(tmpdir: str, num_shards: int, total: int, out: str):
    """Interleave per-shard parts back into source order (reference :178-189)."""
    parts = []
    for i in range(num_shards):
        with open(osp.join(tmpdir, f"part_{i}.pkl"), "rb") as f:
            parts.append(pickle.load(f))
    rem = total % num_shards
    if rem:
        for i in range(rem, num_shards):
            parts[i].append(None)
    ordered = []
    for res in zip(*parts):
        ordered.extend(res)
    ordered = ordered[:total]
    with open(out, "wb") as f:
        pickle.dump(ordered, f)


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Generate 2D pose annotations for a custom video dataset")
    p.add_argument("--video-list", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--det-backend", default="tools.data.stub_backends:detect",
                   help="module:callable returning (N,5) person boxes")
    p.add_argument("--pose-backend", default="tools.data.stub_backends:pose",
                   help="module:callable returning (N,17,3) keypoints")
    p.add_argument("--det-score-thr", type=float, default=0.7)
    p.add_argument("--det-area-thr", type=float, default=1600)
    p.add_argument("--compress", action="store_true",
                   help="K400-style compressed annos (DecompressPose input)")
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--tmpdir", default="tmp")
    p.add_argument("--merge", action="store_true",
                   help="merge tmpdir/part_*.pkl into --out and exit")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    assert args.out.endswith(".pkl")
    annos = parse_video_list(args.video_list)
    if args.merge:
        merge_parts(args.tmpdir, args.num_shards, len(annos), args.out)
        print(f"merged {args.num_shards} parts -> {args.out}")
        return

    detector = load_backend(args.det_backend)
    pose = load_backend(args.pose_backend)
    my_part = annos[args.shard::args.num_shards]
    results = []
    for anno in my_part:
        frames = read_frames(anno.pop("filename"))
        results.append(extract_one(anno, frames, detector, pose,
                                   args.det_score_thr, args.det_area_thr,
                                   args.compress))
    if args.num_shards == 1:
        with open(args.out, "wb") as f:
            pickle.dump(results, f)
        print(f"wrote {len(results)} annos -> {args.out}")
    else:
        os.makedirs(args.tmpdir, exist_ok=True)
        part = osp.join(args.tmpdir, f"part_{args.shard}.pkl")
        with open(part, "wb") as f:
            pickle.dump(results, f)
        print(f"wrote shard {args.shard}/{args.num_shards} -> {part}")


if __name__ == "__main__":
    main()
