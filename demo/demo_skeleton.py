#!/usr/bin/env python
"""Skeleton-recognition demo: one annotation -> top-5 predictions (+ optional
skeleton rendering).

TPU-native analog of reference demo/demo_skeleton.py:227-313.  The reference's
video branch (mmdet person detection + mmpose HRNet + hungarian tracking,
demo_skeleton.py:107-226) produces exactly the annotation dict consumed here;
plug any pose extractor that emits {keypoint: (M, T, V, C), total_frames}.

Usage:
  python demo/demo_skeleton.py CONFIG WORK_DIR --ann data/synth.pkl \
      [--index 0] [--label-map label_map.txt] [--render out.png]
  # full video path (reference :107-226): frames -> pluggable detector/pose
  # backends -> hungarian tracking -> recognizer
  python demo/demo_skeleton.py CONFIG WORK_DIR --video clip.npy \
      [--det-backend mod:fn] [--pose-backend mod:fn]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def video_to_anno(video: str, det_backend: str, pose_backend: str,
                  det_score_thr: float = 0.5, det_area_thr: float = 100.0):
    """frames -> person boxes -> top-down pose -> tracked (M, T, V, C) anno
    (reference demo_skeleton.py:107-226 with pluggable backends)."""
    from tools.data.custom_2d_skeleton import (filter_dets, load_backend,
                                               read_frames)
    from dsgcn_tpu.utils.tracking import pose_tracking

    detector = load_backend(det_backend)
    pose = load_backend(pose_backend)
    frames = read_frames(video)
    per_frame = []
    for f in frames:
        dets = filter_dets(detector(f), det_score_thr, det_area_thr)
        per_frame.append(np.asarray(pose(f, dets)).reshape(-1, 17, 3))
    kp, score = pose_tracking(per_frame)
    assert kp is not None, "no person detected in the video"
    keypoint = np.concatenate([kp, score[..., None]], axis=-1)
    return dict(keypoint=keypoint.astype(np.float32),
                total_frames=len(frames), img_shape=frames[0].shape[:2],
                original_shape=frames[0].shape[:2], start_index=0, label=-1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("work_dir")
    p.add_argument("--ann",
                   help="annotation pickle (or .npy keypoint (M,T,V,C))")
    p.add_argument("--video",
                   help="video (.npy/.npz frames or frame dir) for the full "
                        "detect->pose->track path")
    p.add_argument("--det-backend", default="tools.data.stub_backends:detect")
    p.add_argument("--pose-backend", default="tools.data.stub_backends:pose")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--label-map", help="text file, one label name per line")
    p.add_argument("--render", help="save a skeleton frame grid PNG")
    args = p.parse_args()
    assert (args.ann is None) != (args.video is None), \
        "pass exactly one of --ann / --video"

    from dsgcn_tpu.apis import inference_recognizer, init_recognizer

    if args.video:
        anno = video_to_anno(args.video, args.det_backend, args.pose_backend)
    elif args.ann.endswith(".npy"):
        kp = np.load(args.ann)
        anno = dict(keypoint=kp.astype(np.float32),
                    total_frames=kp.shape[1], start_index=0, label=-1)
    else:
        with open(args.ann, "rb") as f:
            data = pickle.load(f)
        annos = data["annotations"] if isinstance(data, dict) else data
        anno = dict(annos[args.index])
        anno["keypoint"] = np.asarray(anno["keypoint"], np.float32)
        anno.setdefault("start_index", 0)

    model, state, cfg = init_recognizer(args.config, args.work_dir)
    results = inference_recognizer(model, state, anno, cfg=cfg)

    names = None
    if args.label_map:
        with open(args.label_map) as f:
            names = [ln.strip() for ln in f]
    print(f"ground truth: {anno.get('label', '?')}")
    for i, (cls, score) in enumerate(results):
        label = names[cls] if names else str(cls)
        print(f"top-{i + 1}: {label}  ({score:.4f})")

    if args.render:
        from dsgcn_tpu.utils.visualize import vis_3d_pose, vis_2d_pose
        kp = anno["keypoint"]
        t = kp.shape[1]
        frames = [0, t // 2, t - 1]
        fn = vis_3d_pose if kp.shape[-1] == 3 else vis_2d_pose
        fn(kp, frames=frames, out_path=args.render)
        print(f"rendered -> {args.render}")


if __name__ == "__main__":
    main()
