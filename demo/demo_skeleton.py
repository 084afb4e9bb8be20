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
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("work_dir")
    p.add_argument("--ann", required=True,
                   help="annotation pickle (or .npy keypoint (M,T,V,C))")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--label-map", help="text file, one label name per line")
    p.add_argument("--render", help="save a skeleton frame grid PNG")
    args = p.parse_args()

    from dsgcn_tpu.apis import inference_recognizer, init_recognizer

    if args.ann.endswith(".npy"):
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
