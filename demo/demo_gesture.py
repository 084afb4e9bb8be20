#!/usr/bin/env python
"""Gesture-recognition demo over MediaPipe hand-keypoint streams.

TPU-native analog of reference demo/demo_gesture.py:1-173.  The reference's
live loop (cv2 webcam + mediapipe hand tracking + IoU-based track carry-over,
demo_gesture.py:39-77) produces per-frame (21, 2) hand keypoints; this demo
consumes any such stream offline — an annotation pickle or a .npy of shape
(T, 21, 2) — and emits sliding-window gesture predictions, mirroring the
reference's clip_len=10 rolling inference (demo_gesture.py:118-141).

Usage:
  python demo/demo_gesture.py CONFIG WORK_DIR --ann stream.npy \
      [--clip-len 10] [--stride 5] [--index 0]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def sliding_windows(total, clip_len, stride):
    if total <= clip_len:
        return [(0, total)]
    return [(s, s + clip_len)
            for s in range(0, total - clip_len + 1, stride)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("work_dir")
    p.add_argument("--ann", required=True,
                   help="(T,21,2) .npy keypoint stream or gesture pickle")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--clip-len", type=int, default=10)
    p.add_argument("--stride", type=int, default=5)
    args = p.parse_args()

    from dsgcn_tpu.apis import inference_recognizer, init_recognizer
    from dsgcn_tpu.data.dataset import GESTURE_LABEL_NAMES

    if args.ann.endswith(".npy"):
        kp = np.load(args.ann).astype(np.float32)
        assert kp.ndim == 3 and kp.shape[1:] == (21, 2), kp.shape
        label = -1
    else:
        with open(args.ann, "rb") as f:
            data = pickle.load(f)
        annos = data["annotations"] if isinstance(data, dict) else data
        item = annos[args.index]
        kp = np.asarray(item["keypoint"], np.float32)[0, ..., :2]
        label = item.get("label", -1)

    model, state, cfg = init_recognizer(args.config, args.work_dir)
    pipeline = cfg["data"]["test"]["pipeline"]

    print(f"stream: {kp.shape[0]} frames; ground truth: "
          f"{GESTURE_LABEL_NAMES[label] if label >= 0 else '?'}")
    for s, e in sliding_windows(kp.shape[0], args.clip_len, args.stride):
        anno = dict(keypoint=kp[None, s:e], total_frames=e - s,
                    start_index=0, label=-1)
        results = inference_recognizer(model, state, anno,
                                       test_pipeline=pipeline, topk=1)
        cls, score = results[0]
        print(f"frames [{s:4d}:{e:4d})  ->  "
              f"{GESTURE_LABEL_NAMES[cls]:<35s} ({score:.3f})")


if __name__ == "__main__":
    main()
