#!/usr/bin/env python
"""Multi-stream score fusion (reference model-zoo practice: 2s = j+b 1:1,
4s = j:b:jm:bm = 2:2:1:1, configs/stgcn/README.md:47).

Usage: python tools/fuse_scores.py j.pkl b.pkl [jm.pkl bm.pkl]
       [--weights 2 2 1 1] [--metrics top_k_accuracy mean_class_accuracy]
Each pickle: {'scores': (N, K) array, 'labels': list[int]} (tools/test.py --out).
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("score_files", nargs="+")
    p.add_argument("--weights", nargs="+", type=float)
    p.add_argument("--metrics", nargs="+",
                   default=["top_k_accuracy", "mean_class_accuracy"])
    args = p.parse_args()

    weights = args.weights or [1.0] * len(args.score_files)
    assert len(weights) == len(args.score_files)

    fused, labels = None, None
    for w, f in zip(weights, args.score_files):
        with open(f, "rb") as fh:
            d = pickle.load(fh)
        s = np.asarray(d["scores"]) * w
        fused = s if fused is None else fused + s
        if labels is None:
            labels = list(d["labels"])
        else:
            assert labels == list(d["labels"]), "label order mismatch"

    from dsgcn_tpu.core.metrics import evaluate
    for k, v in evaluate(fused, labels, args.metrics).items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
