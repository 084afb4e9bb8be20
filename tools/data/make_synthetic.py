#!/usr/bin/env python
"""Generate a synthetic NTU-like annotation pickle for smoke runs."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from dsgcn_tpu.data.dataset import make_synthetic_pose_dataset

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "data/synth.pkl"
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    make_synthetic_pose_dataset(num_samples=128, num_classes=10, t=64, path=out)
    print(f"wrote {out}")
