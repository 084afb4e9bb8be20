"""Deterministic stub detector/pose backends for custom_2d_skeleton.

Stand-ins for the mmdet/mmpose models the reference hardwires (not in this
image): boxes and keypoints are deterministic functions of the frame
content, so extraction tests are reproducible end-to-end without any
inference dependency.  Real deployments pass their own
``module:callable`` specs instead.
"""
import numpy as np


def detect(frame: np.ndarray) -> np.ndarray:
    """One or two fake person boxes derived from the frame mean."""
    h, w = frame.shape[:2]
    m = float(frame.mean()) / 255.0
    boxes = [[0.1 * w, 0.1 * h, 0.7 * w, 0.9 * h, 0.8 + 0.2 * m]]
    if m > 0.5:
        boxes.append([0.4 * w, 0.2 * h, 0.9 * w, 0.8 * h, 0.75])
    return np.asarray(boxes, np.float32)


def pose(frame: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """17 COCO keypoints on a grid inside each box, scores from box score."""
    out = []
    for b in np.asarray(boxes).reshape(-1, 5):
        x1, y1, x2, y2, s = b
        xs = np.linspace(x1, x2, 17)
        ys = np.linspace(y1, y2, 17)
        out.append(np.stack([xs, ys, np.full(17, s)], axis=-1))
    return np.asarray(out, np.float32).reshape(-1, 17, 3)
