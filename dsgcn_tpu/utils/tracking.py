"""Multi-person pose tracking for the video demo path (reference
demo/demo_skeleton.py:183-226 pose_tracking/dist_ske).

Greedy-per-frame hungarian assignment of detected skeletons to running
tracks, then the ``max_tracks`` longest tracks become the (M, T, V, .)
annotation persons.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def dist_ske(ske1: np.ndarray, ske2: np.ndarray) -> float:
    """Skeleton distance: per-joint max(2 * coord distance, score diff),
    summed (reference :183-186)."""
    dist = np.linalg.norm(ske1[:, :2] - ske2[:, :2], axis=1) * 2
    diff = np.abs(ske1[:, 2] - ske2[:, 2])
    return float(np.sum(np.maximum(dist, diff)))


def pose_tracking(pose_results: List[np.ndarray], max_tracks: int = 2,
                  thre: float = 30) -> Tuple[Optional[np.ndarray],
                                             Optional[np.ndarray]]:
    """pose_results: per frame, an (m_i, V, 3) array (or empty) of skeletons.

    Returns (keypoint (max_tracks, T, V, 2), score (max_tracks, T, V)) —
    zeros where a track has no detection — or (None, None) without any
    detection (reference :190-226)."""
    tracks, num_tracks = [], 0
    num_joints = None
    for idx, poses in enumerate(pose_results):
        poses = list(np.asarray(poses)) if len(poses) else []
        if not poses:
            continue
        if num_joints is None:
            num_joints = poses[0].shape[0]
        proposals = [t for t in tracks if t["data"][-1][0] > idx - thre]
        n, m = len(proposals), len(poses)
        scores = np.zeros((n, m))
        for i in range(n):
            for j in range(m):
                scores[i][j] = dist_ske(proposals[i]["data"][-1][1], poses[j])
        row, col = linear_sum_assignment(scores)
        for r, c in zip(row, col):
            proposals[r]["data"].append((idx, poses[c]))
        if m > n:
            for j in range(m):
                if j not in col:
                    num_tracks += 1
                    tracks.append(dict(track_id=num_tracks,
                                       data=[(idx, poses[j])]))
    if num_joints is None:
        return None, None
    tracks.sort(key=lambda x: -len(x["data"]))
    result = np.zeros((max_tracks, len(pose_results), num_joints, 3),
                      dtype=np.float16)
    for i, track in enumerate(tracks[:max_tracks]):
        for idx, p in track["data"]:
            result[i, idx] = p
    return result[..., :2], result[..., 2]
