"""Skeleton visualization (matplotlib; reference utils/visualize.py Vis2DPose/
Vis3DPose used moviepy — we render frame grids / animations without the
moviepy dependency)."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..data.transforms import BONE_PAIRS


def _edges(layout: str):
    return [(a, b) for a, b in BONE_PAIRS[layout] if a != b]


def vis_2d_pose(keypoint: np.ndarray, layout: str = "nturgb+d",
                frames: Sequence[int] = (0,), out_path: Optional[str] = None):
    """Render selected frames of an (M, T, V, C>=2) skeleton as a grid."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    edges = _edges(layout)
    n = len(frames)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    if n == 1:
        axes = [axes]
    for ax, t in zip(axes, frames):
        for m in range(keypoint.shape[0]):
            pts = keypoint[m, t]
            if np.abs(pts).sum() < 1e-6:
                continue
            ax.scatter(pts[:, 0], pts[:, 1], s=12)
            for a, b in edges:
                ax.plot([pts[a, 0], pts[b, 0]], [pts[a, 1], pts[b, 1]],
                        lw=1.0)
        ax.set_title(f"t={t}")
        ax.set_aspect("equal")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig


def vis_3d_pose(keypoint: np.ndarray, layout: str = "nturgb+d",
                frames: Sequence[int] = (0,), out_path: Optional[str] = None):
    """Render selected frames of an (M, T, V, 3) skeleton in 3D."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    edges = _edges(layout)
    n = len(frames)
    fig = plt.figure(figsize=(4 * n, 4))
    for i, t in enumerate(frames):
        ax = fig.add_subplot(1, n, i + 1, projection="3d")
        for m in range(keypoint.shape[0]):
            pts = keypoint[m, t]
            if np.abs(pts).sum() < 1e-6:
                continue
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=10)
            for a, b in edges:
                ax.plot([pts[a, 0], pts[b, 0]], [pts[a, 1], pts[b, 1]],
                        [pts[a, 2], pts[b, 2]], lw=1.0)
        ax.set_title(f"t={t}")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig


def confusion_matrix_figure(cm: np.ndarray, out_path: Optional[str] = None,
                            normalize: bool = True):
    """Confusion-matrix heatmap (reference plot_confusion_metric.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if normalize:
        with np.errstate(all="ignore"):
            cm = np.nan_to_num(cm / cm.sum(axis=1, keepdims=True))
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(cm, cmap="viridis")
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig
