"""Optimization-trajectory visualization (the debug/replay aid).

Reference parity: the OpenCV per-iteration reprojection replay
(test/test_compare_ceres_vs_native.cpp:277-307, using GetDebugPoses()) --
the reference's only tracing UI. OpenCV is not in this environment; this
renders the same overlays with matplotlib to PNG files (headless-safe) and
degrades to a no-op when matplotlib is absent.
"""

from __future__ import annotations

import pathlib

import numpy as np


def _project(points, T_wc, intrinsics):
    T_cw = np.linalg.inv(T_wc)
    local = points @ T_cw[:3, :3].T + T_cw[:3, 3]
    fx, fy, cx, cy = intrinsics
    with np.errstate(divide="ignore", invalid="ignore"):
        u = fx * local[:, 0] / local[:, 2] + cx
        v = fy * local[:, 1] / local[:, 2] + cy
    return np.stack([u, v], axis=-1), local[:, 2] > 0


def save_reprojection_replay(
    debug_poses: np.ndarray,  # (K, 4, 4) per-iteration T_wc trace
    points: np.ndarray,  # (P, 3)
    pixels: np.ndarray,  # (P, 2) observed
    intrinsics,  # (4,)
    out_dir: str,
    image_size=(640, 480),
    max_points: int = 2000,
) -> list[str]:
    """One PNG per optimizer iteration: observed pixels vs reprojections.

    Returns the written file paths (empty if matplotlib is unavailable).
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return []

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    sel = np.linspace(0, points.shape[0] - 1, min(max_points, points.shape[0]))
    sel = sel.astype(int)
    paths = []
    for k in range(debug_poses.shape[0]):
        proj, in_front = _project(points[sel], debug_poses[k], intrinsics)
        fig, ax = plt.subplots(figsize=(6.4, 4.8), dpi=100)
        ax.scatter(
            pixels[sel, 0], pixels[sel, 1], s=4, c="#3b82f6", label="observed"
        )
        ax.scatter(
            proj[in_front, 0],
            proj[in_front, 1],
            s=4,
            c="#ef4444",
            marker="x",
            label=f"reprojected (iter {k})",
        )
        ax.set_xlim(0, image_size[0])
        ax.set_ylim(image_size[1], 0)
        ax.legend(loc="upper right", fontsize=8)
        ax.set_title(f"iteration {k}")
        path = out / f"reprojection_{k:03d}.png"
        fig.savefig(path)
        plt.close(fig)
        paths.append(str(path))
    return paths


def save_trajectory_plot(
    poses_true: np.ndarray,  # (N, 4, 4)
    poses_est: np.ndarray,  # (N, 4, 4)
    out_path: str,
) -> str | None:
    """Top-down (x, y) trajectory comparison plot."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(6, 6), dpi=100)
    ax.plot(poses_true[:, 0, 3], poses_true[:, 1, 3], "-o", ms=2,
            c="#3b82f6", label="true")
    ax.plot(poses_est[:, 0, 3], poses_est[:, 1, 3], "-x", ms=3,
            c="#ef4444", label="estimated")
    ax.set_aspect("equal")
    ax.legend()
    pathlib.Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path)
    import matplotlib.pyplot as plt  # noqa: F811

    plt.close(fig)
    return out_path
