"""Headless visualization: keypoint overlays and trajectory plots.

Capability parity with the reference's L4 layer (overlays.py, point_cloud.py,
main.py:50-165 four-panel figure) — redesigned for an async, headless
workflow: the device loop never blocks on a GUI (the reference spends
50-90 % of its wall time inside live matplotlib redraws, Report §3); frames
and figures are written to disk instead.
"""

from __future__ import annotations

import os

import numpy as np

# State colors, RGB (ref overlays.py:161-175: unmatched blue(255,0,0 BGR),
# matched yellow, triangulated green).
STATE_COLORS = {0: (0, 0, 255), 1: (255, 255, 0), 2: (0, 255, 0)}


def keypoint_overlay(
    image: np.ndarray, xy: np.ndarray, state: np.ndarray, tracks: np.ndarray | None = None
) -> np.ndarray:
    """Draw state-colored keypoints (+ optional track lines) on a grayscale
    frame. Returns an (H, W, 3) uint8 RGB image. Ref: overlays.py:148-199."""
    import cv2

    img = np.clip(np.asarray(image), 0, 255).astype(np.uint8)
    rgb = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
    for s, color in STATE_COLORS.items():
        for p in xy[state == s]:
            cv2.circle(rgb, (int(p[0]), int(p[1])), 3, color, 1, cv2.LINE_AA)
    if tracks is not None:
        for p, q in zip(xy[state >= 1], tracks[state >= 1]):
            cv2.line(rgb, (int(q[0]), int(q[1])), (int(p[0]), int(p[1])),
                     (160, 160, 160), 1, cv2.LINE_AA)
    return rgb


def hud_text(out) -> str:
    """Keypoint-count HUD line (ref overlays.py:41-67 display_keypoints_info)."""
    return (
        f"tracked {int(out.num_tracked)}  tri {int(out.num_triangulated)}  "
        f"cand {int(out.num_candidates)}  pnp_inl {int(out.num_pnp_inliers)}"
    )


def save_trajectory_plot(
    path: str,
    est_positions: np.ndarray,
    gt_positions: np.ndarray | None = None,
    landmarks: np.ndarray | None = None,
    title: str = "trajectory",
):
    """Top-down (x, z) trajectory figure — the reference's full_trajectory.pdf
    artifact (main.py:330), headless."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    if landmarks is not None and len(landmarks):
        # 75th-percentile distance filter like the reference (main.py:86-93).
        d = np.linalg.norm(landmarks - landmarks.mean(0), axis=1)
        keep = d <= np.percentile(d, 75) * 2
        ax.scatter(landmarks[keep, 0], landmarks[keep, 2], s=1, c="#bbbbbb",
                   label="landmarks")
    ax.plot(est_positions[:, 0], est_positions[:, 2], "-o", ms=2, c="#1f77b4",
            label="estimate")
    if gt_positions is not None:
        ax.plot(gt_positions[:, 0], gt_positions[:, 2], "-", c="#2ca02c",
                label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend()
    ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
