"""Cross-frame instance-ID association by projection voting.

Mirrors `scripts/gaussian_splatting.py:61-102` (`project_points`) and the
mapping loop at `:738-789`: project the Gaussian cloud into the previous and
current label masks; for each previous label, any current label receiving
≥ `threshold` (50%) of its projected points is remapped to the previous
label, keeping instance IDs temporally consistent.
"""

from __future__ import annotations

from typing import Dict, Optional, Set, Tuple

import numpy as np


def project_points_pinhole(
    points: np.ndarray,  # [N,3] world
    pose: np.ndarray,  # [4,4] camera-to-world
    fx: float, fy: float, cx: float, cy: float,
    width: int, height: int,
    lidar_axes: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """World points → integer pixel coords (clipped), like `project_points`.

    `lidar_axes=True` applies the reference's frame change (x fwd, y left,
    z up → camera X=-y, Y=-z, Z=x, `scripts/gaussian_splatting.py:82-85`).
    """
    R = pose[:3, :3]
    t = pose[:3, 3]
    p_cam = (points - t) @ R  # R_cw @ p + t_cw with R_cw = Rᵀ
    if lidar_axes:
        X, Y, Z = -p_cam[:, 1], -p_cam[:, 2], p_cam[:, 0] + 1e-6
    else:
        X, Y, Z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2] + 1e-6
    u = fx * (X / Z) + cx
    v = fy * (Y / Z) + cy
    u_int = np.clip(np.round(u), 0, width - 1).astype(np.int32)
    v_int = np.clip(np.round(v), 0, height - 1).astype(np.int32)
    return u_int, v_int


def build_label_mapping(
    prev_labels: np.ndarray,  # [N] labels sampled at projections in prev frame
    curr_labels: np.ndarray,  # [N] labels sampled at projections in curr frame
    threshold: float = 0.5,
) -> Dict[int, int]:
    """For each prev label, map any curr label covering ≥ threshold of its
    points back to the prev label (`:759-778`). Returns {curr → prev}."""
    n = min(len(prev_labels), len(curr_labels))
    prev_c, curr_c = prev_labels[:n], curr_labels[:n]
    mapping: Dict[int, int] = {}
    for prev_val in np.unique(prev_c):
        idx = np.nonzero(prev_c == prev_val)[0]
        if len(idx) == 0:
            continue
        vals, counts = np.unique(curr_c[idx], return_counts=True)
        for v, c in zip(vals, counts):
            if c / len(idx) >= threshold:
                mapping[int(v)] = int(prev_val)
    return mapping


def apply_label_mapping(
    mask: np.ndarray, mapping: Dict[int, int], used_labels: Optional[Set[int]] = None
) -> np.ndarray:
    """Remap curr labels in-place-style (`:781-785`); frees reused labels."""
    out = mask.copy()
    for curr_val, prev_val in mapping.items():
        out[mask == curr_val] = prev_val
        if used_labels is not None:
            used_labels.discard(curr_val)
    return out


class InstanceAssociator:
    """Stateful helper replicating the SLAM node's prev/curr bookkeeping."""

    def __init__(self, threshold: float = 0.5, lidar_axes: bool = False):
        self.threshold = threshold
        self.lidar_axes = lidar_axes
        self._prev_sampled: Optional[np.ndarray] = None

    def associate(
        self,
        points: np.ndarray,  # [N,3] current Gaussian means
        mask: np.ndarray,  # [H,W] current label map
        pose: np.ndarray,  # [4,4] camera-to-world
        intrinsics,  # (fx, fy, cx, cy)
        used_labels: Optional[Set[int]] = None,
    ) -> np.ndarray:
        fx, fy, cx, cy = intrinsics
        H, W = mask.shape
        u, v = project_points_pinhole(
            points, pose, fx, fy, cx, cy, W, H, self.lidar_axes
        )
        curr_sampled = mask[v, u]
        if self._prev_sampled is not None:
            mapping = build_label_mapping(
                self._prev_sampled, curr_sampled, self.threshold
            )
            mask = apply_label_mapping(mask, mapping, used_labels)
            curr_sampled = mask[v, u]
        self._prev_sampled = curr_sampled.copy()
        return mask
