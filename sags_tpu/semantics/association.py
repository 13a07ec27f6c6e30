"""Cross-frame instance-ID association by projection voting.

Mirrors `scripts/gaussian_splatting.py:61-102` (`project_points`) and the
mapping loop at `:738-789`: project the Gaussian cloud into the previous and
current label masks; for each previous label, any current label receiving
≥ `threshold` (50%) of its projected points is remapped to the previous
label, keeping instance IDs temporally consistent.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Set, Tuple

import jax
import jax.numpy as jnp
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


# ---------------------------------------------------------------------------
# Device-resident association — the TPU-native path.
#
# The host path above (and the reference, `gaussian_splatting.py:80,738-789`)
# copies the ENTIRE Gaussian cloud to the CPU every keyframe (~1.5 MB + a
# tunnel round trip at 131k capacity, growing with the map). Here the
# project-and-vote runs jitted over the map's fixed-capacity buffers and the
# host fetches only the [L,L] label-vote table (~40 KB at L=100); label
# memory lives ON the map slots as a device array, so nothing O(capacity)
# ever crosses the boundary.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("L", "lidar_axes", "width", "height")
)
def _project_vote(
    xyz: jax.Array,  # [C,3] map positions (fixed capacity)
    active: jax.Array,  # [C] bool
    prev_labels: jax.Array,  # [C] int32, -1 = never labeled
    mask: jax.Array,  # [H,W] int32 current label map
    Rcw: jax.Array,  # [3,3] camera-to-world rotation
    tcw: jax.Array,  # [3] camera center
    fx: float, fy: float, cx: float, cy: float,
    L: int, lidar_axes: bool, width: int, height: int,
):
    """Project active map slots into the mask; return the [L,L] vote table
    votes[prev, curr] and the per-slot current-mask sample."""
    p_cam = (xyz - tcw) @ Rcw
    if lidar_axes:
        X, Y, Z = -p_cam[:, 1], -p_cam[:, 2], p_cam[:, 0] + 1e-6
    else:
        X, Y, Z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2] + 1e-6
    u = jnp.clip(jnp.round(fx * (X / Z) + cx), 0, width - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round(fy * (Y / Z) + cy), 0, height - 1).astype(jnp.int32)
    curr = mask[v, u]  # [C]
    voter = active & (prev_labels >= 0)
    idx = jnp.clip(prev_labels, 0, L - 1) * L + jnp.clip(curr, 0, L - 1)
    votes = jnp.zeros((L * L,), jnp.int32).at[idx].add(voter.astype(jnp.int32))
    return votes.reshape(L, L), curr


@functools.partial(jax.jit, donate_argnums=())
def _apply_lut(mask: jax.Array, curr: jax.Array, active: jax.Array,
               lut: jax.Array):
    """Remap the mask through the label LUT and derive the slots' new label
    memory (the remapped sample; inactive slots stay -1)."""
    mask_new = lut[jnp.clip(mask, 0, lut.shape[0] - 1)]
    new_prev = jnp.where(active, lut[jnp.clip(curr, 0, lut.shape[0] - 1)], -1)
    return mask_new, new_prev


def mapping_from_votes(
    votes: np.ndarray, threshold: float
) -> Dict[int, int]:
    """`build_label_mapping` from the aggregated vote table: for each prev
    label, any curr label holding ≥ threshold of its votes remaps to it."""
    totals = votes.sum(axis=1)
    mapping: Dict[int, int] = {}
    for pv in np.nonzero(totals)[0]:
        row = votes[pv]
        for cv in np.nonzero(row)[0]:
            if row[cv] / totals[pv] >= threshold:
                mapping[int(cv)] = int(pv)
    return mapping


class DeviceInstanceAssociator:
    """Projection-vote association with O(L²) host traffic per keyframe.

    Label memory is slot-aligned on the map's fixed-capacity buffers (a
    faithful upgrade over the host path's zip-truncated sample arrays, which
    silently misalign as the map grows); slots added since the last keyframe
    carry -1 and abstain from voting.
    """

    def __init__(self, threshold: float = 0.5, lidar_axes: bool = False,
                 num_classes: int = 100):
        self.threshold = threshold
        self.lidar_axes = lidar_axes
        self.L = num_classes
        self._prev_labels: Optional[jax.Array] = None

    def associate(
        self,
        xyz: jax.Array,  # [C,3] map positions (device)
        active: jax.Array,  # [C] bool (device)
        mask: jax.Array,  # [H,W] int32 (device)
        pose: np.ndarray,  # [4,4] camera-to-world (host)
        intrinsics,  # (fx, fy, cx, cy)
        used_labels: Optional[Set[int]] = None,
    ) -> jax.Array:
        fx, fy, cx, cy = intrinsics
        H, W = mask.shape
        C = xyz.shape[0]
        if self._prev_labels is None or self._prev_labels.shape[0] != C:
            old = self._prev_labels
            self._prev_labels = jnp.full((C,), -1, jnp.int32)
            if old is not None:  # capacity growth: keep existing labels
                n = min(old.shape[0], C)
                self._prev_labels = self._prev_labels.at[:n].set(old[:n])
        votes, curr = _project_vote(
            xyz, active, self._prev_labels, mask,
            jnp.asarray(pose[:3, :3]), jnp.asarray(pose[:3, 3]),
            float(fx), float(fy), float(cx), float(cy),
            self.L, self.lidar_axes, W, H,
        )
        votes_h = np.asarray(votes)  # the ONE O(L²) fetch
        mapping = mapping_from_votes(votes_h, self.threshold)
        lut = np.arange(self.L, dtype=np.int32)
        for cv, pv in mapping.items():
            lut[cv] = pv
            if used_labels is not None:
                used_labels.discard(cv)
        mask_new, self._prev_labels = _apply_lut(
            mask, curr, active, jnp.asarray(lut)
        )
        return mask_new
