"""Trajectory evaluation — finishes the reference's `eval_traj` stub.

`utils/traj_utils.py` loads TUM/Replica ground truth and plots trajectories
but its `eval_traj` is empty (`traj_utils.py:157-158`). Here: Umeyama/Horn
alignment + ATE RMSE + RPE, the standard TUM benchmark metrics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def align_umeyama(est: np.ndarray, gt: np.ndarray, with_scale: bool = False):
    """Least-squares similarity/rigid alignment est→gt over [N,3] positions."""
    mu_e, mu_g = est.mean(0), gt.mean(0)
    xe, xg = est - mu_e, gt - mu_g
    C = xg.T @ xe / len(est)
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = float(np.trace(np.diag(D) @ S) / max((xe**2).sum() / len(est), 1e-12)) if with_scale else 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(
    est_poses: np.ndarray,  # [N,4,4]
    gt_poses: np.ndarray,  # [N,4,4]
    align: bool = True,
) -> Tuple[float, np.ndarray]:
    """Absolute trajectory error RMSE (m) after optional rigid alignment."""
    p_e = est_poses[:, :3, 3]
    p_g = gt_poses[:, :3, 3]
    if align and len(p_e) >= 3:
        s, R, t = align_umeyama(p_e, p_g)
        p_a = (s * (R @ p_e.T)).T + t
    else:
        p_a = p_e
    err = np.linalg.norm(p_a - p_g, axis=-1)
    return float(np.sqrt(np.mean(err**2))), err


def rpe(
    est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1
) -> Tuple[float, float]:
    """Relative pose error: (trans RMSE m, rot RMSE deg) over `delta` steps."""
    terr, rerr = [], []
    for i in range(len(est_poses) - delta):
        de = np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        dg = np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta]
        e = np.linalg.inv(dg) @ de
        terr.append(np.linalg.norm(e[:3, 3]))
        cos = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerr.append(np.degrees(np.arccos(cos)))
    return float(np.sqrt(np.mean(np.square(terr)))), float(
        np.sqrt(np.mean(np.square(rerr)))
    )
