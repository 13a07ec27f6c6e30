"""KITTI odometry dataset + trajectory I/O.

Covers the reference's KITTI benchmark harness surface
(`submodules/fast_gicp/src/kitti.cpp`: %06d.bin KittiLoader, scan-to-scan
odometry with target carry-over, 3×4 pose dump) and the trajectory
export/plot the python_tester scripts provide visually.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from sags_tpu.io.datasets import KITTIOdometryDataset
from sags_tpu.utils.traj import (
    _rotmat_to_quat_xyzw,
    plot_trajectory,
    save_kitti_trajectory,
    save_tum_trajectory,
)


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _structured_cloud(rng, n=1600):
    """Three orthogonal noisy planes — enough geometry for GICP."""
    n3 = n // 3
    pts = []
    u = rng.uniform(0, 4, (n3, 2))
    pts.append(np.stack([u[:, 0], u[:, 1], np.zeros(n3)], 1))
    u = rng.uniform(0, 4, (n3, 2))
    pts.append(np.stack([u[:, 0], np.zeros(n3), u[:, 1]], 1))
    u = rng.uniform(0, 4, (n - 2 * n3, 2))
    pts.append(np.stack([np.zeros(n - 2 * n3), u[:, 0], u[:, 1]], 1))
    cloud = np.concatenate(pts).astype(np.float64)
    return cloud + rng.normal(0, 0.004, cloud.shape)


def _write_kitti_seq(tmp_path, n_frames=3, with_calib=False):
    """Write %06d.bin scans of a world cloud seen from a moving sensor,
    plus GT poses/times (and optionally a calib Tr)."""
    rng = np.random.default_rng(3)
    world = _structured_cloud(rng)
    velo = tmp_path / "velodyne"
    velo.mkdir()
    poses = []
    for i in range(n_frames):
        T = np.eye(4)
        T[:3, :3] = _rotz(0.03 * i)
        T[:3, 3] = [0.15 * i, 0.05 * i, 0.0]
        poses.append(T)
        sensor = (world - T[:3, 3]) @ T[:3, :3]  # R^T (p - t)
        rec = np.concatenate(
            [sensor, np.full((len(sensor), 1), 0.5)], 1
        ).astype(np.float32)
        rec.tofile(velo / f"{i:06d}.bin")
    poses = np.stack(poses)

    Tr = np.eye(4)
    if with_calib:
        # a nontrivial velo→cam0 extrinsic: axis remap + offset
        Tr[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)
        Tr[:3, 3] = [0.05, -0.02, 0.1]
        with open(tmp_path / "calib.txt", "w") as f:
            f.write("P0: " + " ".join(["0"] * 12) + "\n")
            f.write("Tr: " + " ".join(f"{v:.9g}" for v in Tr[:3, :4].ravel()) + "\n")

    # GT file stores cam-frame poses: T_cam = Tr · T_velo · Tr⁻¹
    cam_poses = Tr[None] @ poses @ np.linalg.inv(Tr)[None]
    with open(tmp_path / "poses.txt", "w") as f:
        for T in cam_poses:
            f.write(" ".join(f"{v:.12g}" for v in T[:3, :4].ravel()) + "\n")
    np.savetxt(tmp_path / "times.txt", 0.1 * np.arange(n_frames))
    return world, poses


def test_kitti_dataset_loader(tmp_path):
    world, gt = _write_kitti_seq(tmp_path, n_frames=3)
    ds = KITTIOdometryDataset(
        str(tmp_path / "velodyne"),
        poses_file=str(tmp_path / "poses.txt"),
        times_file=str(tmp_path / "times.txt"),
    )
    assert len(ds) == 3 and ds.has_gt
    s0 = ds.scan(0)
    assert s0.shape[1] == 3 and len(s0) == len(world)
    np.testing.assert_allclose(s0, world, atol=1e-5)  # frame 0 pose = I
    frames = list(ds)
    assert frames[2].timestamp == pytest.approx(0.2)
    np.testing.assert_allclose(frames[1].pose, gt[1], atol=1e-6)
    # Frame contract: `scan` is the raw SENSOR-frame cloud, `points` is its
    # world registration (world = R·scan + t)
    rec = frames[2].scan @ gt[2][:3, :3].T + gt[2][:3, 3]
    np.testing.assert_allclose(rec, world, atol=1e-4)
    np.testing.assert_allclose(frames[2].points, world, atol=1e-4)
    # without GT poses the stream is pose-LESS: scan only
    ds_np = KITTIOdometryDataset(str(tmp_path / "velodyne"))
    f0 = next(iter(ds_np))
    assert f0.pose is None and len(f0.points) == 0 and len(f0.scan) > 0


def test_kitti_calib_pose_mapping(tmp_path):
    _, gt = _write_kitti_seq(tmp_path, n_frames=2, with_calib=True)
    ds = KITTIOdometryDataset(
        str(tmp_path / "velodyne"),
        poses_file=str(tmp_path / "poses.txt"),
        calib_file=str(tmp_path / "calib.txt"),
    )
    # Tr⁻¹ · T_cam · Tr must recover the velodyne-frame GT
    np.testing.assert_allclose(ds.poses[1], gt[1], atol=1e-5)


def test_kitti_max_points(tmp_path):
    _write_kitti_seq(tmp_path, n_frames=1)
    ds = KITTIOdometryDataset(str(tmp_path / "velodyne"), max_points=100)
    assert len(ds.scan(0)) == 100


def test_tum_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    poses = []
    for _ in range(5):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        T = np.eye(4)
        T[:3, :3] = Q
        T[:3, 3] = rng.normal(size=3)
        poses.append(T)
    poses = np.stack(poses)
    path = tmp_path / "traj.txt"
    save_tum_trajectory(str(path), poses, timestamps=0.5 * np.arange(5))
    rows = np.loadtxt(path)
    assert rows.shape == (5, 8)
    np.testing.assert_allclose(rows[:, 0], 0.5 * np.arange(5), atol=1e-6)
    np.testing.assert_allclose(rows[:, 1:4], poses[:, :3, 3], atol=1e-5)
    # quaternion column order is xyzw and reconstructs the rotation
    for r, T in zip(rows, poses):
        x, y, z, w = r[4:8]
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(R, T[:3, :3], atol=1e-5)


def test_quat_branches():
    # exercise all four Shepperd branches (trace>0 + each dominant diagonal)
    for axis, ang in [(np.array([1, 0, 0.0]), 0.1), (np.array([1, 0, 0.0]), 3.1),
                      (np.array([0, 1, 0.0]), 3.1), (np.array([0, 0, 1.0]), 3.1)]:
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
        x, y, z, w = _rotmat_to_quat_xyzw(R)
        R2 = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(R2, R, atol=1e-6)


def test_kitti_trajectory_format(tmp_path):
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[:, 0, 3] = [0, 1, 2]
    path = tmp_path / "poses.txt"
    save_kitti_trajectory(str(path), poses)
    rows = np.loadtxt(path)
    assert rows.shape == (3, 12)  # reference format: top 3×4 row-major
    np.testing.assert_allclose(rows[:, 3], [0, 1, 2])
    np.testing.assert_allclose(rows[:, [0, 5, 10]], 1.0)


def test_plot_trajectory(tmp_path):
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 1, 10)
    poses[:, 1, 3] = np.linspace(0, 0.5, 10) ** 2
    out = tmp_path / "traj.png"
    ok = plot_trajectory(str(out), poses, gt_poses=poses)
    if not ok:
        pytest.skip("matplotlib unavailable")
    assert out.exists() and out.stat().st_size > 1000


@pytest.mark.slow
def test_run_gicp_kitti_cli(tmp_path):
    """End-to-end: KITTI-layout scans → scan-to-scan GICP odometry → KITTI
    pose dump, mirroring `src/kitti.cpp`'s main loop."""
    _write_kitti_seq(tmp_path, n_frames=3)
    out_poses = tmp_path / "est.txt"
    out = subprocess.run(
        [sys.executable, "-m", "sags_tpu.cli.main", "run-gicp",
         "--dataset", "kitti", "--path", str(tmp_path / "velodyne"),
         "--poses", str(tmp_path / "poses.txt"),
         "--times", str(tmp_path / "times.txt"),
         "--out-poses", str(out_poses)],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["frames"] == 3
    assert res["ate_rmse"] is not None and res["ate_rmse"] < 0.05
    est = np.loadtxt(out_poses)
    assert est.shape == (3, 12)
    # accumulated odometry translation ≈ GT (frame 2 at x=0.3)
    assert abs(est[2, 3] - 0.3) < 0.05


def test_kitti_calib_tr_without_colon(tmp_path):
    """KITTI devkit calib lines come both as 'Tr:' and bare 'Tr ' — the
    colon-less form must parse, not IndexError."""
    vals = np.arange(12, dtype=np.float64) / 10.0
    p = tmp_path / "calib.txt"
    p.write_text("P0: " + " ".join(["0"] * 12) + "\n"
                 + "Tr " + " ".join(f"{v:g}" for v in vals) + "\n")
    Tr = KITTIOdometryDataset._read_calib_tr(str(p))
    np.testing.assert_allclose(Tr[:3, :4], vals.reshape(3, 4))
