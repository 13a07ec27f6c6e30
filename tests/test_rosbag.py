"""Rosbag ingestion: bag write→read round trip, message codecs, the
approximate-time synchronizer, and the RosbagDataset → SLAM pipeline path
(the reference's ROS-topic front door, `scripts/gaussian_splatting.py:227-235`,
replayed from a bag instead of live TCPROS)."""

import numpy as np
import pytest

from sags_tpu.io import rosbag as rb


def _make_bag(path, n_frames=4, hz=10.0, imu=False, W=32, H=24):
    rng = np.random.default_rng(0)
    msgs = []
    for i in range(n_frames):
        t = 100.0 + i / hz
        img = rng.uniform(0, 1, (3, H, W)).astype(np.float32)
        pts = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (64, 3)).astype(np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = (0.1 * i, 0, 0)
        # deliberately skewed stamps within the slop window
        msgs.append(("/rgb_img", "sensor_msgs/Image", t,
                     rb.encode_image(t, img)))
        msgs.append(("/cloud_registered", "sensor_msgs/PointCloud2", t + 0.01,
                     rb.encode_pointcloud2(t + 0.01, pts, cols)))
        msgs.append(("/aft_mapped_to_init", "nav_msgs/Odometry", t + 0.02,
                     rb.encode_odometry(t + 0.02, pose)))
        if imu:
            for k in range(5):
                ti = t + k / (5 * hz)
                msgs.append(("/imu", "sensor_msgs/Imu", ti,
                             rb.encode_imu(ti, np.array([0.0, 0, 0.1]),
                                           np.array([0.0, 0, 9.81]))))
    rb.write_bag(str(path), msgs)
    return msgs


def test_bag_roundtrip_and_codecs(tmp_path):
    bag = tmp_path / "t.bag"
    msgs = _make_bag(bag)
    got = list(rb.read_bag(str(bag)))
    assert len(got) == len(msgs)
    for (t0, ty0, s0, raw0), (t1, ty1, s1, raw1) in zip(msgs, got):
        assert (t0, ty0) == (t1, ty1)
        assert abs(s0 - s1) < 1e-6
        assert raw0 == raw1

    stamp, img = rb.decode_image(got[0][3])
    assert img.shape == (3, 24, 32) and abs(stamp - 100.0) < 1e-6
    stamp, pts, cols = rb.decode_pointcloud2(got[1][3])
    assert pts.shape == (64, 3) and cols.shape == (64, 3)
    assert cols.min() >= 0 and cols.max() <= 1
    stamp, T = rb.decode_odometry(got[2][3])
    np.testing.assert_allclose(T[:3, 3], [0, 0, 0], atol=1e-6)
    # rgb8 quantization: colors round-trip to 1/255
    rng = np.random.default_rng(0)
    ref_img = rng.uniform(0, 1, (3, 24, 32)).astype(np.float32)
    np.testing.assert_allclose(img, np.floor(ref_img * 255) / 255.0,
                               atol=1e-6)


def test_odometry_quaternion_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = rb._quat_to_rot(*q)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R
    pose[:3, 3] = (1.0, -2.0, 3.0)
    raw = rb.encode_odometry(5.5, pose)
    stamp, T = rb.decode_odometry(raw)
    np.testing.assert_allclose(T, pose, atol=1e-5)
    assert abs(stamp - 5.5) < 1e-6


def test_approximate_time_synchronizer_slop():
    sync = rb.ApproximateTimeSynchronizer(3, queue_size=10, slop=0.1)
    out = []
    out += sync.add(0, 1.00, "img0")
    out += sync.add(1, 1.04, "cld0")
    assert out == []
    out += sync.add(2, 1.08, "odo0")  # spread 0.08 <= slop → emit
    assert len(out) == 1
    (t0, m0), (t1, m1), (t2, m2) = out[0]
    assert (m0, m1, m2) == ("img0", "cld0", "odo0")
    # beyond-slop straggler must NOT match the old image
    out = sync.add(0, 2.00, "img1")
    out += sync.add(1, 2.30, "cld1")
    out += sync.add(2, 2.31, "odo1")
    assert out == []  # img1 is 0.3s from cld1 — no match yet
    out = sync.add(0, 2.29, "img2")
    assert len(out) == 1 and out[0][0][1] == "img2"


def test_rosbag_dataset_frames(tmp_path):
    bag = tmp_path / "seq.bag"
    _make_bag(bag, n_frames=5, imu=True)
    ds = rb.RosbagDataset(str(bag), imu_topic="/imu")
    frames = list(ds)
    assert len(frames) == 5
    for i, f in enumerate(frames):
        assert f.image.shape == (3, 24, 32)
        assert f.points.shape == (64, 3)
        np.testing.assert_allclose(f.pose[:3, 3], [0.1 * i, 0, 0], atol=1e-6)
    # IMU samples accumulate between frames and carry gyro/accel/dt columns
    assert frames[1].imu is not None and frames[1].imu.shape[1] == 7
    np.testing.assert_allclose(frames[1].imu[:, 2], 0.1, atol=1e-6)
    assert frames[1].imu[1:, 6].min() > 0.0

    # lidar_axes applies the reference's literal Rz_90 @ Rx_minus_90
    # product [[0,0,1],[-1,0,0],[0,-1,0]] (`gaussian_splatting.py:309-315`)
    # — the SAME shared constant the pipeline keyframing uses (a previous
    # version here used Rz(+90) and disagreed with slam/pipeline)
    from sags_tpu.core.transforms import LIDAR_TO_CAM

    np.testing.assert_allclose(
        LIDAR_TO_CAM,
        np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32), atol=0,
    )
    ds2 = rb.RosbagDataset(str(bag), lidar_axes=True)
    f2 = next(iter(ds2))
    np.testing.assert_allclose(
        f2.pose[:3, :3], frames[0].pose[:3, :3] @ LIDAR_TO_CAM, atol=1e-5
    )


def test_rosbag_feeds_pipeline(tmp_path):
    """End-to-end: a bag drives SLAMPipeline.run through the generator
    (staged) ingestion path."""
    from sags_tpu.core.config import (
        CameraPreset, KeyframeConfig, MapConfig, RasterizeConfig,
        SemanticsConfig, SLAMConfig,
    )
    from sags_tpu.slam.pipeline import SLAMPipeline

    bag = tmp_path / "seq.bag"
    _make_bag(bag, n_frames=3, W=32, H=24)
    cfg = SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=4, tile_capacity=32,
                               chunk=8),
        map=MapConfig(initial_capacity=512),
        semantics=SemanticsConfig(cls3d_sample=8, num_classes=16),
        keyframes=KeyframeConfig(keyframe_freq=1, window=4),
        camera=CameraPreset(width=32, height=24, fx=30.0, fy=30.0,
                            cx=16.0, cy=12.0),
        post_train_iters=0,
    )
    pipe = SLAMPipeline(cfg, point_budget=64)
    res = pipe.run(iter(rb.RosbagDataset(str(bag))))
    assert res.poses_est.shape[0] == 3
    assert np.isfinite(res.losses).all()


def test_odometry_quaternion_roundtrip_180deg():
    """Regression: encode_odometry's old trace-only quaternion formula wrote
    garbage for rotations near trace −1 (e.g. a vehicle turned 180°)."""
    import sags_tpu.io.rosbag as rb

    for R in [
        np.diag([-1.0, -1.0, 1.0]),           # 180° yaw, trace −1
        np.diag([1.0, -1.0, -1.0]),           # 180° roll
        np.array([[0, 1, 0], [1, 0, 0], [0, 0, -1.0]]),  # 180° about (1,1,0)
    ]:
        pose = np.eye(4); pose[:3, :3] = R
        raw = rb.encode_odometry(1.5, pose)
        _, pose2 = rb.decode_odometry(raw)
        np.testing.assert_allclose(pose2[:3, :3], R, atol=1e-6)


def test_unsupported_chunk_compression_rejected(tmp_path):
    """An lz4-compressed chunk must fail loudly, not parse as raw bytes."""
    bag = tmp_path / "lz4.bag"
    with open(bag, "wb") as f:
        f.write(rb.MAGIC)
        f.write(rb._record(
            {b"op": b"\x03", b"index_pos": np.uint64(0).tobytes(),
             b"conn_count": rb._u32.pack(0), b"chunk_count": rb._u32.pack(1)},
            b" " * 4096,
        ))
        f.write(rb._record(
            {b"op": b"\x05", b"compression": b"lz4",
             b"size": rb._u32.pack(8)}, b"\x04\x22\x4d\x18junk",
        ))
    with pytest.raises(ValueError, match="lz4"):
        list(rb.read_bag(str(bag)))
