"""I/O (PLY, queue, datasets), semantics (masks, association), metrics, knn."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from sags_tpu.core.config import MapConfig
from sags_tpu.io import ply as plyio
from sags_tpu.io.datasets import Frame, SyntheticDataset, associate_timestamps
from sags_tpu.io.queue import FrameQueue
from sags_tpu.mapping import gaussian_map as gm
from sags_tpu.ops.knn import knn, mean_knn3_sqdist
from sags_tpu.semantics.association import (
    InstanceAssociator,
    apply_label_mapping,
    build_label_mapping,
    project_points_pinhole,
)
from sags_tpu.semantics.masks import MaskGenerator


def test_ply_roundtrip(rng, tmp_path):
    cfg = MapConfig(sh_degree=0, num_objects=16)
    m = gm.init_map(32, cfg)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    cols = rng.uniform(size=(10, 3)).astype(np.float32)
    m, _ = gm.add_points(m, jnp.asarray(pts), jnp.asarray(cols),
                         jnp.ones(10, bool), jax.random.key(0))
    path = str(tmp_path / "map.ply")
    plyio.save_map_ply(path, m)
    m2 = plyio.load_map_ply(path)
    assert int(m2.count) == 10
    np.testing.assert_allclose(np.asarray(m2.xyz[:10]), pts, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m2.obj_dc[:10]), np.asarray(m.obj_dc[:10]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m2.opacity_logit[:10]), np.asarray(m.opacity_logit[:10]), atol=1e-6
    )


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(pts), jnp.asarray(pts), k=4, chunk=128)
    # brute force
    D = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    bf_idx = np.argsort(D, axis=1)[:, :4]
    bf_d2 = np.take_along_axis(D, bf_idx, 1)
    np.testing.assert_allclose(np.sort(np.asarray(d2), 1), np.sort(bf_d2, 1),
                               atol=1e-4)
    m3 = np.asarray(mean_knn3_sqdist(jnp.asarray(pts)))
    bf_m3 = np.take_along_axis(D, np.argsort(D, 1)[:, 1:4], 1).mean(1)
    np.testing.assert_allclose(m3, bf_m3, rtol=1e-3, atol=1e-5)


def test_associate_timestamps():
    a = [0.0, 1.0, 2.0, 3.0]
    b = [0.02, 1.5, 2.95]
    pairs = associate_timestamps(a, b, max_dt=0.08)
    assert (0, 0) in pairs and (3, 2) in pairs
    assert all(abs(a[i] - b[j]) < 0.08 for i, j in pairs)


def test_frame_queue(rng):
    frames = [
        Frame(
            image=rng.uniform(size=(3, 8, 8)).astype(np.float32),
            points=rng.normal(size=(np.random.randint(5, 20), 3)).astype(np.float32),
            colors=np.zeros((20, 3), np.float32),
            pose=np.eye(4, dtype=np.float32),
            timestamp=float(i),
        )
        for i in range(4)
    ]
    for f in frames:
        f.colors = np.zeros((len(f.points), 3), np.float32)
    out = list(FrameQueue(iter(frames), point_budget=16))  # generator input
    assert len(out) == 4
    for f, (df, hf) in zip(frames, out):
        assert hf is f  # host frame rides alongside the staged device frame
        n = min(len(f.points), 16)
        assert int(df.mask.sum()) == n
        np.testing.assert_allclose(np.asarray(df.points[:n]), f.points[:n], atol=1e-6)


def test_frame_queue_timeout():
    """cfg.timeout_s semantics: silence after the first frame ends iteration
    gracefully (the reference's 10 s topic-silence shutdown, `:652-666`)."""
    import time as _time

    from sags_tpu.io.datasets import Frame

    def slow_stream():
        for i in range(3):
            yield Frame(
                image=np.zeros((3, 8, 8), np.float32),
                points=np.zeros((4, 3), np.float32),
                colors=np.zeros((4, 3), np.float32),
                pose=np.eye(4, dtype=np.float32),
                timestamp=float(i),
            )
            if i == 1:
                _time.sleep(0.5)  # silence > timeout_s

    q = FrameQueue(slow_stream(), point_budget=8, timeout_s=0.15)
    out = list(q)
    assert len(out) == 2
    assert q.timed_out


def test_project_points_pinhole():
    pts = np.array([[0.0, 0.0, 2.0], [1.0, 0.5, 2.0]], np.float32)
    u, v = project_points_pinhole(pts, np.eye(4), 100, 100, 32, 24, 64, 48)
    assert (u[0], v[0]) == (32, 24)
    assert (u[1], v[1]) == (63, 47)  # clipped to image bounds


def test_label_mapping_vote():
    prev = np.array([1, 1, 1, 1, 2, 2, 0, 0])
    curr = np.array([7, 7, 7, 3, 9, 9, 0, 0])
    mapping = build_label_mapping(prev, curr, threshold=0.5)
    assert mapping[7] == 1  # 3/4 of prev-label-1 points vote for curr 7
    assert mapping[9] == 2
    assert 3 not in mapping
    mask = np.array([[7, 3], [9, 0]])
    out = apply_label_mapping(mask, mapping)
    np.testing.assert_array_equal(out, [[1, 3], [2, 0]])


def test_instance_associator_consistency():
    """Same scene, same mask twice → labels remap to first frame's ids."""
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [
            rng.normal([-0.5, 0, 2], 0.05, (50, 3)),
            rng.normal([0.5, 0, 2], 0.05, (50, 3)),
        ]
    ).astype(np.float32)
    H, W = 48, 64
    mask1 = np.zeros((H, W), np.int64)
    mask1[:, :32] = 5
    mask1[:, 32:] = 9
    mask2 = np.zeros((H, W), np.int64)
    mask2[:, :32] = 77  # same segments, new random labels
    mask2[:, 32:] = 31
    assoc = InstanceAssociator(threshold=0.5)
    intr = (60.0, 60.0, 32.0, 24.0)
    out1 = assoc.associate(pts, mask1, np.eye(4, dtype=np.float32), intr)
    out2 = assoc.associate(pts, mask2, np.eye(4, dtype=np.float32), intr)
    np.testing.assert_array_equal(np.unique(out2), np.unique(out1))


def test_device_associator_matches_host_and_stays_on_device():
    """DeviceInstanceAssociator (the O(L²)-traffic path the pipeline uses)
    reproduces the host path's remapping on a static cloud, returns a DEVICE
    array, and votes only with active slots."""
    import jax.numpy as jnp

    from sags_tpu.semantics.association import DeviceInstanceAssociator

    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [
            rng.normal([-0.5, 0, 2], 0.05, (50, 3)),
            rng.normal([0.5, 0, 2], 0.05, (50, 3)),
        ]
    ).astype(np.float32)
    C = 128  # fixed-capacity map buffer; tail slots inactive
    xyz = np.zeros((C, 3), np.float32)
    xyz[:100] = pts
    active = np.zeros(C, bool)
    active[:100] = True
    H, W = 48, 64
    mask1 = np.zeros((H, W), np.int64)
    mask1[:, :32] = 5
    mask1[:, 32:] = 9
    mask2 = np.zeros((H, W), np.int64)
    mask2[:, :32] = 77
    mask2[:, 32:] = 31
    intr = (60.0, 60.0, 32.0, 24.0)
    host = InstanceAssociator(threshold=0.5)
    h1 = host.associate(pts, mask1, np.eye(4, dtype=np.float32), intr)
    h2 = host.associate(pts, mask2, np.eye(4, dtype=np.float32), intr)

    dev = DeviceInstanceAssociator(threshold=0.5, num_classes=100)
    d1 = dev.associate(jnp.asarray(xyz), jnp.asarray(active),
                       jnp.asarray(mask1, jnp.int32),
                       np.eye(4, dtype=np.float32), intr)
    d2 = dev.associate(jnp.asarray(xyz), jnp.asarray(active),
                       jnp.asarray(mask2, jnp.int32),
                       np.eye(4, dtype=np.float32), intr)
    assert hasattr(d2, "devices")  # a jax array — never copied to host
    np.testing.assert_array_equal(np.asarray(d1), h1)
    np.testing.assert_array_equal(np.asarray(d2), h2)
    # label memory is slot-aligned: inactive slots stay -1
    prev = np.asarray(dev._prev_labels)
    assert (prev[100:] == -1).all()
    assert (prev[:100] >= 0).all()


def test_device_associator_capacity_growth_keeps_labels():
    """Capacity growth re-pads the slot-aligned label memory, keeping the
    existing labels (the map only appends)."""
    import jax.numpy as jnp

    from sags_tpu.semantics.association import DeviceInstanceAssociator

    rng = np.random.default_rng(1)
    pts = rng.normal([0, 0, 2], 0.1, (40, 3)).astype(np.float32)
    H, W = 32, 48
    mask = np.full((H, W), 7, np.int64)
    intr = (40.0, 40.0, 24.0, 16.0)
    dev = DeviceInstanceAssociator(threshold=0.5, num_classes=100)
    xyz = np.zeros((64, 3), np.float32)
    xyz[:40] = pts
    act = np.arange(64) < 40
    dev.associate(jnp.asarray(xyz), jnp.asarray(act),
                  jnp.asarray(mask, jnp.int32), np.eye(4, dtype=np.float32),
                  intr)
    before = np.asarray(dev._prev_labels)[:40].copy()
    xyz2 = np.zeros((128, 3), np.float32)
    xyz2[:40] = pts
    act2 = np.arange(128) < 40
    dev.associate(jnp.asarray(xyz2), jnp.asarray(act2),
                  jnp.asarray(mask, jnp.int32), np.eye(4, dtype=np.float32),
                  intr)
    after = np.asarray(dev._prev_labels)
    np.testing.assert_array_equal(after[:40], before)
    assert (after[64:] == -1).all()


def test_mask_generator_end_to_end(rng):
    """Synthetic two-color image → label map with >1 instance, values <100."""
    img = np.zeros((3, 48, 64), np.float32)
    img[:, :, :32] = np.array([0.9, 0.1, 0.1])[:, None, None]
    img[:, :, 32:] = np.array([0.1, 0.1, 0.9])[:, None, None]
    mg = MaskGenerator(num_classes=100, seed=0)
    labels = mg.generate_objects(img)
    assert labels.shape == (48, 64)
    assert labels.max() < 100 and labels.min() >= 0
    u = np.unique(labels)
    assert len(u) >= 2  # at least two instances (or one + background)


def test_metrics():
    from sags_tpu.eval.metrics import mse2psnr, psnr, ssim

    a = np.random.default_rng(0).uniform(0.1, 1.0, (3, 32, 32)).astype(np.float32)
    assert psnr(a, a) > 60
    assert abs(mse2psnr(0.01) - 20.0) < 1e-6
    assert ssim(a, a) > 0.99
    b = np.clip(a + 0.1, 0, 1)
    assert psnr(a, b) < psnr(a, a)


def test_traj_ate():
    from sags_tpu.utils.traj import ate_rmse, rpe

    n = 10
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 0, 3] = np.arange(n) * 0.1
    est = gt.copy()
    est[:, 1, 3] += 0.02  # constant offset removed by alignment
    ate, _ = ate_rmse(est, gt, align=True)
    assert ate < 1e-6
    ate_na, _ = ate_rmse(est, gt, align=False)
    assert abs(ate_na - 0.02) < 1e-6
    t_rpe, r_rpe = rpe(est, gt)
    assert t_rpe < 1e-6 and r_rpe < 1e-6


def test_frame_queue_slow_consumer_no_false_timeout():
    """timeout_s measures SOURCE silence: a consumer slower than timeout_s
    (or slow staging) must not truncate replay of a ready list."""
    import time

    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.io.queue import FrameQueue

    ds = list(SyntheticDataset(n_frames=3, width=32, height=24))
    q = FrameQueue(ds, point_budget=64, prefetch=1, timeout_s=0.3)
    n = 0
    for df, f in q:
        time.sleep(0.5)  # consumer slower than timeout_s
        n += 1
    assert n == 3 and not q.timed_out


def test_frame_queue_source_silence_times_out():
    import time

    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.io.queue import FrameQueue

    ds = list(SyntheticDataset(n_frames=2, width=32, height=24))

    def gen():
        yield ds[0]
        yield ds[1]
        time.sleep(5.0)  # silent source
        yield ds[0]

    q = FrameQueue(gen(), point_budget=64, prefetch=1, timeout_s=0.5)
    n = sum(1 for _ in q)
    assert n == 2 and q.timed_out


def test_socket_stream_feeds_pipeline():
    """Live TCP ingestion (io/stream.py): frames published over a socket
    drive SLAMPipeline.run end-to-end — the ROS-free equivalent of the
    reference's topic-driven loop."""
    import threading

    import dataclasses

    from sags_tpu.core.config import SLAMConfig
    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.io.stream import serve_frames, socket_frames
    from sags_tpu.slam.pipeline import SLAMPipeline

    ds = list(SyntheticDataset(n_frames=3, width=48, height=36,
                               pts_per_frame=256))
    ready = threading.Event()
    t = threading.Thread(target=serve_frames, args=(ds,),
                         kwargs={"port": 0, "ready": ready}, daemon=True)
    t.start()
    assert ready.wait(10.0)

    cfg = SLAMConfig(post_train_iters=1)
    cfg = cfg.replace(
        raster=dataclasses.replace(cfg.raster, tile_capacity=64, chunk=16),
        map=dataclasses.replace(cfg.map, initial_capacity=2048),
    )
    pipe = SLAMPipeline(cfg, point_budget=256)
    res = pipe.run(socket_frames(ready.port))
    assert len(res.poses_est) == 3 and not res.timed_out


def test_socket_stream_roundtrips_all_fields():
    import threading

    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.io.stream import serve_frames, socket_frames

    ds = list(SyntheticDataset(n_frames=2, width=32, height=24,
                               imu_substeps=3))
    ready = threading.Event()
    threading.Thread(target=serve_frames, args=(ds,),
                     kwargs={"port": 0, "ready": ready}, daemon=True).start()
    assert ready.wait(10.0)
    got = list(socket_frames(ready.port))
    assert len(got) == 2
    np.testing.assert_array_equal(got[0].image, ds[0].image)
    np.testing.assert_array_equal(got[0].points, ds[0].points)
    np.testing.assert_array_equal(got[1].pose, ds[1].pose)
    np.testing.assert_array_equal(got[1].scan, ds[1].scan)
    if ds[1].imu is not None:
        np.testing.assert_array_equal(got[1].imu, ds[1].imu)


def test_socket_stream_roundtrips_pose_less_frames():
    """Pose-LESS frames (raw-odometry contract: scan only, pose=None) must
    survive the wire codec — pose rides as NaNs, the decoder restores None."""
    import threading

    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.io.stream import serve_frames, socket_frames

    ds = list(SyntheticDataset(n_frames=2, width=32, height=24,
                               pose_free=True))
    assert ds[0].pose is None and ds[0].scan is not None
    ready = threading.Event()
    threading.Thread(target=serve_frames, args=(ds,),
                     kwargs={"port": 0, "ready": ready}, daemon=True).start()
    assert ready.wait(10.0)
    got = list(socket_frames(ready.port))
    assert len(got) == 2
    assert got[0].pose is None
    np.testing.assert_array_equal(got[0].scan, ds[0].scan)
    assert len(got[0].points) == 0


def test_frame_queue_timeout_releases_producer():
    """A timed-out consumer must not leak the producer thread parked in
    Queue.put — the still-alive source's next frame would otherwise hold
    staged device buffers forever."""
    import time as _time

    from sags_tpu.io.datasets import Frame

    def mk(i):
        return Frame(
            image=np.zeros((3, 8, 8), np.float32),
            points=np.zeros((4, 3), np.float32),
            colors=np.zeros((4, 3), np.float32),
            pose=np.eye(4, dtype=np.float32),
            timestamp=float(i),
        )

    def stream():
        yield mk(0)
        _time.sleep(0.5)  # consumer times out during this silence
        while True:  # source comes back to life and never stops
            yield mk(1)

    q = FrameQueue(stream(), point_budget=8, prefetch=1, timeout_s=0.15)
    out = list(q)
    assert q.timed_out and len(out) >= 1
    q._thread.join(timeout=3.0)
    assert not q._thread.is_alive()


def test_sam_external_weights_env(tmp_path, monkeypatch):
    """`SAGS_SAM_WEIGHTS` drop-in point (round-4 VERDICT #7): externally
    trained SAM weights on disk load WITHOUT code changes, mirroring the
    `SAGS_LPIPS_WEIGHTS` mechanism. The reference loads its photo-pretrained
    checkpoints from absolute paths (`scripts/gaussian_splatting.py:136-144`)."""
    import pickle

    import jax
    import numpy as np

    from sags_tpu.models.sam import SAM

    donor = SAM(img_size=64, embed_dim=32, rng=jax.random.key(123))
    # perturb so the donor params are distinguishable from a fresh init
    donor.params = jax.tree.map(lambda x: x + 0.25, donor.params)
    path = tmp_path / "external_sam.pkl"
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(
            lambda x: np.asarray(x, np.float16), donor.params), f)

    monkeypatch.setenv("SAGS_SAM_WEIGHTS", str(path))
    loaded = SAM.pretrained(img_size=64, embed_dim=32, rng=jax.random.key(0))
    want = jax.tree_util.tree_leaves(donor.params)
    got = jax.tree_util.tree_leaves(loaded.params)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-3)
        assert np.asarray(g).dtype == np.float32  # fp16 on disk -> fp32 live
