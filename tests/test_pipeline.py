"""End-to-end pipeline integration tests on the synthetic LIVO-style sequence."""

import dataclasses

import jax
import numpy as np
import pytest

from sags_tpu.core.config import (
    GICPConfig,
    KeyframeConfig,
    MapConfig,
    RasterizeConfig,
    SemanticsConfig,
    SLAMConfig,
    TrackingConfig,
)
from sags_tpu.io.datasets import SyntheticDataset
from sags_tpu.slam.pipeline import SLAMPipeline
from sags_tpu.utils.traj import ate_rmse


def tiny_cfg(backend="none"):
    return SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128, chunk=32),
        map=MapConfig(initial_capacity=16384, initial_scale=0.08),
        semantics=SemanticsConfig(cls3d_sample=32, num_classes=24),
        keyframes=KeyframeConfig(keyframe_freq=2, window=8),
        tracking=TrackingConfig(backend=backend, max_points=1024),
        gicp=GICPConfig(max_iterations=24, knn_max_distance=2.0),
        post_train_iters=0,
    )


@pytest.fixture(scope="module")
def dataset():
    ds = SyntheticDataset(n_frames=6, width=96, height=64, n_world=2048,
                          pts_per_frame=512)
    return list(ds)


@pytest.mark.slow
def test_pipeline_odometry_mode(dataset):
    """Tracking 'none' (odometry poses provided, the FAST-LIVO2 contract):
    map optimization must raise PSNR over the sequence."""
    cfg = tiny_cfg("none")
    pipe = SLAMPipeline(cfg, point_budget=512, rng_seed=0)
    res = pipe.run(dataset, post_train=20)
    assert res.train_iters > 0
    assert np.isfinite(res.losses).all()
    # optimization trends down and the map reconstructs the views
    third = max(1, len(res.losses) // 3)
    assert np.mean(res.losses[-third:]) < np.mean(res.losses[:third]), res.losses
    scores = pipe.evaluate(dataset[:2])
    assert all(s["psnr"] > 8.5 for s in scores), scores
    # poses passed through exactly
    np.testing.assert_allclose(res.poses_est, res.poses_gt, atol=1e-6)


@pytest.mark.slow
def test_pipeline_gicp_tracking():
    """Scan-to-scan GICP tracking reconstructs the trajectory (config #4).
    Uses denser, higher-overlap scans than the rendering test — scan-to-scan
    ICP bias grows with the non-overlap fraction."""
    ds = list(SyntheticDataset(n_frames=6, width=96, height=64, n_world=4096,
                               pts_per_frame=1024, step=0.15))
    cfg = tiny_cfg("gicp")
    pipe = SLAMPipeline(cfg, point_budget=512, rng_seed=0)
    res = pipe.run(ds, post_train=0)
    ate, _ = ate_rmse(res.poses_est, res.poses_gt, align=False)
    assert ate < 0.12, ate  # total path 0.75 m


@pytest.mark.slow
def test_pipeline_esikf_tracking():
    """ESIKF map-based tracking reconstructs the trajectory."""
    ds = list(SyntheticDataset(n_frames=5, width=96, height=64, n_world=4096,
                               pts_per_frame=1024, step=0.12, clutter=0.35))
    cfg = tiny_cfg("esikf")
    pipe = SLAMPipeline(cfg, point_budget=512, rng_seed=0)
    res = pipe.run(ds, post_train=0)
    ate, _ = ate_rmse(res.poses_est, res.poses_gt, align=False)
    assert ate < 0.15, ate


@pytest.mark.slow
def test_overflow_adaptive_capacity():
    """Sustained tile-capacity overflow doubles tile_capacity (no silent drop)."""
    import dataclasses

    ds = list(SyntheticDataset(n_frames=4, width=64, height=48, n_world=4096,
                               pts_per_frame=1024))
    cfg = tiny_cfg("none")
    # deliberately tiny capacity + big splats to force overflow
    cfg = dataclasses.replace(
        cfg,
        raster=dataclasses.replace(cfg.raster, tile_capacity=32, chunk=16),
        map=dataclasses.replace(cfg.map, initial_scale=0.2, prune_extent=100.0),
    )
    pipe = SLAMPipeline(cfg, point_budget=1024, rng_seed=0)
    res = pipe.run(ds, post_train=6)
    assert pipe.cfg.raster.tile_capacity > 32, pipe.cfg.raster.tile_capacity


@pytest.mark.slow
def test_pipeline_esikf_velocity_bootstrap():
    """A platform already moving at t=0: the scan-to-scan bootstrap seeds
    pose+velocity from the first frame pair, without it the filter starts at
    v=0 and drifts (bad early poses also poison the surfel map)."""
    ds = list(SyntheticDataset(n_frames=6, width=96, height=64, n_world=2048,
                               pts_per_frame=1024, clutter=0.5, step=0.25,
                               imu_substeps=5, seed=1))

    def run(boot):
        cfg = tiny_cfg("esikf")
        cfg = dataclasses.replace(
            cfg, tracking=dataclasses.replace(
                cfg.tracking, max_points=1024, esikf_bootstrap=boot))
        pipe = SLAMPipeline(cfg, point_budget=1024, rng_seed=0)
        res = pipe.run(ds, post_train=0)
        return ate_rmse(res.poses_est, res.poses_gt, align=False)[0]

    ate_boot = run(True)
    ate_raw = run(False)
    assert ate_boot < 0.5 * ate_raw, (ate_boot, ate_raw)
    assert ate_boot < 0.12, ate_boot


@pytest.mark.slow
def test_pipeline_gicp_map_tracking_beats_scan_to_scan():
    """Scan-to-MAP tracking (`tracking.backend='gicp_map'`, the GS-ICP-SLAM
    lineage the reference forked fast_gicp for,
    `fast_gicp_impl.hpp:586-720`): aligning each scan against the trackable
    Gaussians' (xyz, Σ from q,s) anchors the pose to a drift-free target, so
    it must match or beat scan-to-scan GICP's compounding deltas on ATE."""
    mk = lambda: list(SyntheticDataset(
        n_frames=8, width=96, height=64, n_world=4096, pts_per_frame=1024,
        step=0.15, clutter=0.3, seed=3))

    ates = {}
    for backend in ("gicp", "gicp_map"):
        cfg = tiny_cfg(backend)
        pipe = SLAMPipeline(cfg, point_budget=512, rng_seed=0)
        res = pipe.run(mk(), post_train=0)
        ates[backend], _ = ate_rmse(res.poses_est, res.poses_gt, align=False)
    # the map target must help, never hurt (small slack for solver noise)
    assert ates["gicp_map"] <= ates["gicp"] * 1.05 + 1e-4, ates
    assert ates["gicp_map"] < 0.12, ates


@pytest.mark.slow
def test_pipeline_pose_free_tracking():
    """Frames that carry ONLY a sensor-frame scan (pose=None, no world
    points — the raw-odometry contract of
    `python_tester/gicp_odometry2.py:126-166`) must still track and build a
    map: poses come from GICP, scans are registered with the ESTIMATE. The
    pipeline provably never reads frame.pose (it is None — any read would
    throw)."""
    ds = SyntheticDataset(n_frames=6, width=96, height=64, n_world=4096,
                          pts_per_frame=1024, step=0.15, clutter=0.3,
                          pose_free=True)
    frames = list(ds)
    assert all(f.pose is None for f in frames)
    assert all(f.scan is not None and len(f.scan) for f in frames)
    assert all(len(f.points) == 0 for f in frames)

    cfg = tiny_cfg("gicp")
    pipe = SLAMPipeline(cfg, point_budget=512, rng_seed=0)
    res = pipe.run(frames, post_train=0)
    assert np.isnan(res.poses_gt).all()  # no GT ever flowed through
    gt = np.stack([ds.pose(i) for i in range(len(frames))])
    ate, _ = ate_rmse(res.poses_est, gt, align=False)
    assert np.isfinite(ate) and ate < 0.12, ate
    # the map grew from estimate-registered scans
    assert int(np.asarray(res.state.map.active).sum()) > 0


@pytest.mark.slow
def test_pipeline_grows_map_capacity():
    """A stream whose cumulative cloud exceeds the initial capacity must
    GROW the map (the reference's optimizer-state concat is unbounded,
    `gaussian_model.py:485-534`) — before round 4 the pipeline silently
    dropped every point past the initial allocation, so long sequences
    mapped only their first frames. Growth must carry training state: the
    optimizer keeps stepping and late frames' points land in the map."""
    import dataclasses as _dc

    cfg = tiny_cfg("none")
    cfg = cfg.replace(map=_dc.replace(cfg.map, initial_capacity=1024,
                                      max_capacity=8192))
    ds = list(SyntheticDataset(n_frames=8, width=96, height=64, n_world=8192,
                               pts_per_frame=512, step=0.15, clutter=0.3))
    pipe = SLAMPipeline(cfg, point_budget=512, rng_seed=0)
    res = pipe.run(ds, post_train=2)
    cap = res.state.map.capacity
    n_act = int(np.asarray(res.state.map.active).sum())
    assert cap > 1024, cap  # grew (doubling)
    assert n_act > 1024, n_act  # late points actually landed
    assert int(np.asarray(res.state.map.count)) <= cap
    assert all(np.isfinite(l) for l in res.losses)
    # growth respects the hard ceiling
    assert cap <= 8192
