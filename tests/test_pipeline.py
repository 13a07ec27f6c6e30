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
        if backend == "gicp_map":
            # the anchor must actually ENGAGE — before round 5 nothing ever
            # set `trackable`, so gicp_map silently degraded to scan-to-scan
            # and this test's <= bound held vacuously as equality
            assert pipe._map_anchored, "scan-to-map never anchored"
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


@pytest.mark.slow
def test_long_run_quality_floor():
    """End-to-end QUALITY REGRESSION GATE (round-4 VERDICT #1): a textured
    sequence long enough to outgrow the initial map capacity must come out
    of the full loop (gicp_map tracking + growth + replay training +
    post-train) with healthy reconstruction at the TRAINED poses. The two
    round-4 silent killers — a map that never grew (4 dB PSNR on long runs)
    and eval at GT poses — would both fail this floor, as would any future
    rot of the same class. Floors carry ~1.5 dB / 2x margin under the
    calibrated values (PSNR ~14.2 mean, ATE ~0.067 on this seed)."""
    import dataclasses as _dc

    from sags_tpu.core.config import SemanticsConfig

    cfg = SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128,
                               chunk=32),
        map=MapConfig(initial_capacity=2048, max_capacity=16384,
                      initial_scale=0.05),
        semantics=SemanticsConfig(cls3d_sample=32, num_classes=24),
        keyframes=KeyframeConfig(keyframe_freq=2, window=12),
        tracking=TrackingConfig(backend="gicp_map", max_points=1024),
        gicp=GICPConfig(max_iterations=24, knn_max_distance=2.0),
        post_train_iters=0, metrics_interval=8,
    )
    ds = list(SyntheticDataset(n_frames=16, width=96, height=64,
                               n_world=8192, pts_per_frame=768, step=0.08,
                               clutter=0.3, texture=0.6, seed=5))
    pipe = SLAMPipeline(cfg, point_budget=768, rng_seed=0)
    res = pipe.run(ds, post_train=40)
    # growth actually happened and late points landed
    assert res.state.map.capacity > 2048
    assert int(np.asarray(res.state.map.active).sum()) > 2048
    ate, _ = ate_rmse(res.poses_est, res.poses_gt, align=False)
    assert ate < 0.15, ate
    scores = pipe.evaluate(ds, every=4, with_lpips=False,
                           poses=res.poses_est)
    mean_psnr = float(np.mean([s["psnr"] for s in scores]))
    assert mean_psnr > 13.0, (mean_psnr, [s["psnr"] for s in scores])
    # Eval coverage loss stays bounded. The tiny 96x64 scene concentrates
    # thousands of pairs in its few center tiles, so the per-tile queue
    # drops a sub-percent tail of the DEEPEST pairs — those arrive with
    # transmittance ~0 (the reference's early-exit would skip them too);
    # the PSNR floor above is the actual quality gate. A broken budget
    # drops orders of magnitude more.
    for s in scores:
        assert s["overflow_pairs"] <= 0.1 * s["n_binned"], scores


@pytest.mark.slow
def test_growth_compacts_pruned_holes_first():
    """Pruned (deactivated) slots fragment the fixed-capacity buffers —
    before paying a capacity doubling, growth reclaims them by compaction
    (the reference's physical row removal, `gaussian_model.py:443-459`)."""
    import jax.numpy as jnp

    cfg = tiny_cfg("none")
    cfg = cfg.replace(map=dataclasses.replace(
        cfg.map, initial_capacity=1024, max_capacity=4096))
    pipe = SLAMPipeline(cfg, point_budget=256, rng_seed=0)
    # fill most of the map, then deactivate half (as pruning would)
    pts = np.random.default_rng(0).uniform(-1, 1, (900, 3)).astype(np.float32)
    pipe.state, _ = pipe.add_fn(
        pipe.state, jnp.asarray(pts), jnp.ones((900, 3), jnp.float32) * 0.5,
        jnp.ones(900, bool), jnp.int32(0))
    m = pipe.state.map
    kill = jnp.asarray(np.arange(1024) % 2 == 0)
    pipe.state = pipe.state._replace(map=m._replace(active=m.active & ~kill))
    # next adds would cross capacity -> compaction must reclaim, not grow
    pipe._maybe_grow_map(256)
    assert pipe.state.map.capacity == 1024  # no growth paid
    assert int(np.asarray(pipe.state.map.count)) <= 460  # holes squeezed
    # active survivors keep training state (spot check: count matches)
    assert int(np.asarray(pipe.state.map.active).sum()) == int(
        np.asarray(pipe.state.map.count))
