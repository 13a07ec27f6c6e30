"""ESIKF tracking tests: IMU propagation sanity + scan-update convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core.transforms import se3_matrix, so3_exp
from sags_tpu.ops import esikf, gicp


def test_propagate_static_gravity():
    """Standing still with perfect gravity-cancelling accel: no motion."""
    s = esikf.init_state()
    M = 50
    gyro = jnp.zeros((M, 3))
    accel = jnp.tile(jnp.array([0.0, 0.0, 9.81]), (M, 1))  # cancels gravity
    dts = jnp.full((M,), 0.01)
    s2 = esikf.propagate(s, gyro, accel, dts)
    np.testing.assert_allclose(np.asarray(s2.p), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.v), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.R), np.eye(3), atol=1e-6)
    # covariance must grow
    assert float(jnp.trace(s2.P)) > float(jnp.trace(s.P))


def test_propagate_constant_rotation():
    """Constant yaw rate integrates to the expected heading."""
    s = esikf.init_state()
    M = 100
    wz = 0.5  # rad/s
    gyro = jnp.tile(jnp.array([0.0, 0.0, wz]), (M, 1))
    accel = jnp.tile(jnp.array([0.0, 0.0, 9.81]), (M, 1))
    dts = jnp.full((M,), 0.01)
    s2 = esikf.propagate(s, gyro, accel, dts)
    expected = np.asarray(so3_exp(jnp.array([0.0, 0.0, wz * 1.0])))
    np.testing.assert_allclose(np.asarray(s2.R), expected, atol=1e-3)


def make_room(rng, n=3000):
    n3 = n // 3
    pts = []
    u = rng.uniform(0, 5, (n3, 2))
    pts.append(np.stack([u[:, 0], u[:, 1], np.zeros(n3)], -1))
    u = rng.uniform(0, 5, (n3, 2))
    pts.append(np.stack([u[:, 0], np.zeros(n3), u[:, 1]], -1))
    u = rng.uniform(0, 5, (n - 2 * n3, 2))
    pts.append(np.stack([np.zeros(n - 2 * n3), u[:, 0], u[:, 1]], -1))
    return np.concatenate(pts).astype(np.float32)


def test_scan_update_recovers_pose(rng):
    """Perturbed pose prior + plane map → iterated update pulls it back."""
    world = make_room(rng)
    covs = gicp.estimate_covariances(
        jnp.asarray(world), jnp.ones(len(world), bool), k=10,
        knn_max_distance=0.5, regularization="none",
    ).covs
    vm = gicp.build_voxel_map(
        jnp.asarray(world), covs, jnp.ones(len(world), bool), 0.5, 4096
    )

    # true pose: small offset; body-frame scan of the same surfaces
    w_true = np.array([0.01, -0.02, 0.03], np.float32)
    t_true = np.array([0.05, 0.08, -0.06], np.float32)
    R_true = np.asarray(so3_exp(jnp.asarray(w_true)))
    scan_world = make_room(np.random.default_rng(11), 2000)
    pts_body = ((scan_world - t_true) @ R_true).astype(np.float32)  # Rᵀ(x−t)

    # prior at identity (error = true pose)
    s = esikf.init_state()
    s = s._replace(P=s.P.at[:6, :6].set(np.eye(6) * 0.05))
    out = esikf.scan_update(
        s, jnp.asarray(pts_body), jnp.ones(len(pts_body), bool), vm,
        meas_noise=0.05, num_iters=5,
    )
    R_est, p_est = np.asarray(out.state.R), np.asarray(out.state.p)
    assert np.linalg.norm(p_est - t_true) < 0.03, (p_est, t_true)
    cos = (np.trace(R_true.T @ R_est) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
    assert int(out.n_matched) > 500


def test_scan_update_corrects_full_state():
    """The iterated update must correct v/bg/ba/g through the prior coupling,
    not only (R, p) — the FAST-LIVO2 full-state behavior (SURVEY §0.1)."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-3, 3, (512, 3)).astype(np.float32)
    pts[:, 2] = 0.05 * rng.standard_normal(512)  # a floor plane + two walls
    pts[:170, 0] = 2.0 + 0.05 * rng.standard_normal(170)
    pts[:170, 2] = rng.uniform(0, 2, 170)
    pts[170:340, 1] = -2.0 + 0.05 * rng.standard_normal(170)
    pts[170:340, 2] = rng.uniform(0, 2, 170)
    mask = np.ones(512, bool)
    covs = gicp.estimate_covariances(
        jnp.asarray(pts), jnp.asarray(mask), k=10, knn_max_distance=4.0,
        regularization="none",
    ).covs
    vm = gicp.build_voxel_map(jnp.asarray(pts), covs, jnp.asarray(mask), 0.5, 2048)

    st = esikf.init_state()
    # cross-couple v with p so a position-only measurement moves v
    P = np.array(st.P)
    P[3:6, 3:6] = np.eye(3) * 1e-2
    P[6:9, 6:9] = np.eye(3) * 1e-1
    P[3:6, 6:9] = P[6:9, 3:6] = np.eye(3) * 2e-2
    st = st._replace(P=jnp.asarray(P), v=jnp.asarray([0.5, -0.3, 0.2]))

    # body points = world points seen from a slightly-off pose
    T_true_t = np.array([0.15, -0.1, 0.05], np.float32)
    scan = (pts - T_true_t)  # identity rotation, translated
    out = esikf.scan_update(st, jnp.asarray(scan), jnp.asarray(mask), vm,
                            num_iters=5, min_planarity=0.1)
    # position moved toward the truth, and v changed through the coupling
    assert float(jnp.linalg.norm(out.state.p - jnp.asarray(T_true_t))) < 0.08
    assert float(jnp.linalg.norm(out.state.v - st.v)) > 1e-4


def test_surfel_map_incremental_matches_batch():
    """Two incremental folds == one batch fold (moment accumulators)."""
    rng = np.random.default_rng(0)
    a = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    b = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    m = np.ones(256, bool)
    sm1 = esikf.surfel_map_init(resolution=0.5, capacity=1024)
    sm1 = esikf.surfel_map_update(sm1, jnp.asarray(a), jnp.asarray(m))
    sm1 = esikf.surfel_map_update(sm1, jnp.asarray(b), jnp.asarray(m))
    sm2 = esikf.surfel_map_init(resolution=0.5, capacity=1024)
    sm2 = esikf.surfel_map_update(
        sm2, jnp.asarray(np.concatenate([a, b])), jnp.asarray(np.ones(512, bool))
    )
    v1, v2 = esikf.surfel_map_voxels(sm1), esikf.surfel_map_voxels(sm2)
    assert int(v1.n_voxels) == int(v2.n_voxels)
    np.testing.assert_array_equal(np.asarray(v1.keys), np.asarray(v2.keys))
    np.testing.assert_allclose(np.asarray(v1.means), np.asarray(v2.means),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1.covs), np.asarray(v2.covs),
                               atol=1e-4)


def test_imu_esikf_beats_constant_position():
    """Full ESIKF with IMU propagation tracks a synthetic IMU+LiDAR sequence
    better than the constant-position variant (VERDICT round-1 item 4)."""
    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.utils.traj import ate_rmse

    def run(use_imu: bool):
        ds = SyntheticDataset(n_frames=10, n_world=4096, pts_per_frame=1024,
                              clutter=0.5, step=0.25,
                              imu_substeps=5 if use_imu else 0, seed=1)
        st = esikf.init_state()
        st = st._replace(v=jnp.asarray(ds.velocity(0), jnp.float32))
        sm = esikf.surfel_map_init(resolution=0.3, capacity=8192)
        est, gt = [], []
        for i, fr in enumerate(ds):
            Tw = np.asarray(fr.pose, np.float32)
            scan = (fr.points - Tw[:3, 3]) @ Tw[:3, :3]
            if fr.imu is not None:
                st = esikf.propagate(
                    st, jnp.asarray(fr.imu[:, 0:3]), jnp.asarray(fr.imu[:, 3:6]),
                    jnp.asarray(fr.imu[:, 6]))
            else:
                q = jnp.concatenate([jnp.full(3, 2e-3), jnp.full(3, 4e-2),
                                     jnp.full(3, 1e-4), jnp.full(9, 1e-8)])
                st = st._replace(P=st.P + jnp.diag(q))
            vm = esikf.surfel_map_voxels(sm)
            if int(vm.n_voxels) > 0:
                st = esikf.scan_update(st, jnp.asarray(scan),
                                       jnp.ones(len(scan), bool), vm,
                                       num_iters=5, min_planarity=0.1).state
            world = scan @ np.asarray(st.R).T + np.asarray(st.p)
            sm = esikf.surfel_map_update(sm, jnp.asarray(world),
                                         jnp.ones(len(world), bool))
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = np.asarray(st.R)
            T[:3, 3] = np.asarray(st.p)
            est.append(T)
            gt.append(Tw)
        return ate_rmse(np.stack(est), np.stack(gt), align=False)[0]

    err_imu = run(True)
    err_cp = run(False)
    assert err_imu < err_cp, (err_imu, err_cp)
    assert err_imu < 0.1, err_imu


def test_surfel_map_counts_out_of_extent_drops():
    """Points beyond the fixed world grid must be surfaced in `overflow`,
    not silently discarded."""
    sm = esikf.surfel_map_init(resolution=0.5, capacity=256, world_extent=8.0)
    pts = np.array([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0], [0.0, -50.0, 0.0]],
                   np.float32)
    sm = esikf.surfel_map_update(sm, jnp.asarray(pts), jnp.ones(3, bool))
    assert int(sm.overflow) == 2


def test_surfel_map_init_rejects_key_overflow():
    with np.testing.assert_raises(ValueError):
        esikf.surfel_map_init(resolution=0.05, world_extent=256.0)


def test_surfel_covariance_conditioned_far_from_origin():
    """Anchored moments: a thin plane 60 m out keeps a clean normal.

    The naive E[pp^T] - mu mu^T form in f32 carries ~1e-2 covariance noise at
    60 m (sums ~3.6e6, f32 eps 6e-8) — the smallest eigenvalue of a plane
    voxel must stay ~sigma_n^2, not be swamped by cancellation error.
    """
    rng = np.random.default_rng(3)
    n = 2000
    base = np.array([60.0, 58.0, 2.0], np.float32)
    pts = base + np.stack(
        [rng.uniform(-0.14, 0.14, n), rng.uniform(-0.14, 0.14, n),
         rng.normal(0, 1e-3, n)], axis=1,
    ).astype(np.float32)
    sm = esikf.surfel_map_init(resolution=0.3, capacity=64, world_extent=128.0)
    sm = esikf.surfel_map_update(sm, jnp.asarray(pts), jnp.ones(n, bool))
    vm = esikf.surfel_map_voxels(sm)
    live = np.asarray(vm.num_points) > 100
    covs = np.asarray(vm.covs)[live]
    w = np.linalg.eigvalsh(covs)
    # normal-direction variance ~1e-6 (+1e-6 regularizer); in-plane ~6e-3.
    assert float(w[:, 0].max()) < 5e-5, w[:, 0]
    assert float(w[:, 2].min()) > 1e-3


def test_photo_update_reduces_pose_error():
    """The LIVO visual leg (`esikf.photo_update`): anchors with known
    intensities sampled from a smooth image under the TRUE pose must pull a
    perturbed filter state back toward truth (SURVEY §0.1: FAST-LIVO2 is
    LiDAR-inertial-VISUAL; this is the sparse direct-alignment residual)."""
    rng = np.random.default_rng(0)
    W, H = 160, 120
    fx = fy = 120.0
    cx, cy = W / 2.0, H / 2.0
    # smooth, textured image: intensity varies with both axes
    u = np.arange(W)[None, :] / W
    v = np.arange(H)[:, None] / H
    gray = (0.5 + 0.3 * np.sin(6.28 * 2 * u) * np.cos(6.28 * 1.5 * v)
            + 0.2 * u * v).astype(np.float32)
    image = np.repeat(gray[None], 3, axis=0)

    # anchors: a z=2..4 cloud, intensity = image sampled at TRUE projection
    M = 400
    pts_c = np.stack([
        rng.uniform(-0.8, 0.8, M), rng.uniform(-0.6, 0.6, M),
        rng.uniform(2.0, 4.0, M)], 1).astype(np.float32)
    uu = fx * pts_c[:, 0] / pts_c[:, 2] + cx
    vv = fy * pts_c[:, 1] / pts_c[:, 2] + cy
    inb = (uu > 2) & (uu < W - 3) & (vv > 2) & (vv < H - 3)
    ui = np.clip(uu.astype(int), 0, W - 1)
    vi = np.clip(vv.astype(int), 0, H - 1)
    intens = gray[vi, ui].astype(np.float32)

    # truth pose = identity; perturb the state
    st = esikf.init_state(P0_pos=1e-2, P0_rot=1e-3)
    dp = np.array([0.03, -0.02, 0.01], np.float32)
    st = st._replace(p=jnp.asarray(dp))
    err0 = float(np.linalg.norm(np.asarray(st.p)))
    out = esikf.photo_update(
        st, jnp.asarray(pts_c), jnp.asarray(intens), jnp.asarray(inb),
        jnp.asarray(image), fx, fy, cx, cy, num_iters=4, meas_noise=0.05)
    err1 = float(np.linalg.norm(np.asarray(out.state.p)))
    assert int(out.n_used) > 100, int(out.n_used)
    assert err1 < 0.5 * err0, (err0, err1)


def test_photo_update_extrinsic_reduces_pose_error():
    """photo_update with R_ext: the filter tracks a LiDAR body frame while
    the image lives in a camera rotated by LIDAR_TO_CAM — the reference's
    frame relationship (`scripts/gaussian_splatting.py:309-315`). The
    extrinsic-threaded Jacobian must pull a perturbed state to truth just
    like the body==camera case."""
    from sags_tpu.core.transforms import LIDAR_TO_CAM

    rng = np.random.default_rng(0)
    W, H = 160, 120
    fx = fy = 120.0
    cx, cy = W / 2.0, H / 2.0
    u = np.arange(W)[None, :] / W
    v = np.arange(H)[:, None] / H
    gray = (0.5 + 0.3 * np.sin(6.28 * 2 * u) * np.cos(6.28 * 1.5 * v)
            + 0.2 * u * v).astype(np.float32)
    image = np.repeat(gray[None], 3, axis=0)

    M = 400
    pts_c = np.stack([
        rng.uniform(-0.8, 0.8, M), rng.uniform(-0.6, 0.6, M),
        rng.uniform(2.0, 4.0, M)], 1).astype(np.float32)
    uu = fx * pts_c[:, 0] / pts_c[:, 2] + cx
    vv = fy * pts_c[:, 1] / pts_c[:, 2] + cy
    inb = (uu > 2) & (uu < W - 3) & (vv > 2) & (vv < H - 3)
    ui = np.clip(uu.astype(int), 0, W - 1)
    vi = np.clip(vv.astype(int), 0, H - 1)
    intens = gray[vi, ui].astype(np.float32)

    # world anchors: truth BODY pose is identity, so world == body frame and
    # the camera-frame cloud maps through q_b = E·q_c (rows → @ Eᵀ)
    pts_world = (pts_c @ LIDAR_TO_CAM.T).astype(np.float32)

    st = esikf.init_state(P0_pos=1e-2, P0_rot=1e-3)
    dp = np.array([0.03, -0.02, 0.01], np.float32)
    st = st._replace(p=jnp.asarray(dp))
    err0 = float(np.linalg.norm(np.asarray(st.p)))
    out = esikf.photo_update(
        st, jnp.asarray(pts_world), jnp.asarray(intens), jnp.asarray(inb),
        jnp.asarray(image), fx, fy, cx, cy, num_iters=4, meas_noise=0.05,
        R_ext=jnp.asarray(LIDAR_TO_CAM))
    err1 = float(np.linalg.norm(np.asarray(out.state.p)))
    assert int(out.n_used) > 100, int(out.n_used)
    assert err1 < 0.5 * err0, (err0, err1)


@pytest.mark.slow
@pytest.mark.parametrize("lidar_axes", [False, True])
def test_liv_beats_li_on_degraded_lidar(lidar_axes):
    """With degraded LiDAR (heavily subsampled scans), the LiDAR-inertial-
    VISUAL filter must beat LiDAR-inertial on ATE — the photometric leg is
    doing real measurement work (FAST-LIVO2's reason to exist).

    Runs both frame conventions: body==camera, AND the FAST-LIVO2 shape
    (poses/scans in the LiDAR body frame, camera rotated by LIDAR_TO_CAM,
    cfg.lidar_axes=True) — the configuration the visual leg exists to serve
    (round-3 VERDICT Missing #3)."""
    from sags_tpu.core.config import (GICPConfig, KeyframeConfig, MapConfig,
                                      RasterizeConfig, SemanticsConfig,
                                      SLAMConfig, TrackingConfig)
    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.slam.pipeline import SLAMPipeline
    from sags_tpu.utils.traj import ate_rmse

    def run(visual):
        cfg = SLAMConfig(
            raster=RasterizeConfig(max_tiles_per_gaussian=16,
                                   tile_capacity=128, chunk=32),
            map=MapConfig(initial_capacity=16384, initial_scale=0.08),
            semantics=SemanticsConfig(cls3d_sample=32, num_classes=24),
            keyframes=KeyframeConfig(keyframe_freq=100),  # no training: ATE only
            tracking=TrackingConfig(backend="esikf", max_points=512,
                                    esikf_visual=visual,
                                    esikf_update_iters=6),
            gicp=GICPConfig(max_iterations=24, knn_max_distance=2.0),
            post_train_iters=0,
            lidar_axes=lidar_axes,
        )
        ds = SyntheticDataset(n_frames=8, width=160, height=120, n_world=8192,
                              pts_per_frame=160, step=0.12, clutter=0.35,
                              seed=5, lidar_frame=lidar_axes)
        pipe = SLAMPipeline(cfg, point_budget=512, rng_seed=0)
        res = pipe.run(list(ds), post_train=0)
        ate, _ = ate_rmse(res.poses_est, res.poses_gt, align=False)
        return ate

    ate_li = run(False)
    ate_liv = run(True)
    assert np.isfinite(ate_liv)
    assert ate_liv < ate_li, (ate_li, ate_liv)
