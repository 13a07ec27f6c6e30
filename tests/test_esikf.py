"""ESIKF tracking tests: IMU propagation sanity + scan-update convergence."""

import jax
import jax.numpy as jnp
import numpy as np

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
