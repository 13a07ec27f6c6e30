"""GICP/VGICP registration tests.

The reference's only formal test (`src/test/gicp_test.cpp`) aligns a KITTI
LiDAR pair and asserts translation error < 0.05 m, rotation error < 1°, for
GICP and VGICP in forward/backward/swap scenarios. The bundled .pcd pair is
binary PCL data; here we synthesize structured scans (a room-like surface
with normals in several directions) and apply the same gates, plus the
backward (inverse) scenario.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core.config import GICPConfig
from sags_tpu.core.transforms import se3_matrix, so3_exp
from sags_tpu.ops import gicp


def make_structured_cloud(rng, n=2048):
    """Three walls + floor with mild waviness — full 3D constraint set."""
    n4 = n // 4
    pts = []
    u = rng.uniform(0, 4, (n4, 2))
    pts.append(np.stack([u[:, 0], u[:, 1], 0.05 * np.sin(3 * u[:, 0])], -1))  # floor
    u = rng.uniform(0, 4, (n4, 2))
    pts.append(np.stack([u[:, 0], 0.05 * np.sin(2 * u[:, 1]), u[:, 1]], -1))  # wall y=0
    u = rng.uniform(0, 4, (n4, 2))
    pts.append(np.stack([0.05 * np.cos(2 * u[:, 0]), u[:, 0], u[:, 1]], -1))  # wall x=0
    u = rng.uniform(0, 4, (n - 3 * n4, 2))
    pts.append(np.stack([u[:, 0], 4.0 + 0.04 * np.sin(u[:, 0] * 2), u[:, 1]], -1))
    cloud = np.concatenate(pts).astype(np.float32)
    return cloud + rng.normal(0, 0.005, cloud.shape).astype(np.float32)


def gt_transform():
    w = np.array([0.02, -0.03, 0.05], np.float32)  # ~3.5 deg
    t = np.array([0.15, -0.2, 0.1], np.float32)
    return np.asarray(se3_matrix(so3_exp(jnp.asarray(w)), jnp.asarray(t)))


def errors(T_est, T_gt):
    dT = np.linalg.inv(T_gt) @ T_est
    trans_err = np.linalg.norm(dT[:3, 3])
    cos = (np.trace(dT[:3, :3]) - 1) / 2
    rot_err = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    return trans_err, rot_err


CFG = dataclasses.replace(GICPConfig(), voxel_resolution=0.5)


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(5)
    target = make_structured_cloud(rng)
    T = gt_transform()
    # source = T⁻¹ target-ish: sample an independent scan of the same surface
    source_world = make_structured_cloud(np.random.default_rng(9))
    # source points expressed in the *source* frame: x_s = T⁻¹ x_w
    Tinv = np.linalg.inv(T)
    source = (source_world @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)
    mask = np.ones(len(target), bool)
    return source, target, T, mask


def test_covariance_estimation_plane(rng):
    """Points on a plane -> smallest scale tiny, quats valid, NORMALIZED_ELLIPSE
    floors the flat direction at 1e-3 of the middle eigenvalue."""
    n = 512
    u = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    pts = np.stack([u[:, 0], u[:, 1], np.zeros(n, np.float32)], -1)
    out = gicp.estimate_covariances(
        jnp.asarray(pts), jnp.ones(n, bool), k=10, knn_max_distance=0.5,
        regularization="normalized_ellipse",
    )
    covs = np.asarray(out.covs)
    ev = np.sort(np.linalg.eigvalsh(covs), axis=-1)
    # normalized: middle ev == 1, flat direction floored at 1e-3
    np.testing.assert_allclose(ev[:, 1], 1.0, rtol=0.3)
    assert (ev[:, 0] >= 0.5e-3).all()
    assert (ev[:, 0] <= 0.3).all()
    # scales: descending sqrt singular values of the raw covariance
    s = np.asarray(out.scales)
    assert (s[:, 0] >= s[:, 1]).all() and (s[:, 1] >= s[:, 2]).all()
    q = np.asarray(out.quats)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    # ellipsoid normal (smallest axis) == plane normal z
    R = np.asarray(gicp.covariances_from_qs(out.quats, out.scales))
    # reconstructed covariance's smallest eigenvector should be ~z
    evr, evecr = np.linalg.eigh(R)
    nrm = np.abs(evecr[:, :, 0][:, 2])
    assert (nrm > 0.95).mean() > 0.9


def test_gicp_alignment_gate(clouds):
    """The reference accuracy gate: <0.05 m translation, <1 deg rotation."""
    source, target, T_gt, mask = clouds
    res = gicp.gicp_align(
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(mask),
        jnp.asarray(mask), jnp.eye(4), CFG,
    )
    te, re = errors(np.asarray(res.T), T_gt)
    assert te < 0.05, (te, re, int(res.iterations))
    assert re < 1.0, (te, re)
    assert bool(res.converged)


def test_gicp_backward_scenario(clouds):
    """Swap source/target: estimate must invert (gicp_test.cpp backward case)."""
    source, target, T_gt, mask = clouds
    res = gicp.gicp_align(
        jnp.asarray(target), jnp.asarray(source), jnp.asarray(mask),
        jnp.asarray(mask), jnp.eye(4), CFG,
    )
    te, re = errors(np.asarray(res.T), np.linalg.inv(T_gt))
    assert te < 0.05 and re < 1.0, (te, re)


def test_vgicp_alignment_gate(clouds):
    source, target, T_gt, mask = clouds
    res = gicp.vgicp_align(
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(mask),
        jnp.asarray(mask), jnp.eye(4), CFG,
    )
    te, re = errors(np.asarray(res.T), T_gt)
    assert te < 0.05, (te, re, int(res.iterations))
    assert re < 1.0, (te, re)


def test_voxel_map_contents(rng):
    pts = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    covs = np.tile(np.eye(3, dtype=np.float32) * 0.01, (500, 1, 1))
    vm = gicp.build_voxel_map(jnp.asarray(pts), jnp.asarray(covs),
                              jnp.ones(500, bool), 1.0, 64)
    assert int(vm.overflow) == 0
    nv = int(vm.n_voxels)
    assert 4 <= nv <= 27
    assert float(jnp.sum(vm.num_points)) == 500
    # voxel means must lie in their voxel
    means = np.asarray(vm.means[:nv])
    coords = np.floor(means / 1.0)
    keys_expected = gicp.lookup_voxels(vm, jnp.asarray(coords, jnp.int32))
    assert np.asarray(keys_expected[1]).all()


def test_voxel_downsample(rng):
    pts = rng.uniform(0, 4, (1000, 3)).astype(np.float32)
    out, mask = gicp.voxel_downsample(jnp.asarray(pts), jnp.ones(1000, bool), 2.0, 32)
    n = int(mask.sum())
    assert 4 <= n <= 8
    # centroids within voxel bounds
    got = np.asarray(out[:n])
    assert (got >= 0).all() and (got <= 4).all()


def test_masked_points_ignored(clouds):
    """Padding rows must not affect the result."""
    source, target, T_gt, mask = clouds
    pad = 256
    src_p = np.concatenate([source, np.full((pad, 3), 1e3, np.float32)])
    tgt_p = np.concatenate([target, np.full((pad, 3), -1e3, np.float32)])
    m_p = np.concatenate([mask, np.zeros(pad, bool)])
    res = gicp.gicp_align(
        jnp.asarray(src_p), jnp.asarray(tgt_p), jnp.asarray(m_p),
        jnp.asarray(m_p), jnp.eye(4), CFG,
    )
    te, re = errors(np.asarray(res.T), T_gt)
    assert te < 0.05 and re < 1.0, (te, re)


def test_gicp_st_alignment_gate(clouds):
    """FastGICPSingleThread (correspondence-reuse) meets the same 5 cm/1°
    gate (`fast_gicp_st_impl.hpp` semantics)."""
    source, target, T_gt, mask = clouds
    res = gicp.gicp_align_st(
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(mask),
        jnp.asarray(mask), jnp.eye(4), CFG,
    )
    trans_err, rot_err = errors(np.asarray(res.T), T_gt)
    assert bool(res.converged)
    assert trans_err < 0.05 and rot_err < 1.0, (trans_err, rot_err)


def test_correspondence_dump(clouds):
    source, target, T_gt, mask = clouds
    idx, sq = gicp.correspondence_dump(
        jnp.asarray(T_gt), jnp.asarray(source), jnp.asarray(target),
        jnp.asarray(mask), jnp.asarray(mask),
    )
    idx, sq = np.asarray(idx), np.asarray(sq)
    assert idx.shape == (len(source),) and (idx >= 0).all()
    # at the true transform, matches are near-exact surface re-samples
    assert np.median(sq) < 0.02


def test_multiplicative_voxel_map(rng):
    """MULTIPLICATIVE accumulation = product-of-Gaussians fusion
    (`fast_vgicp_voxel.hpp:60-99`): two identical isotropic members give
    cov/2 in one-point... verify against a hand-computed 2-point voxel."""
    pts = np.array([[0.2, 0.2, 0.2], [0.3, 0.3, 0.3]], np.float32)
    covs = np.stack([np.eye(3) * 0.5, np.eye(3) * 1.0]).astype(np.float32)
    mask = np.ones(2, bool)
    vm = gicp.build_voxel_map(jnp.asarray(pts), jnp.asarray(covs),
                              jnp.asarray(mask), 1.0, 8, mode="multiplicative")
    # Σ = (Σ₁⁻¹+Σ₂⁻¹)⁻¹ = (2I + I)⁻¹ = I/3 ; μ = Σ(Σᵢ⁻¹ μᵢ)
    expect_cov = np.eye(3) / 3.0
    expect_mean = expect_cov @ (2.0 * pts[0] + 1.0 * pts[1])
    np.testing.assert_allclose(np.asarray(vm.covs[0]), expect_cov, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.means[0]), expect_mean, atol=1e-5)


def test_direct_radius_offsets():
    offs = gicp.neighbor_offsets("direct_radius", 1.5)
    assert (0, 0, 0) in offs
    # radius 1.5 covers unit and face-diagonal neighbors but not (1,1,1)
    assert (1, 1, 0) in offs and (1, 1, 1) not in offs
    assert len(offs) == 19


def test_registration_api_tail(clouds):
    """pygicp surface: ST class, filters, correspondence getter, voxel dump."""
    from sags_tpu.ops.registration import FastGICPSingleThread, FastVGICP

    source, target, T_gt, mask = clouds
    st = FastGICPSingleThread(CFG)
    st.set_input_target(target)
    st.set_input_source(source)
    # trackable filter: drop the last quarter of source points
    keep = np.arange(int(len(source) * 0.75))
    st.set_source_filter(len(keep), keep)
    T = st.align()
    trans_err, rot_err = errors(np.asarray(T), T_gt)
    assert st.has_converged() and trans_err < 0.05

    idx, sq = st.get_source_correspondence()
    assert idx.shape == (len(source),)

    vg = FastVGICP(CFG)
    vg.set_input_target(target)
    vg.set_input_source(source)
    vg.set_voxel_accumulation_mode("additive_weighted")
    vg.set_neighbor_search_method("DIRECT_RADIUS", radius=1.5)
    means, covs = vg.get_voxel_mean_cov()
    assert means.ndim == 2 and covs.shape[1:] == (3, 3)
    assert len(means) == len(covs) > 0


def test_cov_divisor_opt_out():
    """`cov_divisor="reliable"` divides by the reliable-neighbor count
    instead of the reference's always-k (documented latent bug kept for
    parity); with gated-out neighbors the unbiased covariances are larger."""
    rng = np.random.default_rng(5)
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    pts[:8] += 50.0  # a far clump: its neighbors mostly beyond the gate
    m = jnp.ones(64, bool)
    ck = gicp.estimate_covariances(jnp.asarray(pts), m, k=10,
                                   knn_max_distance=0.5,
                                   regularization="none").covs
    cr = gicp.estimate_covariances(jnp.asarray(pts), m, k=10,
                                   knn_max_distance=0.5,
                                   regularization="none",
                                   cov_divisor="reliable").covs
    tk = np.trace(np.asarray(ck), axis1=-2, axis2=-1)
    tr = np.trace(np.asarray(cr), axis1=-2, axis2=-1)
    assert (tr >= tk - 1e-6).all() and (tr > tk + 1e-6).any()


def test_sym_eig3_matches_eigh():
    """Closed-form symmetric 3x3 eigensolver (the TPU-friendly replacement
    for jnp.linalg.eigh in covariance estimation): eigenvalues match eigh,
    eigenvectors reconstruct A, basis is a proper rotation."""
    import jax.numpy as jnp

    from sags_tpu.ops.gicp import sym_eig3

    rng = np.random.default_rng(7)
    B = rng.normal(size=(512, 3, 3)).astype(np.float32)
    A = B @ B.transpose(0, 2, 1) + 1e-3 * np.eye(3, dtype=np.float32)
    # mix in hard cases: isotropic, rank-1, two-equal-eigenvalue
    A[0] = 2.5 * np.eye(3)
    v = np.array([1.0, 2.0, -0.5], np.float32)
    A[1] = np.outer(v, v)
    A[2] = np.diag([3.0, 3.0, 1.0]).astype(np.float32)
    evals, evecs = jax.jit(sym_eig3)(jnp.asarray(A))
    evals, evecs = np.asarray(evals), np.asarray(evecs)
    ref = np.flip(np.linalg.eigvalsh(A), -1)
    scale = np.abs(ref).max(-1, keepdims=True) + 1e-6
    np.testing.assert_allclose(evals / scale, ref / scale, atol=2e-3)
    # descending order
    assert (np.diff(evals, axis=-1) <= 1e-4 * scale).all()
    # reconstruction A = U diag U^T
    rec = np.einsum("nij,nj,nkj->nik", evecs, evals, evecs)
    np.testing.assert_allclose(rec, A, atol=5e-3 * float(scale.max()))
    # orthonormal proper rotation
    eye = np.einsum("nij,nik->njk", evecs, evecs)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)
    assert (np.linalg.det(evecs) > 0.99).all()
