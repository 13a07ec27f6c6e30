"""SO(3)/SE(3) and quaternion math (pure jnp).

Conventions (matching the reference stack):
  * Quaternions are stored **xyzw** — the convention of the reference rasterizer
    (`cuda_rasterizer/forward.cu:134-145`, where q[0]=x ... q[3]=w), of
    `utils/general_utils.py:89-110` (`build_rotation`, comment flags xyzw), and of
    pygicp's rotationsq export (`fast_gicp_impl.hpp:425-430`).
  * `so3_exp` follows `fast_gicp/so3/so3.hpp` (Sophus-style, small-angle series).
  * All functions are batched over leading axes via plain broadcasting or `vmap`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) [..., 4] (xyzw)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion (xyzw, assumed normalized) -> rotation matrix [..., 3, 3].

    Matches the rasterizer's quat→R (`forward.cu:141-145`) and
    `build_rotation` (`utils/general_utils.py:89-110`).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (xyzw), branch-free.

    Uses the 4-branch Shepperd method with `jnp.where` selection so it is safe
    under jit/vmap for any input rotation.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate solutions, each stable in its own region.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    s0 = safe_sqrt(tr + 1.0) * 2.0  # s = 4w
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], -1)
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0  # s = 4x
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0  # s = 4y
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], -1)
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0  # s = 4z
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_normalize(q)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, both xyzw."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric (hat) matrix [..., 3, 3] of v [..., 3].

    Reference: `fast_gicp/so3/so3.hpp` skew/skewd.
    """
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ],
        axis=-2,
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3) rotation matrix, small-angle safe.

    Mirrors `fast_gicp/so3/so3.hpp:so3_exp` (quaternion construction with Taylor
    fallback), returned as a rotation matrix.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    small = theta_sq < 1e-8
    # sin(t/2)/t and cos(t/2)
    imag = jnp.where(
        small,
        0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_sq * theta_sq,
        jnp.sin(0.5 * theta) / theta,
    )
    real = jnp.where(
        small,
        1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_sq * theta_sq,
        jnp.cos(0.5 * theta),
    )
    q = jnp.concatenate([imag[..., None] * w, real[..., None]], axis=-1)
    return quat_to_rotmat(quat_normalize(q))


def so3_log(R: jax.Array) -> jax.Array:
    """Logarithm map SO(3) -> so(3) axis-angle vector [..., 3]."""
    cos_theta = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # theta / (2 sin theta), small-angle: 0.5 + theta^2/12
    sin_theta = jnp.sin(theta)
    factor = jnp.where(
        theta < 1e-4,
        0.5 + theta * theta / 12.0,
        theta / jnp.maximum(2.0 * sin_theta, _EPS),
    )
    return factor[..., None] * w


def se3_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """Build homogeneous [..., 4, 4] from R [..., 3, 3] and t [..., 3]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_matrix(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply SE(3) [4,4] to points [..., 3]."""
    return pts @ T[:3, :3].T + T[:3, 3]


def gicp_delta(d: jax.Array) -> jax.Array:
    """LsqRegistration's 6-vector -> SE(3) increment.

    The reference parameterizes updates as rotation `so3_exp(d[:3])` with **raw**
    translation `d[3:]` (not a full SE(3) exp): `lsq_registration_impl.hpp:137-142`.
    """
    return se3_matrix(so3_exp(d[:3]), d[3:])


def build_scaling_rotation(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """L = R @ diag(s): the Gaussian 'square root' factor, Σ = L Lᵀ.

    Equivalent to the reference's `build_scaling_rotation` followed by
    `Σ = L Lᵀ` (`utils/general_utils.py:68-121`, `forward.cu:122-168` computes
    the same Σ = R S S Rᵀ).
    """
    R = quat_to_rotmat(quat_normalize(quats))
    return R * scales[..., None, :]


def quat_scale_to_cov(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """(scale, quat xyzw) -> full 3x3 covariance Σ = R S² Rᵀ [..., 3, 3]."""
    L = build_scaling_rotation(scales, quats)
    return L @ jnp.swapaxes(L, -1, -2)


# LiDAR body → camera axes (FLU → RDF): the literal matrices the reference
# composes as `R_cam @ (Rz_90 @ Rx_minus_90)` when building keyframe cameras
# from odometry (`scripts/gaussian_splatting.py:309-315`). Product:
# [[0,0,1],[-1,0,0],[0,-1,0]] — lidar-forward x → camera-forward z,
# lidar-left y → camera −x, lidar-up z → camera −y. The single shared
# definition for every ingestion path (pipeline keyframing, rosbag replay).
import numpy as _np  # noqa: E402  (host-side constant; not a jnp value)

LIDAR_TO_CAM = (
    _np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], dtype=_np.float32)
    @ _np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=_np.float32)
)
