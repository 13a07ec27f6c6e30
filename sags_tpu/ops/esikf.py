"""Error-State Iterated Kalman Filter (ESIKF) for LiDAR-inertial odometry.

The reference consumes FAST-LIVO2's ESIKF odometry as a ROS node whose
submodule is not vendored (SURVEY.md §0.1) — only the topic contract is
visible. This module provides the TPU-native tracking front-end filling that
role (BASELINE.json north-star names the ESIKF update): a FAST-LIO2-style
18-state filter

    x = (R ∈ SO(3), p, v, bg, ba, g),   error state δx ∈ R¹⁸

with IMU mean/covariance propagation and an **iterated** point-to-plane LiDAR
update, all as jitted linear algebra (`lax.scan` over IMU samples,
`lax.while_loop`-free fixed iteration count for the update — XLA-friendly).

Planes come from the target Gaussian voxel map (`sags_tpu.ops.gicp.VoxelMap`):
normal = smallest eigenvector of the voxel covariance, the same surfel
geometry GICP uses.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sags_tpu.core.transforms import skew, so3_exp
from sags_tpu.ops.gicp import NEIGHBOR_OFFSETS, VoxelMap, _voxel_coords, lookup_voxels

_HI = jax.lax.Precision.HIGHEST

# error-state layout: [dθ(3), dp(3), dv(3), dbg(3), dba(3), dg(3)]
_DIM = 18


class ESIKFState(NamedTuple):
    R: jax.Array  # [3,3] body→world
    p: jax.Array  # [3]
    v: jax.Array  # [3]
    bg: jax.Array  # [3] gyro bias
    ba: jax.Array  # [3] accel bias
    g: jax.Array  # [3] gravity in world (≈ [0,0,-9.81])
    P: jax.Array  # [18,18] error covariance


def init_state(
    R=None, p=None, g=None, P0_rot=1e-4, P0_pos=1e-4, P0_vel=1e-2, P0_bias=1e-4,
    P0_grav=1e-6,
) -> ESIKFState:
    P = jnp.diag(
        jnp.concatenate(
            [
                jnp.full(3, P0_rot), jnp.full(3, P0_pos), jnp.full(3, P0_vel),
                jnp.full(3, P0_bias), jnp.full(3, P0_bias), jnp.full(3, P0_grav),
            ]
        )
    )
    return ESIKFState(
        R=jnp.eye(3) if R is None else R,
        p=jnp.zeros(3) if p is None else p,
        v=jnp.zeros(3),
        bg=jnp.zeros(3),
        ba=jnp.zeros(3),
        g=jnp.array([0.0, 0.0, -9.81]) if g is None else g,
        P=P,
    )


@functools.partial(jax.jit, static_argnames=())
def propagate(
    state: ESIKFState,
    gyro: jax.Array,  # [M,3] rad/s samples
    accel: jax.Array,  # [M,3] m/s² (body frame, specific force)
    dts: jax.Array,  # [M] seconds per sample
    gyro_noise: float = 1e-3,
    accel_noise: float = 1e-2,
    bias_gyro_noise: float = 1e-5,
    bias_accel_noise: float = 1e-4,
) -> ESIKFState:
    """Mean + covariance propagation over an IMU batch (forward Euler on the
    manifold, first-order F — the standard FAST-LIO formulation)."""

    def step(s: ESIKFState, x):
        w, a, dt = x
        w_u = w - s.bg
        a_u = a - s.ba
        R_new = s.R @ so3_exp(w_u * dt)
        acc_w = s.R @ a_u + s.g
        p_new = s.p + s.v * dt + 0.5 * acc_w * dt * dt
        v_new = s.v + acc_w * dt

        F = jnp.eye(_DIM)
        I3 = jnp.eye(3)
        # dθ' = exp(-w dt) dθ − dt·dbg
        F = F.at[0:3, 0:3].set(so3_exp(-w_u * dt))
        F = F.at[0:3, 9:12].set(-I3 * dt)
        # dp' = dp + dt·dv
        F = F.at[3:6, 6:9].set(I3 * dt)
        # dv' = −R[a]× dθ dt + dv − R dt dba + dt dg
        F = F.at[6:9, 0:3].set(-s.R @ skew(a_u) * dt)
        F = F.at[6:9, 12:15].set(-s.R * dt)
        F = F.at[6:9, 15:18].set(I3 * dt)

        Q = jnp.zeros((_DIM, _DIM))
        Q = Q.at[0:3, 0:3].set(I3 * gyro_noise**2 * dt * dt)
        Q = Q.at[6:9, 6:9].set(I3 * accel_noise**2 * dt * dt)
        Q = Q.at[9:12, 9:12].set(I3 * bias_gyro_noise**2 * dt)
        Q = Q.at[12:15, 12:15].set(I3 * bias_accel_noise**2 * dt)

        P_new = F @ s.P @ F.T + Q
        return s._replace(R=R_new, p=p_new, v=v_new, P=P_new), None

    state, _ = jax.lax.scan(step, state, (gyro, accel, dts))
    return state


class ScanUpdateResult(NamedTuple):
    state: ESIKFState
    n_matched: jax.Array
    mean_residual: jax.Array


@functools.partial(jax.jit, static_argnames=("num_iters", "min_planarity"))
def scan_update(
    state: ESIKFState,
    points_body: jax.Array,  # [N,3] LiDAR points in body frame
    mask: jax.Array,  # [N]
    vm: VoxelMap,  # target surfel map
    meas_noise: float = 0.05,
    num_iters: int = 4,
    gate: float = 0.5,
    min_planarity: float = 0.5,
) -> ScanUpdateResult:
    """Iterated point-to-plane update against the voxel surfel map.

    Residual rᵢ = nᵢ · (R qᵢ + p − cᵢ), H rows over (dθ, dp): the classic
    FAST-LIO measurement model. Fixed iteration count (static) with the
    Kalman gain in information form so the solve is 18×18."""
    N = points_body.shape[0]

    # surfel planes: normal = smallest-eigenvector of voxel covariance
    evals, evecs = jnp.linalg.eigh(vm.covs)
    normals_all = evecs[..., 0]  # [V,3]
    planarity_all = 1.0 - evals[:, 0] / jnp.maximum(evals[:, 1], 1e-9)
    offsets = jnp.asarray(NEIGHBOR_OFFSETS["direct7"], jnp.int32)  # [7,3]

    def best_plane(q_w):
        """Search the 7-voxel neighborhood and keep the plane with the
        smallest point-to-plane distance (FAST-LIO's plane search; exact-voxel
        lookup loses points that straddle voxel boundaries)."""
        coords = _voxel_coords(q_w, vm.resolution)  # [N,3]
        c_off = (coords[:, None, :] + offsets[None]).reshape(-1, 3)
        vidx, found = lookup_voxels(vm, c_off)
        vidx = vidx.reshape(N, -1)
        found = found.reshape(N, -1)
        c = vm.means[vidx]  # [N,7,3]
        n = normals_all[vidx]
        r_all = jnp.einsum("nfi,nfi->nf", n, q_w[:, None] - c)
        cand_ok = (
            found
            & (planarity_all[vidx] > min_planarity)
            & (vm.num_points[vidx] >= 3)
        )
        score = jnp.where(cand_ok, jnp.abs(r_all), jnp.inf)
        best = jnp.argmin(score, axis=-1)
        take = lambda a: jnp.take_along_axis(a, best[..., None], axis=1)[:, 0]
        r = take(r_all)
        n_b = jnp.take_along_axis(n, best[:, None, None], axis=1)[:, 0]
        ok = take(cand_ok) & (jnp.abs(r) < gate) & mask
        return r, n_b, ok

    R0, p0 = state.R, state.p
    Pinv = jnp.linalg.inv(state.P + 1e-9 * jnp.eye(_DIM))
    inv_r = 1.0 / (meas_noise**2)

    def iteration(carry, _):
        R, p = carry
        q_w = points_body @ R.T + p
        r, n, ok = best_plane(q_w)
        w = ok.astype(jnp.float32)

        # H rows: dθ: −n·(R [q]×) ; dp: n
        Hrot = -jnp.einsum("ni,ij,njk->nk", n, R, skew(points_body), precision=_HI)
        Hp = n
        # Information-form update over the full 18-state (zeros elsewhere)
        H = jnp.concatenate(
            [Hrot, Hp, jnp.zeros((N, _DIM - 6))], axis=-1
        )  # [N,18]
        Hw = H * (w * inv_r)[:, None]
        A = Pinv + H.T @ Hw  # [18,18]
        # error between current iterate and prior mean (on-manifold boxminus)
        from sags_tpu.core.transforms import so3_log

        dtheta = so3_log(R0.T @ R)
        dx_prior = jnp.concatenate([dtheta, p - p0, jnp.zeros(_DIM - 6)])
        rhs = Hw.T @ r + Pinv @ dx_prior
        dx = jnp.linalg.solve(A, rhs)

        R_new = R @ so3_exp(-dx[0:3])
        p_new = p - dx[3:6]
        return (R_new, p_new), (jnp.sum(w), jnp.sum(jnp.abs(r) * w) / jnp.maximum(jnp.sum(w), 1.0))

    (R_f, p_f), (n_m, res) = jax.lax.scan(
        iteration, (R0, p0), None, length=num_iters
    )

    # covariance update with the final linearization
    q_w = points_body @ R_f.T + p_f
    r, n, ok = best_plane(q_w)
    w = ok.astype(jnp.float32)
    Hrot = -jnp.einsum("ni,ij,njk->nk", n, R_f, skew(points_body), precision=_HI)
    H = jnp.concatenate([Hrot, n, jnp.zeros((N, _DIM - 6))], axis=-1)
    Hw = H * (w * inv_r)[:, None]
    A = Pinv + H.T @ Hw
    P_new = jnp.linalg.inv(A)

    # velocity/bias remain; update v consistently with dp between iterations?
    # FAST-LIO folds them through H=0 rows — P couples them.
    new_state = state._replace(R=R_f, p=p_f, P=P_new)
    return ScanUpdateResult(state=new_state, n_matched=n_m[-1], mean_residual=res[-1])
