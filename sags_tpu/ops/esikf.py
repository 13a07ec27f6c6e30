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
from typing import NamedTuple, Optional, Tuple

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

    # surfel planes: normal = smallest-eigenvector of voxel covariance.
    # sym_eig3 is DESCENDING (vs eigh's ascending): smallest is column 2.
    from sags_tpu.ops.gicp import sym_eig3

    evals, evecs = sym_eig3(vm.covs)
    normals_all = evecs[..., 2]  # [V,3]
    planarity_all = 1.0 - evals[:, 2] / jnp.maximum(evals[:, 1], 1e-9)
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

    v0, bg0, ba0, g0 = state.v, state.bg, state.ba, state.g

    def iteration(carry, _):
        R, p, v, bg, ba, g = carry
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
        dx_prior = jnp.concatenate(
            [dtheta, p - p0, v - v0, bg - bg0, ba - ba0, g - g0]
        )
        rhs = Hw.T @ r + Pinv @ dx_prior
        dx = jnp.linalg.solve(A, rhs)

        # Apply the FULL error-state correction: the measurement only sees
        # (R, p), but the prior covariance couples v/bg/ba/g to them — the
        # FAST-LIVO2 filter corrects all of them each iterate.
        R_new = R @ so3_exp(-dx[0:3])
        p_new = p - dx[3:6]
        v_new = v - dx[6:9]
        bg_new = bg - dx[9:12]
        ba_new = ba - dx[12:15]
        g_new = g - dx[15:18]
        return (R_new, p_new, v_new, bg_new, ba_new, g_new), (
            jnp.sum(w), jnp.sum(jnp.abs(r) * w) / jnp.maximum(jnp.sum(w), 1.0)
        )

    (R_f, p_f, v_f, bg_f, ba_f, g_f), (n_m, res) = jax.lax.scan(
        iteration, (R0, p0, v0, bg0, ba0, g0), None, length=num_iters
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

    new_state = state._replace(
        R=R_f, p=p_f, v=v_f, bg=bg_f, ba=ba_f, g=g_f, P=P_new
    )
    return ScanUpdateResult(state=new_state, n_matched=n_m[-1], mean_residual=res[-1])


def _bilinear(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Bilinear sample img[H,W] at (u,v) pixel coords (u→W, v→H)."""
    H, W = img.shape
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    fu = jnp.clip(u - u0, 0.0, 1.0)
    fv = jnp.clip(v - v0, 0.0, 1.0)
    g = lambda dy, dx: img[v0 + dy, u0 + dx]
    return ((1 - fv) * ((1 - fu) * g(0, 0) + fu * g(0, 1))
            + fv * ((1 - fu) * g(1, 0) + fu * g(1, 1)))


class PhotoUpdateResult(NamedTuple):
    state: ESIKFState
    n_used: jax.Array
    mean_residual: jax.Array


@functools.partial(jax.jit, static_argnames=("num_iters",))
def photo_update(
    state: ESIKFState,
    points_world: jax.Array,  # [M,3] map anchor points (world frame)
    intensity: jax.Array,  # [M] reference intensity per anchor
    ok: jax.Array,  # [M] anchor validity
    image: jax.Array,  # [3,H,W] current frame
    fx: float, fy: float, cx: float, cy: float,
    meas_noise: float = 0.15,
    num_iters: int = 2,
    gate: float = 0.4,
    grad_min: float = 1e-3,
    R_ext: Optional[jax.Array] = None,  # [3,3] camera axes in the BODY frame
    t_ext: Optional[jax.Array] = None,  # [3] camera center in the BODY frame
) -> PhotoUpdateResult:
    """Photometric ESIKF update — the "V" of LIVO (SURVEY §0.1 north star:
    FAST-LIVO2 is LiDAR-inertial-VISUAL; its sparse-patch direct alignment
    is reproduced here as per-anchor intensity residuals against the
    incremental map's photometric anchors).

    Residual rᵢ = I(π(Eᵀ(Rᵀ(qᵢ − p) − t_e))) − cᵢ with image-gradient
    chain-rule rows over (dθ, dp), fused into the same information-form
    iterated update as `scan_update` (sequential LiDAR→visual updates, the
    FAST-LIVO2 order).

    `R_ext`/`t_ext` are the camera-from-body extrinsic (E, t_e): the filter
    state tracks the BODY (LiDAR/IMU) frame while the image lives in the
    camera frame — the frame relationship the reference bakes in as
    `R_cam = R_body · Rz(90°) · Rx(−90°)`
    (`scripts/gaussian_splatting.py:309-315`, our `transforms.LIDAR_TO_CAM`).
    None means body == camera (identity extrinsic). Jacobians: with
    q_b = Rᵀ(q−p) and q_c = Eᵀ(q_b − t_e),
      dr/dδθ = ((E·g) × q_b)ᵀ,   dr/dδp = −(R·E·g)ᵀ
    (g the pinhole-chained image gradient in the camera frame), which reduce
    to the body==camera rows g×q_c / −(Rg)ᵀ when E = I, t_e = 0.
    """
    gray = image.mean(axis=0)  # [H,W]
    Himg, Wimg = gray.shape
    # central-difference gradient maps, sampled bilinearly at projections
    gx = jnp.zeros_like(gray).at[:, 1:-1].set((gray[:, 2:] - gray[:, :-2]) * 0.5)
    gy = jnp.zeros_like(gray).at[1:-1, :].set((gray[2:, :] - gray[:-2, :]) * 0.5)

    R0, p0 = state.R, state.p
    v0, bg0, ba0, g0 = state.v, state.bg, state.ba, state.g
    Pinv = jnp.linalg.inv(state.P + 1e-9 * jnp.eye(_DIM))
    inv_r = 1.0 / (meas_noise ** 2)
    M = points_world.shape[0]

    def residual_rows(R, p):
        """(r, w, Hm): per-anchor residual, gate weight, measurement rows."""
        q_b = (points_world - p) @ R  # rows Rᵀ(q − p), body frame
        q_c = q_b if t_ext is None else q_b - t_ext[None, :]
        if R_ext is not None:
            q_c = q_c @ R_ext  # rows Eᵀ(·), camera frame
        zc = q_c[:, 2]
        z_safe = jnp.where(zc > 1e-3, zc, 1.0)
        u = fx * q_c[:, 0] / z_safe + cx
        v_pix = fy * q_c[:, 1] / z_safe + cy
        inb = (
            ok & (zc > 0.2)
            & (u >= 1.0) & (u <= Wimg - 2.0)
            & (v_pix >= 1.0) & (v_pix <= Himg - 2.0)
        )
        r = _bilinear(gray, u, v_pix) - intensity
        gxi = _bilinear(gx, u, v_pix)
        gyi = _bilinear(gy, u, v_pix)
        # dr/dq_c = gᵀ · du/dq_c (pinhole Jacobian), camera frame
        gvec = (
            gxi[:, None] * jnp.stack(
                [fx / z_safe, jnp.zeros_like(zc), -fx * q_c[:, 0] / z_safe**2], -1)
            + gyi[:, None] * jnp.stack(
                [jnp.zeros_like(zc), fy / z_safe, -fy * q_c[:, 1] / z_safe**2], -1)
        )  # [M,3]
        # textureless or gated points contribute nothing
        w = (
            inb & (jnp.abs(r) < gate)
            & (jnp.sum(gvec * gvec, -1) > grad_min ** 2)
        ).astype(jnp.float32)
        # rows per the docstring: body-frame lever arm q_b, gradient E·g
        g_body = gvec if R_ext is None else gvec @ R_ext.T
        Hrot = jnp.cross(g_body, q_b)
        Hp = -(g_body @ R.T)
        Hm = jnp.concatenate(
            [Hrot, Hp, jnp.zeros((M, _DIM - 6))], axis=-1)
        return r, w, Hm

    def iteration(carry, _):
        R, p, v, bg, ba, g = carry
        r, w, Hm = residual_rows(R, p)
        Hw = Hm * (w * inv_r)[:, None]
        A = Pinv + Hm.T @ Hw
        from sags_tpu.core.transforms import so3_log

        dtheta = so3_log(R0.T @ R)
        dx_prior = jnp.concatenate(
            [dtheta, p - p0, v - v0, bg - bg0, ba - ba0, g - g0])
        rhs = Hw.T @ r + Pinv @ dx_prior
        dx = jnp.linalg.solve(A, rhs)
        R_new = R @ so3_exp(-dx[0:3])
        p_new = p - dx[3:6]
        v_new = v - dx[6:9]
        bg_new = bg - dx[9:12]
        ba_new = ba - dx[12:15]
        g_new = g - dx[15:18]
        return (R_new, p_new, v_new, bg_new, ba_new, g_new), (
            jnp.sum(w), jnp.sum(jnp.abs(r) * w) / jnp.maximum(jnp.sum(w), 1.0))

    (R_f, p_f, v_f, bg_f, ba_f, g_f), (n_u, res) = jax.lax.scan(
        iteration, (R0, p0, v0, bg0, ba0, g0), None, length=num_iters
    )

    # covariance update with the final linearization
    _, w, Hm = residual_rows(R_f, p_f)
    Hw = Hm * (w * inv_r)[:, None]
    P_new = jnp.linalg.inv(Pinv + Hm.T @ Hw)

    new_state = state._replace(
        R=R_f, p=p_f, v=v_f, bg=bg_f, ba=ba_f, g=g_f, P=P_new)
    return PhotoUpdateResult(state=new_state, n_used=n_u[-1],
                             mean_residual=res[-1])


# ---------------------------------------------------------------------------
# Incremental surfel map — the filter's world model.
#
# FAST-LIO/LIVO maintain an incremental voxel/ikd-tree map; the reference's
# voxel maps accumulate additively (`cuda/gaussian_voxelmap.cu:22-130`
# atomicAdd). TPU equivalent: per-voxel moment accumulators (n, Σp, Σppᵀ)
# over a FIXED world grid, merged with each new scan by one small
# sort + segment-reduce — O(V + N) per frame, no per-frame kNN covariance
# re-estimation, no full-map rebuild. Surfel covariance = within-voxel point
# scatter Σqqᵀ/n − q̄q̄ᵀ with q = p − voxel_center (anchoring at the voxel
# center keeps |q| ≤ ~resolution, so the moment subtraction stays
# well-conditioned in f32 even for voxels far from the world origin —
# the raw E[ppᵀ]−μμᵀ form cancels catastrophically at ~60 m).
# ---------------------------------------------------------------------------


class SurfelMap(NamedTuple):
    keys: jax.Array  # [V] sorted unique voxel keys (INT32_MAX pad)
    n: jax.Array  # [V] points accumulated per voxel
    sum_p: jax.Array  # [V,3] Σ(p − voxel_center) — anchored first moment
    sum_pp: jax.Array  # [V,3,3] Σ(p − voxel_center)(p − voxel_center)ᵀ
    sum_i: jax.Array  # [V] Σ intensity — photometric anchor (mean = sum_i/n)
    overflow: jax.Array  # voxels dropped by capacity
    mins: jax.Array  # [3] fixed grid origin (voxel coords)
    dims: jax.Array  # [3] fixed grid dims
    resolution: float


def surfel_map_init(
    resolution: float = 0.3,
    capacity: int = 8192,
    world_extent: float = 128.0,
) -> SurfelMap:
    """Fixed world grid centered at the origin (±world_extent/2 per axis).

    Raises if the flattened key space exceeds int32 (the encode would wrap
    negative, silently aliasing voxels): shrink `world_extent` or coarsen
    `resolution` — or re-center the trajectory before tracking.
    """
    half = int(world_extent / (2 * resolution)) + 2
    dim = 2 * half + 1
    if dim ** 3 >= 2 ** 31:
        max_dim = int((2.0 ** 31) ** (1.0 / 3.0))  # ≈1290 cells per axis
        raise ValueError(
            f"surfel grid {dim}^3 overflows the int32 key space "
            f"(max ~{max_dim} cells per axis)"
        )
    mins = jnp.full((3,), -half, jnp.int32)
    dims = jnp.full((3,), dim, jnp.int32)
    return SurfelMap(
        keys=jnp.full((capacity,), _SURFEL_KEY_MAX, jnp.int32),
        n=jnp.zeros((capacity,), jnp.float32),
        sum_p=jnp.zeros((capacity, 3), jnp.float32),
        sum_pp=jnp.zeros((capacity, 3, 3), jnp.float32),
        sum_i=jnp.zeros((capacity,), jnp.float32),
        overflow=jnp.int32(0),
        mins=mins,
        dims=dims,
        resolution=resolution,
    )


_SURFEL_KEY_MAX = jnp.iinfo(jnp.int32).max


def _surfel_encode(sm: SurfelMap, coords: jax.Array) -> jax.Array:
    rel = coords - sm.mins
    inside = jnp.all((rel >= 0) & (rel < sm.dims), axis=-1)
    key = (rel[..., 0] * sm.dims[1] + rel[..., 1]) * sm.dims[2] + rel[..., 2]
    return jnp.where(inside, key, _SURFEL_KEY_MAX)


@jax.jit
def surfel_map_update(
    sm: SurfelMap, points: jax.Array, mask: jax.Array,
    intensity: Optional[jax.Array] = None,
) -> SurfelMap:
    """Fold a world-frame scan into the map: one sort + segment-reduce over
    (existing voxels ++ new points). `intensity` [N] (optional) accumulates
    the photometric anchor the LIVO visual update measures against."""
    V = sm.keys.shape[0]
    coords = _voxel_coords(points, sm.resolution)
    keys_new = jnp.where(mask, _surfel_encode(sm, coords), _SURFEL_KEY_MAX)
    valid = keys_new < _SURFEL_KEY_MAX
    # out-of-extent points are dropped — count them (like every other
    # capacity bound, drops must be surfaced, not silent)
    dropped = jnp.sum(mask & ~valid)
    if intensity is None:
        intensity = jnp.zeros(points.shape[0], jnp.float32)

    # anchor each point at its voxel center: the fixed per-voxel anchor makes
    # the moments combinable across updates while keeping them O(resolution)
    q = points - (coords.astype(jnp.float32) + 0.5) * sm.resolution
    keys_all = jnp.concatenate([sm.keys, keys_new])
    n_all = jnp.concatenate([sm.n, valid.astype(jnp.float32)])
    sp_all = jnp.concatenate([sm.sum_p, jnp.where(valid[:, None], q, 0.0)])
    qq = q[:, :, None] * q[:, None, :]
    spp_all = jnp.concatenate(
        [sm.sum_pp, jnp.where(valid[:, None, None], qq, 0.0)]
    )
    si_all = jnp.concatenate([sm.sum_i, jnp.where(valid, intensity, 0.0)])

    order = jnp.argsort(keys_all)
    ks = keys_all[order]
    is_new = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]]) & (
        ks < _SURFEL_KEY_MAX
    )
    vid = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    live = ks < _SURFEL_KEY_MAX
    slot = jnp.where(live & (vid < V), vid, V)
    n_unique = jnp.maximum(vid[-1] + 1, 0)
    overflow = sm.overflow + jnp.maximum(n_unique - V, 0) + dropped

    key_buf = jnp.full((V + 1,), _SURFEL_KEY_MAX, jnp.int32)
    key_buf = key_buf.at[slot].set(
        jnp.where(slot < V, ks, _SURFEL_KEY_MAX), mode="drop"
    )
    add = lambda init, x: init.at[slot].add(x[order], mode="drop")
    n_buf = add(jnp.zeros((V + 1,), jnp.float32), n_all)
    sp_buf = add(jnp.zeros((V + 1, 3), jnp.float32), sp_all)
    spp_buf = add(jnp.zeros((V + 1, 3, 3), jnp.float32), spp_all)
    si_buf = add(jnp.zeros((V + 1,), jnp.float32), si_all)
    return sm._replace(
        keys=key_buf[:V], n=n_buf[:V], sum_p=sp_buf[:V], sum_pp=spp_buf[:V],
        sum_i=si_buf[:V], overflow=overflow,
    )


@jax.jit
def surfel_map_voxels(sm: SurfelMap) -> VoxelMap:
    """View the accumulators as the VoxelMap scan_update consumes."""
    n = jnp.maximum(sm.n, 1.0)
    # decode the per-voxel anchor (voxel center) back from the key
    rel2 = sm.keys % sm.dims[2]
    t = sm.keys // sm.dims[2]
    rel = jnp.stack([t // sm.dims[1], t % sm.dims[1], rel2], axis=-1)
    live = (sm.keys < _SURFEL_KEY_MAX)[:, None]
    center = jnp.where(
        live, ((rel + sm.mins).astype(jnp.float32) + 0.5) * sm.resolution, 0.0
    )
    qbar = sm.sum_p / n[:, None]
    means = center + qbar
    covs = sm.sum_pp / n[:, None, None] - qbar[:, :, None] * qbar[:, None, :]
    # regularize so eigh on empty/degenerate voxels stays finite
    covs = covs + 1e-6 * jnp.eye(3)
    return VoxelMap(
        keys=sm.keys,
        means=means,
        covs=covs,
        num_points=sm.n.astype(jnp.int32),
        n_voxels=jnp.sum(sm.keys < _SURFEL_KEY_MAX),
        overflow=sm.overflow,
        # VoxelMap.lookup uses rel = c - mins + 1; ours is rel = c - sm.mins,
        # so mins+1 makes both encodings agree key-for-key.
        mins=sm.mins + 1,
        dims=sm.dims,
        resolution=sm.resolution,
    )


@jax.jit
def surfel_map_anchors(sm: SurfelMap):
    """Photometric anchors for `photo_update`: (world points, mean intensity,
    validity). Anchors are the voxel mean positions; intensity is the running
    per-voxel mean — the sparse direct-alignment targets FAST-LIVO2 keeps
    per visual submap patch."""
    vm = surfel_map_voxels(sm)
    live = sm.keys < _SURFEL_KEY_MAX
    n = jnp.maximum(sm.n, 1.0)
    return vm.means, sm.sum_i / n, live & (sm.n >= 2.0)
