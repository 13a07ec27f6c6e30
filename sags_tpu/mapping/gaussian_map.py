"""Incremental Gaussian map — TPU-native redesign of `scene/gaussian_model.py`.

The reference grows/shrinks torch parameter tensors in place and performs
surgery on Adam state (`cat_tensors_to_optimizer` `gaussian_model.py:485-508`,
`_prune_optimizer:443-459`). XLA wants static shapes, so the map lives in
**fixed-capacity buffers with an active mask**:

  * `count` = high-water mark of allocated slots (monotone within a capacity).
  * adding Gaussians = masked scatter at `[count, count+B)`; Adam moments of
    fresh slots are zero by construction (inactive slots receive zero grads),
    which matches the reference's concat-zeros surgery.
  * pruning = clearing `active` bits (the reference physically removes rows;
    `compact()` provides the same effect for memory reclamation, host-side).
  * capacity growth = `grow()` (doubling), one recompile per doubling.

Parameter fields mirror `GaussianModel.__init__` (`gaussian_model.py:48-71`):
xyz, f_dc, f_rest, log_scales (exp activation), quats (xyzw, normalize
activation), opacity logits (sigmoid activation), and the 16-channel semantic
`obj_dc` (`:62`), plus `trackable`/`keyframe` bookkeeping (`:65-66`) and
densification stats (`:659-661`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sags_tpu.core import sh as shlib
from sags_tpu.core.config import MapConfig, OptimizationConfig, expon_lr
from sags_tpu.core.transforms import quat_normalize


class GaussianMap(NamedTuple):
    """The map pytree. Leading dim of every per-Gaussian field = capacity."""

    xyz: jax.Array  # [N,3]
    f_dc: jax.Array  # [N,3] SH DC coefficients
    f_rest: jax.Array  # [N,R,3] higher SH (R = (deg+1)^2 - 1)
    log_scales: jax.Array  # [N,3]
    quats: jax.Array  # [N,4] xyzw (raw; normalized at use)
    opacity_logit: jax.Array  # [N]
    obj_dc: jax.Array  # [N,O] semantic embedding
    active: jax.Array  # [N] bool
    trackable: jax.Array  # [N] bool
    keyframe_id: jax.Array  # [N] int32 — keyframe that spawned the Gaussian
    count: jax.Array  # scalar int32 — allocated slots
    max_radii2d: jax.Array  # [N] float32
    xyz_grad_accum: jax.Array  # [N] densification stats
    denom: jax.Array  # [N]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


PARAM_FIELDS = ("xyz", "f_dc", "f_rest", "log_scales", "quats", "opacity_logit", "obj_dc")


class Params(NamedTuple):
    """The trainable subset, as its own pytree for optax."""

    xyz: jax.Array
    f_dc: jax.Array
    f_rest: jax.Array
    log_scales: jax.Array
    quats: jax.Array
    opacity_logit: jax.Array
    obj_dc: jax.Array


def params_of(m: GaussianMap) -> Params:
    return Params(*(getattr(m, f) for f in PARAM_FIELDS))


def with_params(m: GaussianMap, p: Params) -> GaussianMap:
    return m._replace(**p._asdict())


def init_map(capacity: int, cfg: MapConfig) -> GaussianMap:
    R = (cfg.sh_degree + 1) ** 2 - 1
    z3 = jnp.zeros((capacity, 3), jnp.float32)
    return GaussianMap(
        xyz=z3,
        f_dc=z3,
        f_rest=jnp.zeros((capacity, R, 3), jnp.float32),
        log_scales=z3,
        quats=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (capacity, 1)),
        opacity_logit=jnp.zeros((capacity,), jnp.float32),
        obj_dc=jnp.zeros((capacity, cfg.num_objects), jnp.float32),
        active=jnp.zeros((capacity,), bool),
        trackable=jnp.zeros((capacity,), bool),
        keyframe_id=jnp.full((capacity,), -1, jnp.int32),
        count=jnp.zeros((), jnp.int32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# Activations (`gaussian_model.py:34-45`)
# ---------------------------------------------------------------------------


def get_scaling(m: GaussianMap) -> jax.Array:
    return jnp.exp(m.log_scales)


def get_opacity(m: GaussianMap) -> jax.Array:
    return jax.nn.sigmoid(m.opacity_logit)


def get_rotation(m: GaussianMap) -> jax.Array:
    return quat_normalize(m.quats)


def get_shs(m: GaussianMap) -> jax.Array:
    """[N, 3, (deg+1)^2] — DC first, matching `get_features` concat order."""
    dc = m.f_dc[:, :, None]
    if m.f_rest.shape[1] == 0:
        return dc
    return jnp.concatenate([dc, m.f_rest.transpose(0, 2, 1)], axis=-1)


# ---------------------------------------------------------------------------
# Growth: add_from_pcd2_tensor (`gaussian_model.py:180-229`)
# ---------------------------------------------------------------------------


def add_points(
    m: GaussianMap,
    points: jax.Array,  # [B,3]
    colors: jax.Array,  # [B,3] in [0,1]
    mask: jax.Array,  # [B] bool — valid entries of this (padded) batch
    rng: jax.Array,  # PRNG key for the random semantic embedding
    quats: Optional[jax.Array] = None,  # [B,4] xyzw (default identity)
    scales: Optional[jax.Array] = None,  # [B,3] raw scales (default cfg initial)
    z_vals: Optional[jax.Array] = None,  # [B] GICP z values (‖p‖/5000 in SLAM)
    trackable: Optional[jax.Array] = None,  # [B] bool
    initial_scale: float = 0.01,
    initial_opacity: float = 0.1,
    keyframe_id=-1,
) -> Tuple[GaussianMap, jax.Array]:
    """Append a (masked) batch of Gaussians. Returns (map, n_dropped).

    Semantics of `add_from_pcd2_tensor`: RGB→SH0, random 16-d object embedding
    `RGB2SH(U[0,1])`, scales divided by `clamp((z^1.5)*2, 1)` then logged,
    opacity logit of 0.1 (`gaussian_model.py:180-229`).
    """
    B = points.shape[0]
    N = m.capacity
    if quats is None:
        quats = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], points.dtype), (B, 1))
    if scales is None:
        scales = jnp.full((B, 3), initial_scale, points.dtype)
    if z_vals is not None:
        zc = jnp.maximum((z_vals ** 1.5) * 2.0, 1.0)  # `gaussian_model.py:196-198`
        scales = scales / zc[:, None]
    log_scales = jnp.log(jnp.maximum(scales, 1e-12))
    f_dc = shlib.rgb_to_sh(colors)
    obj_dc = shlib.rgb_to_sh(jax.random.uniform(rng, (B, m.obj_dc.shape[1])))
    opl = jnp.full((B,), inverse_sigmoid(jnp.float32(initial_opacity)))
    if trackable is None:
        trackable = jnp.zeros((B,), bool)

    # Target slots: count + rank among valid entries. Out-of-capacity → drop.
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = m.count + rank
    ok = mask & (slot < N)
    slot = jnp.where(ok, slot, N)  # N = out-of-bounds → mode="drop"
    n_added = jnp.sum(ok.astype(jnp.int32))
    n_dropped = jnp.sum(mask) - n_added

    def put(buf, val):
        return buf.at[slot].set(val, mode="drop")

    m = m._replace(
        xyz=put(m.xyz, points),
        f_dc=put(m.f_dc, f_dc),
        f_rest=put(m.f_rest, jnp.zeros((B,) + m.f_rest.shape[1:], m.f_rest.dtype)),
        log_scales=put(m.log_scales, log_scales),
        quats=put(m.quats, quats),
        opacity_logit=put(m.opacity_logit, opl),
        obj_dc=put(m.obj_dc, obj_dc),
        active=put(m.active, ok),
        trackable=put(m.trackable, trackable & ok),
        keyframe_id=put(m.keyframe_id,
                        jnp.full((B,), keyframe_id, jnp.int32)),
        count=m.count + n_added,
        max_radii2d=put(m.max_radii2d, jnp.zeros((B,), jnp.float32)),
        xyz_grad_accum=put(m.xyz_grad_accum, jnp.zeros((B,), jnp.float32)),
        denom=put(m.denom, jnp.zeros((B,), jnp.float32)),
    )
    return m, n_dropped


# ---------------------------------------------------------------------------
# Pruning / densification (`gaussian_model.py:536-650`)
# ---------------------------------------------------------------------------


def prune_large_and_transparent(
    m: GaussianMap, min_opacity: float, extent: Optional[float]
) -> GaussianMap:
    """SLAM-mode prune (`gaussian_model.py:624-636`): opacity < ε or
    max scale > 0.1 * extent."""
    prune = get_opacity(m) < min_opacity
    if extent is not None:
        prune = prune | (jnp.max(get_scaling(m), axis=-1) > 0.1 * extent)
    return m._replace(active=m.active & ~prune)


def prune_large_and_transparent2(
    m: GaussianMap, min_opacity: float, scaling_threshold: float,
    visibility: jax.Array,
) -> GaussianMap:
    """`prune_large_and_transparent2` (`gaussian_model.py:639-651`): shrink
    large Gaussians to 0.1x instead of deleting them; erase transparent
    *visible* ones."""
    scal = get_scaling(m)
    large = jnp.max(scal, axis=-1) > scaling_threshold
    new_ls = jnp.where(large[:, None], jnp.log(jnp.maximum(scal * 0.1, 1e-12)),
                       m.log_scales)
    transparent = visibility & (get_opacity(m) < min_opacity)
    return m._replace(log_scales=new_ls, active=m.active & ~transparent)


def add_densification_stats(
    m: GaussianMap, mean2d_grad: jax.Array, radii: jax.Array
) -> GaussianMap:
    """Accumulate ‖∇mean2D‖ for visible Gaussians (`gaussian_model.py:659-661`),
    and track max screen radius. `mean2d_grad` is [N,2] d(loss)/d(mean2d)."""
    vis = radii > 0
    norm = jnp.linalg.norm(mean2d_grad, axis=-1)
    return m._replace(
        xyz_grad_accum=m.xyz_grad_accum + jnp.where(vis, norm, 0.0),
        denom=m.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.maximum(m.max_radii2d, jnp.where(vis, radii, 0.0)),
    )


def densify_and_clone_split(
    m: GaussianMap,
    grad_threshold: float,
    scene_extent: float,
    rng: jax.Array,
    percent_dense: float = 0.01,
    n_split: int = 2,
) -> Tuple[GaussianMap, jax.Array]:
    """Classic 3DGS densification (`gaussian_model.py:536-623`):

      * clone small high-grad Gaussians (copy, same params),
      * split large high-grad Gaussians into `n_split` samples from N(0, S)
        rotated into world frame, scales divided by 0.8·n_split; original
        deactivated.

    Static-shape version: every Gaussian is a clone/split *candidate*; masked
    appends bounded by remaining capacity, overflow counted.
    """
    grads = m.xyz_grad_accum / jnp.maximum(m.denom, 1.0)
    high = (grads >= grad_threshold) & m.active
    scal = get_scaling(m)
    small = jnp.max(scal, axis=-1) <= percent_dense * scene_extent
    clone_m = high & small
    split_m = high & ~small

    N = m.capacity

    # --- clones: exact copies appended ---
    def append_masked(m, sel, xyz, log_scales, rng_unused):
        B = N
        rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
        slot = m.count + rank
        ok = sel & (slot < N)
        slot = jnp.where(ok, slot, N)
        n_added = jnp.sum(ok.astype(jnp.int32))
        dropped = jnp.sum(sel) - n_added

        def put(buf, val):
            return buf.at[slot].set(val, mode="drop")

        m = m._replace(
            xyz=put(m.xyz, xyz),
            f_dc=put(m.f_dc, m.f_dc),
            f_rest=put(m.f_rest, m.f_rest),
            log_scales=put(m.log_scales, log_scales),
            quats=put(m.quats, m.quats),
            opacity_logit=put(m.opacity_logit, m.opacity_logit),
            obj_dc=put(m.obj_dc, m.obj_dc),
            active=put(m.active, ok),
            trackable=put(m.trackable, m.trackable & ok),
            keyframe_id=put(m.keyframe_id, m.keyframe_id),
            count=m.count + n_added,
            max_radii2d=put(m.max_radii2d, jnp.zeros(B)),
            xyz_grad_accum=put(m.xyz_grad_accum, jnp.zeros(B)),
            denom=put(m.denom, jnp.zeros(B)),
        )
        return m, dropped

    m, drop1 = append_masked(m, clone_m, m.xyz, m.log_scales, None)

    # --- splits: n_split noisy copies, shrunk; deactivate originals ---
    drop2 = jnp.zeros((), jnp.int32)
    R = quat_to_rot_cached(m.quats)
    for k in range(n_split):
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, (N, 3)) * scal
        new_xyz = m.xyz + jnp.einsum("nij,nj->ni", R, noise)
        new_ls = jnp.log(jnp.maximum(scal / (0.8 * n_split), 1e-12))
        m, d = append_masked(m, split_m, new_xyz, new_ls, None)
        drop2 = drop2 + d
    m = m._replace(active=m.active & ~split_m)

    # reset stats (`densification_postfix` zeroes them)
    m = m._replace(
        xyz_grad_accum=jnp.zeros_like(m.xyz_grad_accum),
        denom=jnp.zeros_like(m.denom),
    )
    return m, drop1 + drop2


def quat_to_rot_cached(quats):
    from sags_tpu.core.transforms import quat_to_rotmat

    return quat_to_rotmat(quat_normalize(quats))


def reset_opacity(m: GaussianMap, ceiling: float = 0.01) -> GaussianMap:
    """`reset_opacity` (`gaussian_model.py:312-315`): clamp opacity to ≤ ceiling."""
    new_op = jnp.minimum(get_opacity(m), ceiling)
    return m._replace(opacity_logit=inverse_sigmoid(jnp.clip(new_op, 1e-6, 1 - 1e-6)))


def reset_unreliable_opacity(m: GaussianMap, flt: jax.Array,
                             ceiling: float = 0.01) -> GaussianMap:
    """`reset_unreliable_opacity` (`gaussian_model.py:317-322`): clamp only
    the filtered subset."""
    op = get_opacity(m)
    new_op = jnp.where(flt, jnp.minimum(op, ceiling), op)
    return m._replace(opacity_logit=inverse_sigmoid(jnp.clip(new_op, 1e-6, 1 - 1e-6)))


def reset_visible_opacity(m: GaussianMap, visibility: jax.Array,
                          large_scale: float = 0.03) -> GaussianMap:
    """`reset_visible_opacity` (`gaussian_model.py:324-360`): decay opacity of
    large visible Gaussians by `min(x, log(1+x))`."""
    op = get_opacity(m)
    large = jnp.max(get_scaling(m), axis=-1) > large_scale
    mask = visibility & large & m.active
    new_op = jnp.where(mask, jnp.minimum(op, jnp.log1p(op)), op)
    return m._replace(opacity_logit=inverse_sigmoid(jnp.clip(new_op, 1e-6, 1 - 1e-6)))


# ---------------------------------------------------------------------------
# Optimizer: per-group Adam (`gaussian_model.py:242-262`)
# ---------------------------------------------------------------------------


def make_optimizer(opt: OptimizationConfig, spatial_lr_scale: float = 1.0):
    """Adam(eps=1e-15) with per-field LRs; xyz LR follows the exp schedule.

    Returns an optax GradientTransformation whose update takes `step` via
    `optax.inject_hyperparams`-free closure: call `update(grads, state, params,
    step=...)` through the returned wrapper.
    """
    base = optax.scale_by_adam(b1=opt.adam_b1, b2=opt.adam_b2, eps=opt.adam_eps)

    def lr_tree(step):
        xyz_lr = expon_lr(
            step,
            opt.position_lr_init * spatial_lr_scale,
            opt.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps,
        )
        return Params(
            xyz=xyz_lr,
            f_dc=opt.feature_lr,
            f_rest=opt.feature_lr / 20.0,
            log_scales=opt.scaling_lr,
            quats=opt.rotation_lr,
            opacity_logit=opt.opacity_lr,
            obj_dc=opt.feature_lr,
        )

    def init(params: Params):
        return base.init(params)

    def update(grads: Params, state, params: Params, step):
        upd, state = base.update(grads, state, params)
        lrs = lr_tree(step)
        upd = jax.tree.map(lambda u, lr: -lr * u, upd, lrs)
        return upd, state

    return init, update


def apply_updates(params: Params, updates: Params, active: jax.Array) -> Params:
    """Apply updates only to active slots (inactive ones must stay untouched
    so reused buffers don't drift)."""

    def go(p, u):
        mask = active.reshape((-1,) + (1,) * (p.ndim - 1))
        return p + jnp.where(mask, u, 0.0)

    return jax.tree.map(go, params, updates)


# ---------------------------------------------------------------------------
# Compaction & growth (host-side, outside jit)
# ---------------------------------------------------------------------------


def compact(m: GaussianMap, opt_state=None):
    """Gather active slots to the front — the moral equivalent of the
    reference's physical row removal + `_prune_optimizer`. Call between jit
    steps when fragmentation builds up."""
    import numpy as np

    active = np.asarray(m.active)
    idx = np.nonzero(active)[0]
    n = len(idx)
    N = m.capacity

    def gather(buf):
        buf = np.asarray(buf)
        out = np.zeros_like(buf)
        out[:n] = buf[idx]
        return jnp.asarray(out)

    new = m._replace(
        **{f: gather(getattr(m, f)) for f in PARAM_FIELDS},
        active=jnp.asarray(np.arange(N) < n),
        trackable=gather(m.trackable),
        keyframe_id=gather(m.keyframe_id),
        count=jnp.asarray(n, jnp.int32),
        max_radii2d=gather(m.max_radii2d),
        xyz_grad_accum=gather(m.xyz_grad_accum),
        denom=gather(m.denom),
    )
    if opt_state is None:
        return new
    # scale_by_adam state: (count, mu, nu) with mu/nu matching Params
    new_opt = jax.tree.map(
        lambda x: gather(x) if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == N else x,
        opt_state,
    )
    return new, new_opt


def grow(m: GaussianMap, new_capacity: int, opt_state=None):
    """Double capacity: pad every per-Gaussian buffer (one recompile)."""
    N = m.capacity
    pad = new_capacity - N
    assert pad > 0

    def padbuf(buf):
        if not hasattr(buf, "shape") or buf.ndim == 0 or buf.shape[0] != N:
            return buf
        widths = [(0, pad)] + [(0, 0)] * (buf.ndim - 1)
        return jnp.pad(buf, widths)

    new = GaussianMap(*(padbuf(x) for x in m))
    # identity quats for fresh slots
    new = new._replace(
        quats=new.quats.at[N:, 3].set(1.0),
    )
    if opt_state is None:
        return new
    return new, jax.tree.map(padbuf, opt_state)


def n_active(m: GaussianMap) -> jax.Array:
    return jnp.sum(m.active.astype(jnp.int32))


def gaussians_from_keyframes(m: GaussianMap, min_keyframe_id):
    """`get_target_gaussians`-style recency filter (`gaussian_model.py`
    commented block / `keyframe_idx` table): Gaussians spawned at or after a
    given keyframe."""
    sel = m.active & (m.keyframe_id >= min_keyframe_id)
    return m.xyz, get_rotation(m), get_scaling(m), sel


def get_trackable_gaussians(m: GaussianMap, opacity_th: float):
    """`get_trackable_gaussians_tensor` (`gaussian_model.py:232-240`):
    (xyz, rotation, scaling, mask) of trackable high-opacity Gaussians."""
    sel = (get_opacity(m) > opacity_th) & m.trackable & m.active
    return m.xyz, get_rotation(m), get_scaling(m), sel


@functools.partial(jax.jit, static_argnames=("budget",))
def trackable_subset(m: GaussianMap, opacity_th: float, budget: int):
    """Fixed-budget scan-to-map tracking target: (points, covariances, mask).

    Compacts the trackable high-opacity Gaussians (`get_trackable_gaussians`)
    to `budget` rows — xyz plus the Σ = R S S Rᵀ ellipsoid covariances the
    reference's fork exports for exactly this use
    (`fast_gicp_impl.hpp:586-720` `set_target_covariance_fromqs`,
    `gaussian_model.py:232-240`) — so the GICP tracker can align raw scans
    against the MAP instead of the previous scan.
    """
    from sags_tpu.ops.gicp import covariances_from_qs

    xyz, rot, scal, sel = get_trackable_gaussians(m, opacity_th)
    cap = xyz.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    # NEWEST-first under the budget: slots fill in arrival order, so the
    # highest indices are the most recently observed geometry — the part
    # of the map the CURRENT scan overlaps. Oldest-first (round ≤4) fed
    # the tracker frame-0 geometry forever: once the sensor moved on, the
    # correspondences were garbage and scan-to-map diverged.
    _, _, idx = jax.lax.sort(
        (jnp.where(sel, 0, 1).astype(jnp.int32), -iota, iota), num_keys=2
    )
    idx = idx[:budget]
    n_sel = jnp.sum(sel.astype(jnp.int32))
    mask = jnp.arange(budget) < jnp.minimum(n_sel, budget)
    covs = covariances_from_qs(rot[idx], scal[idx])
    # Regularize like the SOURCE covariances (NORMALIZED_ELLIPSE,
    # `fast_gicp_impl.hpp:462-475`): the scan side of the Mahalanobis is
    # unitless O(1) ellipse ratios — raw metric surfel covariances on the
    # target side (eigenvalues ~1e-4..1e-1) skew the metric and the LM
    # solve walks off. Same math as `estimate_covariances`, but from the
    # closed-form eigendecomposition of Σ = R S² Rᵀ.
    from sags_tpu.ops.gicp import sym_eig3

    evals, U = sym_eig3(covs)
    sv = jnp.maximum(evals, 0.0)
    mid = sv[:, 1:2]
    vals = jnp.where(
        mid == 0.0, jnp.full_like(sv, 1e-9),
        jnp.maximum(sv / jnp.where(mid == 0.0, 1.0, mid), 1e-3))
    covs = jnp.einsum("nij,nj,nkj->nik", U, vals, U)
    covs = jnp.where(mask[:, None, None], covs, jnp.eye(3)[None])
    return xyz[idx], covs, mask, n_sel
