"""Offline 3DGS training — the classic densify/clone/split optimization loop.

The reference's offline path (`Scene` + `GaussianModel` driven by a 3DGS
training script, SURVEY.md §2.8 / configs #2-#3 of BASELINE.json): initialize
Gaussians from a point cloud with kNN-distance scales (`simple-knn` role),
then iterate random training views with

  * L1 + λ·(1−SSIM) photometric loss,
  * view-space positional gradient accumulation
    (`add_densification_stats`, `gaussian_model.py:659-661`),
  * gradient-threshold clone/split between densify_from/until every
    densification_interval (`gaussian_model.py:536-623`),
  * periodic opacity reset (`reset_opacity`, interval
    `opacity_reset_interval`),
  * opacity/size pruning.

Runs as one jitted step (loss + grads incl. the mean2d probe + Adam +
stats) with host-side densify events (they change no shapes — masked
appends inside the fixed-capacity map).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sags_tpu.core.camera import Camera
from sags_tpu.core.config import SLAMConfig
from sags_tpu.mapping import gaussian_map as gm
from sags_tpu.ops import rasterize as rz
from sags_tpu.ops.knn import scale_init_from_points
from sags_tpu.utils.losses import l1_loss, ssim


class OfflineState(NamedTuple):
    map: gm.GaussianMap
    opt_state: optax.OptState
    step: jax.Array
    rng: jax.Array


def init_from_points(
    points: np.ndarray, colors: np.ndarray, cfg: SLAMConfig,
    capacity: Optional[int] = None, rng=None,
) -> OfflineState:
    """`create_from_pcd`-style init: kNN-distance scales, 0.1 opacity."""
    n = len(points)
    capacity = capacity or max(1 << (n - 1).bit_length(), 1024) * 4
    rng = rng if rng is not None else jax.random.key(0)
    r1, r2 = jax.random.split(rng)
    m = gm.init_map(capacity, cfg.map)
    log_s = scale_init_from_points(jnp.asarray(points))
    m, _ = gm.add_points(
        m, jnp.asarray(points), jnp.asarray(colors), jnp.ones(n, bool), r1,
        scales=jnp.exp(log_s),
        initial_opacity=cfg.map.initial_opacity,
    )
    opt_init, _ = gm.make_optimizer(cfg.opt, spatial_lr_scale=cfg.scene_extent)
    return OfflineState(
        map=m, opt_state=opt_init(gm.params_of(m)),
        step=jnp.zeros((), jnp.int32), rng=r2,
    )


def train_step(state: OfflineState, camera: Camera, gt_image: jax.Array,
               cfg: SLAMConfig) -> Tuple[OfflineState, jax.Array]:
    """One photometric iteration with densification-stat accumulation."""
    m = state.map
    params = gm.params_of(m)
    probe = jnp.zeros((m.capacity, 2), jnp.float32)

    def loss_fn(params, probe):
        mm = gm.with_params(m, params)
        out = rz.rasterize(
            mm.xyz, gm.get_opacity(mm), gm.get_scaling(mm), gm.get_rotation(mm),
            camera, cfg.raster, shs=gm.get_shs(mm), sh_degree=cfg.map.sh_degree,
            active_mask=mm.active, mean2d_offset=probe, fused=False,
        )
        _, l1 = l1_loss(out.color, gt_image)
        _, s = ssim(out.color, gt_image)
        loss = (1 - cfg.opt.lambda_dssim) * l1 + cfg.opt.lambda_dssim * (1 - s)
        return loss, out.radii

    (loss, radii), (gmap, gprobe) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, probe)

    _, opt_update = gm.make_optimizer(cfg.opt, spatial_lr_scale=cfg.scene_extent)
    updates, opt_state = opt_update(gmap, state.opt_state, params, state.step)
    params = gm.apply_updates(params, updates, m.active)
    m = gm.with_params(m, params)
    m = gm.add_densification_stats(m, gprobe, radii)
    return OfflineState(m, opt_state, state.step + 1, state.rng), loss


def make_train_step(cfg: SLAMConfig, donate: bool = True):
    fn = lambda s, cam, img: train_step(s, cam, img, cfg)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def densify_event(state: OfflineState, cfg: SLAMConfig) -> OfflineState:
    """Clone/split by gradient threshold + prune (host-triggered, jitted)."""
    rng, sub = jax.random.split(state.rng)
    m, _ = gm.densify_and_clone_split(
        state.map, cfg.opt.densify_grad_threshold, cfg.scene_extent, sub,
        percent_dense=cfg.opt.percent_dense,
    )
    m = gm.prune_large_and_transparent(m, cfg.map.prune_min_opacity, None)
    return state._replace(map=m, rng=rng)


def _optimize(state: OfflineState, cams, imgs, cfg: SLAMConfig,
              iterations: int, seed: int, log_every: int):
    """The shared random-view loop: step + densify window + opacity resets.
    Both offline entry points (frame replay, COLMAP scene) run exactly this
    schedule — keep it in one place so they cannot drift apart."""
    step_fn = make_train_step(cfg, donate=False)
    densify_jit = jax.jit(lambda s: densify_event(s, cfg))
    rng = np.random.default_rng(seed)
    losses: List[float] = []
    for it in range(iterations):
        i = rng.integers(len(cams))
        state, loss = step_fn(state, cams[i], imgs[i])
        losses.append(float(loss))
        step = it + 1
        if (cfg.opt.densify_from_iter <= step <= cfg.opt.densify_until_iter
                and step % cfg.opt.densification_interval == 0):
            state = densify_jit(state)
        if step % cfg.opt.opacity_reset_interval == 0:
            state = state._replace(map=gm.reset_opacity(state.map))
        if log_every and step % log_every == 0:
            print(f"iter {step}: loss={losses[-1]:.4f} "
                  f"active={int(gm.n_active(state.map))}")
    return state, losses


def train_offline(
    frames, cfg: SLAMConfig, iterations: int, capacity: Optional[int] = None,
    seed: int = 0, log_every: int = 0,
):
    """Full offline optimization over a replayed frame set."""
    from sags_tpu.slam.pipeline import SLAMPipeline  # for _camera_for reuse

    pts = np.concatenate([f.points for f in frames])
    cols = np.concatenate([f.colors for f in frames])
    state = init_from_points(pts, cols, cfg, capacity, jax.random.key(seed))

    helper = SLAMPipeline(cfg)
    cams = [helper._camera_for(f, np.asarray(f.pose)) for f in frames]
    imgs = [jnp.asarray(f.image) for f in frames]
    return _optimize(state, cams, imgs, cfg, iterations, seed, log_every)


def train_offline_scene(
    scene, cfg: SLAMConfig, iterations: int, capacity: Optional[int] = None,
    seed: int = 0, log_every: int = 0,
):
    """Offline optimization of an assembled COLMAP scene
    (`io.colmap_scene.load_colmap_scene` output) — the `readColmapSceneInfo`
    → `Scene` → training-loop path of the reference (configs #2/#3).

    The nerf++ radius seeds the scene extent (spatial-lr-scale / prune
    extent), as `Scene.__init__` does with `nerf_normalization["radius"]`.
    """
    views = [v for v in scene.train_views if v.image is not None]
    if not views:
        raise ValueError("COLMAP scene has no views with images")
    cfg = cfg.replace(scene_extent=float(scene.radius))
    state = init_from_points(scene.points, scene.colors, cfg, capacity,
                             jax.random.key(seed))
    cams = [v.camera for v in views]
    imgs = [jnp.asarray(v.image) for v in views]
    return _optimize(state, cams, imgs, cfg, iterations, seed, log_every)
