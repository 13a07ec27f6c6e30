"""The fused SLAM map-optimization step.

One jitted function replaces the reference's hot loop body
(`scripts/gaussian_splatting.py:644-1013`): render → losses (masked L1 + SSIM
+ semantic CE [+ 3D consistency every 5th iter]) → backward → per-group Adam →
periodic prune. The reference pays a python round-trip, a CUDA autograd
launch storm, and host syncs per iteration; here the whole iteration is one
XLA program and the map stays resident in HBM (SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sags_tpu.core.camera import Camera
from sags_tpu.core.config import SLAMConfig
from sags_tpu.mapping import gaussian_map as gm
from sags_tpu.models.classifier import (
    ClassifierParams,
    apply_classifier,
    apply_classifier_features,
    init_classifier,
    make_classifier_optimizer,
)
from sags_tpu.ops import rasterize as rz
from sags_tpu.semantics.losses import loss_cls_3d, object_ce_loss
from sags_tpu.utils.losses import l1_loss, ssim


class SLAMState(NamedTuple):
    map: gm.GaussianMap
    opt_state: optax.OptState
    classifier: ClassifierParams
    cls_opt_state: optax.OptState
    step: jax.Array  # int32 train_iter
    rng: jax.Array


class StepMetrics(NamedTuple):
    loss: jax.Array
    loss_rgb: jax.Array
    loss_obj: jax.Array
    loss_obj_3d: jax.Array
    n_active: jax.Array
    n_binned: jax.Array
    overflow_tile: jax.Array
    overflow_rect: jax.Array
    overflow_window: jax.Array
    overflow_big: jax.Array
    tile_peak: jax.Array  # deepest KNOWN per-tile queue need (sizing signal)
    # tile drops the reference's per-pixel early exit would have composited
    # (adaptation keys on this; overflow_tile is the raw count)
    overflow_tile_live: jax.Array


def init_state(cfg: SLAMConfig, rng: jax.Array, capacity: Optional[int] = None) -> SLAMState:
    capacity = capacity or cfg.map.initial_capacity
    r1, r2, r3 = jax.random.split(rng, 3)
    m = gm.init_map(capacity, cfg.map)
    opt_init, _ = gm.make_optimizer(cfg.opt, spatial_lr_scale=cfg.scene_extent)
    clf = init_classifier(r1, cfg.semantics.num_objects, cfg.semantics.num_classes)
    cls_opt = make_classifier_optimizer(cfg.semantics.classifier_lr)
    return SLAMState(
        map=m,
        opt_state=opt_init(gm.params_of(m)),
        classifier=clf,
        cls_opt_state=cls_opt.init(clf),
        step=jnp.zeros((), jnp.int32),
        rng=r2,
    )


def render_map(m: gm.GaussianMap, camera: Camera, cfg: SLAMConfig, bg_color=None,
               mesh=None, fused=None, training_stage: int = 0,
               windowed=None):
    """`render_4` equivalent (`gaussian_renderer/__init__.py:325-480`).

    `training_stage` divides the render resolution by 2*stage — the
    coarse-to-fine knob of `render_2`/`render_4`
    (`gaussian_renderer/__init__.py:136-141`).
    """
    if training_stage:
        from sags_tpu.core.camera import Camera as _Cam

        d = 2 * training_stage
        camera = _Cam(camera.width // d, camera.height // d, camera.fovx,
                      camera.fovy, camera.world_view, camera.full_proj,
                      camera.cam_center, camera.znear, camera.zfar)
    return rz.rasterize(
        m.xyz,
        gm.get_opacity(m),
        gm.get_scaling(m),
        gm.get_rotation(m),
        camera,
        cfg.raster,
        shs=gm.get_shs(m),
        sh_degree=cfg.map.sh_degree,
        obj_features=m.obj_dc,
        bg_color=bg_color,
        active_mask=m.active,
        mesh=mesh,
        fused=fused,
        windowed=windowed,
    )


def _loss_fn(
    params: gm.Params,
    clf: ClassifierParams,
    m: gm.GaussianMap,
    camera: Camera,
    gt_image: jax.Array,  # [3,H,W]
    gt_objects: jax.Array,  # [H,W] int32
    use_cls3d: jax.Array,  # bool scalar
    rng: jax.Array,
    cfg: SLAMConfig,
    mesh=None,
):
    m = gm.with_params(m, params)
    # With the fused Pallas backward, training runs fully fused; without it,
    # fused=False avoids paying Pallas fwd + XLA recompute in the vjp.
    # The WINDOWED fwd+bwd kernels exist and match (test_pallas_tpu), but at
    # SLAM training density (640x512 / 100+ anchors per tile) the in-VMEM
    # depth-order select costs more than the G[table] row gather it replaces
    # (measured 45.5 vs 42.7 ms/step) and the shared span window overflows —
    # so training keeps the classic fused path; windowed wins for RENDER
    # (3600 tiles at 720p, ~70 anchors/tile: 47 -> 25 ms).
    fused = None if cfg.raster.pallas_backward else False
    train_windowed = bool(getattr(cfg.raster, "train_windowed", False))
    out = render_map(m, camera, cfg, mesh=mesh, fused=fused,
                     windowed=train_windowed)

    # Photometric (`scripts/gaussian_splatting.py:805-810`)
    _, l1 = l1_loss(out.color, gt_image)
    _, s = ssim(out.color, gt_image)
    loss_rgb = (1.0 - cfg.opt.lambda_dssim) * l1 + cfg.opt.lambda_dssim * (1.0 - s)

    # Semantic CE (`:798-803`)
    logits = apply_classifier(clf, out.objects)
    loss_obj = object_ce_loss(logits, gt_objects, cfg.semantics.num_classes)

    # 3D consistency every Nth iter (`:811-817`)
    def cls3d(_):
        logits3d = apply_classifier_features(clf, m.obj_dc)
        prob3d = jax.nn.softmax(logits3d, axis=-1)
        return loss_cls_3d(
            jax.lax.stop_gradient(m.xyz),
            prob3d,
            rng,
            m.active,
            k=cfg.semantics.cls3d_k,
            lambda_val=cfg.semantics.cls3d_lambda,
            sample_size=cfg.semantics.cls3d_sample,
        )

    loss_obj_3d = jax.lax.cond(use_cls3d, cls3d, lambda _: jnp.zeros(()), None)

    sem = cfg.semantics
    loss = (
        sem.loss_rgb_weight * loss_rgb
        + sem.loss_obj_weight * loss_obj
        + sem.loss_obj_3d_weight * loss_obj_3d
    )
    aux = (loss_rgb, loss_obj, loss_obj_3d, out)
    return loss, aux


def slam_step(
    state: SLAMState,
    camera: Camera,
    gt_image: jax.Array,
    gt_objects: jax.Array,
    cfg: SLAMConfig,
    mesh=None,
) -> Tuple[SLAMState, StepMetrics]:
    """One map-optimization iteration (jit this with cfg static via closure)."""
    m = state.map
    rng, sub = jax.random.split(state.rng)
    use_cls3d = (state.step % cfg.semantics.cls3d_interval) == 0

    params = gm.params_of(m)
    (loss, (loss_rgb, loss_obj, loss_obj_3d, out)), (gmap, gclf) = jax.value_and_grad(
        _loss_fn, argnums=(0, 1), has_aux=True
    )(params, state.classifier, m, camera, gt_image, gt_objects, use_cls3d, sub, cfg,
      mesh)

    # Map update — per-group Adam with exp xyz schedule
    _, opt_update = gm.make_optimizer(cfg.opt, spatial_lr_scale=cfg.scene_extent)
    updates, opt_state = opt_update(gmap, state.opt_state, params, state.step)
    params = gm.apply_updates(params, updates, m.active)
    m = gm.with_params(m, params)

    # Classifier update (own Adam, `scripts/gaussian_splatting.py:217`)
    cls_opt = make_classifier_optimizer(cfg.semantics.classifier_lr)
    cupd, cls_opt_state = cls_opt.update(gclf, state.cls_opt_state, state.classifier)
    clf = optax.apply_updates(state.classifier, cupd)

    # Periodic prune (`:829-831`)
    def do_prune(mm):
        return gm.prune_large_and_transparent(
            mm, cfg.map.prune_min_opacity, cfg.map.prune_extent
        )

    m = jax.lax.cond(
        (state.step % cfg.map.prune_interval) == 0, do_prune, lambda mm: mm, m
    )

    new_state = SLAMState(
        map=m,
        opt_state=opt_state,
        classifier=clf,
        cls_opt_state=cls_opt_state,
        step=state.step + 1,
        rng=rng,
    )
    metrics = StepMetrics(
        loss=loss,
        loss_rgb=loss_rgb,
        loss_obj=loss_obj,
        loss_obj_3d=loss_obj_3d,
        n_active=gm.n_active(m),
        n_binned=out.n_binned,
        overflow_tile=out.overflow_tile,
        overflow_rect=out.overflow_rect,
        overflow_window=out.overflow_window,
        overflow_big=out.overflow_big,
        tile_peak=out.tile_peak,
        overflow_tile_live=out.overflow_tile_live,
    )
    return new_state, metrics


def make_slam_step(cfg: SLAMConfig, donate: bool = True, mesh=None):
    """Jit `slam_step` with the config closed over and the state donated, so
    the map updates in place in HBM (no copy per iteration). Pass a mesh to
    shard the render-tile axis across devices (tp over tiles; GSPMD inserts
    the per-Gaussian gradient all-reduce)."""
    fn = lambda s, cam, img, obj: slam_step(s, cam, img, obj, cfg, mesh=mesh)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_add_points(cfg: SLAMConfig, donate: bool = True):
    import jax.numpy as _jnp

    def fn(s, p, c, m, kf=_jnp.int32(-1)):
        return add_frame_points(s, p, c, m, cfg, keyframe_id=kf)

    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def add_frame_points(
    state: SLAMState,
    points: jax.Array,  # [B,3] world
    colors: jax.Array,  # [B,3]
    mask: jax.Array,  # [B] bool
    cfg: SLAMConfig,
    quats: Optional[jax.Array] = None,
    scales: Optional[jax.Array] = None,
    z_vals: Optional[jax.Array] = None,
    trackable: Optional[jax.Array] = None,
    keyframe_id=-1,
) -> Tuple[SLAMState, jax.Array]:
    """Per-frame map growth (`scripts/gaussian_splatting.py:677-689`):
    z_vals default ‖p‖/5000, scale 0.01, identity rotation.

    Scan-registered points default to TRACKABLE: they are real surfel
    geometry the scan-to-map tracker may anchor against (the reference
    fork's `trackable_mask` bookkeeping, `gaussian_model.py:65-66,173-176`)
    — densification clones/splits stay non-trackable (synthetic geometry,
    handled inside mapping/gaussian_map)."""
    rng, sub = jax.random.split(state.rng)
    if z_vals is None:
        z_vals = jnp.linalg.norm(points, axis=-1) / 5000.0
    if trackable is None:
        trackable = mask
    m, dropped = gm.add_points(
        state.map,
        points,
        colors,
        mask,
        sub,
        quats=quats,
        scales=scales,
        z_vals=z_vals,
        trackable=trackable,
        initial_scale=cfg.map.initial_scale,
        initial_opacity=cfg.map.initial_opacity,
        keyframe_id=keyframe_id,
    )
    return state._replace(map=m, rng=rng), dropped
