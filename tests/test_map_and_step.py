"""Gaussian map + fused SLAM step tests: growth, pruning, optimization."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core.camera import make_camera
from sags_tpu.core.config import (
    MapConfig,
    OptimizationConfig,
    RasterizeConfig,
    SemanticsConfig,
    SLAMConfig,
)
from sags_tpu.mapping import gaussian_map as gm
from sags_tpu.slam import step as slam


def small_cfg():
    return SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128, chunk=32),
        map=MapConfig(initial_capacity=256, sh_degree=0, prune_interval=200),
        semantics=SemanticsConfig(cls3d_sample=16, num_classes=20),
    )


def test_add_points_masked(rng):
    cfg = small_cfg()
    m = gm.init_map(64, cfg.map)
    pts = rng.normal(size=(32, 3)).astype(np.float32)
    cols = rng.uniform(size=(32, 3)).astype(np.float32)
    mask = np.zeros(32, bool)
    mask[:20] = True
    m, dropped = gm.add_points(
        m, jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(mask), jax.random.key(0)
    )
    assert int(m.count) == 20
    assert int(gm.n_active(m)) == 20
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(m.xyz[:20]), pts[:20], atol=1e-6)
    # opacity init 0.1 through sigmoid
    np.testing.assert_allclose(np.asarray(gm.get_opacity(m))[:20], 0.1, atol=1e-5)
    # scale init: 0.01 / clamp(z^1.5*2, 1); z = |p|/5000 << 1 so clamp = 1
    # (no z_vals passed here -> raw initial scale)
    np.testing.assert_allclose(np.asarray(gm.get_scaling(m))[:20], 0.01, rtol=1e-5)


def test_add_points_capacity_overflow(rng):
    cfg = small_cfg()
    m = gm.init_map(16, cfg.map)
    pts = rng.normal(size=(32, 3)).astype(np.float32)
    cols = rng.uniform(size=(32, 3)).astype(np.float32)
    mask = np.ones(32, bool)
    m, dropped = gm.add_points(
        m, jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(mask), jax.random.key(0)
    )
    assert int(m.count) == 16
    assert int(dropped) == 16


def test_z_scale_division(rng):
    cfg = small_cfg()
    m = gm.init_map(8, cfg.map)
    pts = np.array([[0, 0, 1.0], [0, 0, 2.0]], np.float32)
    cols = np.full((2, 3), 0.5, np.float32)
    z_vals = np.array([4.0, 0.1], np.float32)  # z^1.5*2 = 16, 0.063->clamp 1
    m, _ = gm.add_points(
        m, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(2, bool), jax.random.key(0),
        scales=jnp.full((2, 3), 0.01), z_vals=jnp.asarray(z_vals),
    )
    s = np.asarray(gm.get_scaling(m))
    np.testing.assert_allclose(s[0], 0.01 / 16.0, rtol=1e-5)
    np.testing.assert_allclose(s[1], 0.01, rtol=1e-5)


def test_prune_large_and_transparent(rng):
    cfg = small_cfg()
    m = gm.init_map(8, cfg.map)
    pts = rng.normal(size=(4, 3)).astype(np.float32)
    cols = rng.uniform(size=(4, 3)).astype(np.float32)
    m, _ = gm.add_points(
        m, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(4, bool), jax.random.key(0)
    )
    # make #0 transparent, #1 huge
    m = m._replace(
        opacity_logit=m.opacity_logit.at[0].set(gm.inverse_sigmoid(jnp.float32(0.001))),
        log_scales=m.log_scales.at[1].set(jnp.log(jnp.asarray([0.5, 0.5, 0.5]))),
    )
    m2 = gm.prune_large_and_transparent(m, 0.005, 2.5)
    act = np.asarray(m2.active)
    assert not act[0] and not act[1] and act[2] and act[3]


def test_compact_roundtrip(rng):
    cfg = small_cfg()
    m = gm.init_map(16, cfg.map)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    cols = rng.uniform(size=(10, 3)).astype(np.float32)
    m, _ = gm.add_points(
        m, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(10, bool), jax.random.key(0)
    )
    keep = np.zeros(16, bool)
    keep[[1, 3, 5, 7, 9]] = True
    m = m._replace(active=jnp.asarray(keep))
    mc = gm.compact(m)
    assert int(mc.count) == 5
    np.testing.assert_allclose(np.asarray(mc.xyz[:5]), pts[[1, 3, 5, 7, 9]], atol=1e-6)
    assert np.asarray(mc.active)[:5].all() and not np.asarray(mc.active)[5:].any()


def test_grow_preserves(rng):
    cfg = small_cfg()
    m = gm.init_map(8, cfg.map)
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    cols = rng.uniform(size=(8, 3)).astype(np.float32)
    m, _ = gm.add_points(
        m, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(8, bool), jax.random.key(0)
    )
    m2 = gm.grow(m, 32)
    assert m2.capacity == 32
    np.testing.assert_allclose(np.asarray(m2.xyz[:8]), pts, atol=1e-6)
    assert int(gm.n_active(m2)) == 8
    # fresh slots hold identity quats (safe to activate later)
    np.testing.assert_allclose(np.asarray(m2.quats[8:, 3]), 1.0)


@pytest.mark.slow
def test_slam_step_optimizes_scene(rng):
    """End-to-end mini slice: init map from noisy points of a synthetic scene,
    run fused steps, PSNR must improve (SURVEY.md §7.2 milestone #3)."""
    cfg = small_cfg()
    # faster feature LR for a short test; keep prune far from the scale we use
    cfg = dataclasses.replace(
        cfg,
        opt=dataclasses.replace(cfg.opt, feature_lr=0.05),
        map=dataclasses.replace(cfg.map, prune_extent=10.0),
    )
    W = H = 32
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), W, H, 1.0, 1.0)

    # Ground truth: a colorful wall of gaussians at z=3
    gx, gy = np.meshgrid(np.linspace(-1.5, 1.5, 8), np.linspace(-1.5, 1.5, 8))
    pts = np.stack([gx.ravel(), gy.ravel(), np.full(64, 3.0)], -1).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, (64, 3)).astype(np.float32)

    state = slam.init_state(cfg, jax.random.key(0), capacity=256)
    addfn = slam.make_add_points(cfg, donate=False)
    state, _ = addfn(state, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(64, bool))
    # widen the gaussians so they cover pixels (well below the prune threshold)
    state = state._replace(
        map=state.map._replace(
            log_scales=jnp.where(
                state.map.active[:, None], jnp.log(0.25), state.map.log_scales
            )
        )
    )

    gt = slam.render_map(state.map, cam, cfg)
    gt_img = jnp.asarray(np.asarray(gt.color))  # self-consistent target
    gt_obj = jnp.zeros((H, W), jnp.int32)

    # perturb colors, then recover them by optimization
    state = state._replace(
        map=state.map._replace(
            f_dc=state.map.f_dc + 0.8 * jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
        )
    )
    stepfn = slam.make_slam_step(cfg, donate=False)
    out0 = slam.render_map(state.map, cam, cfg)
    mse0 = float(jnp.mean((out0.color - gt_img) ** 2))
    losses = []
    for i in range(60):
        state, metrics = stepfn(state, cam, gt_img, gt_obj)
        losses.append(float(metrics.loss))
    out1 = slam.render_map(state.map, cam, cfg)
    mse1 = float(jnp.mean((out1.color - gt_img) ** 2))
    assert int(slam.gm.n_active(state.map)) == 64
    assert mse1 < mse0 * 0.5, (mse0, mse1, losses[:3], losses[-3:])
    assert np.isfinite(losses).all()
