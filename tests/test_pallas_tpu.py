"""TPU-only parity tests for the Pallas kernels (skipped on CPU backends).

Run these on a TPU host: `JAX_PLATFORMS=<tpu> pytest tests/test_pallas_tpu.py`.
They compare the fused forward and the fused backward against the XLA
reference path on the same inputs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernels require a TPU"
)

from sags_tpu.core.camera import make_camera
from sags_tpu.core.config import RasterizeConfig
from sags_tpu.ops import rasterize as rz


def scene(n=8192, W=128, H=96):
    rng = np.random.default_rng(0)
    z = rng.uniform(2.0, 10.0, (n, 1))
    xy = rng.uniform(-0.5, 0.5, (n, 2)) * z * np.array([1.3, 1.0])
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = (rng.uniform(0.01, 0.04, (n, 3)) * z).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    tgt = rng.uniform(0, 1, (3, H, W)).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (means, opac, scales, quats, colors, objs)), cam, jnp.asarray(tgt)


CFG = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=512, chunk=64)


def test_fused_forward_matches_xla():
    """Classic fused compositor vs the XLA scan on the same binned table.
    `windowed=False` pins the classic path: this scene is far beyond the
    windowed tier budgets (its overflow-counted coverage drops are the
    *point* of the adaptation machinery, not a parity target)."""
    A, cam, _ = scene()
    out_p = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, CFG, colors=a[4], obj_features=a[5],
        fused=True, windowed=False))(*A)
    out_x = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, CFG, colors=a[4], obj_features=a[5],
        fused=False))(*A)
    np.testing.assert_allclose(np.asarray(out_p.color), np.asarray(out_x.color),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_p.depth), np.asarray(out_x.depth),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_p.final_T), np.asarray(out_x.final_T),
                               atol=1e-3)


def test_fused_backward_matches_xla():
    A, cam, tgt = scene()
    cfg_p = dataclasses.replace(CFG, pallas_backward=True)
    cfg_x = dataclasses.replace(CFG, pallas_backward=False)

    def make_loss(cfg, fused):
        def loss(m, o, s, q, c, ob):
            r = rz.rasterize(m, o, s, q, cam, cfg, colors=c, obj_features=ob,
                             fused=fused, windowed=False)
            return (jnp.sum((r.color - tgt) ** 2) + 1e-3 * jnp.sum(r.depth ** 2)
                    + 1e-2 * jnp.sum(r.objects ** 2) + jnp.sum(r.final_T ** 2))
        return loss

    gp = jax.jit(jax.grad(make_loss(cfg_p, True), argnums=tuple(range(6))))(*A)
    gx = jax.jit(jax.grad(make_loss(cfg_x, False), argnums=tuple(range(6))))(*A)
    for name, a, b in zip(["means", "opac", "scales", "quats", "colors", "objs"],
                          gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
        assert rel < 2e-2, (name, rel)
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999, (name, cos)


def test_fused_forward_tile8_matches_xla():
    """Regression: the fwd kernel once hardcoded tile=16 pixel decoding
    (`pix_row >> 4`), silently corrupting any other tile size."""
    A, cam, _ = scene()
    cfg8 = dataclasses.replace(CFG, tile=8)
    out_p = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg8, colors=a[4], obj_features=a[5],
        fused=True, windowed=False))(*A)
    out_x = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg8, colors=a[4], obj_features=a[5],
        fused=False))(*A)
    np.testing.assert_allclose(np.asarray(out_p.color), np.asarray(out_x.color),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_p.final_T), np.asarray(out_x.final_T),
                               atol=1e-3)


def _windowed_scene(n=8192, W=256, H=192):
    """Density at which the default-ish window budgets hold with zero
    overflow (the windowed path is only numerically identical to the classic
    one when nothing is dropped — overflow is surfaced + pipeline-adapted)."""
    rng = np.random.default_rng(0)
    z = rng.uniform(2.0, 10.0, (n, 1))
    xy = rng.uniform(-0.5, 0.5, (n, 2)) * z * np.array([1.3, 1.0])
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = (rng.uniform(0.005, 0.02, (n, 3)) * z).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    tgt = rng.uniform(0, 1, (3, H, W)).astype(np.float32)
    A = tuple(jnp.asarray(v) for v in (means, opac, scales, quats, colors, objs))
    return A, cam, jnp.asarray(tgt)


def test_windowed_backward_matches_xla():
    """The windowed fused backward (span DMA + in-VMEM select,
    `pallas_windowed.composite_windowed_bwd`) must match gradients computed
    through the XLA scan on the same scene, given zero overflow."""
    A, cam, tgt = _windowed_scene()
    cfg = dataclasses.replace(CFG, window_blocks=24, windowed_mid_frac=1.0, windowed_big_frac=1.0)

    fwd = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    assert int(fwd.overflow_window) == 0 and int(fwd.overflow_big) == 0

    def make_loss(windowed, fused):
        def loss(m, o, s, q, c, ob):
            r = rz.rasterize(m, o, s, q, cam, cfg, colors=c, obj_features=ob,
                             windowed=windowed, fused=fused)
            return (jnp.sum((r.color - tgt) ** 2) + 1e-3 * jnp.sum(r.depth ** 2)
                    + 1e-2 * jnp.sum(r.objects ** 2) + jnp.sum(r.final_T ** 2))
        return loss

    gw = jax.jit(jax.grad(make_loss(True, None), argnums=tuple(range(6))))(*A)
    gx = jax.jit(jax.grad(make_loss(False, False), argnums=tuple(range(6))))(*A)
    for name, a, b in zip(["means", "opac", "scales", "quats", "colors", "objs"],
                          gw, gx):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
        assert rel < 2e-3, (name, rel)
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.9999, (name, cos)


def test_windowed_overbudget_counts_drops():
    """Honesty contract: when a scene exceeds the windowed budgets (the
    dense classic-test scene: ~620 pairs/tile vs tile_capacity 512), the
    coverage drops MUST surface in the overflow counters — the pipeline's
    adaptation machinery keys on them (`SLAMPipeline._maybe_grow_capacity`)."""
    A, cam, _ = scene()
    out = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, CFG, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    dropped = (int(out.overflow_tile) + int(out.overflow_window)
               + int(out.overflow_big))
    assert dropped > 0, "over-budget scene must report dropped pairs"


def test_windowed_tiny_scene_renders():
    """Regression: with P < the tier buffer floor (128) the compacted tier
    buffers must clamp to P instead of broadcasting mismatched shapes."""
    A, cam, _ = scene(n=100)
    out = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, CFG, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    assert np.isfinite(np.asarray(out.color)).all()


def test_windowed_bf16_obj_matches_full_precision():
    """Split-precision windowed forward (cfg.windowed_bf16): the 16 obj
    channels ride the candidate window as bf16 pairs packed in f32 rows
    (gathered as f32, pltpu.bitcast in-kernel — Mosaic's dynamic_gather
    rejects bf16 data with i32 indices). rgb/depth/T must be bit-identical
    to the full-precision windowed render; obj carries bf16-level error."""
    A, cam, _ = _windowed_scene()
    cfg = dataclasses.replace(CFG, window_blocks=24, windowed_mid_frac=1.0,
                              windowed_big_frac=1.0)
    cfg16 = dataclasses.replace(cfg, windowed_bf16=True)
    ow = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    ob = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg16, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    np.testing.assert_array_equal(np.asarray(ob.color), np.asarray(ow.color))
    np.testing.assert_array_equal(np.asarray(ob.depth), np.asarray(ow.depth))
    np.testing.assert_array_equal(np.asarray(ob.final_T), np.asarray(ow.final_T))
    o_ref = np.asarray(ow.objects)
    o_rel = np.abs(np.asarray(ob.objects) - o_ref).max() / (np.abs(o_ref).max() + 1e-9)
    assert 0.0 < o_rel < 2e-2, o_rel


def test_windowed_kernel_sort_matches_host_on_chip():
    """Compiled kernel-sort path (in-kernel bitonic depth ordering): the
    candidate set and depth order must match the host pair-sort path —
    final_T (order-invariant) bit-comparable, accumulated channels equal to
    FP-association noise. Capacity/coverage counters must agree exactly."""
    A, cam, _ = _windowed_scene()
    cfg = dataclasses.replace(CFG, window_blocks=16, windowed_mid_frac=1.0,
                              windowed_big_frac=1.0, windowed_big_capacity=128)
    cfgk = dataclasses.replace(cfg, windowed_sort="kernel")
    oh = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    ok = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfgk, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    assert int(oh.overflow_tile) == int(ok.overflow_tile)
    assert int(oh.overflow_big) == int(ok.overflow_big)
    if int(oh.overflow_window) == 0:
        assert int(oh.n_binned) == int(ok.n_binned)
        np.testing.assert_array_equal(np.asarray(ok.color),
                                      np.asarray(oh.color))
        np.testing.assert_array_equal(np.asarray(ok.final_T),
                                      np.asarray(oh.final_T))
    else:
        # window-dropped pairs occupy (skipped) chunk slots on the host
        # side but are compacted out in-kernel — same composited set,
        # different chunk-boundary FP association
        np.testing.assert_allclose(np.asarray(ok.color),
                                   np.asarray(oh.color), atol=5e-3)
        np.testing.assert_allclose(np.asarray(ok.final_T),
                                   np.asarray(oh.final_T), atol=1e-3)


def test_windowed_feature_precision_tiers():
    """cfg.feature_precision trades feature-matmul MXU passes for accuracy
    (forward-only; alpha/transmittance math stays fp32 in every tier):
    "high" (manual bf16x2 split) must stay ~1e-5 of "highest"; "default"
    (1-pass bf16) within the documented ~4e-3 display-quantum band."""
    A, cam, _ = _windowed_scene()
    cfg = dataclasses.replace(CFG, window_blocks=24, windowed_mid_frac=1.0,
                              windowed_big_frac=1.0)
    outs = {}
    for fp in ("highest", "high", "default"):
        cfgp = dataclasses.replace(cfg, feature_precision=fp)
        outs[fp] = jax.jit(lambda *a, c=cfgp: rz.rasterize(
            a[0], a[1], a[2], a[3], cam, c, colors=a[4], obj_features=a[5],
            windowed=True))(*A)
    ref = np.asarray(outs["highest"].color)
    np.testing.assert_allclose(np.asarray(outs["high"].color), ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs["default"].color), ref,
                               atol=8e-3)
    # the precision knob must not change WHICH pairs composite
    np.testing.assert_array_equal(np.asarray(outs["default"].final_T),
                                  np.asarray(outs["highest"].final_T))


def test_windowed_quad_ewa_matches_longhand():
    """cfg.ewa_impl='quad' evaluates the EWA quadratic as one [PIX,6]@[6,K]
    monomial-basis matmul on tile-LOCAL coordinates instead of ~9 [PIX,K]
    VPU maps. Forward-only perf mode: must match the longhand path within
    the documented ~1e-3 absolute expansion tolerance (measured 1.3e-5 on
    chip at the bench point; tile-local coords keep the cancellation sane)."""
    A, cam, _ = _windowed_scene()
    cfg = dataclasses.replace(CFG, window_blocks=24, windowed_mid_frac=1.0,
                              windowed_big_frac=1.0)
    cfgq = dataclasses.replace(cfg, ewa_impl="quad")
    ov = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    oq = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfgq, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    assert int(ov.overflow_window) == 0
    np.testing.assert_allclose(np.asarray(oq.color), np.asarray(ov.color),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(oq.final_T), np.asarray(ov.final_T),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(oq.depth), np.asarray(ov.depth),
                               atol=2e-2)


def test_store_tier_on_chip_matches_wide_xla():
    """Compiled (non-interpret) store-tier kernel path: forward must match
    the classic XLA path run with a window wide enough for every rect."""
    rng = np.random.default_rng(1)
    n, W, H = 2048, 256, 192
    z = rng.uniform(2.0, 10.0, (n, 1))
    xy = rng.uniform(-0.5, 0.5, (n, 2)) * z * np.array([1.3, 1.0])
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = (rng.uniform(0.01, 0.12, (n, 3)) * z).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    A = tuple(jnp.asarray(v) for v in (means, opac, scales, quats, colors, objs))
    base = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=1024,
                           chunk=64, window_blocks=24,
                           windowed_mid_frac=1.0, windowed_big_frac=1.0)
    cfg = dataclasses.replace(
        base, windowed_big_capacity=512,
        windowed_store_fracs=((6, 1.0), (8, 1.0), (12, 1.0), (16, 1.0)))
    out_s = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    out_w = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam,
        dataclasses.replace(base, max_tiles_per_gaussian=256),
        colors=a[4], obj_features=a[5],
        windowed=False, fused=False))(*A)
    assert int(out_s.overflow_rect) == 0
    assert int(out_s.n_binned) == int(out_w.n_binned)
    np.testing.assert_allclose(np.asarray(out_s.color),
                               np.asarray(out_w.color), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_s.objects),
                               np.asarray(out_w.objects), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_s.final_T),
                               np.asarray(out_w.final_T), atol=2e-3)
