"""Rasterizer forward golden tests.

The golden is an independent numpy transliteration of the reference CUDA
semantics (`forward.cu`): per-pixel front-to-back loop with the exact gating
(power<=0, alpha>=1/255, transmittance floor 1e-4, done latch, separate T_d,
conditioned depth, background depth 15). We compare our batched cumprod/matmul
formulation against it pixel-for-pixel.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core.camera import make_camera, ndc2pix
from sags_tpu.core.config import RasterizeConfig
from sags_tpu.ops import rasterize as rz

TILE = 16


def make_scene(rng, n=60, W=64, H=48, seed_colors=True):
    means = np.concatenate(
        [
            rng.uniform(-2.0, 2.0, size=(n, 2)),
            rng.uniform(2.0, 8.0, size=(n, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    scales = rng.uniform(0.02, 0.3, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), W, H, 1.0, 0.8)
    return means, scales, quats, opac, colors, objs, cam


def ref_preprocess(means, scales, quats, cam, low_pass=0.3):
    """Numpy EWA preprocess following forward.cu:74-275."""
    n = means.shape[0]
    V = np.asarray(cam.world_view, np.float64)
    M = np.asarray(cam.full_proj, np.float64)
    fx, fy = cam.focal_x, cam.focal_y
    W, H = cam.width, cam.height
    out = {}
    p_view = means @ V[:3, :3].T + V[:3, 3]
    depth = p_view[:, 2]
    ph = np.concatenate([means, np.ones((n, 1))], 1) @ M.T
    p_proj = ph[:, :3] / (ph[:, 3:4] + 1e-7)

    x, y, z, w = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    R = np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )
    S = scales[:, None, :] * np.eye(3)[None]
    L = R @ S
    cov3d = L @ L.transpose(0, 2, 1)
    Rv = V[:3, :3]
    cov_cam = Rv[None] @ cov3d @ Rv.T[None]

    limx, limy = 1.3 * cam.tan_fovx, 1.3 * cam.tan_fovy
    tz = depth
    txc = np.clip(p_view[:, 0] / tz, -limx, limx) * tz
    tyc = np.clip(p_view[:, 1] / tz, -limy, limy) * tz
    J = np.zeros((n, 3, 3))
    J[:, 0, 0] = fx / tz
    J[:, 0, 2] = -fx * txc / tz**2
    J[:, 1, 1] = fy / tz
    J[:, 1, 2] = -fy * tyc / tz**2
    J[:, 2, 2] = 1.0
    C = J @ cov_cam @ J.transpose(0, 2, 1)
    cxx, cyy, cxy = C[:, 0, 0] + low_pass, C[:, 1, 1] + low_pass, C[:, 0, 1]
    czx, cyz = C[:, 0, 2], C[:, 1, 2]
    det = cxx * cyy - cxy**2
    conic = np.stack([cyy, -cxy, cxx], -1) / det[:, None]
    mid = 0.5 * (cxx + cyy)
    lam = mid + np.sqrt(np.maximum(0.1, mid * mid - det))
    radius = np.ceil(3 * np.sqrt(lam))
    mean2d = np.stack(
        [((p_proj[:, 0] + 1) * W - 1) * 0.5, ((p_proj[:, 1] + 1) * H - 1) * 0.5], -1
    )
    tiles_x, tiles_y = -(-W // TILE), -(-H // TILE)
    rmin = np.stack(
        [
            np.clip(np.floor((mean2d[:, 0] - radius) / TILE), 0, tiles_x),
            np.clip(np.floor((mean2d[:, 1] - radius) / TILE), 0, tiles_y),
        ],
        -1,
    ).astype(int)
    rmax = np.stack(
        [
            np.clip(np.floor((mean2d[:, 0] + radius + TILE - 1) / TILE), 0, tiles_x),
            np.clip(np.floor((mean2d[:, 1] + radius + TILE - 1) / TILE), 0, tiles_y),
        ],
        -1,
    ).astype(int)
    tiles_touched = (rmax[:, 0] - rmin[:, 0]) * (rmax[:, 1] - rmin[:, 1])
    valid = (depth > 0.2) & (det != 0) & (tiles_touched > 0)
    out.update(
        depth=depth, mean2d=mean2d, conic=conic, czx=czx, cyz=cyz,
        radius=radius, rmin=rmin, rmax=rmax, valid=valid,
    )
    return out


def ref_render(means, scales, quats, opac, colors, objs, cam, bg=None, bg_depth=15.0):
    """Per-pixel CUDA-semantics loop (forward.cu:280-436)."""
    W, H = cam.width, cam.height
    pre = ref_preprocess(means, scales, quats, cam)
    bg = np.zeros(3) if bg is None else bg
    color = np.zeros((H, W, 3))
    depth_img = np.zeros((H, W))
    obj_img = np.zeros((H, W, objs.shape[1]))
    T_img = np.ones((H, W))

    order = np.argsort(pre["depth"], kind="stable")
    for py in range(H):
        for px in range(W):
            tx, ty = px // TILE, py // TILE
            T, T_d, D = 1.0, 1.0, 0.0
            Cacc = np.zeros(3)
            Oacc = np.zeros(objs.shape[1])
            done = False
            for g in order:
                if done:
                    break
                if not pre["valid"][g]:
                    continue
                if not (pre["rmin"][g, 0] <= tx < pre["rmax"][g, 0]):
                    continue
                if not (pre["rmin"][g, 1] <= ty < pre["rmax"][g, 1]):
                    continue
                dx = pre["mean2d"][g, 0] - px
                dy = pre["mean2d"][g, 1] - py
                ca, cb, cc = pre["conic"][g]
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                if power <= 0.0:
                    alpha = min(0.99, opac[g] * np.exp(power))
                    if alpha >= 1.0 / 255.0:
                        test_T = T * (1 - alpha)
                        if test_T >= 1e-4:
                            Cacc += colors[g] * alpha * T
                            Oacc += objs[g] * alpha * T
                            T = test_T
                        else:
                            done = True
                if power > 0.0:
                    continue
                alpha_d = min(0.99, opac[g] * np.exp(power))
                if alpha_d < 1.0 / 255.0:
                    continue
                test_T_d = T_d * (1 - alpha_d)
                if test_T_d < 1e-4:
                    continue
                czx, cyz = pre["czx"][g], pre["cyz"][g]
                d_cond = pre["depth"][g] - (czx * ca + cyz * cb) * dx - (czx * cb + cyz * cc) * dy
                D += d_cond * alpha_d * T_d
                T_d = test_T_d
            color[py, px] = Cacc + T * bg
            depth_img[py, px] = D + T_d * bg_depth
            obj_img[py, px] = Oacc
            T_img[py, px] = T
    return color, depth_img, obj_img, T_img, pre


# The golden oracle transliterates the reference's CIRCLE rect + truncated
# tile bound (`auxiliary.h:51-61`), so the oracle-parity tests pin
# tight_rect=False (the reference-faithful mode). tight_rect=True renders a
# gate-exact SUPERSET — covered by test_tight_rect_covers_every_live_pixel.
CFG = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128, chunk=32,
                      tight_rect=False)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(42)
    return make_scene(rng)


@pytest.fixture(scope="module")
def rendered(scene):
    means, scales, quats, opac, colors, objs, cam = scene
    out = rz.rasterize(
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales), jnp.asarray(quats),
        cam, CFG, colors=jnp.asarray(colors), obj_features=jnp.asarray(objs),
        bg_color=jnp.asarray([0.1, 0.2, 0.3]),
    )
    ref = ref_render(means, scales, quats, opac, colors, objs, cam, bg=np.array([0.1, 0.2, 0.3]))
    return out, ref


def test_forward_color_matches_cuda_semantics(rendered):
    out, (color_ref, depth_ref, obj_ref, T_ref, pre) = rendered
    got = np.asarray(out.color).transpose(1, 2, 0)
    np.testing.assert_allclose(got, color_ref, atol=2e-4)


def test_forward_depth_matches(rendered):
    out, (color_ref, depth_ref, obj_ref, T_ref, pre) = rendered
    got = np.asarray(out.depth)[0]
    np.testing.assert_allclose(got, depth_ref, atol=2e-3)


def test_forward_objects_match(rendered):
    out, (color_ref, depth_ref, obj_ref, T_ref, pre) = rendered
    got = np.asarray(out.objects).transpose(1, 2, 0)
    np.testing.assert_allclose(got, obj_ref, atol=5e-4)


def test_final_transmittance(rendered):
    out, (_, _, _, T_ref, _) = rendered
    np.testing.assert_allclose(np.asarray(out.final_T), T_ref, atol=1e-4)


def test_radii_and_is_used(rendered, scene):
    out, (_, _, _, _, pre) = rendered
    means, scales, quats, opac, colors, objs, cam = scene
    # contrib-mode is_used ⊆ in-frustum validity, and in this unoccluded
    # random scene the overwhelming majority of valid Gaussians contribute
    used = np.asarray(out.is_used)
    assert not np.any(used & ~pre["valid"])
    assert used.sum() > 0.5 * pre["valid"].sum()
    got_r = np.asarray(out.radii)
    want_r = np.where(pre["valid"], pre["radius"], 0).astype(np.int32)
    np.testing.assert_allclose(got_r, want_r, atol=1)  # fp32 vs fp64 ceil boundary


def test_is_used_false_for_occluded_gaussian():
    """Reference render-kernel semantics (`forward.cu:274`): a Gaussian that
    is inside the frustum but hidden behind an opaque splat contributes to no
    pixel and must report is_used=False (the pre-round-5 `in_frustum`
    behavior returned True — a silently different superset)."""
    from sags_tpu.core.camera import make_camera

    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      64, 64, 1.0, 1.0)
    # Three stacked near-opaque front splats: alpha caps at 0.99 per splat,
    # so the center-region transmittance behind them is ≤ 0.01³ = 1e-6 <
    # transmittance_min. The rear splat is tiny (≈2 px) and sits entirely
    # inside that saturated region.
    means = jnp.asarray([[0, 0, 1.5], [0, 0, 2.0], [0, 0, 2.5],
                         [0, 0, 4.0]], jnp.float32)
    scales = jnp.asarray([[0.8] * 3, [0.8] * 3, [0.8] * 3,
                          [0.05] * 3], jnp.float32)
    quats = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (4, 1))
    opac = jnp.asarray([0.9999, 0.9999, 0.9999, 0.9], jnp.float32)
    colors = jnp.ones((4, 3), jnp.float32)
    out = rz.rasterize(means, opac, scales, quats, cam, CFG, colors=colors)
    used = np.asarray(out.is_used)
    assert used[0], "front splat must contribute"
    assert not used[3], "occluded splat must NOT count as used"
    # the opt-out keeps the cheap superset semantics
    import dataclasses
    out2 = rz.rasterize(means, opac, scales, quats, cam,
                        dataclasses.replace(CFG, is_used_mode="in_frustum"),
                        colors=colors)
    assert np.asarray(out2.is_used).all()


def test_no_overflow_in_small_scene(rendered):
    out, _ = rendered
    assert int(out.overflow_rect) == 0
    assert int(out.overflow_tile) == 0
    assert int(out.n_binned) > 0


def test_overflow_counters_fire():
    """tile_capacity=8 with 32 coincident gaussians must report overflow."""
    rng = np.random.default_rng(1)
    means = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (32, 1))
    means += rng.normal(0, 0.01, means.shape).astype(np.float32)
    scales = np.full((32, 3), 0.1, np.float32)
    quats = np.tile(np.array([[0, 0, 0, 1]], np.float32), (32, 1))
    opac = np.full(32, 0.5, np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 32, 32, 1.0, 1.0)
    cfg = RasterizeConfig(max_tiles_per_gaussian=4, tile_capacity=8, chunk=8)
    out = rz.rasterize(
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales), jnp.asarray(quats),
        cam, cfg, colors=jnp.ones((32, 3)),
    )
    assert int(out.overflow_tile) > 0


def test_huge_gaussian_rect_overflow_and_adaptation():
    """A near-field Gaussian whose tile rect exceeds the R x R binning window
    must (a) fire overflow_rect and (b) render MORE of its footprint once
    max_tiles_per_gaussian grows — the adaptation the pipeline applies
    (the reference has no cap: dynamic num_rendered, rasterizer_impl.cu:288-294)."""
    means = np.array([[0.0, 0.0, 1.5]], np.float32)
    scales = np.full((1, 3), 0.5, np.float32)  # enormous on screen
    quats = np.array([[0, 0, 0, 1]], np.float32)
    opac = np.full(1, 0.9, np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 128, 128, 1.0, 1.0)
    render = lambda cfg: rz.rasterize(
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), cam, cfg, colors=jnp.ones((1, 3)),
    )
    small = render(RasterizeConfig(max_tiles_per_gaussian=4, tile_capacity=8, chunk=8))
    big = render(RasterizeConfig(max_tiles_per_gaussian=64, tile_capacity=8, chunk=8))
    assert int(small.overflow_rect) > 0
    assert int(big.overflow_rect) == 0
    # the clipped render covers fewer pixels
    assert float(small.alpha.sum()) < 0.6 * float(big.alpha.sum())


def test_pipeline_overflow_adaptation_grows_knobs():
    """Sustained overflow metrics must grow the matching raster capacities."""
    from sags_tpu.core.config import SLAMConfig, MapConfig
    from sags_tpu.slam.pipeline import SLAMPipeline
    from sags_tpu.slam.step import StepMetrics

    cfg = SLAMConfig(map=MapConfig(initial_capacity=256),
                     raster=RasterizeConfig(max_tiles_per_gaussian=4,
                                            tile_capacity=128, chunk=8))
    pipe = SLAMPipeline(cfg, point_budget=64)
    z = jnp.float32(0.0)
    m = StepMetrics(loss=z, loss_rgb=z, loss_obj=z, loss_obj_3d=z,
                    n_active=jnp.int32(1), n_binned=jnp.int32(1000),
                    overflow_tile=jnp.int32(50), overflow_rect=jnp.int32(50),
                    overflow_window=jnp.int32(50), overflow_big=jnp.int32(50),
                    tile_peak=jnp.int32(128),
                    overflow_tile_live=jnp.int32(50))
    for _ in range(3):
        pipe._maybe_grow_capacity(m)
    assert pipe.cfg.raster.tile_capacity == 256
    # rect overflow comes from slam_step's CLASSIC path (windowed=False is
    # pinned there) so it must grow the R×R window that path reads — AND
    # enable the windowed render path's store tier so offline renders of
    # the same map recover the footprint too
    assert pipe.cfg.raster.max_tiles_per_gaussian == 9
    assert pipe.cfg.raster.windowed_big_capacity == 128
    assert pipe.cfg.raster.window_blocks == cfg.raster.window_blocks + 2
    assert pipe.cfg.raster.windowed_big_frac == min(
        cfg.raster.windowed_big_frac * 2, 1.0)
    # a second sustained rect overflow doubles the store capacity
    for _ in range(3):
        pipe._maybe_grow_capacity(m)
    assert pipe.cfg.raster.windowed_big_capacity == 256
    assert pipe.cfg.raster.max_tiles_per_gaussian == 16

    # every knob capped → adaptation stops rebuilding instead of ratcheting
    import dataclasses as _dc
    capped = _dc.replace(
        pipe.cfg.raster, tile_capacity=4096, max_tiles_per_gaussian=64,
        windowed_big_capacity=1024, window_blocks=40,
        windowed_mid_frac=1.0, windowed_big_frac=1.0)
    pipe.cfg = pipe.cfg.replace(raster=capped)
    fn_before = pipe.step_fn
    for _ in range(3):
        pipe._maybe_grow_capacity(m)
    assert pipe.cfg.raster is capped and pipe.step_fn is fn_before


def test_tight_rect_covers_every_live_pixel():
    """cfg.tight_rect bins each Gaussian into the axis bbox of the exact
    alpha-cull level set (w = c·√Σ_axis, c² = 2·ln(opac/α_min)) with exact
    fractional pixel→tile bounds. Property under test: NO pixel that passes
    the compositing gate (alpha ≥ α_min ∧ power ≤ 0) lies outside the rect —
    i.e. the tight rect is image-exact, unlike the reference's 3σ circle +
    `(x+r+t−1)/t` truncation (`auxiliary.h:51-61`), which drops live edge
    pixels (measured alpha up to 0.09 one column past the truncated bound)."""
    rng = np.random.default_rng(3)
    n, W, H = 512, 96, 64
    z = rng.uniform(2.0, 10.0, (n, 1))
    xy = rng.uniform(-0.5, 0.5, (n, 2)) * z
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = np.exp(rng.normal(np.log(0.03), 0.7, (n, 3))).clip(0.004, 0.3)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.05, 0.95, (n,)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    cfg = RasterizeConfig(max_tiles_per_gaussian=64, tile_capacity=2048,
                          chunk=64)
    pre = rz.preprocess(jnp.asarray(means), jnp.asarray(opac),
                        jnp.asarray(scales.astype(np.float32)),
                        jnp.asarray(quats), cam, cfg)
    mx, my = np.asarray(pre.mx), np.asarray(pre.my)
    ca, cb, cc = np.asarray(pre.ca), np.asarray(pre.cb), np.asarray(pre.cc)
    op, val = np.asarray(pre.opacity), np.asarray(pre.valid)
    r0x, r1x = np.asarray(pre.rmin_x), np.asarray(pre.rmax_x)
    r0y, r1y = np.asarray(pre.rmin_y), np.asarray(pre.rmax_y)
    px = np.arange(W)[None, :]
    py = np.arange(H)[:, None]
    t = cfg.tile
    for i in range(n):
        if not val[i]:
            continue
        dx, dy = mx[i] - px, my[i] - py
        power = -0.5 * (ca[i]*dx*dx + cc[i]*dy*dy) - cb[i]*dx*dy
        alpha = np.minimum(0.99, op[i] * np.exp(power))
        live = (alpha >= cfg.alpha_min) & (power <= 0)
        if not live.any():
            continue
        ys, xs = np.where(live)
        assert xs.min() // t >= r0x[i] and xs.max() // t < r1x[i], i
        assert ys.min() // t >= r0y[i] and ys.max() // t < r1y[i], i


def test_windowed_kernel_sort_interpret_matches_host():
    """windowed_sort="kernel" (in-kernel bitonic depth ordering,
    `pallas_windowed._kernel_sorted`) must match the host-table windowed
    path: with zero window overflow the candidate sets, their depth order
    (gid tie-break on both sides) and hence the compositing chunks are
    identical — bit-exact output. Interpret-mode CPU coverage; the on-chip
    variant lives in test_pallas_tpu.py."""
    rng = np.random.default_rng(5)
    n, W, H = 512, 64, 48
    z = rng.uniform(2.0, 10.0, (n, 1))
    xy = rng.uniform(-0.5, 0.5, (n, 2)) * z
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = (rng.uniform(0.005, 0.03, (n, 3)) * z).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    A = tuple(jnp.asarray(v) for v in (means, opac, scales, quats, colors, objs))
    base = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=256,
                           pallas_interpret=True, window_blocks=16,
                           windowed_mid_frac=1.0, windowed_big_frac=1.0,
                           windowed_big_capacity=64)
    oh = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, base, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    ck = dataclasses.replace(base, windowed_sort="kernel")
    ok = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, ck, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    assert int(oh.overflow_window) == 0 and int(ok.overflow_window) == 0
    assert int(oh.n_binned) == int(ok.n_binned)
    np.testing.assert_array_equal(np.asarray(ok.color), np.asarray(oh.color))
    np.testing.assert_array_equal(np.asarray(ok.objects),
                                  np.asarray(oh.objects))
    np.testing.assert_array_equal(np.asarray(ok.final_T),
                                  np.asarray(oh.final_T))


def test_windowed_interpret_matches_xla_cpu():
    """The windowed fused fwd+bwd kernels run under Pallas interpret mode on
    CPU (`pallas_interpret`), giving the windowed path CPU-CI coverage (the
    TPU parity tests skip under the suite's forced-CPU conftest)."""
    rng = np.random.default_rng(0)
    n, W, H = 1024, 96, 64
    z = rng.uniform(2.0, 10.0, (n, 1))
    xy = rng.uniform(-0.5, 0.5, (n, 2)) * z
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = (rng.uniform(0.005, 0.02, (n, 3)) * z).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    # base arm pins the non-default scan/prefetch forms so the A/B pairs
    # below stay meaningful (library defaults are "pad"/prefetch since r4)
    cfg = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128,
                          chunk=16, pallas_interpret=True, window_blocks=24,
                          windowed_mid_frac=1.0, windowed_big_frac=1.0,
                          scan_impl="roll", window_prefetch=False)
    tgt = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    A = tuple(jnp.asarray(v) for v in (means, opac, scales, quats, colors, objs))

    ow = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    assert int(ow.overflow_window) == 0 and int(ow.overflow_big) == 0
    ox = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg, colors=a[4], obj_features=a[5],
        windowed=False, fused=False))(*A)
    np.testing.assert_allclose(np.asarray(ow.color), np.asarray(ox.color),
                               atol=1e-5)

    # scan_impl="pad" (shift-fill-1 static-slice scan) is bit-exact vs "roll"
    cfg_pad = dataclasses.replace(cfg, scan_impl="pad")
    op = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg_pad, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    np.testing.assert_array_equal(np.asarray(op.color), np.asarray(ow.color))
    np.testing.assert_array_equal(np.asarray(op.final_T), np.asarray(ow.final_T))

    # ewa_impl="quad" ([PIX,6]@[6,K] monomial-basis EWA) matches the longhand
    # VPU form within the documented ~1e-3 expansion tolerance
    cfg_q = dataclasses.replace(cfg, ewa_impl="quad")
    oq = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg_q, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    np.testing.assert_allclose(np.asarray(oq.color), np.asarray(ow.color),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(oq.final_T), np.asarray(ow.final_T),
                               atol=2e-3)

    # base-tier split (1 universal offset + compacted 2×2 remainder): with
    # an ample remainder buffer the pair set is identical, so the render is
    # bit-exact and nothing overflows
    cfg_bs = dataclasses.replace(cfg, windowed_base_split_frac=1.0)
    obs = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg_bs, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    np.testing.assert_array_equal(np.asarray(obs.color), np.asarray(ow.color))
    np.testing.assert_array_equal(np.asarray(obs.final_T),
                                  np.asarray(ow.final_T))
    assert int(obs.overflow_big) == 0

    # window_prefetch (double-buffered span DMA) is bit-exact vs the
    # single-buffered window
    cfg_pf = dataclasses.replace(cfg, window_prefetch=True)
    opf = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg_pf, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    np.testing.assert_array_equal(np.asarray(opf.color), np.asarray(ow.color))
    np.testing.assert_array_equal(np.asarray(opf.final_T),
                                  np.asarray(ow.final_T))

    def make_loss(windowed, fused):
        def loss(m):
            r = rz.rasterize(m, A[1], A[2], A[3], cam, cfg, colors=A[4],
                             obj_features=A[5], windowed=windowed, fused=fused)
            return jnp.sum((r.color - tgt) ** 2) + jnp.sum(r.final_T ** 2)
        return loss

    gw = jax.jit(jax.grad(make_loss(True, None)))(A[0])
    gx = jax.jit(jax.grad(make_loss(False, False)))(A[0])
    rel = float(jnp.abs(gw - gx).max() / (jnp.abs(gx).max() + 1e-8))
    assert rel < 1e-4, rel

    # Split-precision windowed forward (cfg.windowed_bf16): rgb/depth must
    # stay EXACTLY f32 (only the obj matmul runs in bf16); obj channels
    # carry bf16-level error; gradients take the exact XLA-recompute branch
    # so they match the full-precision path to f32 tolerance.
    cfg16 = dataclasses.replace(cfg, windowed_bf16=True)
    ob = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg16, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    np.testing.assert_array_equal(np.asarray(ob.color), np.asarray(ow.color))
    np.testing.assert_array_equal(np.asarray(ob.depth), np.asarray(ow.depth))
    o_ref = np.asarray(ow.objects)
    o_rel = np.abs(np.asarray(ob.objects) - o_ref).max() / (np.abs(o_ref).max() + 1e-9)
    assert o_rel < 2e-2, o_rel
    assert o_rel > 0.0  # the bf16 path must actually have been taken

    def loss16(m):
        r = rz.rasterize(m, A[1], A[2], A[3], cam, cfg16, colors=A[4],
                         obj_features=A[5], windowed=True)
        return jnp.sum((r.color - tgt) ** 2) + jnp.sum(r.final_T ** 2)

    g16 = jax.jit(jax.grad(loss16))(A[0])
    rel16 = float(jnp.abs(g16 - gx).max() / (jnp.abs(gx).max() + 1e-8))
    assert rel16 < 1e-4, rel16


def test_store_tier_full_coverage_matches_wide_xla():
    """Store tier (`windowed_big_capacity`): rect > R Gaussians composite
    their FULL footprint through the per-tile big table — forward AND
    gradients must match the classic XLA path run with a window wide enough
    to cover every rect (the reference's exact, uncapped coverage,
    `rasterizer_impl.cu:288-294`). Also: the fast mode (store off) must
    report the same pairs as coverage loss in overflow_rect."""
    rng = np.random.default_rng(1)
    n, W, H = 1024, 160, 128
    z = rng.uniform(2.0, 10.0, (n, 1))
    xy = rng.uniform(-0.5, 0.5, (n, 2)) * z * np.array([1.3, 1.0])
    means = np.concatenate([xy, z], 1).astype(np.float32)
    # heavy tail: screen rects up to ~12 tiles
    scales = (rng.uniform(0.01, 0.1, (n, 3)) * z).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    A = tuple(jnp.asarray(v) for v in (means, opac, scales, quats, colors, objs))
    base = RasterizeConfig(
        max_tiles_per_gaussian=16, tile_capacity=1024, chunk=64,
        pallas_interpret=True, window_blocks=24,
        windowed_mid_frac=1.0, windowed_big_frac=1.0,
    )
    cfg_store = dataclasses.replace(
        base, windowed_big_capacity=512,
        windowed_store_fracs=((6, 1.0), (8, 1.0), (12, 1.0), (16, 1.0)),
    )
    cfg_wide = dataclasses.replace(base, max_tiles_per_gaussian=256)

    render = lambda c, **kw: jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, c, colors=a[4], obj_features=a[5],
        **kw))(*A)
    out_s = render(cfg_store, windowed=True)
    out_w = render(cfg_wide, windowed=False, fused=False)
    out_fast = render(base, windowed=True)

    assert int(out_w.overflow_rect) == 0  # wide window covers everything
    assert int(out_s.overflow_rect) == 0  # store covers everything too
    # store binned == wide binned: identical pair sets
    assert int(out_s.n_binned) == int(out_w.n_binned)
    # fast mode loses exactly the pairs the store recovered
    assert int(out_fast.overflow_rect) > 0
    np.testing.assert_allclose(np.asarray(out_s.color),
                               np.asarray(out_w.color), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_s.final_T),
                               np.asarray(out_w.final_T), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_s.depth),
                               np.asarray(out_w.depth), atol=2e-2)

    # base-tier split with copies in the stream: identical pair set →
    # bit-exact vs the unsplit store render, nothing overflows
    out_bs = render(dataclasses.replace(cfg_store,
                                        windowed_base_split_frac=1.0),
                    windowed=True)
    assert int(out_bs.n_binned) == int(out_s.n_binned)
    assert int(out_bs.overflow_big) == 0
    np.testing.assert_array_equal(np.asarray(out_bs.color),
                                  np.asarray(out_s.color))

    # a starved copy-ring buffer degrades coverage HONESTLY: fewer pairs,
    # counted in overflow_big (the pipeline's cue to grow the fraction).
    # The fraction is of the STATIC copy-row total (the pair-sort lanes it
    # exists to shrink) — with this test's frac=1.0 store tiers that total
    # is ~33k mostly-padding rows, so starving the handful of live >2-wide
    # slices needs a fraction tiny enough to cap admission at ONE row.
    out_cr = render(dataclasses.replace(cfg_store,
                                        windowed_copy_ring_frac=1e-6),
                    windowed=True)
    assert int(out_cr.n_binned) < int(out_s.n_binned)
    assert int(out_cr.overflow_big) > 0
    assert np.isfinite(np.asarray(out_cr.color)).all()

    tgt = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))

    def make_loss(c, kw):
        def loss(m, o, s, q, cc, ob):
            r = rz.rasterize(m, o, s, q, cam, c, colors=cc, obj_features=ob,
                             **kw)
            return (jnp.sum((r.color - tgt) ** 2)
                    + 1e-3 * jnp.sum(r.depth ** 2) + jnp.sum(r.final_T ** 2))
        return loss

    gs = jax.jit(jax.grad(make_loss(cfg_store, {"windowed": True}),
                          argnums=(0, 1, 2, 3, 4)))(*A)
    gx = jax.jit(jax.grad(make_loss(cfg_wide, {"windowed": False,
                                               "fused": False}),
                          argnums=(0, 1, 2, 3, 4)))(*A)
    for name, a, b in zip(["means", "opac", "scales", "quats", "colors"],
                          gs, gx):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
        assert rel < 1e-3, (name, rel)


def test_store_tier_saturated_drops_counted():
    """Per-tile big capacity saturation drops the DEEPEST lanes (behind
    near-opaque foreground) and must surface in overflow_big."""
    rng = np.random.default_rng(2)
    n, W, H = 512, 64, 64
    means = np.concatenate(
        [rng.uniform(-0.6, 0.6, (n, 2)), rng.uniform(2.0, 4.0, (n, 1))], 1
    ).astype(np.float32)
    scales = np.full((n, 3), 0.6, np.float32)  # everyone huge: rects >> R
    quats = np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1))
    opac = np.full((n,), 0.9, np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    objs = np.zeros((n, 16), np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    cfg = RasterizeConfig(
        max_tiles_per_gaussian=16, tile_capacity=1024, chunk=64,
        pallas_interpret=True, window_blocks=24, windowed_big_capacity=128,
        windowed_store_fracs=((6, 1.0), (8, 1.0), (12, 1.0), (16, 1.0)),
    )
    out = jax.jit(lambda: rz.rasterize(
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), cam, cfg, colors=jnp.asarray(colors),
        obj_features=jnp.asarray(objs), windowed=True))()
    assert int(out.overflow_big) > 0  # saturation is counted, never silent
    assert np.isfinite(np.asarray(out.color)).all()


def test_mark_visible_frustum_cull():
    """`mark_visible` (markVisible parity, `rasterize_points.cu:218-237`):
    true iff the view-space depth exceeds the 0.2 near threshold
    (`auxiliary.h:144-169`), under a non-trivial camera pose."""
    from sags_tpu.core.transforms import so3_exp

    R = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5])), np.float32)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    cam = make_camera(R, t, 64, 64, 1.2, 0.9)
    # place points at chosen view-space depths, map them to world
    z_view = np.array([-1.0, 0.1, 0.19, 0.21, 3.0, 50.0], np.float32)
    pts_view = np.stack(
        [np.linspace(-0.5, 0.5, z_view.size).astype(np.float32),
         np.zeros_like(z_view), z_view], axis=1)
    pts_world = pts_view @ R.T + t  # R: cam->world, t: camera center
    vis = np.asarray(rz.mark_visible(jnp.asarray(pts_world), cam))
    np.testing.assert_array_equal(vis, z_view > 0.2)


def test_windowed_expand_frac_lossless_and_counted():
    """`windowed_expand_frac`: a loose budget must be pair-for-pair identical
    to the full expansion (live rows sort before culled rows, so trimming
    dead rows changes nothing); a budget below the live-row count must drop
    pairs HONESTLY into overflow_big."""
    rng = np.random.default_rng(4)
    n, W, H = 2048, 96, 64
    z = rng.uniform(2.0, 10.0, (n, 1))
    xy = rng.uniform(-0.9, 0.9, (n, 2)) * z  # a chunk falls outside the frustum
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = (rng.uniform(0.005, 0.02, (n, 3)) * z).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    cfg = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=256,
                          chunk=16, pallas_interpret=True, window_blocks=24,
                          windowed_mid_frac=1.0, windowed_big_frac=1.0)
    A = tuple(jnp.asarray(v) for v in (means, opac, scales, quats, colors, objs))
    render = lambda c: jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, c, colors=a[4], obj_features=a[5],
        windowed=True))(*A)

    out_full = render(cfg)
    n_live = int(np.asarray(
        rz.preprocess(*A[:4], cam, cfg, colors=A[4]).valid).sum())
    # loose budget (>= live rows): identical pair set, bit-identical image
    loose = (n_live + 255) // 128 * 128 / n
    out_loose = render(dataclasses.replace(cfg, windowed_expand_frac=loose))
    assert int(out_loose.n_binned) == int(out_full.n_binned)
    assert int(out_loose.overflow_big) == int(out_full.overflow_big)
    np.testing.assert_array_equal(np.asarray(out_loose.color),
                                  np.asarray(out_full.color))
    # starved budget: fewer pairs, counted
    tight = max(128, (n_live // 2) // 128 * 128) / n
    out_tight = render(dataclasses.replace(cfg, windowed_expand_frac=tight))
    assert int(out_tight.n_binned) < int(out_full.n_binned)
    assert int(out_tight.overflow_big) > 0
    assert np.isfinite(np.asarray(out_tight.color)).all()


def test_occupancy_probe_derives_exact_budgets():
    """`windowed_occupancy` + `derive_windowed_budgets` must produce a config
    that renders with ZERO overflow on its probe scene (every buffer sized
    from measured need), matches the generous-budget image bit-for-bit, and
    is genuinely snug (expansion budget below the padded row store)."""
    rng = np.random.default_rng(7)
    n, W, H = 2048, 160, 96
    z = rng.uniform(2.0, 10.0, (n, 1))
    xy = rng.uniform(-0.5, 0.5, (n, 2)) * z
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = (rng.uniform(0.005, 0.02, (n, 3)) * z).astype(np.float32)
    # a handful of big Gaussians exercise the slice-store tiers
    scales[:24] *= 12.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    cfg = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=256,
                          chunk=16, pallas_interpret=True, window_blocks=24,
                          windowed_big_capacity=64)
    A = tuple(jnp.asarray(v) for v in (means, opac, scales, quats, colors, objs))
    render = lambda c: jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, c, colors=a[4], obj_features=a[5],
        windowed=True))(*A)

    occ = {k: np.asarray(v) for k, v in jax.jit(
        lambda m, o, s, q: rz.windowed_occupancy(m, o, s, q, cam, cfg)
    )(*A[:4]).items()}
    derived = rz.derive_windowed_budgets(cfg, occ, n)

    # generous reference: everything buffered, huge window
    generous = dataclasses.replace(
        cfg, windowed_mid_frac=1.0, windowed_big_frac=1.0,
        windowed_copy_ring_frac=1.0, windowed_expand_frac=1.0,
        windowed_store_fracs=((8, 1.0), (16, 1.0), (32, 1.0)),
        window_blocks=48)
    og = render(generous)
    od = render(derived)
    for f in ("overflow_tile", "overflow_rect", "overflow_window",
              "overflow_big"):
        assert int(getattr(od, f)) == 0, (f, int(getattr(od, f)))
    assert int(od.n_binned) == int(og.n_binned)
    np.testing.assert_array_equal(np.asarray(od.color), np.asarray(og.color))
    np.testing.assert_array_equal(np.asarray(od.final_T),
                                  np.asarray(og.final_T))
    # snugness: the probe found slack (this scene culls nothing like 100%
    # of rows, but the copy/store buffers must be far below the generous 1.0)
    assert derived.windowed_mid_frac < 1.0
    assert derived.windowed_big_frac < 1.0
    assert all(f < 1.0 for _, f in derived.windowed_store_fracs)
    assert derived.window_blocks <= occ["window_blocks_need"] + 1


def test_pipeline_tile_capacity_shrinks_back():
    """A startup transient grows tile_capacity; once the deepest tile queue
    stays under a third of capacity with zero overflow for the hysteresis
    window, the capacity halves back (the grown compositor costs real
    time — measured 59 → 92 ms/step at 512 → 1024 on-chip)."""
    from sags_tpu.core.config import MapConfig, SLAMConfig
    from sags_tpu.slam.pipeline import SLAMPipeline

    cfg = SLAMConfig(map=MapConfig(initial_capacity=256),
                     raster=RasterizeConfig(max_tiles_per_gaussian=4,
                                            tile_capacity=1024, chunk=8))
    pipe = SLAMPipeline(cfg, point_budget=64)
    target = 4 * cfg.metrics_interval  # quiet trained frames required
    # one lattice step down per quiet window: 1024 -> 768
    for _ in range(target):
        pipe._maybe_shrink_capacity(peak=300, overflow_free=True)
    assert pipe.cfg.raster.tile_capacity == 768
    # second quiet window: 768 -> 512 (= lattice(1.25*300), the known need)
    for _ in range(target):
        pipe._maybe_shrink_capacity(peak=300, overflow_free=True)
    assert pipe.cfg.raster.tile_capacity == 512
    # need floor: lattice(1.25*300)=512 blocks further shrink at this peak
    for _ in range(2 * target):
        pipe._maybe_shrink_capacity(peak=300, overflow_free=True)
    assert pipe.cfg.raster.tile_capacity == 512
    # an overflow resets the quiet counter
    for _ in range(target - 1):
        pipe._maybe_shrink_capacity(peak=100, overflow_free=True)
    pipe._maybe_shrink_capacity(peak=100, overflow_free=False)
    assert pipe.cfg.raster.tile_capacity == 512
    # floor: never below 256 (Pallas lane layout floor)
    for _ in range(3 * target):
        pipe._maybe_shrink_capacity(peak=10, overflow_free=True)
    assert pipe.cfg.raster.tile_capacity == 256


def test_live_overflow_respects_transmittance_floor():
    """Transmittance-aware tile-overflow accounting: depth-capped drops
    behind fully saturated pixels are what the reference's per-pixel early
    exit skips (`forward.cu:372-389`) — counted raw, but NOT live. Drops in
    a still-transmitting tile are genuine coverage loss — live."""
    from sags_tpu.core.camera import make_camera

    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      16, 16, 1.0, 1.0)  # single 16x16 tile
    cfg = RasterizeConfig(max_tiles_per_gaussian=4, tile_capacity=32,
                          chunk=16)
    n = 80  # > tile_capacity
    means = jnp.asarray(np.stack([np.zeros(n), np.zeros(n),
                                  np.linspace(2.0, 6.0, n)], -1), jnp.float32)
    scales = jnp.full((n, 3), 2.0, jnp.float32)  # blanket the whole tile
    quats = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n, 1))
    colors = jnp.ones((n, 3), jnp.float32)

    # opaque stack: every pixel saturates within the first ~5 splats; the
    # 48 depth-capped pairs are raw overflow but dead (live == 0)
    opaque = rz.rasterize(means, jnp.full((n,), 0.95), scales, quats, cam,
                          cfg, colors=colors)
    assert int(opaque.overflow_tile) > 0
    assert int(opaque.overflow_tile_live) == 0, int(opaque.overflow_tile_live)
    assert int(opaque.tile_peak) <= cfg.tile_capacity  # sat+truncated: need unknown

    # translucent stack: nothing saturates, the same drops ARE live and the
    # known need is the full queue depth
    faint = rz.rasterize(means, jnp.full((n,), 0.02), scales, quats, cam,
                         cfg, colors=colors)
    assert int(faint.overflow_tile) > 0
    assert int(faint.overflow_tile_live) == int(faint.overflow_tile)
    assert int(faint.tile_peak) > cfg.tile_capacity
