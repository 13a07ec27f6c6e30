"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The driver separately dry-runs `__graft_entry__.dryrun_multichip`; here we
additionally check *numerical equivalence*: the tile-sharded training step
must produce the same loss and the same map update as the unsharded one
(GSPMD inserts the per-Gaussian gradient all-reduce; any sharding bug shows
up as a numeric divergence).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core.camera import make_camera
from sags_tpu.core.config import MapConfig, RasterizeConfig, SemanticsConfig, SLAMConfig
from sags_tpu.parallel.mesh import make_mesh, shard_tiles
from sags_tpu.slam import step as slam

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def setup(cfg):
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.uniform(-2, 2, (256, 2)), rng.uniform(2, 6, (256, 1))], 1
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (256, 3)).astype(np.float32)
    state = slam.init_state(cfg, jax.random.key(0))
    state, _ = jax.jit(lambda s, p, c, m: slam.add_frame_points(s, p, c, m, cfg))(
        state, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(256, bool)
    )
    W, H = 128, 64
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 1.0)
    rngi = np.random.default_rng(1)
    gt_img = jnp.asarray(rngi.uniform(0, 1, (3, H, W)).astype(np.float32))
    gt_obj = jnp.zeros((H, W), jnp.int32)
    return state, cam, gt_img, gt_obj


def test_sharded_step_matches_single_device():
    cfg = SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=64,
                               chunk=16),
        map=MapConfig(initial_capacity=512),
        semantics=SemanticsConfig(cls3d_sample=16, num_classes=16),
    )
    state0, cam, gt_img, gt_obj = setup(cfg)
    mesh = make_mesh(8)

    s1, m1 = slam.make_slam_step(cfg, donate=False)(state0, cam, gt_img, gt_obj)
    s8, m8 = slam.make_slam_step(cfg, donate=False, mesh=mesh)(
        state0, cam, gt_img, gt_obj
    )
    np.testing.assert_allclose(float(m1.loss), float(m8.loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.map.f_dc), np.asarray(s8.map.f_dc), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.map.xyz), np.asarray(s8.map.xyz), atol=1e-6
    )
    assert int(m8.n_binned) == int(m1.n_binned)


def test_shard_tiles_places_data():
    mesh = make_mesh(8)
    x = jnp.zeros((80, 256))

    @jax.jit
    def f(x):
        return shard_tiles(x + 1.0, mesh)

    y = f(x)
    assert float(y.sum()) == 80 * 256
    # sharded across 8 devices on the tile axis
    assert len(y.sharding.device_set) == 8


def test_sharded_pallas_step_matches_single_device():
    """The multi-chip path must not forfeit the fused Pallas kernels: with
    `pallas_interpret` the shard_map compositor runs the real kernel code
    (interpreted on the CPU mesh, compiled on TPU) and must match the
    single-device XLA step bit-for-tolerance."""
    cfg = SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128,
                               chunk=16, pallas_interpret=True),
        map=MapConfig(initial_capacity=512),
        semantics=SemanticsConfig(cls3d_sample=16, num_classes=16),
    )
    state0, cam, gt_img, gt_obj = setup(cfg)
    mesh = make_mesh(8)

    s1, m1 = slam.make_slam_step(cfg, donate=False)(state0, cam, gt_img, gt_obj)
    s8, m8 = slam.make_slam_step(cfg, donate=False, mesh=mesh)(
        state0, cam, gt_img, gt_obj
    )
    np.testing.assert_allclose(float(m1.loss), float(m8.loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.map.f_dc), np.asarray(s8.map.f_dc), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.map.xyz), np.asarray(s8.map.xyz), atol=1e-6
    )


def test_sharded_windowed_render_matches_single_device():
    """Multi-chip windowed (gather-free) rendering: shard_map over the tiles
    axis runs the span-DMA kernels per tile slice with a tile_offset scalar
    mapping local→global pixel coords (`rasterize._composite_windowed_sharded`).
    Forward AND gradients must match the single-device windowed path; the
    tile grid (6×5 = 30 tiles) is deliberately not divisible by 8 to
    exercise the padded-tile branch."""
    import sags_tpu.ops.rasterize as rz

    rng = np.random.default_rng(0)
    n, W, H = 1024, 96, 80
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
    cfg = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128,
                          chunk=16, pallas_interpret=True, window_blocks=24,
                          windowed_mid_frac=1.0, windowed_big_frac=1.0)
    A = tuple(jnp.asarray(v) for v in (means, opac, scales, quats, colors, objs))
    mesh = make_mesh(8)
    tgt = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))

    o1 = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg, colors=a[4], obj_features=a[5],
        windowed=True))(*A)
    o8 = jax.jit(lambda *a: rz.rasterize(
        a[0], a[1], a[2], a[3], cam, cfg, colors=a[4], obj_features=a[5],
        windowed=True, mesh=mesh))(*A)
    np.testing.assert_allclose(np.asarray(o8.color), np.asarray(o1.color),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o8.depth), np.asarray(o1.depth),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(o8.objects), np.asarray(o1.objects),
                               atol=1e-4)

    def make_loss(mesh):
        def loss(m, o):
            r = rz.rasterize(m, A[1], A[2], A[3], cam, cfg, colors=A[4],
                             obj_features=o, windowed=True, mesh=mesh)
            return (jnp.sum((r.color - tgt) ** 2) + jnp.sum(r.final_T ** 2)
                    + jnp.sum(r.objects ** 2) * 1e-3)
        return loss

    g1 = jax.jit(jax.grad(make_loss(None), argnums=(0, 1)))(A[0], A[5])
    g8 = jax.jit(jax.grad(make_loss(mesh), argnums=(0, 1)))(A[0], A[5])
    for a, b in zip(g8, g1):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8))
        assert rel < 1e-4, rel
