"""Rasterizer backward tests: finite differences vs autodiff.

The reference implements gradients by hand in `backward.cu` (atomicAdd
scatter); here the whole pipeline is jax-differentiable, so correctness is
checked against central finite differences (the same validation a hand-written
custom_vjp would need).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sags_tpu.core.camera import make_camera
from sags_tpu.core.config import RasterizeConfig
from sags_tpu.ops import rasterize as rz

CFG = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=64, chunk=16)


def tiny_scene():
    rng = np.random.default_rng(7)
    n = 12
    means = np.concatenate(
        [rng.uniform(-1.0, 1.0, (n, 2)), rng.uniform(2.5, 5.0, (n, 1))], 1
    ).astype(np.float32)
    scales = rng.uniform(0.08, 0.25, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, -1, keepdims=True)
    opac = rng.uniform(0.3, 0.7, (n,)).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    objs = rng.normal(size=(n, 16)).astype(np.float32) * 0.3
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 32, 32, 1.0, 1.0)
    target = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    return means, scales, quats, opac, colors, objs, cam, target


def make_loss(cam, target):
    tgt = jnp.asarray(target)

    def loss(means, scales, quats, opac, colors, objs):
        out = rz.rasterize(
            means, opac, scales, quats, cam, CFG,
            colors=colors, obj_features=objs, bg_color=jnp.asarray([0.2, 0.2, 0.2]),
        )
        return (
            jnp.sum((out.color - tgt) ** 2)
            + 0.05 * jnp.sum(out.depth**2) / 100.0
            + 0.01 * jnp.sum(out.objects**2)
        )

    return loss


def central_diff(f, args, argnum, idx, eps):
    args_p = [np.array(a, np.float64) for a in args]
    args_m = [np.array(a, np.float64) for a in args]
    args_p[argnum][idx] += eps
    args_m[argnum][idx] -= eps
    fp = float(f(*[jnp.asarray(a, jnp.float32) for a in args_p]))
    fm = float(f(*[jnp.asarray(a, jnp.float32) for a in args_m]))
    return (fp - fm) / (2 * eps)


def test_gradients_match_finite_differences():
    means, scales, quats, opac, colors, objs, cam, target = tiny_scene()
    loss = jax.jit(make_loss(cam, target))
    args = (means, scales, quats, opac, colors, objs)
    g = jax.jit(jax.grad(make_loss(cam, target), argnums=(0, 1, 2, 3, 4, 5)))(
        *[jnp.asarray(a) for a in args]
    )
    g = [np.asarray(x) for x in g]

    rng = np.random.default_rng(3)
    # NOTE: loss is O(100) in fp32, so eps must be large enough that the
    # perturbation clears the ulp (~3e-5). Colors/objects are *linear* in the
    # output, so a large eps is still exact for them.
    for _ in range(4):
        i, j = rng.integers(0, colors.shape[0]), rng.integers(0, 3)
        fd = central_diff(loss, args, 4, (i, j), 0.05)
        assert abs(g[4][i, j] - fd) < 2e-2 + 0.05 * abs(fd), (g[4][i, j], fd)

    # objects also linear
    for _ in range(3):
        i, j = rng.integers(0, objs.shape[0]), rng.integers(0, 16)
        fd = central_diff(loss, args, 5, (i, j), 0.05)
        assert abs(g[5][i, j] - fd) < 2e-2 + 0.05 * abs(fd), (g[5][i, j], fd)

    # Nonlinear params: opacity, means, scales, quats. Compositing has genuine
    # (reference-faithful) discontinuities — tile-rect membership at the 3σ
    # boundary and the 1/255 alpha gate — so a single eps can straddle a jump.
    # Accept if FD at *any* probe eps agrees (it converges to AD away from the
    # jump; verified manually that FD(eps→0) → AD here).
    checks = [(3, (1,)), (3, (5,)),
              (0, (2, 0)), (0, (7, 1)), (0, (4, 2)),
              (1, (3, 0)), (1, (8, 2)),
              (2, (6, 1)), (2, (9, 3))]
    for argnum, idx in checks:
        ad = g[argnum][idx]
        errs = []
        for eps in (2e-2, 5e-3, 2.5e-3):
            fd = central_diff(loss, args, argnum, idx, eps)
            tol = 5e-2 + 0.10 * max(abs(fd), abs(ad))
            errs.append((abs(ad - fd), tol, fd))
            if abs(ad - fd) < tol:
                break
        else:
            raise AssertionError((argnum, idx, ad, errs))


def test_grad_through_sh_colors():
    """SH path: gradient w.r.t. SH coefficients flows and matches FD."""
    means, scales, quats, opac, colors, objs, cam, target = tiny_scene()
    sh = np.zeros((12, 3, 1), np.float32)
    sh[:, :, 0] = (colors - 0.5) / 0.28209479177387814

    def loss_sh(shv):
        out = rz.rasterize(
            jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
            jnp.asarray(quats), cam, CFG, shs=shv, sh_degree=0,
            obj_features=jnp.asarray(objs),
        )
        return jnp.sum((out.color - jnp.asarray(target)) ** 2)

    g = np.asarray(jax.grad(loss_sh)(jnp.asarray(sh)))
    f = jax.jit(loss_sh)
    i = 4
    eps = 0.05  # linear in SH -> large eps exact; clears fp32 ulp
    shp, shm = sh.copy(), sh.copy()
    shp[i, 1, 0] += eps
    shm[i, 1, 0] -= eps
    fd = (float(f(jnp.asarray(shp))) - float(f(jnp.asarray(shm)))) / (2 * eps)
    assert abs(g[i, 1, 0] - fd) < 2e-2 + 0.05 * abs(fd)


def test_no_nan_gradients_with_degenerate_inputs():
    """Culled/degenerate Gaussians must not poison gradients with NaNs."""
    means = np.array(
        [[0.0, 0.0, 3.0], [0.0, 0.0, -1.0], [0.0, 0.0, 0.05], [50.0, 50.0, 3.0]],
        np.float32,
    )
    scales = np.full((4, 3), 0.1, np.float32)
    quats = np.tile(np.array([[0, 0, 0, 1]], np.float32), (4, 1))
    opac = np.full(4, 0.5, np.float32)
    colors = np.full((4, 3), 0.5, np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 32, 32, 1.0, 1.0)

    def loss(m, s, q, o, c):
        out = rz.rasterize(m, o, s, q, cam, CFG, colors=c)
        return jnp.sum(out.color) + jnp.sum(out.depth)

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(colors),
    )
    for x in g:
        assert np.all(np.isfinite(np.asarray(x))), x
