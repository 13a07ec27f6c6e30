"""Offline 3DGS training loop: kNN-scale init, densification, convergence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core.config import (MapConfig, OptimizationConfig,
                                  RasterizeConfig, SLAMConfig)
from sags_tpu.io.datasets import SyntheticDataset
from sags_tpu.mapping import gaussian_map as gm
from sags_tpu.slam import offline


def offline_cfg():
    return SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128,
                               chunk=32),
        map=MapConfig(initial_capacity=8192),
        opt=OptimizationConfig(
            feature_lr=0.05, opacity_lr=0.1, scaling_lr=0.02,
            densify_from_iter=10, densification_interval=15,
            densify_grad_threshold=1e-4, opacity_reset_interval=10_000,
        ),
    )


@pytest.mark.slow
def test_offline_training_improves(rng):
    cfg = offline_cfg()
    frames = list(SyntheticDataset(n_frames=3, width=96, height=64,
                                   n_world=1500, pts_per_frame=600, step=0.2))
    state, losses = offline.train_offline(frames, cfg, iterations=40,
                                          capacity=8192)
    third = max(1, len(losses) // 3)
    assert np.mean(losses[-third:]) < np.mean(losses[:third]), losses
    assert np.isfinite(losses).all()
    # densification ran: stats were reset, map still sane
    assert int(gm.n_active(state.map)) > 0


def test_init_from_points_knn_scales(rng):
    cfg = offline_cfg()
    pts = rng.normal(size=(300, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(size=(300, 3)).astype(np.float32)
    state = offline.init_from_points(pts, cols, cfg, capacity=1024)
    s = np.asarray(gm.get_scaling(state.map))[:300]
    # scales equal the mean 3-NN distance (isotropic init)
    from sags_tpu.ops.knn import mean_knn3_sqdist

    want = np.sqrt(np.clip(np.asarray(mean_knn3_sqdist(jnp.asarray(pts))), 1e-7, None))
    np.testing.assert_allclose(s[:, 0], want, rtol=1e-4)
    np.testing.assert_allclose(s[:, 1], want, rtol=1e-4)


def test_densify_event_grows_on_high_grads(rng):
    cfg = offline_cfg()
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    cols = rng.uniform(size=(64, 3)).astype(np.float32)
    state = offline.init_from_points(pts, cols, cfg, capacity=1024)
    # fake large positional gradients on a few gaussians
    m = state.map
    accum = m.xyz_grad_accum.at[:8].set(1.0)
    denom = m.denom.at[:].set(1.0)
    m = m._replace(xyz_grad_accum=accum, denom=denom)
    n0 = int(gm.n_active(m))
    state = state._replace(map=m)
    state2 = offline.densify_event(state, cfg)
    n1 = int(gm.n_active(state2.map))
    assert n1 > n0, (n0, n1)  # clones/splits appended
