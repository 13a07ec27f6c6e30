"""NDT registration tests — the reference's NDT_CUDA matrix entry with the
same 5 cm / 1° accuracy gate (`gicp_test.cpp:141-149`)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core.config import GICPConfig
from sags_tpu.ops import ndt
from tests.test_gicp import CFG, clouds, errors  # noqa: F401 (fixture reuse)

NDT_CFG = dataclasses.replace(GICPConfig(), voxel_resolution=1.0,
                              neighbor_search="direct7")

# NOTE: the strict 5cm/1deg NDT gate runs on the reference's bundled KITTI
# pair (tests/test_kitti_pair.py). The 4 m synthetic room below carries much
# less information per voxel (NDT is a coarse-distribution method), so these
# gates are looser by design.
NDT_CFG_FINE = dataclasses.replace(NDT_CFG, voxel_resolution=0.5)


def test_ndt_p2d_gate(clouds):  # noqa: F811
    source, target, T_gt, mask = clouds
    res = ndt.ndt_align(
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(mask),
        jnp.asarray(mask), jnp.eye(4), NDT_CFG_FINE, mode="p2d",
    )
    te, re = errors(np.asarray(res.T), T_gt)
    assert te < 0.10, (te, re, int(res.iterations))
    assert re < 1.5, (te, re)


def test_ndt_d2d_gate(clouds):  # noqa: F811
    source, target, T_gt, mask = clouds
    res = ndt.ndt_align(
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(mask),
        jnp.asarray(mask), jnp.eye(4), NDT_CFG, mode="d2d",
    )
    te, re = errors(np.asarray(res.T), T_gt)
    assert te < 0.05, (te, re, int(res.iterations))
    assert re < 1.0, (te, re)


def test_ndt_class_api(clouds):  # noqa: F811
    source, target, T_gt, mask = clouds
    reg = ndt.NDT(NDT_CFG, mode="p2d").set_resolution(0.5)
    reg.set_input_source(source)
    reg.set_input_target(target)
    T = reg.align()
    te, re = errors(T, T_gt)
    assert te < 0.10 and re < 1.5, (te, re)


def test_ndt_voxel_map_scatter(rng):
    """Scatter covariance = E[ppT] - mu muT per voxel, floored eigenvalues."""
    pts = rng.uniform(0, 1, (400, 3)).astype(np.float32)
    vm = ndt.build_ndt_voxel_map(jnp.asarray(pts), jnp.ones(400, bool), 1.0, 8)
    assert int(vm.n_voxels) == 1
    cov = np.asarray(vm.covs[0])
    ref = np.cov(pts.T, bias=True)
    np.testing.assert_allclose(cov, ref, atol=1e-4)
