"""The reference's own integration test, replicated: align the bundled KITTI
LiDAR pair and assert translation < 0.05 m, rotation < 1° — `gicp_test.cpp:
33-71,141-201` (0.2 m voxel downsample, forward and backward scenarios).

Uses the reference's *data* (two .pcd scans + relative.txt ground truth) as
the oracle; skipped when the reference checkout is absent.
"""

import os

import dataclasses
import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core.config import GICPConfig
from sags_tpu.io.pcd import load_pcd
from sags_tpu.ops import gicp, ndt
from sags_tpu.ops.registration import downsample

DATA = "/root/reference/submodules/fast_gicp/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "relative.txt")),
    reason="reference KITTI pair not available",
)


@pytest.fixture(scope="module")
def kitti_pair():
    target = load_pcd(os.path.join(DATA, "251370668.pcd"))
    source = load_pcd(os.path.join(DATA, "251371071.pcd"))
    T_gt = np.loadtxt(os.path.join(DATA, "relative.txt")).reshape(4, 4)
    # gicp_test.cpp:55-65 — 0.2 m voxel grid
    target = downsample(target, 0.2)
    source = downsample(source, 0.2)

    def pad(pts):
        cap = 1 << (len(pts) - 1).bit_length()
        out = np.zeros((cap, 3), np.float32)
        out[: len(pts)] = pts
        mask = np.zeros(cap, bool)
        mask[: len(pts)] = True
        return jnp.asarray(out), jnp.asarray(mask)

    return pad(source), pad(target), T_gt


def errors(T_est, T_gt):
    dT = np.linalg.inv(T_gt) @ T_est
    te = np.linalg.norm(dT[:3, 3])
    re = np.degrees(np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1)))
    return te, re


CFG = GICPConfig()


@pytest.mark.slow
def test_kitti_gicp_forward(kitti_pair):
    (src, sm), (tgt, tm), T_gt = kitti_pair
    res = gicp.gicp_align(src, tgt, sm, tm, jnp.eye(4), CFG)
    te, re = errors(np.asarray(res.T), T_gt)
    assert te < 0.05, (te, re, int(res.iterations))
    assert re < 1.0, (te, re)


@pytest.mark.slow
def test_kitti_gicp_backward(kitti_pair):
    (src, sm), (tgt, tm), T_gt = kitti_pair
    res = gicp.gicp_align(tgt, src, tm, sm, jnp.eye(4), CFG)
    te, re = errors(np.asarray(res.T), np.linalg.inv(T_gt))
    assert te < 0.05 and re < 1.0, (te, re)


@pytest.mark.slow
def test_kitti_vgicp(kitti_pair):
    (src, sm), (tgt, tm), T_gt = kitti_pair
    cfg = dataclasses.replace(CFG, voxel_resolution=1.0, max_voxels=131072)
    res = gicp.vgicp_align(src, tgt, sm, tm, jnp.eye(4), cfg)
    te, re = errors(np.asarray(res.T), T_gt)
    assert te < 0.05, (te, re, int(res.iterations))
    assert re < 1.0, (te, re)


@pytest.mark.slow
def test_kitti_ndt(kitti_pair):
    (src, sm), (tgt, tm), T_gt = kitti_pair
    cfg = dataclasses.replace(CFG, voxel_resolution=1.0,
                              neighbor_search="direct7", max_voxels=131072)
    res = ndt.ndt_align(src, tgt, sm, tm, jnp.eye(4), cfg, mode="p2d")
    te, re = errors(np.asarray(res.T), T_gt)
    assert te < 0.05, (te, re, int(res.iterations))
    assert re < 1.0, (te, re)


@pytest.mark.slow
def test_kitti_gicp_swap_scenarios(kitti_pair):
    """The gtest's remaining two scenarios (`gicp_test.cpp:166-201`):
    align, `swap_source_and_target()`, then re-set only ONE side — the
    swapped state of the other side (points AND covariances) must be
    reused correctly."""
    from sags_tpu.ops.registration import FastGICP

    (src, sm), (tgt, tm), T_gt = kitti_pair
    src_np = np.asarray(src)[np.asarray(sm)]
    tgt_np = np.asarray(tgt)[np.asarray(tm)]

    # swap then set_input_source: target slot now holds the old source
    reg = FastGICP(CFG)
    reg.set_input_source(src_np)
    reg.set_input_target(tgt_np)
    T_fwd = reg.align(np.eye(4))
    te, re = errors(T_fwd, T_gt)
    assert te < 0.05 and re < 1.0, (te, re)
    reg.swap_source_and_target()
    reg.set_input_source(src_np)  # align src→src_old? No: src vs old source
    # after the swap the target IS the old source; aligning the original
    # source against it must give identity
    T_id = reg.align(np.eye(4))
    te_id = np.linalg.norm(T_id[:3, 3])
    assert te_id < 0.01, te_id

    # swap then set_input_target: source slot holds the old target
    reg2 = FastGICP(CFG)
    reg2.set_input_source(src_np)
    reg2.set_input_target(tgt_np)
    reg2.align(np.eye(4))
    reg2.swap_source_and_target()
    reg2.set_input_target(tgt_np)
    # old-target (as source) vs target: identity again
    T_id2 = reg2.align(np.eye(4))
    assert np.linalg.norm(T_id2[:3, 3]) < 0.01

    # pure swap: aligning the swapped pair recovers the inverse motion
    reg3 = FastGICP(CFG)
    reg3.set_input_source(src_np)
    reg3.set_input_target(tgt_np)
    reg3.align(np.eye(4))
    reg3.swap_source_and_target()
    T_bwd = reg3.align(np.eye(4))
    te, re = errors(T_bwd, np.linalg.inv(T_gt))
    assert te < 0.05 and re < 1.0, (te, re)
