"""NDT scan registration (P2D / D2D) — TPU-native equivalent of
`fast_gicp/ndt` (`ndt/ndt_cuda.hpp:21-73`, `cuda/ndt_compute_derivatives.cu`).

Cost (P2D, [Biber IROS2003] MLE form with a Cauchy robust kernel — the
reference's choice, `ndt_compute_derivatives.cu:47-95`):

    w = cauchy(resolution, ‖e‖),  e = μ_B − T·p
    E = w · eᵀ Σ_B⁻¹ e,   J = [skew(T·p) | −I]

with voxels required to hold > 6 points. D2D voxelizes the source as well and
uses RCR = Σ_B + R Σ_A Rᵀ. Voxel distributions are plain point statistics
(mean + scatter), not the GICP surfel covariances. Optimization reuses the
LsqRegistration GN/LM loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sags_tpu.core.config import GICPConfig
from sags_tpu.ops.gicp import (
    NEIGHBOR_OFFSETS,
    AlignResult,
    VoxelMap,
    _hb_from_pairs,
    _voxel_coords,
    build_voxel_map,
    lookup_voxels,
    lsq_align,
    robust_inv3,
    sym_eig3,
)

_HI = jax.lax.Precision.HIGHEST


def build_ndt_voxel_map(
    points: jax.Array, mask: jax.Array, resolution: float, max_voxels: int
) -> VoxelMap:
    """Voxel mean + scatter covariance of member points (create_voxelmaps)."""
    outer = jnp.einsum("ni,nj->nij", points, points, precision=_HI)
    vm = build_voxel_map(points, outer, mask, resolution, max_voxels)
    # ADDITIVE finalize gave mean=E[p], cov=E[ppᵀ]; scatter = E[ppᵀ] − μμᵀ
    cov = vm.covs - jnp.einsum("ni,nj->nij", vm.means, vm.means, precision=_HI)
    # eigenvalue floor (NDT's degenerate-voxel guard); closed-form sym_eig3
    # (descending) replaces the TPU-hostile iterative eigh
    evals, evecs = sym_eig3(cov)
    floor = jnp.maximum(evals[..., 0:1] * 1e-2, 1e-9)
    evals = jnp.maximum(evals, floor)
    cov = jnp.einsum("nij,nj,nkj->nik", evecs, evals, evecs, precision=_HI)
    return vm._replace(covs=cov)


def _cauchy(k: float, x: jax.Array) -> jax.Array:
    return (k * k) / (k * k + x * x)


def _ndt_pairs(T, src_pts, src_covs, src_w, vm: VoxelMap, offsets, resolution,
               min_voxel_points=6):
    """Correspondences + weights + mahalanobis for P2D (src_covs None) / D2D."""
    Ns = src_pts.shape[0]
    F = offsets.shape[0]
    src_t = jnp.matmul(src_pts, T[:3, :3].T, precision=_HI) + T[:3, 3]
    coords = _voxel_coords(src_t, resolution)
    c_off = (coords[:, None, :] + offsets[None]).reshape(-1, 3)
    vidx, found = lookup_voxels(vm, c_off)
    vidx = vidx.reshape(Ns, F)
    found = found.reshape(Ns, F) & src_w[:, None]
    found = found & (vm.num_points[vidx] > min_voxel_points)

    mean_B = vm.means[vidx]  # [Ns,F,3]
    cov_B = vm.covs[vidx]
    if src_covs is None:
        RCR = cov_B
    else:
        RCR = cov_B + jnp.einsum(
            "ij,njk,lk->nil", T[:3, :3], src_covs, T[:3, :3], precision=_HI
        )[:, None]
    mahal = robust_inv3(RCR.reshape(-1, 3, 3)).reshape(Ns, F, 3, 3)
    err = mean_B - src_t[:, None]
    w = jnp.where(found, _cauchy(resolution, jnp.linalg.norm(err, axis=-1)), 0.0)
    return w, mean_B, mahal


def make_ndt_linearizer(
    src_pts, src_covs, src_mask, vm: VoxelMap, cfg: GICPConfig
):
    offsets = jnp.asarray(NEIGHBOR_OFFSETS[cfg.neighbor_search], jnp.int32)
    Ns = src_pts.shape[0]
    F = offsets.shape[0]

    def flat(T, w, mean_B, mahal):
        mean_A = jnp.broadcast_to(src_pts[:, None], (Ns, F, 3)).reshape(-1, 3)
        return _hb_from_pairs(
            T, mean_A, mean_B.reshape(-1, 3), mahal.reshape(-1, 3, 3), w.reshape(-1)
        )

    def linearize(T):
        w, mean_B, mahal = _ndt_pairs(
            T, src_pts, src_covs, src_mask, vm, offsets, cfg.voxel_resolution
        )
        H, b, e = flat(T, w, mean_B, mahal)
        return H, b, e, (w, mean_B, mahal)

    def error(T, corr):
        w, mean_B, mahal = corr
        _, _, e = flat(T, w, mean_B, mahal)
        return e

    return linearize, error


@functools.partial(jax.jit, static_argnames=("cfg", "mode"))
def ndt_align(
    source: jax.Array,
    target: jax.Array,
    source_mask: jax.Array,
    target_mask: jax.Array,
    init_T: jax.Array,
    cfg: GICPConfig = GICPConfig(),
    mode: str = "p2d",  # p2d | d2d (NDTDistanceMode)
) -> AlignResult:
    vm = build_ndt_voxel_map(target, target_mask, cfg.voxel_resolution,
                             cfg.max_voxels)
    if mode == "p2d":
        src_pts, src_covs, src_mask = source, None, source_mask
    elif mode == "d2d":
        svm = build_ndt_voxel_map(source, source_mask, cfg.voxel_resolution,
                                  cfg.max_voxels)
        valid = (jnp.arange(svm.means.shape[0]) < svm.n_voxels) & (
            svm.num_points > 6
        )
        src_pts, src_covs, src_mask = svm.means, svm.covs, valid
    else:
        raise ValueError(f"unknown NDT mode {mode!r}")
    lin, err = make_ndt_linearizer(src_pts, src_covs, src_mask, vm, cfg)
    return lsq_align(lin, err, init_T, cfg)


class NDT:
    """pygicp `NDTCuda`-shaped wrapper (`src/python/main.cpp` NDTCuda class)."""

    def __init__(self, cfg: GICPConfig = GICPConfig(), mode: str = "d2d"):
        import dataclasses

        self.cfg = dataclasses.replace(cfg, neighbor_search="direct7")
        self.mode = mode
        self._src = self._tgt = None
        self._result = None

    def set_resolution(self, r: float):
        import dataclasses

        self.cfg = dataclasses.replace(self.cfg, voxel_resolution=float(r))
        return self

    def set_distance_mode(self, mode: str):
        self.mode = mode.lower()
        return self

    def set_neighbor_search_method(self, m: str, radius: float = -1.0):
        import dataclasses

        self.cfg = dataclasses.replace(self.cfg, neighbor_search=m.lower())
        return self

    def set_input_source(self, points):
        from sags_tpu.ops.registration import _pad_pow2

        self._src = _pad_pow2(__import__("numpy").asarray(points, "float32"))
        return self

    def set_input_target(self, points):
        from sags_tpu.ops.registration import _pad_pow2

        self._tgt = _pad_pow2(__import__("numpy").asarray(points, "float32"))
        return self

    def align(self, initial_guess=None):
        import numpy as np

        src, smask, _ = self._src
        tgt, tmask, _ = self._tgt
        T0 = jnp.asarray(
            np.eye(4, dtype=np.float32) if initial_guess is None
            else np.asarray(initial_guess, np.float32)
        )
        self._result = ndt_align(src, tgt, smask, tmask, T0, self.cfg, self.mode)
        return np.asarray(self._result.T)

    def has_converged(self):
        return bool(self._result.converged)
