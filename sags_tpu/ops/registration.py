"""pygicp-compatible class API over `sags_tpu.ops.gicp`.

Mirrors the reference's pybind surface (`submodules/fast_gicp/src/python/
main.cpp:149-299`): `FastGICP`, `FastVGICP`, `align_points`, `downsample`,
including the GS-ICP-SLAM extensions — covariance ↔ (quaternion, scale)
export/import (`get_*_rotationsq/scales`, `set_*_covariance_fromqs`) and the
z-value scale division (`calculate_*_covariance_withz`).

These wrappers pad inputs to power-of-two sizes so XLA compiles once per size
bucket, not once per scan.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sags_tpu.core.config import GICPConfig
from sags_tpu.ops import gicp as _g


def _pad_pow2(points: np.ndarray, minimum: int = 1024):
    n = len(points)
    cap = max(minimum, 1 << (n - 1).bit_length())
    out = np.zeros((cap, 3), np.float32)
    out[:n] = points
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return jnp.asarray(out), jnp.asarray(mask), n


class FastGICP:
    """Stateful wrapper with pygicp semantics (covariances cached per cloud)."""

    method = "gicp"

    def __init__(self, cfg: GICPConfig = GICPConfig()):
        self.cfg = cfg
        self._src = self._tgt = None
        self._src_covs = self._tgt_covs = None
        self._src_qs = self._tgt_qs = None
        self._src_filter = self._tgt_filter = None
        self._result = None

    # --- pygicp API ---
    def set_num_threads(self, n: int):  # XLA decides; kept for API parity
        return self

    def set_correspondence_randomness(self, k: int):
        self.cfg = dataclasses.replace(self.cfg, k_correspondences=int(k))
        return self

    def set_max_knn_distance(self, d: float):
        self.cfg = dataclasses.replace(self.cfg, knn_max_distance=float(d))
        return self

    def set_max_correspondence_distance(self, d: float):
        self.cfg = dataclasses.replace(self.cfg, corr_dist_threshold=float(d))
        return self

    def set_input_source(self, points):
        self._src = _pad_pow2(np.asarray(points, np.float32))
        self._src_covs = None
        self._src_qs = None
        self._src_filter = None
        return self

    def set_input_target(self, points):
        self._tgt = _pad_pow2(np.asarray(points, np.float32))
        self._tgt_covs = None
        self._tgt_qs = None
        self._tgt_filter = None
        return self

    def swap_source_and_target(self):
        self._src, self._tgt = self._tgt, self._src
        self._src_covs, self._tgt_covs = self._tgt_covs, self._src_covs
        self._src_qs, self._tgt_qs = self._tgt_qs, self._src_qs
        self._src_filter, self._tgt_filter = self._tgt_filter, self._src_filter
        return self

    # --- trackable-subset filters (`set_*_filter`, `main.cpp:249-256`;
    # `calculate_*_covariance_with_filter`, `fast_gicp_impl.hpp:586-720`).
    # The reference's with_filter covariance loop writes a buffer sized
    # num_trackable at raw cloud indices — an out-of-bounds latent bug; the
    # sane contract implemented here: the filter marks the trackable subset
    # used for registration (the mask), while q/s export still covers ALL
    # points (as the reference intends for Gaussian init).
    def _set_filter(self, which, num_trackable, filt):
        pts, mask, n = getattr(self, f"_{which}")
        f = np.zeros(len(pts), bool)
        idx = np.asarray(filt, np.int64).reshape(-1)
        f[idx[idx < n]] = True
        setattr(self, f"_{which}_filter", (int(num_trackable), jnp.asarray(f)))
        return self

    def set_source_filter(self, num_trackable, filt):
        return self._set_filter("src", num_trackable, filt)

    def set_target_filter(self, num_trackable, filt):
        return self._set_filter("tgt", num_trackable, filt)

    def calculate_source_covariance_with_filter(self):
        return self._covs("src")

    def calculate_target_covariance_with_filter(self):
        return self._covs("tgt")

    def _covs(self, which: str, z_values=None):
        pts, mask, n = getattr(self, f"_{which}")
        out = _g.estimate_covariances(
            pts, mask, self.cfg.k_correspondences, self.cfg.knn_max_distance,
            self.cfg.regularization,
            z_values=None if z_values is None else jnp.asarray(
                np.pad(np.asarray(z_values, np.float32), (0, len(pts) - n))
            ),
        )
        setattr(self, f"_{which}_covs", out.covs)
        setattr(self, f"_{which}_qs", (out.quats, out.scales))
        return out

    def calculate_source_covariance(self):
        return self._covs("src")

    def calculate_target_covariance(self):
        return self._covs("tgt")

    def calculate_source_covariance_withz(self, z_values):
        return self._covs("src", z_values)

    def calculate_target_covariance_withz(self, z_values):
        return self._covs("tgt", z_values)

    def _qs(self, which: str, idx: int):
        if getattr(self, f"_{which}_qs") is None:
            self._covs(which)
        qs = getattr(self, f"_{which}_qs")[idx]
        n = getattr(self, f"_{which}")[2]
        return np.asarray(qs[:n]).reshape(-1)

    def get_source_rotationsq(self):
        return self._qs("src", 0)

    def get_target_rotationsq(self):
        return self._qs("tgt", 0)

    def get_source_scales(self):
        return self._qs("src", 1)

    def get_target_scales(self):
        return self._qs("tgt", 1)

    def _set_fromqs(self, which: str, quats, scales):
        pts, mask, n = getattr(self, f"_{which}")
        q = np.asarray(quats, np.float32).reshape(-1, 4)
        s = np.asarray(scales, np.float32).reshape(-1, 3)
        covs = np.tile(np.eye(3, dtype=np.float32), (len(pts), 1, 1))
        covs[:n] = np.asarray(_g.covariances_from_qs(jnp.asarray(q), jnp.asarray(s)))[:n]
        setattr(self, f"_{which}_covs", jnp.asarray(covs))
        setattr(self, f"_{which}_qs", (jnp.asarray(q), jnp.asarray(s)))
        return self

    def set_source_covariance_fromqs(self, quats, scales):
        return self._set_fromqs("src", quats, scales)

    def set_target_covariance_fromqs(self, quats, scales):
        return self._set_fromqs("tgt", quats, scales)

    def _align_fn(self):
        return _g.gicp_align

    def align(self, initial_guess=np.eye(4)):
        src, smask, _ = self._src
        tgt, tmask, _ = self._tgt
        if self._src_filter is not None:
            smask = smask & self._src_filter[1]
        if self._tgt_filter is not None:
            tmask = tmask & self._tgt_filter[1]
        if self._src_covs is None:
            self._covs("src")
        if self._tgt_covs is None:
            self._covs("tgt")
        self._result = self._align_fn()(
            src, tgt, smask, tmask, jnp.asarray(np.asarray(initial_guess, np.float32)),
            self.cfg, source_covs=self._src_covs, target_covs=self._tgt_covs,
        )
        return np.asarray(self._result.T)

    def get_source_correspondence(self):
        """pygicp `get_source_correspondence` (`main.cpp:230-233`): nearest
        target index (−1 when gated) + squared distance per source point at
        the final transformation (identity before align)."""
        src, smask, n = self._src
        tgt, tmask, _ = self._tgt
        T = (self._result.T if self._result is not None
             else jnp.eye(4, dtype=jnp.float32))
        idx, sq = _g.correspondence_dump(
            jnp.asarray(T), src, tgt, smask, tmask,
            corr_dist_threshold=self.cfg.corr_dist_threshold,
        )
        return np.asarray(idx[:n]), np.asarray(sq[:n])

    def get_final_transformation(self):
        return np.asarray(self._result.T)

    def get_final_hessian(self):
        return np.asarray(self._result.H)

    def has_converged(self):
        return bool(self._result.converged)


class FastVGICP(FastGICP):
    method = "vgicp"

    def set_resolution(self, r: float):
        self.cfg = dataclasses.replace(self.cfg, voxel_resolution=float(r))
        return self

    def set_neighbor_search_method(self, m: str, radius: float = 1.5):
        self.cfg = dataclasses.replace(
            self.cfg, neighbor_search=m.lower(), neighbor_radius=float(radius)
        )
        return self

    def set_voxel_accumulation_mode(self, m: str):
        self.cfg = dataclasses.replace(self.cfg, voxel_accumulation=m.lower())
        return self

    def get_voxel_mean_cov(self):
        """pygicp `get_voxel_mean_cov` (`main.cpp:268-277`): the target
        Gaussian voxel map's (means, covs) as [V,3] / [V,3,3] arrays."""
        tgt, tmask, _ = self._tgt
        if self._tgt_covs is None:
            self._covs("tgt")
        vm = _g.build_voxel_map(
            tgt, self._tgt_covs, tmask, self.cfg.voxel_resolution,
            self.cfg.max_voxels, mode=self.cfg.voxel_accumulation,
        )
        V = int(vm.n_voxels)
        return np.asarray(vm.means)[:V], np.asarray(vm.covs)[:V]

    def _align_fn(self):
        return _g.vgicp_align


def align_points(
    target,
    source,
    method: str = "GICP",
    downsample_resolution: float = -1.0,
    k_correspondences: int = 15,
    max_correspondence_distance: float = float("inf"),
    voxel_resolution: float = 1.0,
    neighbor_search_method: str = "DIRECT1",
    initial_guess=np.eye(4),
) -> np.ndarray:
    """One-shot alignment (pygicp `align_points`, `main.cpp:37-147`)."""
    cfg = GICPConfig(
        k_correspondences=k_correspondences,
        corr_dist_threshold=max_correspondence_distance,
        voxel_resolution=voxel_resolution,
        neighbor_search=neighbor_search_method.lower(),
    )
    name = method.upper()
    if name in ("NDT", "NDT_CUDA"):
        from sags_tpu.ops.ndt import NDT

        reg = NDT(cfg)
    else:
        cls = {"GICP": FastGICP, "VGICP": FastVGICP,
               "VGICP_CUDA": FastVGICP,
               "GICP_ST": globals().get("FastGICPSingleThread", FastGICP)}[name]
        reg = cls(cfg)
    if downsample_resolution > 0:
        target = downsample(target, downsample_resolution)
        source = downsample(source, downsample_resolution)
    reg.set_input_source(source)
    reg.set_input_target(target)
    return reg.align(initial_guess)


def downsample(points, resolution: float) -> np.ndarray:
    """pygicp `downsample`: voxel-grid centroid filter."""
    pts, mask, n = _pad_pow2(np.asarray(points, np.float32))
    out, omask = _g.voxel_downsample(pts, mask, float(resolution), len(pts))
    return np.asarray(out)[np.asarray(omask)]


class FastGICPSingleThread(FastGICP):
    """FastGICPSingleThread (`gicp/fast_gicp_st.hpp`): correspondence reuse
    across LM iterations under the triangle-inequality early-termination
    bound — RESULT-parity implementation (see `gicp.make_gicp_st_linearizer`;
    thread count itself is an XLA concern)."""

    method = "gicp_st"

    def _align_fn(self):
        return _g.gicp_align_st


class FastVGICPCuda(FastVGICP):
    """API alias (`gicp/fast_vgicp_cuda.hpp`): the TPU is the accelerator."""

    method = "vgicp_cuda"


def NDTCuda(*args, **kw):
    """API alias for the NDT wrapper (`ndt/ndt_cuda.hpp`)."""
    from sags_tpu.ops.ndt import NDT

    return NDT(*args, **kw)
