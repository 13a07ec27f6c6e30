"""Fused per-frame SLAM programs — the dispatch-storm collapse.

The reference's node pays a Python/CUDA launch storm per frame (SURVEY §2.11:
per-iteration autograd launches, `.cuda()` uploads, host syncs); round 4 of
this framework still glued tracking and training together with host Python —
~15 separate XLA dispatches per frame, each paying the host↔device RTT
(~25 ms through a tunneled chip → the driver-recorded 2.14 Hz loop).

This module builds ONE XLA program per frame covering the whole per-frame
pipeline of `scripts/gaussian_splatting.py:644-935`:

    surfel covariances → GICP align (scan-to-scan or scan-to-map) → pose
    compose → world registration of the scan → map growth (`:677-689`) →
    render+losses+backward+Adam+prune (`slam/step.py`) → metrics row

and keeps every host-read scalar in a device-resident metrics RING BUFFER
fetched every `cfg.metrics_interval` frames — the per-frame loop issues one
dispatch and ZERO value fetches in steady state, so dispatches pipeline and
throughput is bounded by device compute, not RTT.

Variants (separately jitted; each is structurally static):
  * track_add_train_self   — keyframe: camera built IN-PROGRAM from the pose
                             the tracker just estimated; trains on this frame
  * track_add_train_stored — non-keyframe: trains on a stored (replayed)
                             keyframe, device-resident since its capture
  * track_add              — keyframe with semantics: the mask generator and
                             the ID association need the pose between
                             tracking and training (2 programs + mask model)
  * train_only             — the 2nd half of the split + post-training

Tracking modes fused here: "gicp"/"vgicp" (scan-to-scan), "gicp_map"
(scan-to-map with scan-to-scan fallback while thin), "none" (odometry pose
consumed). The ESIKF front-end keeps the per-module path (its IMU packets
are variable-length host data).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sags_tpu.core.camera import Camera, focal2fov, make_camera
from sags_tpu.core.config import SLAMConfig
from sags_tpu.core.transforms import LIDAR_TO_CAM
from sags_tpu.mapping import gaussian_map as gm
from sags_tpu.ops import gicp as gicp_ops
from sags_tpu.slam import step as slam_step_mod

# metrics ring-buffer columns
MET_LOSS = 0
MET_N_BINNED = 1
MET_OV_TILE = 2
MET_OV_RECT = 3
MET_OV_WINDOW = 4
MET_OV_BIG = 5
MET_N_TRACKABLE = 6
MET_TRAINED = 7
MET_TILE_PEAK = 8
MET_OV_TILE_LIVE = 9
MET_COLS = 10


class TrackState(NamedTuple):
    """Device-resident front-end state threaded through the fused programs."""

    T: jax.Array  # [4,4] accumulated world-from-sensor pose
    prev_scan: jax.Array  # [N,3] previous scan (next align's target)
    prev_mask: jax.Array  # [N]
    prev_covs: jax.Array  # [N,3,3] previous scan's surfel covariances
    # [4,4] last scan-to-scan delta — constant-velocity warm start for the
    # next align (smooth motion converges in 2-4 LM outer iterations
    # instead of ~20 from identity)
    prev_delta: jax.Array
    frame_idx: jax.Array  # int32 — keyframe_id for map growth
    metrics: jax.Array  # [M, MET_COLS] rolling metrics rows
    mi: jax.Array  # int32 — monotone metrics write count


def init_track_state(n_scan: int, n_metrics: int) -> TrackState:
    return TrackState(
        T=jnp.eye(4, dtype=jnp.float32),
        prev_scan=jnp.zeros((n_scan, 3), jnp.float32),
        prev_mask=jnp.zeros((n_scan,), bool),
        prev_covs=jnp.tile(jnp.eye(3, dtype=jnp.float32), (n_scan, 1, 1)),
        prev_delta=jnp.eye(4, dtype=jnp.float32),
        frame_idx=jnp.zeros((), jnp.int32),
        metrics=jnp.zeros((n_metrics, MET_COLS), jnp.float32),
        mi=jnp.zeros((), jnp.int32),
    )


def _estimate_covs(scan, mask, cfg: SLAMConfig):
    """Per-scan surfel covariances PLUS their (quat, scale) export — the
    reference fork's core feature (`fast_gicp_impl.hpp:420-434`): the same
    eigendecomposition drives GICP alignment AND Gaussian-splat init."""
    g = cfg.gicp
    return gicp_ops.estimate_covariances(
        scan, mask, g.k_correspondences, g.knn_max_distance, g.regularization
    )


def _n_trackable(m: gm.GaussianMap, cfg: SLAMConfig) -> jax.Array:
    sel = (gm.get_opacity(m) > cfg.tracking.opacity_threshold) \
        & m.trackable & m.active
    return jnp.sum(sel.astype(jnp.int32))


def _track(state, track: TrackState, scan, smask, pose_in, cfg: SLAMConfig,
           *, mode: str, anchored: bool, first: bool):
    """Pose estimate + next-frame target bookkeeping, all traced.

    Semantics match `pipeline._track` / `_track_gicp_map`: scan-to-scan
    deltas compose into `track.T`; the anchored scan-to-map variant solves
    the absolute pose directly with `track.T` as the initial guess
    (`fast_gicp_impl.hpp:586-720`). Covariances are estimated ONCE per scan
    and reused as the next frame's target (`fast_gicp_impl.hpp:380-479`
    runs per input cloud, not per align)."""
    if mode == "none":
        return (pose_in, track.prev_scan, track.prev_mask, track.prev_covs,
                track.prev_delta)

    covs = _estimate_covs(scan, smask, cfg).covs
    if first:
        return track.T, scan, smask, covs, track.prev_delta

    if mode == "gicp_map" and anchored:
        import dataclasses as _dc

        tcfg = cfg.tracking
        tgt, tcov, tmask, _ = gm.trackable_subset(
            state.map, tcfg.opacity_threshold, tcfg.max_points
        )
        # Correspondence gate: unlike scan-to-scan (both clouds cover the
        # same region), part of each scan is NEW geometry with no map
        # counterpart yet — ungated NN matches drag the solve toward
        # whatever old map point happens to be nearest. Static config, so
        # the gate costs nothing.
        gcfg = _dc.replace(cfg.gicp,
                           corr_dist_threshold=tcfg.map_corr_threshold)
        # warm start: previous pose composed with the last inter-frame
        # delta (constant velocity) — the absolute solve then starts a few
        # millimeters from the answer
        init = jnp.matmul(track.T, track.prev_delta)
        res = gicp_ops.gicp_align(
            scan, tgt, smask, tmask, init, gcfg,
            source_covs=covs, target_covs=tcov,
        )
        # jump rejection: an anchored solve that lands far from the
        # constant-velocity prediction is a failed registration (thin or
        # ambiguous target) — keep the prediction instead
        jump = jnp.linalg.norm(res.T[:3, 3] - init[:3, 3])
        T_new = jnp.where(jump <= tcfg.max_jump, res.T, init)
        from sags_tpu.core.transforms import se3_inverse
        delta = jnp.matmul(se3_inverse(track.T), T_new)
        return T_new, scan, smask, covs, delta

    align = gicp_ops.vgicp_align if mode == "vgicp" else gicp_ops.gicp_align
    res = align(
        scan, track.prev_scan, smask, track.prev_mask,
        track.prev_delta, cfg.gicp,
        source_covs=covs, target_covs=track.prev_covs,
    )
    return jnp.matmul(track.T, res.T), scan, smask, covs, res.T


def _camera_at(T: jax.Array, cfg: SLAMConfig, H: int, W: int) -> Camera:
    """Camera at the tracked pose, built in-trace (`pipeline._camera_for`)."""
    cam_cfg = cfg.camera
    fovx = focal2fov(cam_cfg.fx * W / cam_cfg.width, W)
    fovy = focal2fov(cam_cfg.fy * H / cam_cfg.height, H)
    R = T[:3, :3]
    if cfg.lidar_axes:
        R = R @ jnp.asarray(LIDAR_TO_CAM)
    return make_camera(R, T[:3, 3], W, H, fovx, fovy)


def _add(state, T, points, colors, pmask, kf_id, cfg: SLAMConfig,
         *, sensor_frame: bool, surfel: bool):
    if sensor_frame:
        points = points @ T[:3, :3].T + T[:3, 3]
    quats = scales = None
    if surfel:
        # GS-ICP-SLAM lineage: splats are initialized from the scan's
        # surfel covariance eigendecomposition (quat + √eigenvalue scales,
        # the reference fork's q/s export `fast_gicp_impl.hpp:420-434`) —
        # the map then IS the surfel field the scan-to-map tracker aligns
        # against. Computed on the WORLD-registered points so the quats
        # need no frame rotation (~1.5 ms per 4096-point batch).
        pc = _estimate_covs(points, pmask, cfg)
        quats, scales = pc.quats, pc.scales
    state, _ = slam_step_mod.add_frame_points(
        state, points, colors, pmask, cfg, quats=quats, scales=scales,
        keyframe_id=kf_id
    )
    return state


def _train_and_metrics(state, track: TrackState, camera, image, objects,
                       cfg: SLAMConfig, mesh, *, trained_flag: float = 1.0):
    state, sm = slam_step_mod.slam_step(
        state, camera, image, objects, cfg, mesh=mesh
    )
    row = jnp.stack([
        sm.loss.astype(jnp.float32),
        sm.n_binned.astype(jnp.float32),
        sm.overflow_tile.astype(jnp.float32),
        sm.overflow_rect.astype(jnp.float32),
        sm.overflow_window.astype(jnp.float32),
        sm.overflow_big.astype(jnp.float32),
        _n_trackable(state.map, cfg).astype(jnp.float32),
        jnp.float32(trained_flag),
        sm.tile_peak.astype(jnp.float32),
        sm.overflow_tile_live.astype(jnp.float32),
    ])
    return state, _write_row(track, row)


def _idle_metrics(state, track: TrackState, cfg: SLAMConfig):
    row = jnp.zeros((MET_COLS,), jnp.float32)
    row = row.at[MET_N_TRACKABLE].set(
        _n_trackable(state.map, cfg).astype(jnp.float32))
    return _write_row(track, row)


def _write_row(track: TrackState, row: jax.Array) -> TrackState:
    M = track.metrics.shape[0]
    return track._replace(
        metrics=jax.lax.dynamic_update_slice(
            track.metrics, row[None], (track.mi % M, jnp.int32(0))
        ),
        mi=track.mi + 1,
    )


class FusedFrontend:
    """Builds and caches the jitted per-frame programs for one (cfg, H, W,
    sensor_frame, mesh) operating point. Rebuild on cfg change (the pipeline
    does this on overflow adaptation, like it rebuilds step_fn)."""

    MODES = ("gicp", "vgicp", "gicp_map", "none")

    def __init__(self, cfg: SLAMConfig, H: int, W: int, *,
                 sensor_frame: bool, mesh=None):
        assert cfg.tracking.backend in self.MODES, cfg.tracking.backend
        self.cfg = cfg
        self.H, self.W = H, W
        self.sensor_frame = sensor_frame
        self.mesh = mesh
        self._fns = {}

    # -- program builders (memoized per static-variant key) ----------------
    def _memo(self, key, build):
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = jax.jit(build())
        return fn

    def track_add_train_self(self, anchored: bool, first: bool):
        """Keyframe program: track → grow → train at the JUST-estimated pose
        (camera constructed in-trace). Returns (state, track, pose, camera)."""
        cfg, H, W, mesh = self.cfg, self.H, self.W, self.mesh
        mode, sensor = cfg.tracking.backend, self.sensor_frame
        surfel_init = cfg.map.surfel_init and mode != "none"

        def build():
            def fn(state, track, scan, smask, points, colors, pmask,
                   pose_in, image, objects):
                T, pscan, pmsk, pcovs, pdelta = _track(
                    state, track, scan, smask, pose_in, cfg,
                    mode=mode, anchored=anchored, first=first)
                cam = _camera_at(T, cfg, H, W)
                state = _add(state, T, points, colors, pmask,
                             track.frame_idx, cfg, sensor_frame=sensor,
                             surfel=surfel_init)
                track = track._replace(
                    T=T, prev_scan=pscan, prev_mask=pmsk, prev_covs=pcovs,
                    prev_delta=pdelta, frame_idx=track.frame_idx + 1)
                state, track = _train_and_metrics(
                    state, track, cam, image, objects, cfg, mesh)
                return state, track, T, cam
            return fn

        return self._memo(("self", anchored, first), build)

    def track_add_train_stored(self, anchored: bool):
        """Replay program: track → grow → train on a STORED keyframe."""
        cfg, H, W, mesh = self.cfg, self.H, self.W, self.mesh
        mode, sensor = cfg.tracking.backend, self.sensor_frame
        surfel_init = cfg.map.surfel_init and mode != "none"

        def build():
            def fn(state, track, scan, smask, points, colors, pmask,
                   pose_in, kf_cam, kf_image, kf_objects):
                T, pscan, pmsk, pcovs, pdelta = _track(
                    state, track, scan, smask, pose_in, cfg,
                    mode=mode, anchored=anchored, first=False)
                state = _add(state, T, points, colors, pmask,
                             track.frame_idx, cfg, sensor_frame=sensor,
                             surfel=surfel_init)
                track = track._replace(
                    T=T, prev_scan=pscan, prev_mask=pmsk, prev_covs=pcovs,
                    prev_delta=pdelta, frame_idx=track.frame_idx + 1)
                state, track = _train_and_metrics(
                    state, track, kf_cam, kf_image, kf_objects, cfg, mesh)
                return state, track, T
            return fn

        return self._memo(("stored", anchored), build)

    def track_add(self, anchored: bool, first: bool, write_row: bool):
        """First half of the semantics split (and the no-train frame):
        track → grow; the host runs the mask model + association on the
        returned pose, then `train_only` finishes the frame. `write_row`
        keeps the one-metrics-row-per-frame accounting: True when no
        `train_only` follows (its row would double-count the frame)."""
        cfg, H, W = self.cfg, self.H, self.W
        mode, sensor = cfg.tracking.backend, self.sensor_frame
        surfel_init = cfg.map.surfel_init and mode != "none"

        def build():
            def fn(state, track, scan, smask, points, colors, pmask, pose_in):
                T, pscan, pmsk, pcovs, pdelta = _track(
                    state, track, scan, smask, pose_in, cfg,
                    mode=mode, anchored=anchored, first=first)
                cam = _camera_at(T, cfg, H, W)
                state = _add(state, T, points, colors, pmask,
                             track.frame_idx, cfg, sensor_frame=sensor,
                             surfel=surfel_init)
                track = track._replace(
                    T=T, prev_scan=pscan, prev_mask=pmsk, prev_covs=pcovs,
                    prev_delta=pdelta, frame_idx=track.frame_idx + 1)
                if write_row:
                    track = _idle_metrics(state, track, cfg)
                return state, track, T, cam
            return fn

        return self._memo(("track_add", anchored, first, write_row), build)

    def train_only(self):
        """Map-optimization iteration with a metrics-row write — the 2nd
        half of the semantics split AND the post-training loop."""
        cfg, mesh = self.cfg, self.mesh

        def build():
            def fn(state, track, cam, image, objects):
                return _train_and_metrics(
                    state, track, cam, image, objects, cfg, mesh)
            return fn

        return self._memo(("train_only",), build)
