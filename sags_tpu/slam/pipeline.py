"""Online SLAM pipeline — the orchestration the reference spreads across its
ROS node (`scripts/gaussian_splatting.py:152-1013`), redesigned host-side:

  frame stream → (tracking) → map growth → keyframing → mask generation +
  ID association → fused jitted optimization step → post-training + eval.

Differences from the reference by design:
  * ingestion is a bounded prefetch queue (no unsynchronized shared dict);
  * the entire optimization iteration is ONE XLA program (`slam/step.py`);
  * tracking backends are pluggable: "none" (consume odometry poses — the
    FAST-LIVO2 topic contract), "gicp"/"vgicp" (scan-to-scan, the
    GS-ICP-SLAM lineage), "esikf" (the ops/esikf filter).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sags_tpu.core.camera import Camera, focal2fov, make_camera
from sags_tpu.core.config import SLAMConfig
from sags_tpu.io.datasets import Frame
from sags_tpu.io.queue import DeviceFrame, FrameQueue
from sags_tpu.mapping import gaussian_map as gm
from sags_tpu.ops import gicp as gicp_ops
from sags_tpu.semantics.association import DeviceInstanceAssociator
from sags_tpu.slam import fused as fused_mod
from sags_tpu.slam import step as slam_step_mod


@dataclasses.dataclass
class Keyframe:
    camera: Camera
    image: jax.Array  # [3,H,W]
    objects: jax.Array  # [H,W] int32
    pose: np.ndarray


@dataclasses.dataclass
class PipelineResult:
    poses_est: np.ndarray  # [F,4,4]
    poses_gt: np.ndarray  # [F,4,4]
    n_keyframes: int
    train_iters: int
    losses: List[float]
    state: slam_step_mod.SLAMState
    timed_out: bool = False  # stream ended by cfg.timeout_s silence
    # wall-clock per consumed frame. Under the fused front-end most frames
    # only ENQUEUE device work (sub-ms) and the periodic metrics drain
    # absorbs the wait — steady-state rates must be SUM-based over a span
    # (len/sum), never a per-frame median. First frames carry XLA compiles.
    frame_times: List[float] = dataclasses.field(default_factory=list)


class SLAMPipeline:
    def __init__(
        self,
        cfg: SLAMConfig,
        mask_generator=None,
        mesh=None,
        point_budget: int = 4096,
        rng_seed: int = 0,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.point_budget = point_budget
        self.mask_generator = mask_generator
        self.state = slam_step_mod.init_state(cfg, jax.random.key(rng_seed))
        self.step_fn = slam_step_mod.make_slam_step(cfg, donate=False, mesh=mesh)
        self.add_fn = slam_step_mod.make_add_points(cfg, donate=False)
        self.keyframes: List[Keyframe] = []
        self.associator = DeviceInstanceAssociator(
            cfg.semantics.overlap_threshold, lidar_axes=cfg.lidar_axes,
            num_classes=cfg.semantics.num_classes,
        )
        self.losses: List[float] = []
        self.train_iter = 0
        self._kf_rng = np.random.default_rng(rng_seed)
        self._eye4 = jnp.eye(4)  # device-resident identity initial guess
        # (scan, mask, covs) DEVICE arrays of the last scan — covariances
        # are estimated once per cloud and reused as next frame's target
        self._prev_scan = None
        self._covs_fn = None
        # DEVICE-resident accumulated pose: per-frame tracking never fetches
        # the 4x4 to host (a full tunnel RTT each) — poses are stacked and
        # fetched ONCE when the run ends; cameras/transforms consume the
        # device array lazily (Camera is a pytree of traced leaves)
        self._track_T = jnp.eye(4)
        self._esikf = None
        self._track_map = None  # accumulated surfel voxel map for ESIKF
        self._esikf_boot = None  # first scan held for the velocity bootstrap
        self._overflow_strikes = 0
        # Consecutive overflow-free drains whose tile-queue PEAK stayed well
        # under tile_capacity: the shrink-back counter (a transient startup
        # overflow grows the compositor; this un-ratchets it once the map
        # settles — the grown program costs real time every frame)
        self._quiet_shrink = 0
        # Host caches of MONOTONE device predicates: once the map is thick
        # enough to anchor / the surfel map is non-empty, it stays so — the
        # per-frame int() fetch (a full tunnel RTT each) is paid only until
        # the predicate first flips (round-3 VERDICT weak #6).
        self._map_anchored = False
        self._surfels_live = False
        # Host-side upper bound of allocated map slots (count only grows —
        # it is the allocation high-water mark): growth triggers BEFORE an
        # add could hit capacity, with no per-frame device fetch. Lazily
        # seeded from the device count so resumed states account correctly.
        self._count_ub: Optional[int] = None
        # Fused front-end (slam/fused.py): ONE XLA program per frame, host
        # scalars in a device metrics ring fetched every metrics_interval
        # frames. Built lazily on the first frame (needs H,W).
        self._fused: Optional[fused_mod.FusedFrontend] = None
        self.track: Optional[fused_mod.TrackState] = None
        self._zeros_objects = None
        self._fused_first = True  # no previous scan yet
        self._host_mi = 0  # host mirror of metrics rows written
        self._drained_mi = 0  # rows already fetched/processed
        # (mi, metrics-array) snapshots: each frame's TrackState.metrics is
        # a distinct device array, so draining a snapshot LAG frames old
        # fetches an already-completed chain — no pipeline stall, no device
        # idle bubble (a fresh-array drain blocks until every queued frame
        # finishes, ~one RTT of idle per drain through a tunnel)
        self._met_snaps: List = []

    # ------------------------------------------------------------------
    def _camera_for(self, frame: Frame, pose: np.ndarray) -> Camera:
        H, W = frame.image.shape[1:]
        cam_cfg = self.cfg.camera
        fovx = focal2fov(cam_cfg.fx * W / cam_cfg.width, W)
        fovy = focal2fov(cam_cfg.fy * H / cam_cfg.height, H)
        R = pose[:3, :3]
        if self.cfg.lidar_axes:
            # FAST-LIVO2 odometry reports the LiDAR body frame; apply the
            # reference's exact axis fix (see _LIDAR_TO_CAM below).
            R = R @ _LIDAR_TO_CAM
        return make_camera(R, pose[:3, 3], W, H, fovx, fovy)

    def _track(self, frame: Frame) -> np.ndarray:
        """Estimate the frame pose. 'none' trusts frame.pose (odometry topic);
        'gicp'/'vgicp' run scan-to-scan alignment; 'gicp_map' aligns the scan
        against the Gaussian MAP's trackable subset (the GS-ICP-SLAM lineage
        the reference forked fast_gicp for, `fast_gicp_impl.hpp:586-720`);
        'esikf' runs the iterated Kalman update against an accumulated surfel
        voxel map (the FAST-LIVO2-style front-end).

        Trackers consume `frame.scan` (raw sensor points) when present —
        `frame.pose` is then NEVER read, so pose-less streams track. Legacy
        world-frame frames without a scan are un-projected through the pose
        they carry."""
        mode = self.cfg.tracking.backend
        if mode == "none":
            if frame.pose is None:
                raise ValueError(
                    "tracking.backend='none' consumes odometry poses, but "
                    "this frame carries none — use a tracking backend")
            return np.asarray(frame.pose, np.float32)

        if frame.scan is not None:
            scan = np.asarray(frame.scan, np.float32)
        else:
            if frame.pose is None:
                raise ValueError("frame has neither scan nor pose")
            Tw = np.asarray(frame.pose, np.float32)
            scan = (frame.points - Tw[:3, 3]) @ Tw[:3, :3]

        budget = self.cfg.tracking.max_points
        pad = lambda a: np.pad(a, ((0, max(0, budget - len(a))), (0, 0)))[:budget]
        msk = np.arange(budget) < min(len(scan), budget)
        scan_p = pad(scan.astype(np.float32))

        if mode == "esikf":
            # per-point intensity rides along when the frame carries colors
            # aligned with the scan sample (synthetic + depth datasets do)
            intens = None
            if (frame.colors is not None and len(frame.colors) == len(scan)):
                iv = np.asarray(frame.colors, np.float32).mean(-1)
                intens = np.pad(iv, (0, max(0, budget - len(iv))))[:budget]
            return self._track_esikf(scan_p, msk, frame.imu, frame.timestamp,
                                     intens=intens, image=frame.image)

        if mode == "gicp_map":
            return self._track_gicp_map(scan_p, msk)

        # stage once, keep the DEVICE arrays for next frame's target — a
        # numpy prev_scan would re-upload 4096x3 floats every frame (a full
        # tunnel RTT on remote chips). Each scan's surfel covariances are
        # estimated ONCE and reused as next frame's target covariances —
        # the reference's set_input_source/target caching semantics
        # (`fast_gicp_impl.hpp:380-479` runs per input cloud, not per align)
        scan_d, msk_d = jnp.asarray(scan_p), jnp.asarray(msk)
        covs_d = self._scan_covs(scan_d, msk_d)
        if self._prev_scan is None:
            self._prev_scan = (scan_d, msk_d, covs_d)
            return self._track_T

        prev_p, prev_m, prev_c = self._prev_scan
        align = gicp_ops.vgicp_align if mode == "vgicp" else gicp_ops.gicp_align
        res = align(
            scan_d, prev_p, msk_d, prev_m, self._eye4, self.cfg.gicp,
            source_covs=covs_d, target_covs=prev_c,
        )
        # accumulate ON DEVICE — no per-frame 4x4 fetch
        self._track_T = jnp.matmul(self._track_T, res.T)
        self._prev_scan = (scan_d, msk_d, covs_d)
        return self._track_T

    def _maybe_grow_map(self, incoming: int) -> None:
        """Grow the fixed-capacity map by doubling when the next add could
        hit the allocation mark — the role of the reference's unbounded
        optimizer-state concat (`gaussian_model.py:485-534`). One recompile
        per doubling (the MapConfig design); at `max_capacity` adds beyond
        the bound drop and stay counted by `add_points`."""
        if self._count_ub is None:
            self._count_ub = int(np.asarray(self.state.map.count))
        cap = self.state.map.capacity
        if self._count_ub + incoming <= cap:
            self._count_ub += incoming
            return
        # The per-frame bound assumes every budgeted point lands, but
        # add_points only consumes sum(mask) valid points — on sparse scans
        # the bound drifts far above the real count and capacity would
        # double all the way to max_capacity. Growth already pays a
        # recompile, so one resync fetch here is free and keeps the
        # per-frame path fetch-free.
        self._count_ub = int(np.asarray(self.state.map.count))
        if self._count_ub + incoming <= cap:
            self._count_ub += incoming
            return
        # Reclaim pruned holes BEFORE paying a capacity doubling: adds
        # append at the count high-water mark, so transparent-pruned slots
        # fragment the buffer until compaction (the reference's physical
        # row removal, `gaussian_model.py:443-459`). Only worth the host
        # round-trip when it frees real room (≥ the incoming batch AND a
        # quarter of capacity) — otherwise grow.
        n_act = int(np.asarray(gm.n_active(self.state.map)))
        if cap - n_act >= max(incoming, cap // 4):
            new_map, new_opt = gm.compact(self.state.map,
                                          self.state.opt_state)
            self.state = self.state._replace(map=new_map, opt_state=new_opt)
            self._count_ub = n_act
            if self._count_ub + incoming <= cap:
                self._count_ub += incoming
                return
        new_cap = cap
        need = self._count_ub + incoming
        while new_cap < need and new_cap < self.cfg.map.max_capacity:
            new_cap = min(new_cap * 2, self.cfg.map.max_capacity)
        self._count_ub += incoming  # ub even if capped (adds drop past cap)
        if new_cap == cap:
            return
        new_map, new_opt = gm.grow(self.state.map, new_cap,
                                   self.state.opt_state)
        self.state = self.state._replace(map=new_map, opt_state=new_opt)

    def _scan_covs(self, scan_d, msk_d):
        """One jitted surfel-covariance program per pipeline (static GICP
        params) — computed once per scan, reused across align calls."""
        if self._covs_fn is None:
            g = self.cfg.gicp
            self._covs_fn = jax.jit(
                lambda p, m: gicp_ops.estimate_covariances(
                    p, m, g.k_correspondences, g.knn_max_distance,
                    g.regularization,
                ).covs)
        return self._covs_fn(scan_d, msk_d)

    def _track_gicp_map(self, scan_p: np.ndarray, msk: np.ndarray) -> np.ndarray:
        """Scan-to-MAP GICP: align against the trackable Gaussians' (xyz,
        Σ from q,s) — the map is the drift-free target, so pose error stops
        compounding frame-over-frame the way scan-to-scan deltas do
        (`gaussian_model.py:232-240` + the fast_gicp fork's fromqs API).
        Falls back to scan-to-scan while the map is too thin to anchor."""
        tcfg = self.cfg.tracking
        tgt, tcov, tmask, n_sel = gm.trackable_subset(
            self.state.map, tcfg.opacity_threshold, tcfg.max_points
        )
        scan_d, msk_d = jnp.asarray(scan_p), jnp.asarray(msk)
        if (not self._map_anchored
                and int(n_sel) >= self.cfg.tracking.anchor_min_points):
            self._map_anchored = True  # map only grows: fetch never again
        covs_d = self._scan_covs(scan_d, msk_d)
        if not self._map_anchored:
            # thin map (first frames): one scan-to-scan delta keeps motion
            if self._prev_scan is not None:
                prev_p, prev_m, prev_c = self._prev_scan
                res = gicp_ops.gicp_align(
                    scan_d, prev_p, msk_d, prev_m, self._eye4, self.cfg.gicp,
                    source_covs=covs_d, target_covs=prev_c,
                )
                self._track_T = jnp.matmul(self._track_T, res.T)
            self._prev_scan = (scan_d, msk_d, covs_d)
            return self._track_T
        res = gicp_ops.gicp_align(
            scan_d, tgt, msk_d, tmask,
            jnp.asarray(self._track_T), self.cfg.gicp,
            source_covs=covs_d, target_covs=tcov,
        )
        self._track_T = res.T
        self._prev_scan = (scan_d, msk_d, covs_d)
        return self._track_T

    def _track_esikf(
        self, scan_p: np.ndarray, msk: np.ndarray,
        imu: Optional[np.ndarray] = None,
        timestamp: Optional[float] = None,
        intens: Optional[np.ndarray] = None,
        image: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """ESIKF against an INCREMENTAL surfel voxel map: IMU mean/covariance
        propagation (when the frame carries samples) or constant-position P
        inflation, iterated point-to-plane update, then one O(V+N)
        sort+segment-reduce map fold (no per-frame covariance re-estimation,
        no full-map rebuild — the FAST-LIVO2 front-end shape)."""
        from sags_tpu.ops import esikf

        if self._esikf is None:
            self._esikf = esikf.init_state()
            self._track_map = esikf.surfel_map_init(
                resolution=self.cfg.tracking.downsample_resolution * 3,
                capacity=8192,
            )
            if self.cfg.tracking.esikf_bootstrap:
                self._esikf_boot = (scan_p.copy(), msk.copy(), timestamp)
        elif self._esikf_boot is not None:
            # Velocity bootstrap: the filter starts at v=0, so a platform
            # already moving at t=0 drifts until the Kalman cross-covariance
            # learns v — and meanwhile bad poses poison the surfel map. One
            # scan-to-scan GICP on the first frame pair seeds pose AND
            # velocity (the role of FAST-LIVO2's static initialization when
            # the platform can't be assumed stationary).
            prev_p, prev_m, t0 = self._esikf_boot
            self._esikf_boot = None
            res = gicp_ops.gicp_align(
                jnp.asarray(scan_p), jnp.asarray(prev_p), jnp.asarray(msk),
                jnp.asarray(prev_m), jnp.eye(4), self.cfg.gicp,
            )
            delta = np.asarray(res.T)
            st = self._esikf
            dt = (timestamp - t0) if (timestamp is not None and t0 is not None
                                      and timestamp > t0) else None
            v = (delta[:3, 3] / dt) if dt else np.asarray(st.v)
            self._esikf = st._replace(
                R=jnp.asarray(delta[:3, :3]), p=jnp.asarray(delta[:3, 3]),
                v=jnp.asarray(v.astype(np.float32)),
            )
        if imu is not None and len(imu):
            imu = np.asarray(imu, np.float32)
            self._esikf = esikf.propagate(
                self._esikf, jnp.asarray(imu[:, 0:3]), jnp.asarray(imu[:, 3:6]),
                jnp.asarray(imu[:, 6]),
            )
        else:
            # constant-position motion model: inflate P each frame
            q = jnp.concatenate([
                jnp.full(3, 2e-3), jnp.full(3, 4e-2), jnp.full(3, 1e-4),
                jnp.full(9, 1e-8),
            ])
            self._esikf = self._esikf._replace(P=self._esikf.P + jnp.diag(q))
        vm = esikf.surfel_map_voxels(self._track_map)
        if not self._surfels_live and int(vm.n_voxels) > 0:
            self._surfels_live = True  # voxel count only grows
        if self._surfels_live:
            out = esikf.scan_update(
                self._esikf, jnp.asarray(scan_p), jnp.asarray(msk),
                vm, num_iters=self.cfg.tracking.esikf_update_iters,
                min_planarity=self.cfg.tracking.esikf_min_planarity,
            )
            self._esikf = out.state
            tcfg = self.cfg.tracking
            if tcfg.esikf_visual and image is not None:
                # LIVO visual leg: photometric update against the map's
                # intensity anchors (sequential LiDAR→visual, FAST-LIVO2
                # order). Under lidar_axes the filter tracks the LiDAR body
                # frame and the camera-from-body extrinsic (the reference's
                # R_cam = R_body·Rz(90)·Rx(−90) fix,
                # `scripts/gaussian_splatting.py:309-315`) rides into the
                # projection Jacobian via photo_update's R_ext.
                apts, aint, aok = esikf.surfel_map_anchors(self._track_map)
                H, W = image.shape[1:]
                cam_cfg = self.cfg.camera
                pout = esikf.photo_update(
                    self._esikf, apts, aint, aok, jnp.asarray(image),
                    cam_cfg.fx * W / cam_cfg.width,
                    cam_cfg.fy * H / cam_cfg.height,
                    cam_cfg.cx * W / cam_cfg.width,
                    cam_cfg.cy * H / cam_cfg.height,
                    meas_noise=tcfg.esikf_photo_noise,
                    num_iters=tcfg.esikf_photo_iters,
                    R_ext=(jnp.asarray(_LIDAR_TO_CAM)
                           if self.cfg.lidar_axes else None),
                )
                self._esikf = pout.state
        # fold this scan (at the estimated pose) into the surfel map — all
        # on device: the world transform, the map fold, and the returned
        # 4x4 never touch the host (no per-frame fetch)
        R = self._esikf.R
        p = self._esikf.p
        world = jnp.asarray(scan_p) @ R.T + p
        self._track_map = esikf.surfel_map_update(
            self._track_map, world, jnp.asarray(msk),
            intensity=None if intens is None else jnp.asarray(intens),
        )
        return jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(p)

    def _rederive_windowed(self, r):
        """Size every windowed-path buffer from ONE occupancy probe of the
        current map at the newest keyframe viewpoint (`windowed_occupancy` →
        `derive_windowed_budgets`) — a single recompile replaces the blind
        doubling ratchet when a scene shift outruns the budgets. margin=1.2
        (vs the bench's 1.05) buys headroom against further drift before the
        next strike. Returns None when there is nothing to probe yet."""
        if not self.keyframes:
            return None
        from sags_tpu.ops import rasterize as rz

        m = self.state.map
        cam = self.keyframes[-1].camera
        try:
            occ_fn = jax.jit(lambda a, b, c, d, act: rz.windowed_occupancy(
                a, b, c, d, cam, r, active_mask=act))
            occ = {k: np.asarray(v) for k, v in occ_fn(
                m.xyz, gm.get_opacity(m), gm.get_scaling(m),
                gm.get_rotation(m), m.active).items()}
            derived = rz.derive_windowed_budgets(r, occ, m.capacity,
                                                 margin=1.2)
        except Exception:
            return None  # probe is an optimization; doubling still works
        out = {
            "windowed_store_fracs": derived.windowed_store_fracs,
            "windowed_mid_frac": derived.windowed_mid_frac,
            "windowed_big_frac": derived.windowed_big_frac,
            "windowed_copy_ring_frac": derived.windowed_copy_ring_frac,
            "windowed_expand_frac": derived.windowed_expand_frac,
            "window_blocks": min(derived.window_blocks, 40),  # VMEM bound
        }
        # the classic path's R×R binning window, sized to the widest live
        # splat (capped: an 8×8 window bounds expansion cost; wider rects
        # stay counted in overflow_rect)
        side = int(occ.get("max_rect_side", 0))
        R = int(round(r.max_tiles_per_gaussian ** 0.5))
        if side:
            out["max_tiles_per_gaussian"] = min(max(side, R), 8) ** 2
        return out

    def _maybe_grow_capacity(self, metrics) -> None:
        """Overflow-adaptive render capacities (the reference has no silent
        cap — it sizes `num_rendered` dynamically, `rasterizer_impl.cu:288-294`;
        here every capacity-bounded table surfaces an overflow counter and
        sustained overflow grows the corresponding knob, one recompile each):
          * overflow_tile  → tile_capacity ×2 (per-tile queue length)
          * overflow_rect  → max_tiles_per_gaussian to the next square
                             (R×R binning window side +1)
          * overflow_window→ window_blocks +2 (windowed candidate spans)
        """
        import dataclasses

        binned = max(int(metrics.n_binned), 1)
        thresh = 0.001 * binned
        over = {
            # LIVE drops only: depth-capped pairs behind fully-saturated
            # pixels are exactly what the reference's per-pixel early exit
            # skips (`forward.cu:372-389`) — growing capacity for them buys
            # nothing and costs every frame
            "tile": int(getattr(metrics, "overflow_tile_live",
                                metrics.overflow_tile)) > thresh,
            "rect": int(getattr(metrics, "overflow_rect", 0)) > thresh,
            "window": int(getattr(metrics, "overflow_window", 0)) > thresh,
            "big": int(getattr(metrics, "overflow_big", 0)) > thresh,
        }
        if any(over.values()):
            self._overflow_strikes += 1
        else:
            self._overflow_strikes = 0
        if self._overflow_strikes < 3:
            return
        r = self.cfg.raster
        kw = {}
        if over["tile"] and r.tile_capacity < r.tile_capacity_max:
            # Need-sized on a 256-lattice (256→512→768→1024): tile_peak is
            # the UNCLAMPED deepest queue, so one growth lands at 1.25× the
            # real need instead of ratcheting through doublings (compositor
            # cost is ~linear in depth: 59/75.6/89.6 ms at 512/768/1024).
            # 256 multiples keep the Pallas K_chunk at 256.
            need = _lattice256(metrics.tile_peak)
            if need > r.tile_capacity:
                kw["tile_capacity"] = min(need, r.tile_capacity_max)
        if over["rect"]:
            # These metrics come from slam_step, which PINS the classic
            # fused path (windowed=False, slam/step.py:129) — so rect
            # overflow here must grow the knob that path reads: the R×R
            # expansion window. Bounded: each step is a recompile, and a
            # scene whose splats exceed the cap entirely would otherwise
            # ratchet forever (drops stay counted past the cap).
            R = int(round(r.max_tiles_per_gaussian ** 0.5)) + 1
            if R * R <= 64:
                kw["max_tiles_per_gaussian"] = R * R
            # Keep the windowed RENDER path (pipeline renders, eval, viewer)
            # in sync: enable/grow its store tier so offline renders of the
            # same map recover the full footprint. Capped like MT.
            if r.windowed and r.windowed_big_capacity < 1024:
                kw["windowed_big_capacity"] = (
                    r.windowed_big_capacity * 2 if r.windowed_big_capacity
                    else 128
                )
        if over["window"] or over["big"]:
            # Probe-derived budgets: size every windowed buffer from the
            # scene itself in ONE recompile (round-4 VERDICT #8) instead of
            # ratcheting each knob by doubling across repeated strikes.
            derived = self._rederive_windowed(
                dataclasses.replace(r, **kw) if kw else r)
            if derived is not None and any(
                    getattr(r, k) != v for k, v in derived.items()):
                kw.update(derived)
            else:  # nothing to probe / probe says budgets already match the
                # probed view (the overflow came elsewhere): doubling fallback
                if over["window"] and r.window_blocks < 40:  # VMEM bound
                    kw["window_blocks"] = r.window_blocks + 2
                if over["big"]:
                    if r.windowed_mid_frac < 1.0:
                        kw["windowed_mid_frac"] = min(
                            r.windowed_mid_frac * 2, 1.0)
                    if r.windowed_big_frac < 1.0:
                        kw["windowed_big_frac"] = min(
                            r.windowed_big_frac * 2, 1.0)
        self._overflow_strikes = 0
        if not kw:
            return  # every relevant knob is at its cap — don't rebuild
        self.cfg = self.cfg.replace(raster=dataclasses.replace(r, **kw))
        self.step_fn = slam_step_mod.make_slam_step(
            self.cfg, donate=False, mesh=self.mesh
        )
        if self._fused is not None:  # fused programs close over cfg too
            self._fused = fused_mod.FusedFrontend(
                self.cfg, self._fused.H, self._fused.W,
                sensor_frame=self._fused.sensor_frame, mesh=self.mesh)

    def _make_objects(self, frame: Frame, pose: np.ndarray):
        """SAM mask + cross-frame ID association. The association runs ON
        DEVICE over the map's fixed-capacity buffers (DeviceInstanceAssociator)
        — host↔device traffic is one [L,L] vote table per keyframe, not the
        O(capacity) full-cloud copy the reference pays
        (`gaussian_splatting.py:80,738-789`). Returns a device [H,W] int32."""
        H, W = frame.image.shape[1:]
        if self.mask_generator is None:
            return jnp.zeros((H, W), jnp.int32)
        mask = jnp.asarray(
            self.mask_generator.generate_objects(frame.image), jnp.int32
        )
        cam_cfg = self.cfg.camera
        fx = cam_cfg.fx * W / cam_cfg.width
        fy = cam_cfg.fy * H / cam_cfg.height
        cx = cam_cfg.cx * W / cam_cfg.width
        cy = cam_cfg.cy * H / cam_cfg.height
        return self.associator.associate(
            self.state.map.xyz, self.state.map.active, mask, pose,
            (fx, fy, cx, cy),
            used_labels=getattr(self.mask_generator, "used_labels", None),
        )

    # -- fused front-end (slam/fused.py) --------------------------------
    @property
    def _use_fused(self) -> bool:
        return (self.cfg.fused_frontend
                and self.cfg.tracking.backend in fused_mod.FusedFrontend.MODES)

    def _fused_setup(self, df, frame: Frame) -> None:
        H, W = frame.image.shape[1:]
        self._fused = fused_mod.FusedFrontend(
            self.cfg, H, W, sensor_frame=df.sensor_frame, mesh=self.mesh)
        if self.track is None:
            # ring must hold a full drain interval PLUS the drain lag (rows
            # written while the lagged snapshot ages) with margin
            self.track = fused_mod.init_track_state(
                self.cfg.tracking.max_points,
                max(self.cfg.metrics_interval, 4) + self._DRAIN_LAG + 2)
        if self._zeros_objects is None:
            self._zeros_objects = jnp.zeros((H, W), jnp.int32)

    def _frame_fused(self, df, frame: Frame, frame_idx: int):
        """One frame through the fused front-end: ≤2 dispatches (1 in the
        common replay case), ZERO value fetches in steady state. Returns the
        DEVICE pose estimate."""
        cfg = self.cfg
        if self._fused is None:
            self._fused_setup(df, frame)
        self._maybe_grow_map(self.point_budget)
        mode = cfg.tracking.backend
        anchored = self._map_anchored if mode == "gicp_map" else False
        first = self._fused_first and mode != "none"
        scan, smask = df.scan, df.scan_mask
        if scan is None:  # "none" backend may stage without a scan budget
            scan = self.track.prev_scan
            smask = self.track.prev_mask
        common = (self.state, self.track, scan, smask,
                  df.points, df.colors, df.mask, df.pose)

        if frame_idx % cfg.keyframes.keyframe_freq == 0:
            if self.mask_generator is not None:
                # the mask model + ID association need the pose between
                # tracking and training: 2 programs on (rare) keyframes
                fn = self._fused.track_add(anchored, first, write_row=False)
                self.state, self.track, T, cam = fn(*common)
                objects = self._make_objects(frame, T)
                tfn = self._fused.train_only()
                self.state, self.track = tfn(
                    self.state, self.track, cam, df.image, objects)
            else:
                objects = self._zeros_objects
                fn = self._fused.track_add_train_self(anchored, first)
                self.state, self.track, T, cam = fn(*common, df.image,
                                                    objects)
            self.keyframes.append(Keyframe(
                camera=cam, image=df.image,
                objects=jnp.asarray(objects, jnp.int32), pose=T))
            if len(self.keyframes) > cfg.keyframes.window:
                self.keyframes.pop(0)
        elif cfg.keyframes.replay and self.keyframes:
            kf = self.keyframes[self._kf_rng.integers(len(self.keyframes))]
            fn = self._fused.track_add_train_stored(anchored)
            self.state, self.track, T = fn(*common, kf.camera, kf.image,
                                           kf.objects)
        else:
            fn = self._fused.track_add(anchored, first, write_row=True)
            self.state, self.track, T, _ = fn(*common)
        self._fused_first = False
        self._host_mi += 1
        self._met_snaps.append((self._host_mi, self.track.metrics))

        # thin-map anchoring probe: one scalar fetch per frame ONLY until
        # the monotone predicate flips (then never again)
        if mode == "gicp_map" and not self._map_anchored:
            M = self.track.metrics.shape[0]
            idx = (self._host_mi - 1) % M
            n_sel = int(np.asarray(
                self.track.metrics[idx, fused_mod.MET_N_TRACKABLE]))
            if n_sel >= self.cfg.tracking.anchor_min_points:
                self._map_anchored = True
        self._maybe_drain_lagged()
        return T

    # how many frames a metrics snapshot must age before its chain is
    # assumed complete (2 frames of device work >> 1 dispatch RTT)
    _DRAIN_LAG = 2

    def _maybe_drain_lagged(self) -> None:
        """Drain the snapshot taken exactly `metrics_interval` rows past the
        last drain, once it is ≥ _DRAIN_LAG frames old — its device chain
        has long finished, so the fetch is a pure transfer."""
        interval = self.cfg.metrics_interval
        target = self._drained_mi + interval
        if self._host_mi < target + self._DRAIN_LAG:
            return
        snap = next((a for mi, a in self._met_snaps if mi == target), None)
        self._drain_metrics(snapshot=snap, upto_mi=target if snap is not None
                            else None)
        self._met_snaps = [(mi, a) for mi, a in self._met_snaps
                           if mi > self._drained_mi]

    def _train_once_fused(self, kf: Keyframe):
        """Post-training iteration through the fused metrics plumbing."""
        tfn = self._fused.train_only()
        self.state, self.track = tfn(
            self.state, self.track, kf.camera, kf.image, kf.objects)
        self._host_mi += 1
        self._met_snaps.append((self._host_mi, self.track.metrics))
        self._maybe_drain_lagged()

    def _drain_metrics(self, snapshot=None, upto_mi: Optional[int] = None) -> None:
        """ONE fetch of the device metrics ring → host loss log + overflow
        adaptation for every frame since the last drain. With a lagged
        (snapshot, upto_mi) the fetch reads an already-completed chain."""
        arr = self.track.metrics if snapshot is None else snapshot
        end_mi = self._host_mi if upto_mi is None else upto_mi
        k = end_mi - self._drained_mi
        if k <= 0 or self.track is None:
            return
        M = arr.shape[0]
        assert k <= M, (k, M)  # drain cadence never outruns the ring
        buf = np.asarray(arr)
        start = self._drained_mi % M
        peak, overflow_free, trained_rows = 0, True, 0
        for j in range(k):
            r = buf[(start + j) % M]
            if r[fused_mod.MET_TRAINED] > 0.5:
                self.losses.append(float(r[fused_mod.MET_LOSS]))
                self.train_iter += 1
                trained_rows += 1
                peak = max(peak, int(r[fused_mod.MET_TILE_PEAK]))
                overflow_free &= (
                    int(r[fused_mod.MET_OV_TILE_LIVE]) == 0
                    and int(r[fused_mod.MET_OV_RECT]) == 0
                    and int(r[fused_mod.MET_OV_WINDOW]) == 0
                    and int(r[fused_mod.MET_OV_BIG]) == 0)
                self._maybe_grow_capacity(_HostMetrics(
                    loss=float(r[fused_mod.MET_LOSS]),
                    n_binned=int(r[fused_mod.MET_N_BINNED]),
                    overflow_tile=int(r[fused_mod.MET_OV_TILE]),
                    overflow_rect=int(r[fused_mod.MET_OV_RECT]),
                    overflow_window=int(r[fused_mod.MET_OV_WINDOW]),
                    overflow_big=int(r[fused_mod.MET_OV_BIG]),
                    tile_peak=int(r[fused_mod.MET_TILE_PEAK]),
                    overflow_tile_live=int(r[fused_mod.MET_OV_TILE_LIVE]),
                ))
        if trained_rows:
            self._maybe_shrink_capacity(peak, overflow_free,
                                        units=trained_rows)
        self._drained_mi = end_mi

    def _maybe_shrink_capacity(self, peak: int, overflow_free: bool,
                               units: int = 1) -> None:
        """Un-ratchet tile_capacity once the scene settles: a dense startup
        (thousands of fresh splats in one view) legitimately overflows and
        grows the compositor, but the grown program costs real time every
        frame (measured 59/75.6/89.6 ms/step at 512/768/1024). After
        4·metrics_interval consecutive overflow-free trained frames, land
        on the 256-lattice step holding 1.25× the observed (unclamped)
        peak; growth uses the same need-sizing, so oscillation needs a
        real scene shift, not noise (growth additionally requires actual
        counted overflow for 3 consecutive frames)."""
        r = self.cfg.raster
        # at most ONE lattice step down per quiet window, never below the
        # deepest known live need: saturated truncated tiles have unknown
        # true need, so stepping down gradually and letting LIVE overflow
        # veto is the probe (one recompile per step, bounded lattice)
        target = max(256, _lattice256(peak), r.tile_capacity - 256)
        if not (overflow_free and target < r.tile_capacity):
            self._quiet_shrink = 0
            return
        # counted in quiet TRAINED FRAMES regardless of caller (the fused
        # drain passes its batch size, the legacy path 1 per frame)
        self._quiet_shrink += max(units, 1)
        if self._quiet_shrink < 4 * max(self.cfg.metrics_interval, 1):
            return
        self._quiet_shrink = 0
        self.cfg = self.cfg.replace(
            raster=dataclasses.replace(r, tile_capacity=target))
        self.step_fn = slam_step_mod.make_slam_step(
            self.cfg, donate=False, mesh=self.mesh)
        if self._fused is not None:
            self._fused = fused_mod.FusedFrontend(
                self.cfg, self._fused.H, self._fused.W,
                sensor_frame=self._fused.sensor_frame, mesh=self.mesh)

    def _train_once(self, kf: Keyframe):
        self.state, metrics = self.step_fn(self.state, kf.camera, kf.image, kf.objects)
        # ONE packed device fetch for everything the host loop reads: six
        # separate int()/float() fetches each pay a full host↔device round
        # trip (~25 ms on a tunneled chip — 150 ms/frame of pure RTT).
        vals = np.asarray(_pack_metrics(metrics))
        self.losses.append(float(vals[0]))
        self.train_iter += 1
        overflow = [int(vals[i]) for i in (2, 3, 4, 5)]
        live = int(vals[7])
        self._maybe_grow_capacity(_HostMetrics(
            loss=float(vals[0]), n_binned=int(vals[1]),
            overflow_tile=overflow[0], overflow_rect=overflow[1],
            overflow_window=overflow[2], overflow_big=overflow[3],
            tile_peak=int(vals[6]), overflow_tile_live=live,
        ))
        self._maybe_shrink_capacity(
            int(vals[6]), live == 0 and all(o == 0 for o in overflow[1:]))
        return metrics

    # ------------------------------------------------------------------
    def run(self, frames: Iterable[Frame], post_train: Optional[int] = None) -> PipelineResult:
        """Consume a frame stream (any iterable, including live generators
        that block on sensor input). Ends on stream exhaustion OR on
        `cfg.timeout_s` of silence after the first frame (the reference's
        topic-silence shutdown, `:652-666`), then post-trains."""
        cfg = self.cfg
        poses_est, poses_gt = [], []
        scan_budget = (cfg.tracking.max_points
                       if (self._use_fused
                           and cfg.tracking.backend != "none") else None)
        q = FrameQueue(frames, self.point_budget, prefetch=2,
                       timeout_s=cfg.timeout_s, scan_budget=scan_budget)
        frame_idx = 0
        frame_times: List[float] = []

        use_fused = self._use_fused
        for df, frame in q:
            t_frame = time.perf_counter()
            if use_fused:
                pose = self._frame_fused(df, frame, frame_idx)
                poses_est.append(pose)
                poses_gt.append(np.full((4, 4), np.nan, np.float32)
                                if frame.pose is None
                                else np.asarray(frame.pose))
                frame_times.append(time.perf_counter() - t_frame)
                frame_idx += 1
                continue
            pose = self._track(frame)
            poses_est.append(pose)
            # pose-less frames have no GT here; callers evaluate ATE against
            # whatever external truth they hold
            poses_gt.append(np.full((4, 4), np.nan, np.float32)
                            if frame.pose is None else np.asarray(frame.pose))

            # grow the map with this frame's cloud (`:677-689`). A sensor-
            # frame scan is registered into the world with the ESTIMATED
            # pose — the one on-device [P,3]@[3,3] matmul this costs is why
            # pose-less staging still overlaps the optimizer.
            pts = df.points
            if df.sensor_frame:
                pts = pts @ jnp.asarray(pose[:3, :3].T) + jnp.asarray(pose[:3, 3])
            self._maybe_grow_map(self.point_budget)
            self.state, _ = self.add_fn(
                self.state, pts, df.colors, df.mask,
                jnp.int32(frame_idx),
            )

            if frame_idx % cfg.keyframes.keyframe_freq == 0:
                objects = self._make_objects(frame, pose)
                kf = Keyframe(
                    camera=self._camera_for(frame, pose),
                    image=df.image,
                    objects=jnp.asarray(objects, jnp.int32),
                    pose=pose,
                )
                self.keyframes.append(kf)
                if len(self.keyframes) > cfg.keyframes.window:
                    self.keyframes.pop(0)
                self._train_once(kf)
            elif cfg.keyframes.replay and self.keyframes:
                kf = self.keyframes[self._kf_rng.integers(len(self.keyframes))]
                self._train_once(kf)
            frame_times.append(time.perf_counter() - t_frame)
            frame_idx += 1

        # post-training on random keyframes (`:938-1013`)
        n_post = cfg.post_train_iters if post_train is None else post_train
        for _ in range(n_post):
            if not self.keyframes:
                break
            kf = self.keyframes[self._kf_rng.integers(len(self.keyframes))]
            if use_fused and self._fused is not None:
                self._train_once_fused(kf)
            else:
                self._train_once(kf)
        if use_fused:
            self._drain_metrics()  # final sync drain of the remainder
            self._met_snaps.clear()

        # trackers return DEVICE poses (accumulated without per-frame
        # fetches); stack them on device and fetch the whole trajectory in
        # ONE transfer
        if poses_est:
            poses_np = np.asarray(jnp.stack([jnp.asarray(p)
                                             for p in poses_est]))
        else:
            poses_np = np.zeros((0, 4, 4))
        return PipelineResult(
            poses_est=poses_np.astype(np.float32),
            poses_gt=np.stack(poses_gt) if poses_gt else np.zeros((0, 4, 4)),
            n_keyframes=len(self.keyframes),
            train_iters=self.train_iter,
            losses=self.losses,
            state=self.state,
            timed_out=q.timed_out,
            frame_times=frame_times,
        )

    def evaluate(self, frames: Iterable[Frame], every: int = 1,
                 with_lpips: bool = True, poses=None,
                 derive_budgets: bool = True):
        """PSNR/SSIM/LPIPS over held-out frames — the reference's
        `calc_2d_metric` triple (`scripts/gaussian_splatting.py:405-443`).
        LPIPS uses torchmetrics LPIPS(alex) when installed, else the JAX
        implementation (`eval/lpips_jax.py` — backend reported per score).

        `poses` ([F,4,4], optional) renders frame i at poses[i] instead of
        frame.pose — pass the run's ESTIMATED trajectory to measure map
        quality at the poses the map was trained with (the reference
        evaluates its saved SharedCam viewpoints, which carry odometry
        poses, `scripts/gaussian_splatting.py:405-443`); GT poses then
        convolve rendering quality with tracking drift."""
        from sags_tpu.eval.lpips_jax import lpips_any, lpips_backend
        from sags_tpu.eval.metrics import psnr, ssim

        cfg = self.cfg
        if derive_budgets and cfg.raster.windowed:
            # Size the windowed render buffers for THIS map from one
            # occupancy probe (the bench's derive pattern): eval still
            # never adapts mid-run — budgets are fixed before the first
            # score and the per-frame overflow counters verify coverage.
            derived = self._rederive_windowed(cfg.raster) or {}
            # eval is offline: run the per-tile queues at the proven-on-chip
            # maximum — coverage over speed (training keeps its adapted
            # capacity; wider-still queues stay counted, never silent)
            derived["tile_capacity"] = max(cfg.raster.tile_capacity,
                                           cfg.raster.tile_capacity_max)
            cfg = cfg.replace(
                raster=dataclasses.replace(cfg.raster, **derived))
        scores = []
        for i, frame in enumerate(frames):
            if i % every:
                continue
            if poses is not None and i >= len(poses):
                # a cfg.timeout_s silence shutdown tracks fewer frames than
                # the stream holds — report metrics over the frames that
                # were actually tracked instead of crashing the eval
                break
            pose_i = (np.asarray(poses[i]) if poses is not None
                      else np.asarray(frame.pose))
            cam = self._camera_for(frame, pose_i)
            out = slam_step_mod.render_map(self.state.map, cam, cfg)
            # Measurement must not steer the system it measures: eval NEVER
            # adapts capacities (that would recompile mid-eval and change
            # subsequent training). Overflow counters are REPORTED per frame
            # so the caller can see coverage loss and adapt between runs.
            pred = np.asarray(out.color)
            s = {
                "psnr": psnr(pred, frame.image),
                "ssim": ssim(pred, frame.image),
                "overflow_pairs": int(out.overflow_tile)
                + int(out.overflow_rect) + int(out.overflow_window)
                + int(out.overflow_big),
                "n_binned": int(out.n_binned),
            }
            if with_lpips:
                s["lpips"] = lpips_any(pred, frame.image)
                s["lpips_net"] = lpips_backend()
            scores.append(s)
        return scores


# Single shared definition (core/transforms.py) so every ingestion path —
# pipeline keyframing here, rosbag replay — applies the SAME reference fix.
from sags_tpu.core.transforms import LIDAR_TO_CAM as _LIDAR_TO_CAM  # noqa: E402


def _lattice256(peak) -> int:
    """1.25× headroom over a peak need, rounded up to the 256-lattice."""
    return -(-int(peak * 1.25) // 256) * 256


@dataclasses.dataclass
class _HostMetrics:
    """Host-side snapshot of the metric scalars `_maybe_grow_capacity` reads."""

    loss: float
    n_binned: int
    overflow_tile: int
    overflow_rect: int
    overflow_window: int
    overflow_big: int
    tile_peak: int = 0  # deepest KNOWN tile-queue need
    overflow_tile_live: int = 0  # tile drops above the transmittance floor


@jax.jit
def _pack_metrics(metrics):
    """Pack the host-read metric scalars into one [8] array → one fetch."""
    g = lambda name: getattr(metrics, name, jnp.int32(0))
    return jnp.stack([
        metrics.loss.astype(jnp.float32),
        metrics.n_binned.astype(jnp.float32),
        g("overflow_tile").astype(jnp.float32),
        g("overflow_rect").astype(jnp.float32),
        g("overflow_window").astype(jnp.float32),
        g("overflow_big").astype(jnp.float32),
        g("tile_peak").astype(jnp.float32),
        g("overflow_tile_live").astype(jnp.float32),
    ])
