"""Command-line entry points.

`python -m sags_tpu.cli.main <command>`:
  run-slam  — online SLAM over a dataset (TUM/Replica/synthetic), the
              equivalent of `roslaunch gaussian_splatting gaussian_splatting
              .launch` + the node's run loop.
  run-gicp  — scan-to-scan odometry over a dataset, the equivalent of
              `python_tester/gicp_odometry2.py`.
  render    — render views from a saved PLY map.
  eval      — PSNR/SSIM (+LPIPS if available) of a saved map against a
              dataset, the `calc_2d_metric` path.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _load_dataset(args):
    from sags_tpu.io import datasets as D

    if args.dataset == "synthetic":
        # clutter blobs make z observable for geometric tracking (the bare
        # corridor's walls are all parallel — point-to-plane drifts along
        # the axis); IMU substeps feed the ESIKF propagate path
        return list(
            D.SyntheticDataset(
                n_frames=args.frames, width=args.width, height=args.height,
                clutter=0.35, imu_substeps=5,
                texture=getattr(args, "texture", 0.0),
                step=getattr(args, "step", 0.4),
                n_world=getattr(args, "world_points", 4096),
                pts_per_frame=getattr(args, "scan_points", 2048),
            )
        )
    if args.dataset == "tum":
        return list(D.TUMDataset(args.path))
    if args.dataset == "replica":
        return list(D.ReplicaDataset(args.path))
    if args.dataset == "kitti":
        # KITTI odometry velodyne scans (`src/kitti.cpp` KittiLoader)
        return list(D.KITTIOdometryDataset(
            args.path,
            poses_file=getattr(args, "poses", ""),
            times_file=getattr(args, "times", ""),
            calib_file=getattr(args, "calib", ""),
            max_points=getattr(args, "max_points", 0),
        ))
    if args.dataset == "rosbag":
        # ROS1 bag replay of the node's three topics (io/rosbag.py) —
        # a generator, staged frame-by-frame like the socket source
        from sags_tpu.io.rosbag import RosbagDataset

        return iter(RosbagDataset(
            args.path,
            image_topic=args.image_topic,
            cloud_topic=args.cloud_topic,
            odom_topic=args.odom_topic,
            imu_topic=args.imu_topic or None,
        ))
    if args.dataset == "socket":
        # live TCP ingestion (io/stream.py): a generator, not a list — the
        # pipeline stages it frame-by-frame and applies timeout_s silence
        from sags_tpu.io.stream import socket_frames

        # generous connect window: a publisher may still be loading/rendering
        return socket_frames(args.port, connect_timeout=180.0)
    raise SystemExit(f"unknown dataset {args.dataset}")


def cmd_run_slam(args):
    import jax

    from sags_tpu.core.config import SLAMConfig, preset
    from sags_tpu.io.ply import save_map_ply
    from sags_tpu.mapping.gaussian_map import compact, n_active
    from sags_tpu.semantics.masks import MaskGenerator
    from sags_tpu.slam.pipeline import SLAMPipeline
    from sags_tpu.utils.traj import ate_rmse

    resumed_state = None
    if args.resume:
        # cfg_args parity (`arguments/__init__.py:100-120`): a resumed run
        # adopts the persisted config; explicit CLI flags still override.
        from sags_tpu.slam.checkpoint import load_state

        resumed_state, cfg = load_state(args.resume)
        print(f"resumed state+config from {args.resume}", file=sys.stderr)
        if args.preset:
            print("--preset ignored: --resume adopts the persisted config",
                  file=sys.stderr)
    else:
        cfg = preset(args.preset) if args.preset else SLAMConfig()
    # only EXPLICIT flags override (None = not given); fresh runs get the
    # documented defaults
    tracking = args.tracking if args.tracking is not None else (
        cfg.tracking.backend if args.resume else "none")
    post_train = args.post_train if args.post_train is not None else (
        cfg.post_train_iters if args.resume else 100)
    import dataclasses as _dc

    cfg = cfg.replace(
        tracking=_dc.replace(cfg.tracking, backend=tracking),
        post_train_iters=post_train,
    )
    if args.capacity:
        import dataclasses

        cfg = cfg.replace(map=dataclasses.replace(cfg.map,
                                                  initial_capacity=args.capacity))
    frames = _load_dataset(args)
    mask_gen = None
    if args.semantics:
        if args.mask_backend == "geometric":
            from sags_tpu.semantics.geometric import GeometricMaskGenerator

            mask_gen = GeometricMaskGenerator(
                num_classes=cfg.semantics.num_classes
            )
        else:  # SAM with the shipped synthetic-trained weights when present
            mask_gen = MaskGenerator(num_classes=cfg.semantics.num_classes)
    pipe = SLAMPipeline(cfg, mask_generator=mask_gen, point_budget=args.point_budget)
    if resumed_state is not None:
        pipe.state = resumed_state
    t0 = time.perf_counter()
    res = pipe.run(frames)
    dt = time.perf_counter() - t0
    ate, _ = ate_rmse(res.poses_est, res.poses_gt)
    n_frames = len(frames) if isinstance(frames, list) else len(res.poses_est)
    if isinstance(frames, list):
        # evaluate at the poses the map was TRAINED with (the estimated
        # trajectory) — the reference's calc_2d_metric renders its saved
        # odometry-posed viewpoints (`scripts/gaussian_splatting.py:405-443`);
        # GT-posed eval would convolve render quality with tracking drift
        # (ATE reports that separately). --eval-poses gt restores GT eval.
        eval_poses = (res.poses_est
                      if getattr(args, "eval_poses", "est") == "est"
                      else None)
        scores = pipe.evaluate(frames, every=max(1, n_frames // 5),
                               poses=eval_poses)
        # None (JSON null), not NaN: bare NaN is invalid JSON
        psnr = float(np.mean([s["psnr"] for s in scores])) if scores else None
        ssim_v = (float(np.mean([s["ssim"] for s in scores]))
                  if scores else None)
        lpips_v = (
            float(np.mean([s["lpips"] for s in scores
                           if s.get("lpips") is not None]))
            if scores and any(s.get("lpips") is not None for s in scores)
            else None
        )
        lpips_net = scores[0].get("lpips_net") if scores else None
        eval_overflow = (int(np.sum([s.get("overflow_pairs", 0)
                                     for s in scores])) if scores else None)
    else:  # live stream: frames are consumed; no replay to evaluate against
        psnr = None
        ssim_v = None
        lpips_v = None
        lpips_net = None
        eval_overflow = None
    # Steady-state loop rate over the second half of the run (the first
    # frames carry XLA compiles; wall-clock "fps" includes them). SUM-based:
    # under the fused front-end most frames only ENQUEUE device work
    # (sub-ms) and the periodic metrics drain absorbs the wait — the sum of
    # tail frame times is the honest wall time of the tail, a per-frame
    # median is not.
    tail = res.frame_times[len(res.frame_times) // 2:]
    fps_steady = (len(tail) / max(sum(tail), 1e-9)) if tail else None
    print(
        json.dumps(
            {
                "frames": n_frames,
                "train_iters": res.train_iters,
                "fps": n_frames / max(dt, 1e-9),
                "fps_steady": fps_steady,
                "ate_rmse": ate if np.isfinite(ate) else None,
                "mean_psnr": psnr,
                "mean_ssim": ssim_v,
                "mean_lpips": lpips_v,
                "lpips_net": lpips_net,
                "eval_overflow_pairs": eval_overflow,
                "active_gaussians": int(n_active(res.state.map)),
                "keyframes": res.n_keyframes,
                "timed_out": res.timed_out,
                "tracking": cfg.tracking.backend,
            }
        )
    )
    if args.traj_out:
        from sags_tpu.utils.traj import save_tum_trajectory

        save_tum_trajectory(args.traj_out, res.poses_est)
        print(f"wrote trajectory (TUM format) to {args.traj_out}",
              file=sys.stderr)
    if args.traj_plot:
        from sags_tpu.utils.traj import plot_trajectory

        if plot_trajectory(args.traj_plot, res.poses_est, res.poses_gt):
            print(f"wrote trajectory plot to {args.traj_plot}", file=sys.stderr)
    if args.save:
        save_map_ply(args.save, compact(res.state.map))
        print(f"saved map to {args.save}", file=sys.stderr)
    if args.checkpoint:
        from sags_tpu.slam.checkpoint import save_state

        save_state(args.checkpoint, res.state, pipe.cfg)
        print(f"checkpointed state to {args.checkpoint}", file=sys.stderr)


def cmd_train(args):
    """Offline 3DGS optimization over a replayed frame set (configs #2/#3)."""
    from sags_tpu.core.config import SLAMConfig
    from sags_tpu.io.ply import save_map_ply
    from sags_tpu.mapping.gaussian_map import compact, n_active
    from sags_tpu.slam import offline

    cfg = SLAMConfig()
    frames = _load_dataset(args)
    t0 = time.perf_counter()
    state, losses = offline.train_offline(
        frames, cfg, iterations=args.iters, capacity=args.capacity or None,
        log_every=max(args.iters // 10, 1),
    )
    dt = time.perf_counter() - t0
    print(json.dumps({
        "iters": args.iters,
        "final_loss": losses[-1] if losses else None,
        "active_gaussians": int(n_active(state.map)),
        "iters_per_sec": args.iters / dt,
    }))
    if args.save:
        save_map_ply(args.save, compact(state.map))
        print(f"saved map to {args.save}", file=sys.stderr)


def cmd_run_gicp(args):
    from sags_tpu.ops import registration as R
    from sags_tpu.ops.registration import FastGICP, FastVGICP
    from sags_tpu.utils.traj import ate_rmse

    frames = _load_dataset(args)
    reg = (FastVGICP if args.method == "vgicp" else FastGICP)()
    poses = [np.eye(4)]
    times = []
    # Frames carrying a raw `scan` feed it straight to the tracker; legacy
    # world-frame frames reconstruct the scan through the GT pose.
    raw_sensor = args.dataset == "kitti"
    has_gt = not raw_sensor or bool(getattr(args, "poses", ""))

    def sensor_frame(f):
        if f.scan is not None:
            pts = np.asarray(f.scan)
        else:
            pts = np.asarray(f.points)
            T = np.asarray(f.pose)
            pts = (pts - T[:3, 3]) @ T[:3, :3]
        if args.downsample > 0:  # `kitti.cpp:80-98` voxel-grid prefilter
            pts = R.downsample(pts, args.downsample)
        return pts

    if args.mode == "map":
        # Scan-to-keyframe-map odometry (`python_tester/using_previous_30_*.py`
        # :178-213): every Nth scan is registered into a world-frame keyframe
        # stack that becomes the target; each raw scan aligns against it with
        # the previous world pose as the initial guess.
        h0 = sensor_frame(frames[0])  # poses[0] = I: world frame := frame 0
        kf_stack = [h0]
        reg.set_input_target(h0)
        for i in range(1, len(frames)):
            pts = sensor_frame(frames[i])
            reg.set_input_source(pts)
            t0 = time.perf_counter()
            pose = np.asarray(reg.align(poses[-1]))
            times.append(time.perf_counter() - t0)
            poses.append(pose)
            if i % args.keyframe_every == 1 or args.keyframe_every == 1:
                kf_stack.append(pts @ pose[:3, :3].T + pose[:3, 3])
                reg.set_input_target(np.vstack(kf_stack))
    else:
        # Scan-to-scan with target←source carry-over — the reference KITTI
        # loop's `swapSourceAndTarget` (`src/kitti.cpp:116-130`). The swap
        # (not set_input_target) keeps the covariances just estimated for
        # the source, halving per-frame covariance work.
        sp = sensor_frame(frames[0])
        reg.set_input_target(sp)
        for i in range(1, len(frames)):
            sc = sensor_frame(frames[i])
            reg.set_input_source(sc)
            t0 = time.perf_counter()
            delta = reg.align(np.eye(4))
            times.append(time.perf_counter() - t0)
            poses.append(poses[-1] @ delta)
            reg.swap_source_and_target()
    poses = np.stack(poses)
    ate = None
    if has_gt:
        if raw_sensor and not getattr(args, "calib", ""):
            # KITTI GT is T_w_cam0; estimates are velodyne-frame. Without the
            # Tr conjugation (--calib) the frames differ by ~0.27 m lever-arm
            # terms Umeyama cannot absorb — the metric would be silently
            # inflated (`kitti.cpp` applies calib unconditionally).
            print("WARNING: --poses without --calib: ATE mixes cam0-frame GT "
                  "with velodyne-frame estimates; pass the sequence's "
                  "calib.txt for a faithful metric", file=sys.stderr)
        gt = np.stack([np.asarray(f.pose) for f in frames])
        ate, _ = ate_rmse(poses, gt)
    print(
        json.dumps(
            {
                "frames": len(frames),
                "method": args.method,
                "mode": args.mode,
                "ate_rmse": ate,
                "mean_align_ms": float(np.mean(times) * 1000) if times else None,
                "fps": 1.0 / float(np.mean(times)) if times else None,
            }
        )
    )
    if args.out_poses:
        from sags_tpu.utils.traj import save_kitti_trajectory

        save_kitti_trajectory(args.out_poses, poses)
        print(f"wrote poses (KITTI format) to {args.out_poses}",
              file=sys.stderr)
    if args.traj_plot:
        from sags_tpu.utils.traj import plot_trajectory

        gt = np.stack([np.asarray(f.pose) for f in frames]) if has_gt else None
        if plot_trajectory(args.traj_plot, poses, gt):
            print(f"wrote trajectory plot to {args.traj_plot}", file=sys.stderr)


def _load_points(path: str) -> np.ndarray:
    """Load a raw [N,3] point cloud: .npy/.npz, .ply (vertex x,y,z),
    KITTI .bin (float32 x,y,z,reflectance), or whitespace text."""
    if path.endswith(".npy") or path.endswith(".npz"):
        arr = np.load(path)
        if hasattr(arr, "files"):
            arr = arr[arr.files[0]]
    elif path.endswith(".ply"):
        from sags_tpu.io.ply import _read_ply_raw

        _, cols = _read_ply_raw(path)
        arr = np.stack([cols["x"], cols["y"], cols["z"]], 1)
    elif path.endswith(".bin"):
        arr = np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:, :3]
    else:
        arr = np.loadtxt(path, dtype=np.float32)
    pts = np.asarray(arr, np.float32).reshape(-1, arr.shape[-1])[:, :3]
    return pts[np.isfinite(pts).all(axis=1)]


def cmd_align(args):
    """Pairwise-alignment timing harness — the reference's `src/align.cpp:22-90`
    benchmark (each method run once cold, then N× for steady-state rate)."""
    from sags_tpu.ops import registration as R

    target = _load_points(args.target)
    source = _load_points(args.source)
    if args.downsample > 0:
        target = R.downsample(target, args.downsample)
        source = R.downsample(source, args.downsample)
    methods = (
        ["GICP", "GICP_ST", "VGICP", "VGICP_CUDA", "NDT_CUDA"]
        if args.method == "all" else [args.method.upper()]
    )
    for m in methods:
        t0 = time.perf_counter()
        T = R.align_points(target, source, method=m,
                           voxel_resolution=args.voxel_resolution)
        single = time.perf_counter() - t0
        ts = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            T = R.align_points(target, source, method=m,
                               voxel_resolution=args.voxel_resolution)
            ts.append(time.perf_counter() - t0)
        print(json.dumps({
            "method": m,
            "n_target": len(target),
            "n_source": len(source),
            "single_ms": single * 1000.0,
            "avg_ms": float(np.mean(ts)) * 1000.0 if ts else None,
            "fps": 1.0 / float(np.mean(ts)) if ts else None,
            "translation": np.asarray(T)[:3, 3].tolist(),
        }))


def cmd_serve(args):
    """Publish a dataset as a live TCP frame stream (io/stream.py) — the
    sensor-side counterpart of `run-slam --dataset socket`."""
    from sags_tpu.io.stream import serve_frames

    frames = _load_dataset(args)

    def paced():
        for f in frames:
            if args.hz > 0:
                time.sleep(1.0 / args.hz)
            yield f

    print(f"serving {len(frames)} frames on port {args.port} "
          f"(waiting for a consumer)...", file=sys.stderr)
    serve_frames(paced(), port=args.port)
    print("stream complete", file=sys.stderr)


def cmd_render(args):
    import jax.numpy as jnp

    from sags_tpu.core.camera import make_camera
    from sags_tpu.core.config import SLAMConfig
    from sags_tpu.io.ply import load_map_ply
    from sags_tpu.slam.step import render_map

    cfg = SLAMConfig()
    m = load_map_ply(args.map)
    pose = np.eye(4, dtype=np.float32)
    if args.pose:
        pose = np.loadtxt(args.pose).reshape(4, 4).astype(np.float32)
    cam = make_camera(pose[:3, :3], pose[:3, 3], args.width, args.height, 1.2, 0.9)
    out = render_map(m, cam, cfg)
    img = np.clip(np.asarray(out.color).transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8)
    import imageio.v2 as imageio

    imageio.imwrite(args.out, img)
    print(f"wrote {args.out} ({args.width}x{args.height}, "
          f"{int(m.count)} gaussians)")


def cmd_viewer(args):
    """Serve the map to a SIBR remote viewer (`network_gui` protocol)."""
    import time as _t

    from sags_tpu.core.config import SLAMConfig
    from sags_tpu.io.ply import load_map_ply
    from sags_tpu.slam.step import render_map
    from sags_tpu.viz.network_gui import NetworkGUI

    cfg = SLAMConfig()
    m = load_map_ply(args.map)
    gui = NetworkGUI(port=args.port)
    print(f"viewer socket on 127.0.0.1:{args.port} "
          f"({int(m.count)} gaussians)", file=sys.stderr)
    try:
        while True:
            served = gui.serve_once(
                lambda cam: np.asarray(render_map(m, cam, cfg).color)
            )
            if not served:
                _t.sleep(0.02)
    except KeyboardInterrupt:
        pass
    finally:
        gui.close()


def cmd_eval(args):
    from sags_tpu.core.config import SLAMConfig
    from sags_tpu.eval.metrics import evaluate_pair
    from sags_tpu.io.ply import load_map_ply
    from sags_tpu.slam.pipeline import SLAMPipeline

    cfg = SLAMConfig()
    frames = _load_dataset(args)
    m = load_map_ply(args.map)
    pipe = SLAMPipeline(cfg)
    pipe.state = pipe.state._replace(map=m)
    scores = pipe.evaluate(frames, every=args.every)
    agg = {
        k: float(np.mean([s[k] for s in scores if s.get(k) is not None] or [np.nan]))
        for k in ("psnr", "ssim", "lpips")
    }
    lpips_net = scores[0].get("lpips_net") if scores else None
    print(json.dumps({"n_eval": len(scores), **agg, "lpips_net": lpips_net}))


def _enable_compile_cache():
    """Persistent XLA compile cache for every CLI entry point. Must go
    through jax.config.update: on hosts where a sitecustomize imports jax at
    interpreter startup, env vars set later are ignored and every compile is
    paid fresh (through a tunneled chip that is minutes per program)."""
    import os

    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "sags_tpu", "jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # an optimization, never a hard dependency
        print(f"# compile cache unavailable: {e}", file=sys.stderr)


def main(argv=None):
    _enable_compile_cache()
    p = argparse.ArgumentParser(prog="sags-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_dataset_args(sp, live=False, kitti=False):
        # "socket"/"rosbag" (consumed-once generators) only make sense for
        # the online SLAM loop; train/run-gicp/eval index a materialized list
        choices = ["synthetic", "tum", "replica"] + (
            ["socket", "rosbag"] if live else []
        ) + (["kitti"] if kitti else [])
        sp.add_argument("--dataset", default="synthetic", choices=choices)
        sp.add_argument("--path", default="")
        sp.add_argument("--frames", type=int, default=20)
        sp.add_argument("--width", type=int, default=160)
        sp.add_argument("--height", type=int, default=120)
        sp.add_argument("--texture", type=float, default=0.0,
                        help="synthetic-world procedural texture strength "
                             "(0..1; view-consistent instance texture)")
        sp.add_argument("--step", type=float, default=0.4,
                        help="synthetic trajectory step per frame")
        sp.add_argument("--world-points", type=int, default=4096,
                        help="synthetic world point count")
        sp.add_argument("--scan-points", type=int, default=2048,
                        help="synthetic per-frame scan point count")
        if live:
            sp.add_argument("--image-topic", default="/rgb_img")
            sp.add_argument("--cloud-topic", default="/cloud_registered")
            sp.add_argument("--odom-topic", default="/aft_mapped_to_init")
            sp.add_argument("--imu-topic", default="")
        if kitti:
            sp.add_argument("--poses", default="",
                            help="KITTI GT poses.txt (12 floats/line) for ATE")
            sp.add_argument("--times", default="", help="KITTI times.txt")
            sp.add_argument("--calib", default="",
                            help="KITTI calib.txt with a Tr: velo→cam0 line")
            sp.add_argument("--max-points", type=int, default=0,
                            help="subsample each scan to at most N points")

    sp = sub.add_parser("run-slam")
    add_dataset_args(sp, live=True)
    sp.add_argument("--preset", default="", choices=["", "fast_livo2", "replica", "tum"])
    # default=None so --resume can distinguish "flag given" from "default":
    # a resumed run adopts the persisted config and only EXPLICIT flags
    # override it (cfg_args parity, `arguments/__init__.py:100-120`)
    sp.add_argument("--tracking", default=None,
                    choices=["none", "gicp", "vgicp", "gicp_map", "esikf"])
    sp.add_argument("--semantics", action="store_true")
    sp.add_argument("--mask-backend", default="geometric",
                    choices=["geometric", "sam"])
    sp.add_argument("--port", type=int, default=7011,
                    help="TCP port for --dataset socket (io/stream.py)")
    sp.add_argument("--post-train", type=int, default=None)
    sp.add_argument("--eval-poses", default="est", choices=["est", "gt"],
                    help="render eval views at the estimated (trained-with) "
                         "poses or at ground-truth poses")
    sp.add_argument("--point-budget", type=int, default=4096)
    sp.add_argument("--capacity", type=int, default=0)
    sp.add_argument("--save", default="")
    sp.add_argument("--checkpoint", default="",
                    help="save the full SLAM state (map + Adam + PRNG) here")
    sp.add_argument("--resume", default="",
                    help="restore a --checkpoint state (and its config) "
                         "before running")
    sp.add_argument("--traj-out", default="",
                    help="write the estimated trajectory (TUM format)")
    sp.add_argument("--traj-plot", default="",
                    help="write a top-down est-vs-gt trajectory PNG")
    sp.set_defaults(fn=cmd_run_slam)

    sp = sub.add_parser("train")
    add_dataset_args(sp)
    sp.add_argument("--iters", type=int, default=2000)
    sp.add_argument("--capacity", type=int, default=0)
    sp.add_argument("--save", default="")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("run-gicp")
    add_dataset_args(sp, kitti=True)
    sp.add_argument("--method", default="gicp", choices=["gicp", "vgicp"])
    sp.add_argument("--mode", default="scan", choices=["scan", "map"],
                    help="scan: scan-to-scan deltas (gicp_odometry2.py / "
                         "kitti.cpp); map: scan-to-keyframe-map "
                         "(using_previous_30_*.py)")
    sp.add_argument("--keyframe-every", type=int, default=30)
    sp.add_argument("--downsample", type=float, default=0.0,
                    help="voxel-grid leaf size in m (kitti.cpp uses 0.25)")
    sp.add_argument("--out-poses", default="",
                    help="write estimated poses in KITTI 3x4 format "
                         "(the reference harness's /tmp/traj.txt)")
    sp.add_argument("--traj-plot", default="",
                    help="write a top-down est-vs-gt trajectory PNG")
    sp.set_defaults(fn=cmd_run_gicp)

    sp = sub.add_parser("render")
    sp.add_argument("--map", required=True)
    sp.add_argument("--pose", default="")
    sp.add_argument("--out", default="render.png")
    sp.add_argument("--width", type=int, default=640)
    sp.add_argument("--height", type=int, default=480)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("viewer")
    sp.add_argument("--map", required=True)
    sp.add_argument("--port", type=int, default=6009)
    sp.set_defaults(fn=cmd_viewer)

    sp = sub.add_parser("eval")
    add_dataset_args(sp)
    sp.add_argument("--map", required=True)
    sp.add_argument("--every", type=int, default=1)
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("align")
    sp.add_argument("--target", required=True)
    sp.add_argument("--source", required=True)
    sp.add_argument("--method", default="all")
    sp.add_argument("--n", type=int, default=10)
    sp.add_argument("--downsample", type=float, default=-1.0)
    sp.add_argument("--voxel-resolution", type=float, default=1.0)
    sp.set_defaults(fn=cmd_align)

    sp = sub.add_parser("serve")
    add_dataset_args(sp)
    sp.add_argument("--port", type=int, default=7011)
    sp.add_argument("--hz", type=float, default=0.0,
                    help="publish rate (0 = as fast as the consumer reads)")
    sp.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
