"""Per-phase wall-time split of the online SLAM loop at the bench.py
operating point — finds where the per-frame time goes on a tunneled chip
(every host↔device interaction pays the tunnel RTT; on a local TPU those
are sub-ms).

Wraps SLAMPipeline._track / add_fn / _train_once / _make_objects with
timers and reports per-phase medians over the steady-state tail.

Usage: python tools/pipeline_phase_time.py [--frames 24]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (enables the persistent compile cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    args = ap.parse_args()

    from sags_tpu.core.config import (KeyframeConfig, MapConfig,
                                      RasterizeConfig, SLAMConfig,
                                      TrackingConfig)
    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.slam.pipeline import SLAMPipeline

    cfg = SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=512,
                               chunk=64),
        map=MapConfig(initial_capacity=131072),
        keyframes=KeyframeConfig(keyframe_freq=5, window=16),
        tracking=TrackingConfig(backend="gicp", max_points=4096),
        post_train_iters=0,
    )
    ds = SyntheticDataset(n_frames=args.frames, width=640, height=512,
                          n_world=65536, pts_per_frame=8192, step=0.15,
                          clutter=0.3)
    pipe = SLAMPipeline(cfg, point_budget=8192, rng_seed=0)

    phases = {"track": [], "add": [], "objects": [], "train": []}

    orig_track = pipe._track
    orig_add = pipe.add_fn
    orig_train = pipe._train_once
    orig_objects = pipe._make_objects

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            phases[name].append(time.perf_counter() - t0)
            return out
        return wrap

    pipe._track = timed("track", orig_track)
    pipe.add_fn = timed("add", orig_add)
    pipe._train_once = timed("train", orig_train)
    pipe._make_objects = timed("objects", orig_objects)

    t0 = time.time()
    res = pipe.run(ds, post_train=0)
    total = time.time() - t0
    tail = res.frame_times[len(res.frame_times) // 2:]
    print(f"total {total:.1f}s; steady-state frame "
          f"{np.median(tail)*1000:.0f} ms ({1/np.median(tail):.2f} Hz)")
    for name, ts in phases.items():
        if not ts:
            continue
        t = np.array(ts[len(ts) // 2:]) * 1000
        print(f"{name:8s} n={len(ts):3d}  median {np.median(t):7.1f} ms  "
              f"max {t.max():7.1f}")


if __name__ == "__main__":
    main()
