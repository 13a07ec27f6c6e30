"""Benchmark: 720p splatting render FPS on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the repo target of 30 FPS at 720p (BASELINE.md — the reference
publishes no numbers; 30 FPS on a v5e-8 is the north-star gate).

Env knobs: SAGS_BENCH_GAUSSIANS (default 262144), SAGS_BENCH_W/H (1280x720),
SAGS_BENCH_ITERS (20), SAGS_BENCH_MODE (render|train).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sags_tpu.core.camera import make_camera
    from sags_tpu.core.config import RasterizeConfig
    from sags_tpu.ops import rasterize as rz

    P = int(os.environ.get("SAGS_BENCH_GAUSSIANS", 262144))
    W = int(os.environ.get("SAGS_BENCH_W", 1280))
    H = int(os.environ.get("SAGS_BENCH_H", 720))
    iters = int(os.environ.get("SAGS_BENCH_ITERS", 20))
    tile_capacity = int(os.environ.get("SAGS_BENCH_TILE_CAP", 512))
    chunk = int(os.environ.get("SAGS_BENCH_CHUNK", 64))

    rng = np.random.default_rng(0)
    # A 720p-filling scene: gaussians spread over the frustum, small scales so
    # per-tile queues stay realistic (indoor SLAM operating point).
    z = rng.uniform(2.0, 12.0, (P, 1))
    xy = rng.uniform(-0.55, 0.55, (P, 2)) * z * np.array([1.6, 0.9])
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = (rng.uniform(0.004, 0.02, (P, 3)) * z).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (P,)).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    objs = rng.normal(size=(P, 16)).astype(np.float32)

    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.75)
    cfg = RasterizeConfig(
        max_tiles_per_gaussian=16, tile_capacity=tile_capacity, chunk=chunk,
        remat=False,
    )

    args = tuple(jnp.asarray(a) for a in (means, opac, scales, quats, colors, objs))

    @jax.jit
    def render(means, opac, scales, quats, colors, objs):
        out = rz.rasterize(means, opac, scales, quats, cam, cfg,
                           colors=colors, obj_features=objs)
        return out.color, out.depth, out.n_binned, out.overflow_tile

    # compile + warmup
    out = render(*args)
    jax.block_until_ready(out)
    n_binned, overflow = int(out[2]), int(out[3])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = render(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    result = {
        "metric": f"720p_render_fps_{P//1024}k_gaussians",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }
    print(json.dumps(result))
    print(
        f"# {W}x{H}, {P} gaussians, {n_binned} binned pairs, overflow={overflow}, "
        f"{dt*1000:.1f} ms/frame, device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
