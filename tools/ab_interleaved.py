"""Interleaved A/B bench for RasterizeConfig knobs on the real chip.

The shared tunnel/chip drifts over minutes (docs/PERFORMANCE.md), so
sequential A-then-B comparisons are worthless. This harness alternates the
two arms round-by-round with a fresh RTT baseline per round and reports
per-arm medians/mins — the methodology every accepted perf decision in
docs/PERFORMANCE.md used.

Usage:
  python tools/ab_interleaved.py window_prefetch=False window_prefetch=True
  python tools/ab_interleaved.py "chunk=64" "chunk=128" --rounds 6

Each positional arg is a comma-separated list of RasterizeConfig field
overrides (values parsed with ast.literal_eval). Scene = bench.py's 720p
operating point.
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_overrides(spec: str) -> dict:
    out = {}
    for item in spec.split(","):
        k, v = item.split("=", 1)
        out[k.strip()] = ast.literal_eval(v.strip())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arms", nargs="+", help="config override specs")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--gaussians", type=int, default=262144)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--check", action="store_true",
                    help="assert all arms produce the same checksum")
    ap.add_argument("--derive", action="store_true",
                    help="apply derive_windowed_budgets (occupancy probe) "
                         "to each arm's config after overrides")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from sags_tpu.core.camera import make_camera
    from sags_tpu.core.config import RasterizeConfig
    from sags_tpu.ops import rasterize as rz

    W, H = (int(x) for x in args.size.split("x"))
    P = args.gaussians
    rng = np.random.default_rng(0)
    z = rng.uniform(2.0, 12.0, (P, 1))
    xy = rng.uniform(-0.55, 0.55, (P, 2)) * z * np.array([1.6, 0.9])
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = np.exp(rng.normal(np.log(0.02), 0.5, (P, 3))).clip(0.004, 0.12)
    scales = scales.astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (P,)).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    objs = rng.normal(size=(P, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.75)
    base = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=512,
                           chunk=64, remat=False)
    dev_args = tuple(jnp.asarray(a)
                     for a in (means, opac, scales, quats, colors, objs))
    variants = [
        (dev_args[0], dev_args[1] * (1.0 - 0.001 * v), *dev_args[2:])
        for v in range(4)
    ]

    fns, sums = [], []
    for spec in args.arms:
        cfg = dataclasses.replace(base, **parse_overrides(spec))
        if args.derive:
            occ = {k: np.asarray(v) for k, v in jax.jit(
                lambda m, o, s, q, c=cfg: rz.windowed_occupancy(
                    m, o, s, q, cam, c)
            )(*dev_args[:4]).items()}
            cfg = rz.derive_windowed_budgets(cfg, occ, P)

        def render(means, opac, scales, quats, colors, objs, cfg=cfg):
            out = rz.rasterize(means, opac, scales, quats, cam, cfg,
                               colors=colors, obj_features=objs)
            return out.color.sum()

        f = jax.jit(render)
        s = float(f(*dev_args))  # compile + warmup
        fns.append(f)
        sums.append(s)
        print(f"arm[{spec}]: checksum={s:.6f}", file=sys.stderr)
    if args.check:
        for s in sums[1:]:
            assert abs(s - sums[0]) < 1e-3 * max(1.0, abs(sums[0])), sums

    per_arm = [[] for _ in args.arms]
    for r in range(args.rounds):
        rtt = bench.measure_rtt()
        for ai, f in enumerate(fns):
            times = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                o = f(*variants[i % 4])
                float(o)
                times.append(time.perf_counter() - t0)
            dt = max(float(np.median(times)) - rtt, 1e-6)
            per_arm[ai].append(dt)
            print(f"round {r} arm[{args.arms[ai]}]: {dt*1000:.2f} ms "
                  f"(rtt {rtt*1000:.1f})", file=sys.stderr)

    print()
    for ai, spec in enumerate(args.arms):
        ts = np.array(per_arm[ai]) * 1000
        print(f"{spec:40s} median {np.median(ts):6.2f} ms  "
              f"min {ts.min():6.2f} ms  (n={len(ts)})")
    # Paired per-round deltas vs arm 0: the chip has multi-minute speed
    # phases, so the paired difference (both arms measured seconds apart
    # inside one round) is far lower-variance than cross-round medians.
    base = np.array(per_arm[0]) * 1000
    for ai, spec in enumerate(args.arms[1:], start=1):
        d = np.array(per_arm[ai]) * 1000 - base
        wins = int((d < 0).sum())
        print(f"delta[{spec} - {args.arms[0]}]: "
              f"median {np.median(d):+6.2f} ms  mean {d.mean():+6.2f} ms  "
              f"faster in {wins}/{len(d)} rounds")


if __name__ == "__main__":
    main()
