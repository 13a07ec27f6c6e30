"""Device timing of the GICP tracking programs at the pipeline operating
point (4096-point scans, k=10 covariances, LM loop) — the dominant cost of
the online frame after the round-4 chatter fixes.

Usage: python tools/gicp_time.py [--points 4096] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (persistent compile cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from sags_tpu.core.config import GICPConfig
    from sags_tpu.ops import gicp as gicp_ops

    N = args.points
    rng = np.random.default_rng(0)
    world = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    world[:, 2] += 6
    ang = 0.02
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.05, 0.02, 0.0], np.float32)
    src = (world - t) @ R
    cfg = GICPConfig()
    msk = jnp.ones(N, bool)
    A = (jnp.asarray(src), jnp.asarray(world), msk, msk, jnp.eye(4))

    variants = [
        (A[0] * (1.0 + 1e-5 * v), *A[1:]) for v in range(4)
    ]

    import jax

    @jax.jit
    def covs_fn(p, m):
        return gicp_ops.estimate_covariances(
            p, m, cfg.k_correspondences, cfg.knn_max_distance,
            cfg.regularization).covs

    src_c = covs_fn(A[0], msk)
    tgt_c = covs_fn(A[1], msk)

    def run(a):
        res = gicp_ops.gicp_align(a[0], a[1], a[2], a[3], a[4], cfg)
        return res.T, res.iterations, res.converged

    def run_with_covs(a):
        res = gicp_ops.gicp_align(a[0], a[1], a[2], a[3], a[4], cfg,
                                  source_covs=src_c, target_covs=tgt_c)
        return res.T, res.iterations, res.converged

    T, it, cv = run(A)  # compile + warm
    print(f"# converged={bool(cv)} iters={int(it)} "
          f"T[0,3]={float(T[0, 3]):.4f} (expect ~{t[0]})", file=sys.stderr)
    progs = [("align_full", run, variants),
             ("covs_only", lambda a: (covs_fn(a[0], msk), 0, 0), variants),
             ("align_covs_given", run_with_covs, variants)]
    for name, fn, vs in progs:
        fn(vs[0])
        for r in range(args.rounds):
            rtt = bench.measure_rtt()
            ts = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                out = fn(vs[i % 4])
                float(np.asarray(out[0]).ravel()[0])
                ts.append(time.perf_counter() - t0)
            dt = max(float(np.median(ts)) - rtt, 0.0)
            print(f"round {r}: {name} {dt*1000:.1f} ms device "
                  f"(rtt {rtt*1000:.1f})")


if __name__ == "__main__":
    main()
