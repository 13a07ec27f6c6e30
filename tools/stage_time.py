"""Per-stage device timing of the windowed exact render at the bench point.

Times four jitted sub-programs with per-iteration value-fetch sync minus the
tunnel RTT baseline (the only trustworthy methodology on this runtime — see
docs/PERFORMANCE.md "Timing methodology"):

  pack    — preprocess + row pack + anchor sort + the [P,40] row gather
  prepare — everything the XLA prepare program does (pack + pair expansion +
            pair sort + table build + window-local translate + span plan)
  kernel  — the Pallas windowed compositor alone (prepared inputs frozen)
  full    — the complete render (bench.py's headline program)

Usage: python tools/stage_time.py [--iters 12] [--rounds 3] [--no-derive]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--gaussians", type=int, default=262144)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--no-derive", action="store_true")
    ap.add_argument("--micro", action="store_true",
                    help="also time isolated prepare sub-stages (pair sort "
                         "at the real lane count, tier-compaction "
                         "partitions, window-local translate) on synthetic "
                         "data of the same shapes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from sags_tpu.core.camera import make_camera
    from sags_tpu.core.config import RasterizeConfig
    from sags_tpu.ops import rasterize as rz

    W, H = (int(x) for x in args.size.split("x"))
    P = args.gaussians
    tiles_x, tiles_y = -(-W // 16), -(-H // 16)
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
    cfg = RasterizeConfig(
        max_tiles_per_gaussian=16, tile_capacity=512, chunk=64, remat=False,
        windowed_big_capacity=256, feature_precision="default",
    )
    A = tuple(jnp.asarray(a) for a in (means, opac, scales, quats, colors,
                                       objs))
    if not args.no_derive:
        occ = {k: np.asarray(v) for k, v in jax.jit(
            lambda m, o, s, q: rz.windowed_occupancy(m, o, s, q, cam, cfg)
        )(*A[:4]).items()}
        cfg = rz.derive_windowed_budgets(cfg, occ, P)
        print(f"# derived: expand={cfg.windowed_expand_frac:.3f} "
              f"blocks={cfg.window_blocks}", file=sys.stderr)
    variants = [(A[0], A[1] * (1.0 - 0.001 * v), *A[2:]) for v in range(4)]

    def pack_fn(m, o, s, q, c, f):
        pre = rz.preprocess(m, o, s, q, cam, cfg, colors=c)
        G = rz._pack_gaussians(pre, f, extras=True)
        NT = tiles_x * tiles_y
        anchor = jnp.where(pre.valid, pre.rmin_y * tiles_x + pre.rmin_x, NT)
        akey = (anchor << 16) | rz._depth_quant(pre)
        iota = jnp.arange(G.shape[0], dtype=jnp.int32)
        akey_s, perm = jax.lax.sort((akey, iota), num_keys=1)
        G_s = G[perm]
        return G_s[:, 0].sum() + akey_s[-1]

    def prepare_fn(m, o, s, q, c, f):
        pre = rz.preprocess(m, o, s, q, cam, cfg, colors=c)
        outs = rz._prepare_windowed(pre, f, tiles_x, tiles_y, cfg)
        G_s, table, table_local, counts = outs[:4]
        return (G_s[:, 0].sum() + table_local.sum() + counts.sum()
                + outs[4].sum() + outs[5].sum() + outs[6].sum())

    def full_fn(m, o, s, q, c, f):
        out = rz.rasterize(m, o, s, q, cam, cfg, colors=c, obj_features=f)
        return out.color.sum()

    # kernel-only: freeze one prepared input set on device
    prep_j = jax.jit(lambda m, o, s, q, c, f: rz._prepare_windowed(
        rz.preprocess(m, o, s, q, cam, cfg, colors=c), f, tiles_x, tiles_y,
        cfg))
    prepared = prep_j(*A)
    G_s, table, table_local, counts, bases, dests, nblks = prepared[:7]
    n_feat = 3 + 16 + 4

    def kernel_fn(G_s, dummy):
        acc, T = rz._composite_windowed_with_xla_vjp(
            G_s, table, table_local, counts, bases, dests, nblks,
            n_feat, tiles_x, tiles_y, cfg)
        return acc[..., :3].sum() + dummy

    G_variants = [(G_s * (1.0 + 1e-6 * v), jnp.float32(v)) for v in range(4)]

    progs = [
        ("pack", jax.jit(pack_fn), variants),
        ("prepare", jax.jit(prepare_fn), variants),
        ("kernel", jax.jit(kernel_fn), G_variants),
        ("full", jax.jit(full_fn), variants),
    ]

    if args.micro:
        # lane counts as _prepare_windowed builds them from this cfg
        R = int(round(cfg.max_tiles_per_gaussian ** 0.5))
        n_copies = 0
        if cfg.windowed_big_capacity > 0:
            for cap_t, frac_t in cfg.windowed_store_fracs:
                if cap_t <= R:
                    continue
                pb = min(max(int(P * frac_t) // 128 * 128, 128), P)
                n_copies += (-(-min(cap_t, cfg.windowed_store_max_rect)
                               // R)) ** 2 * pb
        P_all = P + n_copies
        ef = cfg.windowed_expand_frac
        PE = P_all if ef >= 1.0 else min(-(-int(P_all * ef) // 128) * 128,
                                         P_all)
        PM = max(int(P * cfg.windowed_mid_frac) // 128 * 128, 128)
        PB = max(int(P * cfg.windowed_big_frac) // 128 * 128, 128)
        crf = cfg.windowed_copy_ring_frac
        NC = -(-max(int(n_copies * crf), 1) // 128) * 128 if n_copies else 0
        lanes = 4 * PE + 5 * PM + 12 * PB + 12 * NC
        print(f"# micro shapes: PE={PE} PM={PM} PB={PB} NC={NC} "
              f"pair_lanes={lanes}", file=sys.stderr)
        kk = jnp.asarray(rng.integers(0, 1 << 30, lanes, dtype=np.int32))
        gg = jnp.asarray(rng.integers(0, P_all, lanes, dtype=np.int32))

        def pair_sort_fn(k, g):
            ks, gs = jax.lax.sort((k, g), num_keys=2)
            return ks[-1] + gs[-1]

        sel = jnp.asarray(rng.integers(0, 2, PE, dtype=np.int32))
        iota_pe = jnp.arange(PE, dtype=jnp.int32)

        def partition4_fn(s, d):
            tot = d
            for i in range(4):
                _, idx = jax.lax.sort(((s + i) % 2, iota_pe), num_keys=1)
                tot = tot + idx[0]
            return tot

        NT = tiles_x * tiles_y
        K = cfg.tile_capacity
        tbl = jnp.asarray(
            rng.integers(-1, P_all, (NT, K), dtype=np.int32))
        rs = jnp.asarray(np.sort(rng.integers(0, P_all, NT + 1))
                         .astype(np.int32))

        def translate_fn(table, d):
            t_iota = jnp.arange(NT, dtype=jnp.int32)
            ty2, tx2 = t_iota // tiles_x, t_iota % tiles_x
            col0 = jnp.maximum(tx2 - (R - 1), 0)
            local = jnp.full_like(table, -1)
            dest = jnp.zeros_like(t_iota)
            for j in range(R):
                row = ty2 - (R - 1) + j
                rowc = jnp.maximum(row, 0)
                s_j = jnp.where(row >= 0, rs[rowc * tiles_x + col0], 0)
                e_j = jnp.where(row >= 0, rs[
                    jnp.minimum(rowc * tiles_x + tx2 + 1, NT)], 0)
                base_j = s_j // 128
                nblk = jnp.where(e_j > s_j,
                                 -((base_j * 128 - e_j) // 128), 0)
                offs = table - base_j[:, None] * 128
                m = ((table >= s_j[:, None]) & (table < e_j[:, None])
                     & (offs < nblk[:, None] * 128))
                local = jnp.where(m, dest[:, None] * 128 + offs, local)
                dest = dest + nblk
            return local.sum() + d

        dv = [jnp.float32(v) for v in range(4)]
        progs += [
            ("pair_sort", jax.jit(pair_sort_fn),
             [(kk + v, gg) for v in range(4)]),
            ("partition4", jax.jit(partition4_fn),
             [(sel, d) for d in dv]),
            ("translate", jax.jit(translate_fn),
             [(tbl, d) for d in dv]),
        ]
    for name, f, vs in progs:
        float(np.asarray(f(*vs[0])).ravel()[0])  # compile+warm

    results = {n: [] for n, _, _ in progs}
    for r in range(args.rounds):
        rtt = bench.measure_rtt()
        for name, f, vs in progs:
            ts = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                out = f(*vs[i % 4])
                float(np.asarray(out).ravel()[0])
                ts.append(time.perf_counter() - t0)
            dt = max(float(np.median(ts)) - rtt, 0.0)
            results[name].append(dt)
            print(f"round {r} {name:8s} {dt*1000:6.2f} ms (rtt {rtt*1000:.1f})",
                  file=sys.stderr)
    print()
    for name in results:
        ts = np.array(results[name]) * 1000
        print(f"{name:8s} median {np.median(ts):6.2f} ms  min {ts.min():6.2f}")


if __name__ == "__main__":
    main()
