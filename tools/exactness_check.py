"""Quantify the visual cost of the windowed tier caps at the bench point.

Renders the exact bench.py scene twice — default config vs the store-tier
EXACT config (windowed_big_capacity=256, every alpha-live pair composited) —
and reports PSNR / max|Δ| between them, plus both overflow counter sets.
This is the honesty companion to the headline FPS: the overflow counters
count *potential* pairs outside the covered window, most of which the exact
alpha cull (rcull2) would zero anyway; this measures what actually differs.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from sags_tpu.core.camera import make_camera
    from sags_tpu.core.config import RasterizeConfig
    from sags_tpu.ops import rasterize as rz

    P = int(os.environ.get("SAGS_BENCH_GAUSSIANS", 262144))
    W = int(os.environ.get("SAGS_BENCH_W", 1280))
    H = int(os.environ.get("SAGS_BENCH_H", 720))

    rng = np.random.default_rng(0)
    z = rng.uniform(2.0, 12.0, (P, 1))
    xy = rng.uniform(-0.55, 0.55, (P, 2)) * z * np.array([1.6, 0.9])
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = np.exp(rng.normal(np.log(0.02), 0.5, (P, 3))).clip(0.004, 0.12)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (P,)).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    objs = rng.normal(size=(P, 16)).astype(np.float32)
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.75)
    A = tuple(jnp.asarray(a) for a in
              (means.astype(np.float32), opac, scales.astype(np.float32),
               quats, colors, objs))

    def render(cfg):
        out = jax.jit(lambda *a: rz.rasterize(
            a[0], a[1], a[2], a[3], cam, cfg, colors=a[4],
            obj_features=a[5]))(*A)
        ov = dict(tile=int(out.overflow_tile), rect=int(out.overflow_rect),
                  window=int(out.overflow_window), big=int(out.overflow_big))
        return np.asarray(out.color), ov

    base = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=512,
                           chunk=64, remat=False)
    import dataclasses
    exact = dataclasses.replace(base, windowed_big_capacity=256)

    img_d, ov_d = render(base)
    img_e, ov_e = render(exact)
    d = img_d - img_e
    mse = float(np.mean(d * d))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    print(json.dumps({
        "psnr_default_vs_exact_db": round(psnr, 2),
        "max_abs": round(float(np.abs(d).max()), 5),
        "pix_gt_1pct": int((np.abs(d).max(0) > 0.01).sum()),
        "overflow_default": ov_d,
        "overflow_exact": ov_e,
    }))


if __name__ == "__main__":
    main()
