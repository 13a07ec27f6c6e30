"""Eval-surface tests: the reference's PSNR/SSIM/LPIPS triple
(`scripts/gaussian_splatting.py:405-443`) must be reachable from every eval
path, with LPIPS non-null even without torchmetrics (eval/lpips_jax.py)."""

import numpy as np

from sags_tpu.eval.lpips_jax import lpips_backend, lpips_jax
from sags_tpu.eval.metrics import evaluate_pair


def _img(seed=0, shape=(3, 48, 64)):
    rng = np.random.default_rng(seed)
    # smooth-ish image: perceptual metrics are built for natural statistics
    x = rng.uniform(0, 1, shape).astype(np.float32)
    k = np.ones((1, 5, 5), np.float32) / 25.0
    from scipy.ndimage import convolve

    return np.clip(convolve(x, k, mode="nearest"), 0, 1)


def test_lpips_identity_is_zero():
    a = _img(0)
    assert lpips_jax(a, a) < 1e-6


def test_lpips_orders_distortions():
    """More distortion ⇒ larger distance — the property that makes the
    fallback valid as a regression metric."""
    a = _img(0)
    rng = np.random.default_rng(1)
    n1 = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    n2 = np.clip(a + rng.normal(0, 0.25, a.shape).astype(np.float32), 0, 1)
    d0, d1, d2 = lpips_jax(a, a), lpips_jax(a, n1), lpips_jax(a, n2)
    assert d0 < d1 < d2, (d0, d1, d2)


def test_lpips_deterministic_across_calls():
    a, b = _img(0), _img(3)
    assert lpips_jax(a, b) == lpips_jax(a, b)


def test_evaluate_pair_reports_full_triple():
    a, b = _img(0), _img(3)
    out = evaluate_pair(a, b)
    assert set(out) >= {"psnr", "ssim", "lpips", "lpips_net"}
    assert out["lpips"] is not None and np.isfinite(out["lpips"])
    # backend honesty: without a real weights file this must NOT claim alex
    assert out["lpips_net"] == lpips_backend()
    assert out["lpips_net"] in ("alex", "random_alex")


def test_pipeline_evaluate_carries_lpips():
    """SLAMPipeline.evaluate (the cmd_eval path) includes the third metric."""
    from sags_tpu.core.config import MapConfig, RasterizeConfig, SLAMConfig
    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.slam.pipeline import SLAMPipeline

    cfg = SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128,
                               chunk=32),
        map=MapConfig(initial_capacity=4096, initial_scale=0.08),
        post_train_iters=0,
    )
    ds = list(SyntheticDataset(n_frames=2, width=64, height=48, n_world=512,
                               pts_per_frame=256))
    pipe = SLAMPipeline(cfg, point_budget=256, rng_seed=0)
    pipe.run(ds, post_train=0)
    scores = pipe.evaluate(ds[:1])
    assert scores and scores[0]["lpips"] is not None
    assert np.isfinite(scores[0]["lpips"])
    assert scores[0]["lpips_net"] in ("alex", "random_alex")
