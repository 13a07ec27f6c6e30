"""Rendering-quality metrics: PSNR / SSIM / (optional) LPIPS.

Reference: `calc_2d_metric` evaluates every 100th saved frame with
PSNR (mse2psnr), SSIM, LPIPS(alex) (`scripts/gaussian_splatting.py:405-443`,
`utils/image_utils.py`). LPIPS requires pretrained AlexNet weights — gated on
availability (zero-egress environments skip it).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from sags_tpu.utils.losses import ssim as _ssim


def mse2psnr(mse: float) -> float:
    """`mse2psnr` — -10 log10(mse)."""
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def psnr(pred: np.ndarray, gt: np.ndarray, mask_zeros: bool = True) -> float:
    """PSNR over [3,H,W] images; reference masks gt==0 pixels."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if mask_zeros:
        sel = gt != 0
        if not sel.any():
            return 0.0
        mse = float(np.mean((pred[sel] - gt[sel]) ** 2))
    else:
        mse = float(np.mean((pred - gt) ** 2))
    return mse2psnr(mse)


def ssim(pred: np.ndarray, gt: np.ndarray) -> float:
    _, s = _ssim(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32))
    return float(s)


_lpips_model = None


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """LPIPS(alex) if torchmetrics + weights are available, else None.

    Only true UNAVAILABILITY (missing package, undownloadable weights) maps
    to None — shape/dtype/compute errors propagate so a real bug can't hide
    behind the "LPIPS unavailable" answer.
    """
    global _lpips_model
    try:
        import torch
        from torchmetrics.image.lpip import (
            LearnedPerceptualImagePatchSimilarity,
        )
    except ImportError:
        return None
    if _lpips_model is None:
        try:
            _lpips_model = LearnedPerceptualImagePatchSimilarity(net_type="alex")
        except (OSError, RuntimeError, ValueError):
            # weights not downloadable in an egress-less environment
            return None
    a = torch.from_numpy(np.asarray(pred, np.float32))[None] * 2 - 1
    b = torch.from_numpy(np.asarray(gt, np.float32))[None] * 2 - 1
    with torch.no_grad():
        return float(_lpips_model(a, b))


def evaluate_pair(pred: np.ndarray, gt: np.ndarray) -> Dict[str, Optional[float]]:
    """The reference's metric triple. LPIPS falls back to the JAX
    implementation (`eval/lpips_jax.py`) when torchmetrics is absent, so it
    is non-null in zero-egress environments (backend reported)."""
    from sags_tpu.eval.lpips_jax import lpips_any, lpips_backend

    return {
        "psnr": psnr(pred, gt),
        "ssim": ssim(pred, gt),
        "lpips": lpips_any(pred, gt),
        "lpips_net": lpips_backend(),
    }
