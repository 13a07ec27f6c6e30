"""Image losses — jnp ports of `utils/loss_utils.py`.

The reference masks L1/SSIM by `gt != 0`, which (documented there as a latent
quirk) also masks true-black pixels; we keep the behavior behind `mask_zeros`
so SLAM parity holds, but callers can disable it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jax.Array, gt: jax.Array, mask_zeros: bool = True):
    """Returns (map, mean) like `loss_utils.py:17-20`."""
    loss = jnp.abs(pred - gt)
    if mask_zeros:
        loss = jnp.where(gt != 0, loss, 0.0)
    return loss, jnp.mean(loss)


def l2_loss(pred: jax.Array, gt: jax.Array, mask_zeros: bool = True):
    loss = (pred - gt) ** 2
    if mask_zeros:
        loss = jnp.where(gt != 0, loss, 0.0)
    return jnp.mean(loss)


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size)
    g = np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def _depthwise_conv(img: jax.Array, window: jax.Array, pad: int) -> jax.Array:
    """img [C,H,W] -> same-shape depthwise conv with zero padding (as torch)."""
    C = img.shape[0]
    lhs = img[None]  # [1,C,H,W]
    rhs = jnp.tile(window[None, None], (C, 1, 1, 1))  # [C,1,k,k]
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def ssim(
    img: jax.Array,
    gt: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    mask_zeros: bool = True,
):
    """SSIM with an 11×11 σ=1.5 Gaussian window (`loss_utils.py:27-69`).

    Args are [C,H,W]. Returns (ssim_map, mean).
    """
    if mask_zeros:
        img = jnp.where(gt != 0, img, 0.0)
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    pad = window_size // 2
    conv = lambda x: _depthwise_conv(x, window, pad)

    mu1, mu2 = conv(img), conv(gt)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img * img) - mu1_sq
    sigma2_sq = conv(gt * gt) - mu2_sq
    sigma12 = conv(img * gt) - mu1_mu2

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map, jnp.mean(ssim_map)


def rgb_loss(pred: jax.Array, gt: jax.Array, lambda_dssim: float = 0.2):
    """(1−λ)·L1 + λ·(1−SSIM) — the SLAM node's photometric loss
    (`scripts/gaussian_splatting.py:805-810`)."""
    _, l1 = l1_loss(pred, gt)
    _, s = ssim(pred, gt)
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - s)
