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


@functools.lru_cache(maxsize=16)
def _band_matrix(size: int, window_size: int, sigma: float) -> np.ndarray:
    """Banded blur matrix B so that (B @ v) == 1-D Gaussian conv with zero
    padding — the separable half of the SSIM window as a plain matmul
    (3-channel grouped convs are pathologically slow on TPU; two banded
    matmuls run on the MXU)."""
    x = np.arange(window_size)
    g = np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    B = np.zeros((size, size), np.float32)
    half = window_size // 2
    for i in range(size):
        for j, w in enumerate(g):
            k = i + j - half
            if 0 <= k < size:
                B[i, k] = w
    return B


def _depthwise_conv(img: jax.Array, window_size: int, sigma: float) -> jax.Array:
    """img [C,H,W] -> separable Gaussian blur via two banded matmuls."""
    C, H, W = img.shape
    Bh = jnp.asarray(_band_matrix(H, window_size, sigma))
    Bw = jnp.asarray(_band_matrix(W, window_size, sigma))
    out = jnp.einsum("ih,chw->ciw", Bh, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("jw,chw->chj", Bw, out,
                      precision=jax.lax.Precision.HIGHEST)


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
    conv = lambda x: _depthwise_conv(x, window_size, sigma)

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
