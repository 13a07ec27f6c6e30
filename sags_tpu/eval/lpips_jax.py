"""LPIPS — TPU-native (JAX) implementation of the perceptual metric the
reference reports per eval (`calc_2d_metric` uses torchmetrics
LPIPS(net_type="alex"), `scripts/gaussian_splatting.py:405-443,1055-1056`).

Computation follows Zhang et al. (CVPR'18): per-layer conv features of both
images are channel-unit-normalized, squared-differenced, channel-averaged
(the calibrated linear head; uniform when no calibration is shipped),
spatially averaged, and summed over layers.

Feature weights come from, in priority order:
  1. an `.npz` pointed at by `SAGS_LPIPS_WEIGHTS` (keys `convN_w` [Cout,Cin,
     kh,kw], optional `linN` [C] per layer) — a real AlexNet-LPIPS export
     drops in and this module reproduces the reference metric;
  2. a seeded FIXED random filter bank (`net = "random_alex"`), the
     documented fallback for this zero-egress environment: torchmetrics is
     not installed and no pretrained weights exist on disk, so the true
     calibrated metric is unobtainable offline. Random-feature perceptual
     distances preserve the multi-scale structure of LPIPS and move
     monotonically with the distortions SLAM eval cares about (blur, noise,
     misalignment) — valid as a PER-RUN REGRESSION metric, not comparable
     to published LPIPS numbers. The backend is always reported next to the
     value so no artifact can silently pass a surrogate off as the real one.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature-extractor shape (conv layers only, as used by LPIPS):
# (out_ch, in_ch, kernel, stride, padding)
_ALEX_LAYERS = (
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
)
# ImageNet normalization the torch implementation applies ([-1,1] inputs).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_weights():
    """Returns (list of [Cout,Cin,kh,kw] filters, list of [C] lin heads, tag)."""
    path = os.environ.get("SAGS_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        z = np.load(path)
        convs, lins = [], []
        for i in range(len(_ALEX_LAYERS)):
            convs.append(np.asarray(z[f"conv{i}_w"], np.float32))
            k = f"lin{i}"
            lins.append(
                np.asarray(z[k], np.float32) if k in z
                else np.full(convs[-1].shape[0],
                             1.0 / convs[-1].shape[0], np.float32)
            )
        return convs, lins, "alex"
    rng = np.random.default_rng(1234)  # FIXED: the metric must be stable
    convs, lins = [], []
    for (co, ci, k, _s, _p) in _ALEX_LAYERS:
        std = float(np.sqrt(2.0 / (ci * k * k)))  # He init
        convs.append(rng.normal(0.0, std, (co, ci, k, k)).astype(np.float32))
        lins.append(np.full(co, 1.0 / co, np.float32))
    return convs, lins, "random_alex"


@functools.lru_cache(maxsize=1)
def _model():
    convs, lins, tag = _load_weights()
    convs_j = [jnp.asarray(w) for w in convs]
    lins_j = [jnp.asarray(l) for l in lins]

    @jax.jit
    def distance(a: jax.Array, b: jax.Array) -> jax.Array:
        """a, b: [3,H,W] in [0,1]."""
        def feats(x):
            x = x * 2.0 - 1.0  # torch LPIPS takes [-1,1]
            x = (x - _SHIFT[:, None, None]) / _SCALE[:, None, None]
            x = x[None]  # NCHW
            out = []
            for w, (co, ci, k, s, p) in zip(convs_j, _ALEX_LAYERS):
                x = jax.lax.conv_general_dilated(
                    x, w, window_strides=(s, s), padding=[(p, p), (p, p)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                )
                x = jnp.maximum(x, 0.0)  # ReLU
                out.append(x)
                if len(out) in (1, 2):  # maxpool after conv1, conv2
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                        "VALID",
                    )
            return out

        fa, fb = feats(a), feats(b)
        total = 0.0
        for xa, xb, lin in zip(fa, fb, lins_j):
            na = xa / jnp.sqrt(jnp.sum(xa * xa, 1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb * xb, 1, keepdims=True) + 1e-10)
            d2 = (na - nb) ** 2  # [1,C,h,w]
            total = total + jnp.mean(
                jnp.sum(d2 * lin[None, :, None, None], axis=1)
            )
        return total

    return distance, tag


def lpips_backend() -> str:
    """Which feature bank is active: "alex" (real weights file) or
    "random_alex" (seeded surrogate — regression metric only)."""
    return _model()[1]


def lpips_jax(pred: np.ndarray, gt: np.ndarray) -> float:
    """Perceptual distance between [3,H,W] images in [0,1]."""
    fn, _ = _model()
    return float(fn(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32)))


def lpips_any(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """The best available LPIPS: torchmetrics LPIPS(alex) when installed
    (the reference's exact metric), else the JAX implementation above."""
    from sags_tpu.eval import metrics as _m

    v = _m.lpips(pred, gt)
    if v is not None:
        return v
    return lpips_jax(pred, gt)
