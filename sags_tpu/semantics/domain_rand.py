"""Domain randomization for the semantic stack's training data and gates.

Round-3 VERDICT weak #4: every segmentation IoU gate ran on the cleanest
possible distribution (noise-free procedural renders). Real keyframes carry
sensor noise, exposure drift, motion blur and codec artifacts — the
reference's MobileSAMv2 weights were trained on real photos and shrug these
off (`scripts/gaussian_splatting.py:493-580`); ours must be shown to.

All distortions here are GEOMETRY-PRESERVING (no warps), so instance boxes
and masks stay valid labels for the distorted image. Host-side numpy: used
at dataset-build time (`models/sam_train.py`) and in the quality gates
(`tests/test_semantics_quality.py`) — never in a jit hot path.
"""

from __future__ import annotations

import io

import numpy as np


def domain_randomize(
    img: np.ndarray,  # [3,H,W] float32 in [0,1]
    rng: np.random.Generator,
    strength: float = 1.0,
    jpeg_prob: float = 0.5,
) -> np.ndarray:
    """One random draw of the full distortion pipeline:
    exposure gain → gamma → Gaussian blur → Gaussian + shot noise →
    (probabilistic) JPEG round-trip. `strength` scales every magnitude."""
    s = float(strength)
    x = np.asarray(img, np.float32).copy()

    # exposure / gamma jitter
    gain = 2.0 ** rng.uniform(-0.5 * s, 0.5 * s)
    gamma = 2.0 ** rng.uniform(-0.4 * s, 0.4 * s)
    x = np.clip(x * gain, 0.0, 1.0) ** gamma

    # blur (motion/defocus stand-in): isotropic Gaussian
    sigma = rng.uniform(0.0, 1.2 * s)
    if sigma > 0.05:
        from scipy.ndimage import gaussian_filter

        x = gaussian_filter(x, sigma=(0.0, sigma, sigma))

    # sensor noise: signal-dependent (shot) + read (Gaussian)
    shot = rng.uniform(0.0, 0.04 * s)
    read = rng.uniform(0.0, 0.03 * s)
    noise = rng.normal(0.0, 1.0, x.shape).astype(np.float32)
    x = x + noise * np.sqrt(np.clip(x, 0.0, 1.0)) * shot
    x = x + rng.normal(0.0, read, x.shape).astype(np.float32)
    x = np.clip(x, 0.0, 1.0)

    # codec artifacts: real JPEG round-trip (PIL), quality scaled by strength
    if rng.uniform() < jpeg_prob:
        x = jpeg_roundtrip(x, quality=int(rng.uniform(92 - 62 * s, 92 - 22 * s)))
    return x.astype(np.float32)


def jpeg_roundtrip(img: np.ndarray, quality: int = 50) -> np.ndarray:
    """[3,H,W] float32 → JPEG encode/decode at `quality` → float32."""
    from PIL import Image

    u8 = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    pil = Image.fromarray(u8.transpose(1, 2, 0))
    buf = io.BytesIO()
    pil.save(buf, format="JPEG", quality=int(np.clip(quality, 5, 95)))
    buf.seek(0)
    dec = np.asarray(Image.open(buf), np.float32) / 255.0
    return dec.transpose(2, 0, 1)
