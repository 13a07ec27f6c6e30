"""Semantic classifier head: 1×1 conv over rendered object features.

Reference: `torch.nn.Conv2d(num_objects=16, num_classes=100, kernel_size=1)`
with its own Adam(lr=5e-4) (`scripts/gaussian_splatting.py:215-218`). A 1×1
conv over [16,H,W] is a channel matmul — MXU-friendly as an einsum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ClassifierParams(NamedTuple):
    weight: jax.Array  # [num_classes, num_objects]
    bias: jax.Array  # [num_classes]


def init_classifier(rng, num_objects: int = 16, num_classes: int = 100) -> ClassifierParams:
    # torch Conv2d default init: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in) for both
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(num_objects)
    w = jax.random.uniform(k1, (num_classes, num_objects), minval=-bound, maxval=bound)
    b = jax.random.uniform(k2, (num_classes,), minval=-bound, maxval=bound)
    return ClassifierParams(w, b)


def apply_classifier(params: ClassifierParams, objects: jax.Array) -> jax.Array:
    """objects [O,H,W] → logits [K,H,W]."""
    return (
        jnp.einsum("ohw,ko->khw", objects, params.weight,
                   precision=jax.lax.Precision.HIGHEST)
        + params.bias[:, None, None]
    )


def apply_classifier_features(params: ClassifierParams, feats: jax.Array) -> jax.Array:
    """Per-Gaussian features [N,O] → logits [N,K] (the `logits3d` path,
    `scripts/gaussian_splatting.py:812-813`)."""
    return feats @ params.weight.T + params.bias[None, :]


def make_classifier_optimizer(lr: float = 5e-4):
    return optax.adam(lr)
