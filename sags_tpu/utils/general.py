"""General utilities — `utils/general_utils.py` parity surface.

`build_rotation` / `build_scaling_rotation` / `strip_symmetric` live in
`sags_tpu.core.transforms` (xyzw convention); re-exported here so code
written against the reference layout finds them. `get_expon_lr_func` wraps
`core.config.expon_lr`; `safe_state` seeds every RNG the stack touches.
"""

from __future__ import annotations

import random

import numpy as np

from sags_tpu.core.config import expon_lr
from sags_tpu.core.transforms import (  # noqa: F401  (re-exports)
    build_scaling_rotation,
    quat_to_rotmat as build_rotation,
)


def strip_symmetric(cov):
    """[...,3,3] symmetric → packed upper triangle [...,6] (CUDA layout)."""
    import jax.numpy as jnp

    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1
    )


def inverse_sigmoid(x):
    import jax.numpy as jnp

    return jnp.log(x / (1.0 - x))


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1_000_000):
    """`general_utils.py:33-66` — returns step → lr."""

    def helper(step):
        return expon_lr(step, lr_init, lr_final, lr_delay_steps, lr_delay_mult,
                        max_steps)

    return helper


def safe_state(seed: int = 0):
    """Seed python/numpy RNGs and return a jax PRNG key (`general_utils.py:
    123-144` seeds torch/numpy/random; XLA itself is deterministic)."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
