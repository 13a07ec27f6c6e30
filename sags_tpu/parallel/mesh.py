"""Device mesh + sharding specs for multi-chip SLAM.

The reference is a single-GPU stack whose only "distributed" layer is ROS
pub/sub + shared-memory tensors (SURVEY.md §2.11). The TPU-native scaling
axes are:

  * **tiles** — the render grid is embarrassingly parallel after binning
    (`rasterizer_impl.cu` launches one block per tile); we shard the per-tile
    work tables and pixel buffers over the `tiles` mesh axis and let GSPMD
    insert the all-reduce of per-Gaussian gradient contributions in backward.
  * **points** — GICP/ESIKF H/b reductions are a psum over point shards.

Everything goes through `jax.sharding` + sharding constraints inside one jit
program — XLA places collectives on ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the tile axis) across devices."""
    return NamedSharding(mesh, P(TILE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_tiles(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    """Apply a tiles-axis sharding constraint (no-op without a mesh)."""
    if mesh is None:
        return x
    spec = P(TILE_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
