"""Pallas TPU kernel: fill the per-tile work table from the sorted pair list.

After the (tile<<16|depth) sort, each tile's Gaussian ids form a contiguous
segment of the sorted array. XLA expresses the dense [NT, K] table fill as a
scatter or gather of ~2M scalars (~20 ms on v5e — random-access ops run at
~100M elem/s); as a Pallas kernel it is a dynamic-slice **DMA per tile** plus
a tail mask (sub-ms): 8 tiles per program (TPU block tiling wants the
second-minor dim in multiples of 8), scalar-prefetched segment starts/counts,
eight overlapped contiguous HBM→VMEM copies per program.

This replaces `identifyTileRanges` + the per-tile range indirection of the
reference (`rasterizer_impl.cu:120-138,327`): CUDA keeps (start,end) ranges
and indexes the sorted list in-kernel; we materialize padded rows because the
XLA compositor consumes fixed-shape chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # tiles per program


_ALIGN = 1024  # int32 1-D tiling granularity for dynamic HBM slices


def _fill_kernel(starts_ref, counts_ref, gid_ref, out_ref, scratch, sems):
    tb = pl.program_id(0)
    K = out_ref.shape[1]
    W = scratch.shape[1] * 128

    def dma(j):
        start = starts_ref[tb * _ROWS + j]
        # aligned row-block start: _ALIGN elements = _ALIGN//128 rows (mult. of 8)
        base_row = pl.multiple_of((start // _ALIGN) * (_ALIGN // 128), _ALIGN // 128)
        return pltpu.make_async_copy(
            gid_ref.at[pl.ds(base_row, W // 128)], scratch.at[j], sems.at[j]
        )

    for j in range(_ROWS):
        dma(j).start()
    for j in range(_ROWS):
        dma(j).wait()

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, K), 1)
    rows = []
    for j in range(_ROWS):
        start = starts_ref[tb * _ROWS + j]
        off = start - (start // _ALIGN) * _ALIGN
        rows.append(_extract_window(scratch[j], off, K))
    cnt = jnp.stack([counts_ref[tb * _ROWS + j] for j in range(_ROWS)])
    out_ref[...] = jnp.where(k_iota < cnt[:, None], jnp.stack(rows), -1)


def _extract_window(a2d, off, K):
    """Flat window [off, off+K) of a row-major (R,128) block, via 2-D dynamic
    rotates (Mosaic has no 1-D dynamic_rotate). off ∈ [0, R·128 − K]."""
    R = a2d.shape[0]
    row_off = off // 128
    lane_off = off % 128
    B = pltpu.roll(a2d, (R - row_off) % R, 0)  # rows now start at row_off
    D1 = pltpu.roll(B, (128 - lane_off) % 128, 1)  # lanes rotated within rows
    E = pltpu.roll(D1, R - 1, 0)  # next-row view for the carried lanes
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    out = jnp.where(lane_iota >= (128 - lane_off), E, D1)
    return out[: K // 128].reshape(K)


@functools.partial(jax.jit, static_argnames=("num_tiles", "capacity"))
def fill_table(
    gid_sorted: jax.Array,  # [N] gaussian ids in (tile, depth) sorted order
    starts: jax.Array,  # [NT+1] segment starts (searchsorted output)
    num_tiles: int,
    capacity: int,
) -> jax.Array:
    """Returns the [NT, capacity] table, -1-padded beyond each tile's count."""
    K = capacity
    assert K % 128 == 0, "tile_capacity must be a multiple of 128 on TPU"
    grid = -(-num_tiles // _ROWS)
    nt_pad = grid * _ROWS
    W = _ALIGN + -(-K // _ALIGN) * _ALIGN  # aligned over-fetch window
    # Pad so every aligned W-window read stays in bounds; 2-D so DMA slices
    # are whole 128-lane rows (1-D int32 refs demand 1024-aligned slices).
    n = gid_sorted.shape[0]
    pad_n = (-(n + W)) % 128 + W
    gid_padded = jnp.concatenate(
        [gid_sorted, jnp.full((pad_n,), -1, jnp.int32)]
    ).reshape(-1, 128)
    counts = jnp.minimum(starts[1:] - starts[:-1], K).astype(jnp.int32)[:num_tiles]
    starts32 = starts[:num_tiles].astype(jnp.int32)
    pad = nt_pad - num_tiles
    if pad:
        counts = jnp.concatenate([counts, jnp.zeros((pad,), jnp.int32)])
        starts32 = jnp.concatenate([starts32, jnp.zeros((pad,), jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_ROWS, K), lambda t, s, c: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, W // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((_ROWS,)),
        ],
    )
    out = pl.pallas_call(
        _fill_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt_pad, K), jnp.int32),
    )(starts32, counts, gid_padded)
    return out[:num_tiles]
