"""Pallas TPU kernel: fused per-tile alpha compositing.

The XLA compositing path (`ops/rasterize.composite`) scans fixed chunk counts
over every tile with HBM round-trips between chunk stages. This kernel fuses
the whole per-tile loop in VMEM:

  grid (tiles, chunks), revisiting one output block per tile:
    alphas (PIX×K) → exclusive cumulative transmittance via a strict-upper
    triangular MXU matmul (log-space prefix sum) → weight matrix → one
    (PIX×K)@(K×C) MXU matmul into the accumulator — and *skips* chunks past
    the tile's actual queue length (scalar-prefetched counts), so work is
    proportional to binned pairs, not capacity.

Layout: per-Gaussian data arrives as [NT, 32, K_TILE] (channel-major per
tile) so column extraction needs no transposes; rows 0-5 are geometry
(mx,my,ca,cb,cc,op), rows 8+ are the feature matrix for the accumulation
matmul (8-row offset keeps the sublane slice aligned).

Forward-only: the training path wraps this in `jax.custom_vjp` whose backward
recomputes through the XLA composite (`rasterize._composite_vjp`), keeping
gradients exact while the forward runs fused.

Compositing semantics match `forward.cu:280-436` exactly (same gates,
transmittance floor, conditioned depth — see rasterize.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HDR = 8  # header rows (geometry); feature rows start here


def _kernel(counts_ref, gt_ref, acc_out, t_out, acc_s, t_s, *, tile, tiles_x,
            alpha_min, t_min):
    t = pl.program_id(0)
    c = pl.program_id(1)
    NC = pl.num_programs(1)
    K = gt_ref.shape[2]
    PIX = tile * tile
    CF = gt_ref.shape[1] - HDR

    @pl.when(c == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)
        t_s[...] = jnp.ones_like(t_s)

    @pl.when(c * K < counts_ref[t])
    def _():
        g = gt_ref[0]  # [32, K]
        # pixel coordinates of this tile
        base_x = ((t % tiles_x) * tile).astype(jnp.float32)
        base_y = ((t // tiles_x) * tile).astype(jnp.float32)
        pix_row = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 0)
        px = base_x + (pix_row & (tile - 1)).astype(jnp.float32)
        py = base_y + (pix_row >> 4).astype(jnp.float32)

        dx = g[0:1, :] - px  # [PIX,K] via broadcast of the (1,K) row
        dy = g[1:2, :] - py
        power = -0.5 * (g[2:3, :] * dx * dx + g[4:5, :] * dy * dy) - g[3:4, :] * dx * dy
        alpha = jnp.minimum(0.99, g[5:6, :] * jnp.exp(power))
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 1)
        in_count = (c * K + k_iota) < counts_ref[t]
        gate = (power <= 0.0) & (alpha >= alpha_min) & in_count
        a = jnp.where(gate, alpha, 0.0)
        log_om = jnp.log1p(-a)  # 0 where ungated

        # exclusive prefix sum along K: Hillis-Steele doubling with static
        # lane rolls (log2 K steps of VPU adds — far cheaper than a (K,K)
        # triangular MXU matmul at fp32)
        inc = log_om
        for shift in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512):
            if shift >= K:
                break
            rolled = pltpu.roll(inc, shift, 1)
            inc = inc + jnp.where(k_iota >= shift, rolled, 0.0)
        cum = inc - log_om  # exclusive
        T_exc = t_s[...] * jnp.exp(cum)  # t_s is [PIX,1], broadcasts over K
        om = 1.0 - a
        m = gate & (T_exc * om >= t_min)
        w = jnp.where(m, a * T_exc, 0.0)

        feats = g[HDR:, :]  # [CF, K]
        acc_s[...] += jax.lax.dot_general(
            w, feats, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # image quality: keep fp32
        )
        t_s[...] *= jnp.exp(
            jnp.sum(jnp.where(m, log_om, 0.0), axis=1, keepdims=True)
        )

    @pl.when(c == NC - 1)
    def _():
        acc_out[0] = acc_s[...]
        t_out[0] = t_s[...][:, 0:1]


@functools.partial(
    jax.jit, static_argnames=("tile", "tiles_x", "alpha_min", "t_min", "chunk")
)
def composite_fused(
    gt: jax.Array,  # [NT, 32, K_TILE] channel-major gathered rows
    counts: jax.Array,  # [NT] int32
    tile: int,
    tiles_x: int,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
    chunk: int = 256,
):
    """Returns (accum [NT, PIX, CF], T_final [NT, PIX])."""
    NT, CH, K_TILE = gt.shape
    assert CH >= HDR
    K = min(chunk, K_TILE)
    assert K_TILE % K == 0
    NC = K_TILE // K
    PIX = tile * tile
    CF = CH - HDR

    kern = functools.partial(
        _kernel, tile=tile, tiles_x=tiles_x, alpha_min=alpha_min, t_min=t_min
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT, NC),
        in_specs=[
            pl.BlockSpec((1, CH, K), lambda t, c, counts: (t, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, PIX, CF), lambda t, c, counts: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 1), lambda t, c, counts: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((PIX, CF), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
        ],
    )
    acc, T = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NT, PIX, CF), jnp.float32),
            jax.ShapeDtypeStruct((NT, PIX, 1), jnp.float32),
        ],
    )(counts.astype(jnp.int32), gt)
    return acc, T[..., 0]
