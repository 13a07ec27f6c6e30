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


def _kernel(counts_ref, toff_ref, gt_ref, acc_out, t_out, acc_s, t_s, *, tile,
            tiles_x, alpha_min, t_min):
    t = pl.program_id(0)  # LOCAL tile index (indexes counts/blocks)
    tg = t + toff_ref[0]  # GLOBAL tile index (pixel coordinates) — under
    # shard_map each device holds a contiguous tile slice; toff maps local
    # program ids back to global tile coords.
    c = pl.program_id(1)
    NC = pl.num_programs(1)
    K = gt_ref.shape[2]
    PIX = tile * tile
    CF = gt_ref.shape[1] - HDR

    @pl.when(c == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)
        t_s[...] = jnp.ones_like(t_s)

    # Skip chunks past this tile's queue AND chunks where every pixel is
    # already saturated (the CUDA per-pixel early exit `forward.cu:372-389`,
    # lifted to chunk granularity: once max T < t_min no weight can pass the
    # t_min gate again, so the remaining work is provably zero).
    @pl.when((c * K < counts_ref[t]) & (jnp.max(t_s[...]) >= t_min))
    def _():
        g = gt_ref[0]  # [32, K]
        # pixel coordinates of this tile
        base_x = ((tg % tiles_x) * tile).astype(jnp.float32)
        base_y = ((tg // tiles_x) * tile).astype(jnp.float32)
        pix_row = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 0)
        px = base_x + (pix_row % tile).astype(jnp.float32)
        py = base_y + (pix_row // tile).astype(jnp.float32)

        dx = g[0:1, :] - px  # [PIX,K] via broadcast of the (1,K) row
        dy = g[1:2, :] - py
        power = -0.5 * (g[2:3, :] * dx * dx + g[4:5, :] * dy * dy) - g[3:4, :] * dx * dy
        alpha = jnp.minimum(0.99, g[5:6, :] * jnp.exp(power))
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 1)
        in_count = (c * K + k_iota) < counts_ref[t]
        gate = (power <= 0.0) & (alpha >= alpha_min) & in_count
        a = jnp.where(gate, alpha, 0.0)
        om = 1.0 - a

        # exclusive prefix PRODUCT along K: Hillis-Steele doubling with static
        # lane rolls — multiplicative, in linear space (the log-space variant
        # costs two extra [PIX,K] transcendental maps: log1p + exp).
        # Exclusive = inclusive scan of om shifted right by one.
        inc = jnp.where(k_iota >= 1, pltpu.roll(om, 1, 1), 1.0)
        for shift in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512):
            if shift >= K:
                break
            rolled = pltpu.roll(inc, shift, 1)
            inc = inc * jnp.where(k_iota >= shift, rolled, 1.0)
        T_exc = t_s[...] * inc  # t_s is [PIX,1], broadcasts over K
        m = gate & (T_exc * om >= t_min)
        w = jnp.where(m, a * T_exc, 0.0)

        feats = g[HDR:, :]  # [CF, K]
        acc_s[...] += jax.lax.dot_general(
            w, feats, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # image quality: keep fp32
        )
        # T *= Π_m om, computed without reduce_prod (unsupported in Mosaic):
        # m is monotone within a chunk (once T_exc·om < t_min it stays below),
        # so the post-chunk T equals the SMALLEST m-true inclusive product —
        # i.e. min over m of T_exc·om, or the unchanged t_s if m is all-false.
        t_s[...] = jnp.min(
            jnp.where(m, T_exc * om, t_s[...]), axis=1, keepdims=True
        )

    @pl.when(c == NC - 1)
    def _():
        acc_out[0] = acc_s[...]
        t_out[0] = t_s[...][:, 0:1]


@functools.partial(
    jax.jit,
    static_argnames=("tile", "tiles_x", "alpha_min", "t_min", "chunk",
                     "interpret"),
)
def composite_fused(
    gt: jax.Array,  # [NT, 32, K_TILE] channel-major gathered rows
    counts: jax.Array,  # [NT] int32
    tile: int,
    tiles_x: int,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
    chunk: int = 256,
    tile_offset=None,  # global id of local tile 0 (shard_map slices)
    interpret: bool = False,  # Pallas interpreter (CPU-mesh tests)
):
    """Returns (accum [NT, PIX, CF], T_final [NT, PIX])."""
    NT, CH, K_TILE = gt.shape
    assert CH >= HDR
    K = min(chunk, K_TILE)
    assert K_TILE % K == 0
    NC = K_TILE // K
    PIX = tile * tile
    CF = CH - HDR
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    else:
        tile_offset = jnp.asarray(tile_offset, jnp.int32).reshape(1)

    kern = functools.partial(
        _kernel, tile=tile, tiles_x=tiles_x, alpha_min=alpha_min, t_min=t_min
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NT, NC),
        in_specs=[
            pl.BlockSpec((1, CH, K), lambda t, c, *_: (t, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, PIX, CF), lambda t, c, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 1), lambda t, c, *_: (t, 0, 0),
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
        interpret=interpret,
    )(counts.astype(jnp.int32), tile_offset, gt)
    return acc, T[..., 0]


# ---------------------------------------------------------------------------
# Fused backward kernel
# ---------------------------------------------------------------------------
#
# Differentiates exactly what the forward computes (same gating structure):
# per pixel, with gated alphas a_i, within-chunk exclusive transmittance from
# ALL gated entries and cross-chunk carry from the m-masked product,
#
#   ∂L/∂a_i = m_i·T_exc,i·s_i  −  (g_i/om_i)·Σ_{j>i, chunk} w_j s_j
#             − (m_i/om_i)·( Σ_{j in later chunks} w_j s_j + T_N·dT )
#
# with s_i = Σ_c f_{i,c}·dAcc_c, then chained to opacity / conic / mean
# columns; feature grads are one (CF,PIX)@(PIX,K) matmul. One grid step per
# tile: a forward sweep records chunk-entry transmittances in VMEM, a reverse
# sweep accumulates the suffix carry. Replaces the reference's atomicAdd
# backward (`backward.cu:428-680`) with per-pair gradients + one
# deterministic scatter-add outside.


def _prefix_hs(x, k_iota, K, exclusive=True):
    """Hillis-Steele prefix sum along the last axis."""
    inc = x
    shift = 1
    while shift < K:
        inc = inc + jnp.where(k_iota >= shift, pltpu.roll(inc, shift, 1), 0.0)
        shift *= 2
    return inc - x if exclusive else inc


def _bwd_kernel(counts_ref, toff_ref, gt_ref, dacc_ref, dt_ref, tn_ref,
                dgt_ref, t_entry_s, carry_s, dg_s, *, tile, tiles_x,
                alpha_min, t_min, chunk):
    t = pl.program_id(0)  # local (counts/block index)
    tg = t + toff_ref[0]  # global (pixel coordinates)
    CH, K_TILE = gt_ref.shape[1], gt_ref.shape[2]
    K = chunk
    NC = K_TILE // K
    PIX = tile * tile
    CF = CH - HDR

    g_all = gt_ref[0]  # [CH, K_TILE]
    dacc = dacc_ref[0]  # [PIX, CF]
    dT_px = dt_ref[0]  # [PIX, 1]
    T_N = tn_ref[0]  # [PIX, 1]

    base_x = ((tg % tiles_x) * tile).astype(jnp.float32)
    base_y = ((tg // tiles_x) * tile).astype(jnp.float32)
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 0)
    px = base_x + (pix_row % tile).astype(jnp.float32)
    py = base_y + (pix_row // tile).astype(jnp.float32)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 1)

    def chunk_quants(c, T_entry):
        """Recompute (a, g, om, log_om, T_exc, m, power, dx, dy) for chunk c."""
        g = g_all[:, c * K:(c + 1) * K]
        dx = g[0:1, :] - px
        dy = g[1:2, :] - py
        power = -0.5 * (g[2:3, :] * dx * dx + g[4:5, :] * dy * dy) - g[3:4, :] * dx * dy
        raw = g[5:6, :] * jnp.exp(power)
        alpha = jnp.minimum(0.99, raw)
        in_count = (c * K + k_iota) < counts_ref[t]
        gate = (power <= 0.0) & (alpha >= alpha_min) & in_count
        a = jnp.where(gate, alpha, 0.0)
        om = 1.0 - a
        log_om = jnp.log1p(-a)
        cum = _prefix_hs(log_om, k_iota, K, exclusive=True)
        T_exc = T_entry * jnp.exp(cum)
        m = gate & (T_exc * om >= t_min)
        clipped = raw >= 0.99
        return g, dx, dy, a, gate, om, log_om, T_exc, m, clipped

    # ---- forward sweep: record chunk-entry transmittances ----
    T = jnp.ones((PIX, 1), jnp.float32)
    for c in range(NC):
        t_entry_s[:, c:c + 1] = T
        _, _, _, a, gate, om, log_om, T_exc, m, _ = chunk_quants(c, T)
        T = T * jnp.exp(jnp.sum(jnp.where(m, log_om, 0.0), axis=1, keepdims=True))

    # ---- reverse sweep ----
    carry_s[...] = T_N * dT_px  # Σ later-chunk w·s + T_N·dT term
    for c in reversed(range(NC)):
        T_entry = t_entry_s[:, c:c + 1]
        g, dx, dy, a, gate, om, log_om, T_exc, m, clipped = chunk_quants(c, T_entry)
        feats = g_all[HDR:, c * K:(c + 1) * K]  # [CF, K]

        s = jax.lax.dot_general(
            dacc, feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [PIX, K]
        w = jnp.where(m, a * T_exc, 0.0)
        ws = w * s
        incl = _prefix_hs(ws, k_iota, K, exclusive=False)
        tot = incl[:, K - 1:K]  # inclusive prefix at the end == chunk total
        B = tot - incl  # within-chunk suffix Σ_{j>i} ws_j
        inv_om = 1.0 / om
        da = (
            jnp.where(m, T_exc * s, 0.0)
            - jnp.where(gate, inv_om, 0.0) * B
            - jnp.where(m, inv_om, 0.0) * carry_s[...]
        )

        # chain: a = min(0.99, op·exp(power))
        live = gate & ~clipped
        dpow = jnp.where(live, da * a, 0.0)  # ∂a/∂power = a
        # ∂a/∂op = exp(power) = a/op (avoids a second exp)
        opac_row = g[5:6, :]
        dop_px = jnp.where(live, da * a / jnp.maximum(opac_row, 1e-12), 0.0)

        dca = jnp.sum(dpow * (-0.5 * dx * dx), axis=0)
        dcb = jnp.sum(dpow * (-dx * dy), axis=0)
        dcc = jnp.sum(dpow * (-0.5 * dy * dy), axis=0)
        dmx = jnp.sum(dpow * (-(g[2:3, :] * dx + g[3:4, :] * dy)), axis=0)
        dmy = jnp.sum(dpow * (-(g[4:5, :] * dy + g[3:4, :] * dx)), axis=0)
        dop = jnp.sum(dop_px, axis=0)

        dfeats = jax.lax.dot_general(
            dacc, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [CF, K]

        hdr_grads = jnp.concatenate(
            [
                dmx.reshape(1, K), dmy.reshape(1, K), dca.reshape(1, K),
                dcb.reshape(1, K), dcc.reshape(1, K), dop.reshape(1, K),
                jnp.zeros((HDR - 6, K), jnp.float32),
            ],
            axis=0,
        )
        dg_s[:, c * K:(c + 1) * K] = jnp.concatenate([hdr_grads, dfeats], axis=0)

        carry_s[...] += tot

    dgt_ref[0] = dg_s[...]


@functools.partial(
    jax.jit,
    static_argnames=("tile", "tiles_x", "alpha_min", "t_min", "chunk",
                     "interpret"),
)
def composite_fused_bwd(
    gt: jax.Array,  # [NT, CH, K_TILE]
    counts: jax.Array,  # [NT]
    d_accum: jax.Array,  # [NT, PIX, CF] cotangent
    d_T: jax.Array,  # [NT, PIX] cotangent
    T_final: jax.Array,  # [NT, PIX] primal output
    tile: int,
    tiles_x: int,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
    chunk: int = 256,
    tile_offset=None,
    interpret: bool = False,
) -> jax.Array:
    """Returns dGt [NT, CH, K_TILE]."""
    NT, CH, K_TILE = gt.shape
    K = min(chunk, K_TILE)
    NC = K_TILE // K
    PIX = tile * tile
    CF = CH - HDR
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    else:
        tile_offset = jnp.asarray(tile_offset, jnp.int32).reshape(1)

    kern = functools.partial(
        _bwd_kernel, tile=tile, tiles_x=tiles_x, alpha_min=alpha_min,
        t_min=t_min, chunk=K,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, CH, K_TILE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, CF), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CH, K_TILE), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PIX, NC), jnp.float32),       # chunk-entry T
            pltpu.VMEM((PIX, 1), jnp.float32),        # suffix carry
            pltpu.VMEM((CH, K_TILE), jnp.float32),    # assembled dGt
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, CH, K_TILE), jnp.float32),
        interpret=interpret,
    )(counts.astype(jnp.int32), tile_offset, gt, d_accum, d_T[..., None],
      T_final[..., None])
