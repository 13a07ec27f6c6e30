"""Pallas TPU kernel: windowed fused compositor — gather-free rendering.

The profiled killer of the plain fused path is the XLA row-gather
`G[table]` (~25 ms for 1.8M 128-byte rows at 720p: XLA gathers run at
~77M rows/s regardless of row width). The reference never materializes that
gather — its CUDA render kernel walks the sorted pair list in-kernel
(`cuda_rasterizer/forward.cu:310-340`). This kernel restores that property
TPU-style:

  1. Gaussians' packed rows are pre-sorted by (anchor tile, depth), where
     the anchor is the rect-min tile of the R×R binning window. All
     Gaussians that can touch tile (ty,tx) then live in R *contiguous*
     spans of the sorted row store (anchors in tile rows ty-R+1..ty,
     columns tx-R+1..tx).
  2. Each grid step DMAs those R spans (whole 128-row blocks, dynamic
     start / static size per block) into a VMEM candidate window packed
     back-to-back — sequential HBM reads at full bandwidth instead of a
     random gather. Spans share one per-tile block budget
     (`cfg.window_blocks` total), allocated host-side by actual span
     length, so dense regions don't force a uniform worst-case window.
  3. The per-tile depth-ordered work list is translated into *window-local*
     indices; the kernel materializes depth order with Mosaic's native
     within-128-lane dynamic gather (`take_along_axis` on the lane axis),
     one [CH,128] gather per (output block × candidate block). Two sources
     for that list: the host pair sort + table (`_kernel`, differentiable
     via `composite_windowed_bwd`), or — render fast path — the kernel
     itself (`_kernel_sorted`): per-row validity (rect ∧ exact conic-q
     alpha cull) and `(depth_quant << 11) | window_idx` keys are computed
     from the DMA'd rows and bitonic-sorted in VMEM (`ops/pallas_sort`),
     deleting the ~3.3M-lane host pair sort, the tier buffers and the
     table build from the program.
  4. Compositing proceeds exactly as `pallas_composite._kernel`
     (linear-space Hillis-Steele exclusive product, chunk skip by counts,
     chunk skip on full saturation).

Window overflow (a tile needing more candidate blocks than the budget) is
counted host-side and surfaced; the pipeline adapts capacities the same way
it adapts `tile_capacity`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HDR = 8  # header rows (geometry); feature rows start here

# Packed-row extra columns appended by the windowed path (rows 32..39 of the
# 40-wide layout; rows 0..31 are identical to `rasterize._pack_gaussians`).
# Host-side pair expansion reads them; so does `_kernel_sorted` (the
# in-kernel-sort mode DMAs the full 40-row layout to build its own keys).
COL_RMIN_X = 32
COL_RMIN_Y = 33
COL_RECT_W = 34
COL_RECT_H = 35
COL_DQ = 36
COL_RCULL2 = 37  # exact alpha-cull radius² (rasterize.preprocess)
COL_STORE = 38  # 1.0 marks a slice-store copy row (rasterize._prepare_windowed)
WIDE_CH = 40


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def _feat_dot(w, feats, feat_prec):
    """[PIX,K] @ [CF,K]^T feature accumulation at a configurable MXU cost.

    "highest" = fp32 6-pass; "default" = bf16 1-pass (~4e-3 abs on [0,1]
    channels — under the 8-bit display quantum). "high" is emulated as a
    bf16x2 split (w_hi+w_lo) × (f_hi+f_lo) with the lo·lo term dropped —
    3 one-pass dots ≈ lax.Precision.HIGH (~1e-6 rel), which Mosaic does
    not accept natively on TPU."""
    dims = (((1,), (1,)), ((), ()))
    if feat_prec == "high":
        wh = w.astype(jnp.bfloat16)
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        fh = feats.astype(jnp.bfloat16)
        fl = (feats - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(wh, fh, dims,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(wh, fl, dims,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(wl, fh, dims,
                                   preferred_element_type=jnp.float32)
        return acc
    return jax.lax.dot_general(w, feats, dims,
                               preferred_element_type=jnp.float32,
                               precision=_PRECISIONS[feat_prec])


def _kernel(counts_ref, bases_ref, dests_ref, nblks_ref, toff_ref, table_ref,
            gb_ref, *rest, tile, tiles_x, alpha_min, t_min, chunk, n_span,
            w_blocks, bf16_obj=False, scan_impl="roll",
            prefetch=False, ablate="", ewa_impl="vpu", feat_prec="highest"):
    acc_out, t_out, cand, gsel, acc_s, t_s, sems = rest
    t = pl.program_id(0)
    tg = t + toff_ref[0]  # GLOBAL tile id (pixel coords) — under shard_map
    # each device holds a contiguous tile slice; toff maps local → global.
    c = pl.program_id(1)
    NC = pl.num_programs(1)
    NT = pl.num_programs(0)
    K = chunk
    CH = gb_ref.shape[1]
    PIX = tile * tile
    CF = acc_s.shape[1]

    def _span_copies(tt, buf, action):
        """Issue (or wait for) tile tt's span DMAs into window buffer `buf`
        (buf is None when single-buffered)."""
        for j in range(n_span):
            base = bases_ref[tt * n_span + j]
            dest = dests_ref[tt * n_span + j]
            nblk = nblks_ref[tt * n_span + j]
            for b in range(w_blocks):
                @pl.when(b < nblk)
                def _():
                    dst = (cand.at[pl.ds(dest + b, 1)] if buf is None
                           else cand.at[buf, pl.ds(dest + b, 1)])
                    sem = sems.at[j] if buf is None else sems.at[buf, j]
                    cp = pltpu.make_async_copy(
                        gb_ref.at[pl.ds(base + b, 1)], dst, sem)
                    cp.start() if action == "start" else cp.wait()

    @pl.when(c == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)
        t_s[...] = jnp.ones_like(t_s)
        if not prefetch:
            # span DMAs: per-128-row-block conditional copies, packed
            # back-to-back — issued and waited within this grid step
            _span_copies(t, None, "start")
            _span_copies(t, None, "wait")
        else:
            # Double-buffered prefetch: tile t's window was issued one tile
            # ago (t=0 issues its own); issue t+1's into the other buffer so
            # the copy overlaps this tile's NC compositing chunks, then wait
            # only for t's. Buffer parity t%2 never collides: tile t-1's
            # compute finished before this grid step (sequential grid).
            @pl.when(t == 0)
            def _():
                _span_copies(t, t % 2, "start")

            @pl.when(t + 1 < NT)
            def _():
                _span_copies(t + 1, (t + 1) % 2, "start")

            _span_copies(t, t % 2, "wait")

    # chunk skip: past the tile's queue, or every pixel saturated (the CUDA
    # per-pixel early exit `forward.cu:372-389` at chunk granularity)
    @pl.when((c * K < counts_ref[t]) & (jnp.max(t_s[...]) >= t_min))
    def _():
        idx_of = lambda kb: table_ref[0, c * (K // 128) + kb]
        cand_at = lambda b: cand[b] if not prefetch else cand[t % 2, b]
        _select_and_composite(
            idx_of, cand_at, gsel, acc_s, t_s, tg, K=K, CH=CH, tile=tile,
            tiles_x=tiles_x, alpha_min=alpha_min, t_min=t_min,
            w_blocks=w_blocks, bf16_obj=bf16_obj, scan_impl=scan_impl,
            ablate=ablate, ewa_impl=ewa_impl, feat_prec=feat_prec,
        )

    @pl.when(c == NC - 1)
    def _():
        acc_out[0] = acc_s[...]
        t_out[0] = t_s[...][:, 0:1]


def _select_and_composite(idx_of, cand_at, gsel, acc_s, t_s, tg, *, K, CH,
                          tile, tiles_x, alpha_min, t_min, w_blocks,
                          bf16_obj, scan_impl, ablate, ewa_impl, feat_prec):
    """One compositing chunk: depth-order select from the candidate window
    (`idx_of(kb)` → [128] window-local ids, −1 = empty) followed by the EWA
    alpha math, the exclusive-product scan and the feature matmul. Shared by
    the host-table kernel (`_kernel`) and the in-kernel-sort variant
    (`_kernel_sorted`)."""
    PIX = tile * tile
    CF = acc_s.shape[1]
    if True:  # (indent kept from the pre-refactor _kernel body)
        # ---- select: depth-ordered rows from the packed candidate window.
        # Indices never point past the allocated blocks (host guarantees
        # local < used*128), so unconditionally scanning all w_blocks is
        # correct — unallocated blocks just never match `hi == b`.
        # (measured: these register-accumulating unrolled passes beat both a
        # dynamic-trip fori_loop and pl.when-predicated scratch RMW — scalar
        # control flow around [CH,128] vector work costs more than the
        # skipped gathers would save)
        for kb in range(K // 128):
            idxb = idx_of(kb)  # [128] window-local ids
            hi = idxb // 128
            lo = jnp.where(idxb >= 0, idxb % 128, 0)
            idxmod = jnp.broadcast_to(lo[None, :], (CH, 128))
            # NOTE: must stay a where-chain (not masked multiply-add): rows
            # of never-DMA'd window blocks are uninitialized VMEM, and
            # NaN·0 would poison a sum. Measured identical speed anyway.
            sel = jnp.zeros((CH, 128), jnp.float32)
            # ablate="nosel": one gather instead of w_blocks (timing only)
            for b in range(1 if ablate == "nosel" else w_blocks):
                g_b = jnp.take_along_axis(cand_at(b), idxmod, axis=1)
                sel = jnp.where((hi == b)[None, :], g_b, sel)
            gsel[:, pl.ds(kb * 128, 128)] = sel

        g = gsel[...]
        base_x = ((tg % tiles_x) * tile).astype(jnp.float32)
        base_y = ((tg // tiles_x) * tile).astype(jnp.float32)
        if scan_impl == "pad":
            # Pixel coords as [PIX,1] columns — the broadcast to [PIX,K]
            # happens inside the consuming subtract instead of materializing
            # iota/mod/add at full size.
            pc = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
            px = base_x + (pc % tile).astype(jnp.float32)
            py = base_y + (pc // tile).astype(jnp.float32)
        else:
            pix_row = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 0)
            px = base_x + (pix_row % tile).astype(jnp.float32)
            py = base_y + (pix_row // tile).astype(jnp.float32)
        if ablate == "nomath":  # skip the EWA alpha math (timing only)
            alpha = jnp.broadcast_to(g[5:6, :] * 0.01, (PIX, K))
            power = jnp.zeros((PIX, K), jnp.float32) - 0.5
        elif ewa_impl == "quad":
            # Expand the EWA quadratic around the tile origin and evaluate
            # all six monomials with ONE [PIX,6]@[6,K] matmul: ~10 cheap
            # [1,K] row ops replace ~9 [PIX,K] VPU maps. Tile-LOCAL means
            # keep the expansion well-conditioned (|u|,|mx| ≤ R·tile, so
            # the c0/c1·u/c3·u² cancellation stays ~1e-3 absolute — a
            # global-coordinate expansion would lose ~5 digits).
            Ar, Br, Cr = g[2:3, :], g[3:4, :], g[4:5, :]
            mx = g[0:1, :] - base_x
            my = g[1:2, :] - base_y
            coeffs = jnp.concatenate([
                -0.5 * (Ar * mx * mx + Cr * my * my) - Br * mx * my,
                Ar * mx + Br * my,
                Cr * my + Br * mx,
                -0.5 * Ar,
                -Br,
                -0.5 * Cr,
            ], axis=0)  # [6, K]
            pc6 = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
            u = (pc6 % tile).astype(jnp.float32)
            v = (pc6 // tile).astype(jnp.float32)
            basis = jnp.concatenate(
                [jnp.ones_like(u), u, v, u * u, u * v, v * v], axis=1
            )  # [PIX, 6] — static per tile
            power = jax.lax.dot_general(
                basis, coeffs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            # expansion noise (~1e-3 abs) must not flip the power<=0 gate at
            # a Gaussian's center (where power==0 exactly in the longhand
            # form): clamp alpha's exponent, keep the degenerate-conic guard
            # with matching slack
            alpha = jnp.minimum(
                0.99, g[5:6, :] * jnp.exp(jnp.minimum(power, 0.0))
            )
            power = jnp.minimum(power, jnp.where(power <= 0.01, 0.0, power))
        else:
            dx = g[0:1, :] - px
            dy = g[1:2, :] - py
            power = -0.5 * (g[2:3, :] * dx * dx + g[4:5, :] * dy * dy) - g[3:4, :] * dx * dy
            alpha = jnp.minimum(0.99, g[5:6, :] * jnp.exp(power))
        # No in-count gate needed (unlike pallas_composite._kernel, whose
        # clamped gather duplicates row 0 into empty lanes): lanes beyond
        # the tile's queue — and window-overflow drops — carry
        # table_local == -1, so the select leaves them all-zero and
        # opacity 0 fails the alpha_min gate.
        gate = (power <= 0.0) & (alpha >= alpha_min)
        a = jnp.where(gate, alpha, 0.0)
        om = 1.0 - a
        # exclusive prefix product (see pallas_composite._kernel)
        if ablate == "noscan":  # skip the Hillis-Steele product (timing only)
            inc = jnp.broadcast_to(om[:, :1], (PIX, K))
        elif scan_impl == "pad":
            # Shift-fill-1 Hillis-Steele: each step reads the sh-right-shifted
            # product through a static concat slice (out-of-range lanes take
            # 1.0 from the pad), dropping the per-step lane-iota mask and the
            # cyclic roll of the "roll" impl.
            ones_pad = jnp.ones((PIX, max(K // 2, 1)), jnp.float32)
            p = om
            sh = 1
            while sh < K:
                shifted = jnp.concatenate(
                    [ones_pad[:, :sh], p[:, :K - sh]], axis=1
                )
                p = p * shifted
                sh *= 2
            inc = jnp.concatenate([ones_pad[:, :1], p[:, :K - 1]], axis=1)
        else:
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 1)
            inc = jnp.where(k_iota >= 1, pltpu.roll(om, 1, 1), 1.0)
            sh = 1
            while sh < K:
                inc = inc * jnp.where(k_iota >= sh, pltpu.roll(inc, sh, 1), 1.0)
                sh *= 2
        T_exc = t_s[...] * inc
        m = gate & (T_exc * om >= t_min)
        w = jnp.where(m, a * T_exc, 0.0)
        if bf16_obj:
            # Split-precision layout (CH=24): rows 8..15 are f32 features
            # (rgb, dz0, A, B, 1, pad); rows 16..23 pack the 16 obj channels
            # as bf16 pairs in f32 (lo = 2c, hi = 2c+1) — gathered as f32
            # (Mosaic's dynamic_gather rejects bf16 with i32 indices) and
            # bitcast back here. Acc columns: [f32feat 0..7 | obj 8..23].
            obj = pltpu.bitcast(g[16:24, :], jnp.bfloat16)  # [16, K]
            acc_f = _feat_dot(w, g[8:16, :], feat_prec)
            acc_o = jax.lax.dot_general(
                w.astype(jnp.bfloat16), obj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s[...] += jnp.concatenate([acc_f, acc_o], axis=1)
        elif ablate == "nomatmul":  # skip the feature matmul (timing only);
            # the [PIX,CF] slice-add still consumes w so the rest survives DCE
            acc_s[...] += w[:, :CF]
        else:
            acc_s[...] += _feat_dot(w, g[HDR:HDR + CF, :], feat_prec)
        # T *= Π_m om without reduce_prod (unsupported): m is monotone within
        # a chunk, so the post-chunk T is the smallest m-true T_exc·om.
        t_s[...] = jnp.min(
            jnp.where(m, T_exc * om, t_s[...]), axis=1, keepdims=True
        )


def _bwd_kernel(counts_ref, bases_ref, dests_ref, nblks_ref, toff_ref,
                table_ref, gb_ref, dacc_ref, dt_ref, tn_ref, dgt_out, cand,
                gsel, t_entry_s, carry_s, dg_s, sems, *, tile, tiles_x,
                alpha_min, t_min, chunk, n_span, w_blocks):
    """Windowed fused backward: span DMA + in-VMEM depth-order select, then
    the exact reverse-sweep gradient of `pallas_composite._bwd_kernel` on the
    selected columns. One grid step per tile; emits per-pair gradients in
    table order (scatter-add to rows happens outside, deterministic)."""
    t = pl.program_id(0)
    tg = t + toff_ref[0]  # global tile id (pixel coordinates)
    CH = gb_ref.shape[1]
    K_TILE = gsel.shape[1]
    K = chunk
    NC = K_TILE // K
    PIX = tile * tile
    CF = dacc_ref.shape[2]

    # ---- span DMAs into the candidate window (same plan as forward) ----
    for j in range(n_span):
        base = bases_ref[t * n_span + j]
        dest = dests_ref[t * n_span + j]
        nblk = nblks_ref[t * n_span + j]
        for b in range(w_blocks):
            @pl.when(b < nblk)
            def _():
                pltpu.make_async_copy(
                    gb_ref.at[pl.ds(base + b, 1)],
                    cand.at[pl.ds(dest + b, 1)],
                    sems.at[j],
                ).start()
    for j in range(n_span):
        base = bases_ref[t * n_span + j]
        dest = dests_ref[t * n_span + j]
        nblk = nblks_ref[t * n_span + j]
        for b in range(w_blocks):
            @pl.when(b < nblk)
            def _():
                pltpu.make_async_copy(
                    gb_ref.at[pl.ds(base + b, 1)],
                    cand.at[pl.ds(dest + b, 1)],
                    sems.at[j],
                ).wait()

    # ---- depth-order select into gsel [CH, K_TILE] (dynamic pass count —
    # see the forward kernel) ----
    for kb in range(K_TILE // 128):
        idxb = table_ref[0, kb]  # [128] window-local ids (-1 = empty)
        hi = idxb // 128
        lo = jnp.where(idxb >= 0, idxb % 128, 0)
        idxmod = jnp.broadcast_to(lo[None, :], (CH, 128))
        sel = jnp.zeros((CH, 128), jnp.float32)
        for b in range(w_blocks):
            g_b = jnp.take_along_axis(cand[b], idxmod, axis=1)
            sel = jnp.where((hi == b)[None, :], g_b, sel)
        gsel[:, pl.ds(kb * 128, 128)] = sel

    g_all = gsel[...]
    dacc = dacc_ref[0]  # [PIX, CF]
    dT_px = dt_ref[0]
    T_N = tn_ref[0]

    base_x = ((tg % tiles_x) * tile).astype(jnp.float32)
    base_y = ((tg // tiles_x) * tile).astype(jnp.float32)
    pix_row = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 0)
    px = base_x + (pix_row % tile).astype(jnp.float32)
    py = base_y + (pix_row // tile).astype(jnp.float32)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 1)

    def _prefix_hs(x, exclusive=True):
        inc = x
        shift = 1
        while shift < K:
            inc = inc + jnp.where(k_iota >= shift, pltpu.roll(inc, shift, 1), 0.0)
            shift *= 2
        return inc - x if exclusive else inc

    def chunk_quants(c, T_entry):
        g = g_all[:, c * K:(c + 1) * K]
        dx = g[0:1, :] - px
        dy = g[1:2, :] - py
        power = -0.5 * (g[2:3, :] * dx * dx + g[4:5, :] * dy * dy) - g[3:4, :] * dx * dy
        raw = g[5:6, :] * jnp.exp(power)
        alpha = jnp.minimum(0.99, raw)
        # empty/overflow lanes select all-zero columns (see forward kernel)
        gate = (power <= 0.0) & (alpha >= alpha_min)
        a = jnp.where(gate, alpha, 0.0)
        om = 1.0 - a
        log_om = jnp.log1p(-a)
        cum = _prefix_hs(log_om, exclusive=True)
        T_exc = T_entry * jnp.exp(cum)
        m = gate & (T_exc * om >= t_min)
        clipped = raw >= 0.99
        return g, dx, dy, a, gate, om, log_om, T_exc, m, clipped

    T = jnp.ones((PIX, 1), jnp.float32)
    for c in range(NC):
        t_entry_s[:, c:c + 1] = T
        _, _, _, a, gate, om, log_om, T_exc, m, _ = chunk_quants(c, T)
        T = T * jnp.exp(jnp.sum(jnp.where(m, log_om, 0.0), axis=1, keepdims=True))

    carry_s[...] = T_N * dT_px
    for c in reversed(range(NC)):
        T_entry = t_entry_s[:, c:c + 1]
        g, dx, dy, a, gate, om, log_om, T_exc, m, clipped = chunk_quants(c, T_entry)
        feats = g_all[HDR:, c * K:(c + 1) * K]  # [CF, K]

        s = jax.lax.dot_general(
            dacc, feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        w = jnp.where(m, a * T_exc, 0.0)
        ws = w * s
        incl = _prefix_hs(ws, exclusive=False)
        tot = incl[:, K - 1:K]
        B = tot - incl
        inv_om = 1.0 / om
        da = (
            jnp.where(m, T_exc * s, 0.0)
            - jnp.where(gate, inv_om, 0.0) * B
            - jnp.where(m, inv_om, 0.0) * carry_s[...]
        )

        live = gate & ~clipped
        dpow = jnp.where(live, da * a, 0.0)
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
        )

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

    dgt_out[0] = dg_s[...]


@functools.partial(
    jax.jit,
    static_argnames=("tile", "tiles_x", "alpha_min", "t_min", "chunk",
                     "n_span", "w_blocks", "interpret"),
)
def composite_windowed_bwd(
    gb: jax.Array,      # [NB_total, CH, 128] anchor-sorted blocked row store
    table: jax.Array,   # [NT, K_TILE//128, 128] window-local depth-order ids
    counts: jax.Array,  # [NT]
    bases: jax.Array,
    dests: jax.Array,
    nblks: jax.Array,
    d_accum: jax.Array,  # [NT, PIX, CF] cotangent (CF = CH - HDR)
    d_T: jax.Array,      # [NT, PIX]
    T_final: jax.Array,  # [NT, PIX]
    tile: int,
    tiles_x: int,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
    chunk: int = 256,
    n_span: int = 4,
    w_blocks: int = 12,
    interpret: bool = False,
    tile_offset=None,  # global id of local tile 0 (shard_map slices)
) -> jax.Array:
    """Returns per-pair gradients dGt [NT, CH, K_TILE] in table order."""
    NT = table.shape[0]
    K_TILE = table.shape[1] * 128
    CH = gb.shape[1]
    K = min(chunk, K_TILE)
    NC = K_TILE // K
    PIX = tile * tile
    CF = d_accum.shape[-1]

    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    else:
        tile_offset = jnp.asarray(tile_offset, jnp.int32).reshape(1)
    kern = functools.partial(
        _bwd_kernel, tile=tile, tiles_x=tiles_x, alpha_min=alpha_min,
        t_min=t_min, chunk=K, n_span=n_span, w_blocks=w_blocks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, K_TILE // 128, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((w_blocks, CH, 128), jnp.float32),
            pltpu.VMEM((CH, K_TILE), jnp.float32),   # selected columns
            pltpu.VMEM((PIX, NC), jnp.float32),      # chunk-entry T
            pltpu.VMEM((PIX, 1), jnp.float32),       # suffix carry
            pltpu.VMEM((CH, K_TILE), jnp.float32),   # assembled dGt
            pltpu.SemaphoreType.DMA((n_span,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, CH, K_TILE), jnp.float32),
        interpret=interpret,
    )(counts.astype(jnp.int32), bases.astype(jnp.int32),
      dests.astype(jnp.int32), nblks.astype(jnp.int32), tile_offset, table,
      gb, d_accum, d_T[..., None], T_final[..., None])


@functools.partial(
    jax.jit,
    static_argnames=("n_feat", "tile", "tiles_x", "alpha_min", "t_min",
                     "chunk", "n_span", "w_blocks", "interpret", "bf16_obj",
                     "scan_impl", "prefetch", "ablate", "ewa_impl",
                     "feat_prec"),
)
def composite_windowed(
    gb: jax.Array,      # [NB_total, CH, 128] anchor-sorted blocked row store
    table: jax.Array,   # [NT, K_TILE//128, 128] window-local depth-order ids
    counts: jax.Array,  # [NT]
    bases: jax.Array,   # [NT * n_span] span source block ids
    dests: jax.Array,   # [NT * n_span] span dest block offset in the window
    nblks: jax.Array,   # [NT * n_span] blocks allocated to the span
    n_feat: int,
    tile: int,
    tiles_x: int,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
    chunk: int = 256,
    n_span: int = 4,
    w_blocks: int = 12,
    interpret: bool = False,
    bf16_obj: bool = False,
    scan_impl: str = "roll",
    prefetch: bool = False,  # double-buffered window DMA (issue t+1 at t)
    ablate: str = "",  # PERF DIAGNOSIS ONLY — disables a kernel stage
    ewa_impl: str = "vpu",  # "vpu" longhand | "quad" 6-basis MXU expansion
    feat_prec: str = "highest",  # feature-matmul MXU precision (config doc)
    tile_offset=None,  # global id of local tile 0 (shard_map slices)
):
    """Returns (accum [NT, PIX, n_feat], T_final [NT, PIX])."""
    NT = table.shape[0]
    K_TILE = table.shape[1] * 128
    CH = gb.shape[1]
    K = min(chunk, K_TILE)
    assert K % 128 == 0 and K_TILE % K == 0
    NC = K_TILE // K
    PIX = tile * tile
    CF = n_feat

    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    else:
        tile_offset = jnp.asarray(tile_offset, jnp.int32).reshape(1)
    kern = functools.partial(
        _kernel, tile=tile, tiles_x=tiles_x, alpha_min=alpha_min, t_min=t_min,
        chunk=K, n_span=n_span, w_blocks=w_blocks,
        bf16_obj=bf16_obj, scan_impl=scan_impl, prefetch=prefetch,
        ablate=ablate, ewa_impl=ewa_impl, feat_prec=feat_prec,
    )
    in_specs = [
        pl.BlockSpec((1, K_TILE // 128, 128), lambda t, c, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [table, gb]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(NT, NC),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, PIX, CF), lambda t, c, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 1), lambda t, c, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            (pltpu.VMEM((2, w_blocks, CH, 128), jnp.float32) if prefetch
             else pltpu.VMEM((w_blocks, CH, 128), jnp.float32)),
            pltpu.VMEM((CH, K), jnp.float32),
            pltpu.VMEM((PIX, CF), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            (pltpu.SemaphoreType.DMA((2, n_span)) if prefetch
             else pltpu.SemaphoreType.DMA((n_span,))),
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
    )(counts.astype(jnp.int32), bases.astype(jnp.int32),
      dests.astype(jnp.int32), nblks.astype(jnp.int32), tile_offset, *inputs)
    return acc, T[..., 0]


# ---------------------------------------------------------------------------
# In-kernel-sort variant: no host pair sort, no table — the kernel builds and
# depth-orders its own candidate list from the DMA'd window.
# ---------------------------------------------------------------------------

_SORT_ROWS = 16          # bitonic sort extent: 16×128 = 2048 candidate slots
_IDX_BITS = 11           # low key bits carry the window-local row id
_IDX_MASK = (1 << _IDX_BITS) - 1
_KEY_INVALID = 0x7FFFFFFF


def _kernel_sorted(bases_ref, dests_ref, nblks_ref, sstart_ref, send_ref,
                   toff_ref, gb_ref, acc_out, t_out, nv_out, cand, gsel,
                   acc_s, t_s, order_s, nv_s, sems, *, tile, tiles_x,
                   alpha_min, t_min, chunk, n_span, w_blocks, k_tile,
                   scan_impl, ablate, ewa_impl, feat_prec):
    """Windowed forward with IN-KERNEL depth ordering (render path).

    The host-table path pays a ~3.3M-lane global `lax.sort` plus table
    fill/translate (~8 ms at the 720p bench point) to hand the kernel a
    depth-ordered work list. But everything the list encodes is derivable
    from data already in VMEM after the span DMAs: per window row, validity
    = (in its span) ∧ (this tile inside the row's rect) ∧ (conic-q min ≤
    alpha-gate level), and the order key is the packed 16-bit quantized
    depth. So this kernel builds `(dq << 11) | window_idx` keys itself and
    bitonic-sorts 2048 lanes in VMEM (~µs/tile, `pallas_sort`). Ties break
    by window position — identical to the host pair sort's (key, gid)
    order, because window position is monotone in sorted-row id.

    Coverage note: validity is the EXACT alpha-gate test — no mid/big tier
    buffers, so the tier-saturation drop mode of the host path does not
    exist here. A tile's first `k_tile` nearest candidates composite; the
    rest are counted in `nv_out` (capacity overflow = nv − k_tile).
    """
    t = pl.program_id(0)
    tg = t + toff_ref[0]
    c = pl.program_id(1)
    NC = pl.num_programs(1)
    K = chunk
    CH = gb_ref.shape[1]

    @pl.when(c == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)
        t_s[...] = jnp.ones_like(t_s)
        for j in range(n_span):
            base = bases_ref[t * n_span + j]
            dest = dests_ref[t * n_span + j]
            nblk = nblks_ref[t * n_span + j]
            for b in range(w_blocks):
                @pl.when(b < nblk)
                def _():
                    pltpu.make_async_copy(
                        gb_ref.at[pl.ds(base + b, 1)],
                        cand.at[pl.ds(dest + b, 1)], sems.at[j]).start()
        for j in range(n_span):
            base = bases_ref[t * n_span + j]
            dest = dests_ref[t * n_span + j]
            nblk = nblks_ref[t * n_span + j]
            for b in range(w_blocks):
                @pl.when(b < nblk)
                def _():
                    pltpu.make_async_copy(
                        gb_ref.at[pl.ds(base + b, 1)],
                        cand.at[pl.ds(dest + b, 1)], sems.at[j]).wait()

        # ---- per-row validity + sort keys, one [1,128] lane row per block
        from sags_tpu.ops.pallas_sort import bitonic_sort_rl

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        tx = tg % tiles_x
        ty = tg // tiles_x
        txf = tx.astype(jnp.float32)
        tyf = ty.astype(jnp.float32)
        T = float(tile)
        rows = []
        for b in range(_SORT_ROWS if ablate != "nokeys" else 0):
            if b >= w_blocks:
                rows.append(jnp.full((1, 128), _KEY_INVALID, jnp.int32))
                continue
            in_any = jnp.bool_(False)
            base_b = jnp.int32(0)
            s_b = jnp.int32(0)
            e_b = jnp.int32(0)
            for j in range(n_span):
                d = dests_ref[t * n_span + j]
                n = nblks_ref[t * n_span + j]
                hit = (d <= b) & (b < d + n)
                base_b = jnp.where(hit, bases_ref[t * n_span + j] + (b - d),
                                   base_b)
                s_b = jnp.where(hit, sstart_ref[t * n_span + j], s_b)
                e_b = jnp.where(hit, send_ref[t * n_span + j], e_b)
                in_any = in_any | hit
            blk = cand[b]  # [CH, 128]; unallocated blocks read garbage —
            # every use below is masked by `ok` (NaN compares are False)
            grow = base_b * 128 + lane
            ok = in_any & (grow >= s_b) & (grow < e_b)
            rx = blk[COL_RMIN_X:COL_RMIN_X + 1, :].astype(jnp.int32)
            ry = blk[COL_RMIN_Y:COL_RMIN_Y + 1, :].astype(jnp.int32)
            rw = blk[COL_RECT_W:COL_RECT_W + 1, :].astype(jnp.int32)
            rh = blk[COL_RECT_H:COL_RECT_H + 1, :].astype(jnp.int32)
            ok = ok & (rx <= tx) & (tx < rx + rw) & (ry <= ty) & (ty < ry + rh)
            # exact alpha cull (mirror of rasterize._tile_qmin/_cull_c2)
            mx, my = blk[0:1, :], blk[1:2, :]
            qa, qb, qc = blk[2:3, :], blk[3:4, :], blk[4:5, :]
            op = blk[5:6, :]
            c2 = jnp.maximum(
                2.0 * jnp.log(jnp.maximum(op / alpha_min, 1e-12)), 0.0
            ) * (1.0 + 1e-5) + 1e-6
            x0 = txf * T - mx
            x1 = txf * T + (T - 1.0) - mx
            y0 = tyf * T - my
            y1 = tyf * T + (T - 1.0) - my
            inside = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)
            a_s = jnp.maximum(qa, 1e-12)
            c_s = jnp.maximum(qc, 1e-12)

            def q_edge_x(xf):
                dy = jnp.clip(-qb * xf / c_s, y0, y1)
                return qa * xf * xf + 2.0 * qb * xf * dy + qc * dy * dy

            def q_edge_y(yf):
                dx = jnp.clip(-qb * yf / a_s, x0, x1)
                return qa * dx * dx + 2.0 * qb * dx * yf + qc * yf * yf

            qmin = jnp.minimum(
                jnp.minimum(q_edge_x(x0), q_edge_x(x1)),
                jnp.minimum(q_edge_y(y0), q_edge_y(y1)),
            )
            qmin = jnp.where(inside, 0.0, qmin)
            ok = ok & (qmin <= c2)
            dqv = blk[COL_DQ:COL_DQ + 1, :].astype(jnp.int32)
            key = jnp.where(
                ok, (dqv << _IDX_BITS) | (b * 128 + lane), _KEY_INVALID)
            rows.append(key)
        if ablate == "nokeys":  # PERF DIAGNOSIS: skip the key math
            ii = jax.lax.broadcasted_iota(
                jnp.int32, (_SORT_ROWS, 128), 1)
            keys = jnp.where(ii < 64, ii << _IDX_BITS, _KEY_INVALID)
        else:
            keys = jnp.concatenate(rows, axis=0)  # [_SORT_ROWS, 128]
        nv = jnp.sum((keys != _KEY_INVALID).astype(jnp.int32))
        if ablate == "nosort":  # PERF DIAGNOSIS: skip the bitonic network
            order_s[...] = keys
        else:
            order_s[...] = bitonic_sort_rl(keys)
        nv_s[0] = nv
        # nv rides out through an (8,128) VMEM block shared by 8 tiles
        # (TPU block-shape minimum); host reads column 0 of row t.
        nv_out[pl.ds(t % 8, 1)] = jnp.full((1, 128), nv, jnp.int32)

    @pl.when((c * K < nv_s[0]) & (jnp.max(t_s[...]) >= t_min))
    def _():
        def idx_of(kb):
            krow = order_s[c * (K // 128) + kb]  # [128] sorted keys
            return jnp.where(krow != _KEY_INVALID,
                             jnp.bitwise_and(krow, _IDX_MASK), -1)

        _select_and_composite(
            idx_of, lambda b: cand[b], gsel, acc_s, t_s, tg, K=K, CH=CH,
            tile=tile, tiles_x=tiles_x, alpha_min=alpha_min, t_min=t_min,
            w_blocks=w_blocks, bf16_obj=False, scan_impl=scan_impl,
            ablate=ablate, ewa_impl=ewa_impl, feat_prec=feat_prec,
        )

    @pl.when(c == NC - 1)
    def _():
        acc_out[0] = acc_s[...]
        t_out[0] = t_s[...][:, 0:1]


@functools.partial(
    jax.jit,
    static_argnames=("n_feat", "tile", "tiles_x", "alpha_min", "t_min",
                     "chunk", "n_span", "w_blocks", "k_tile", "interpret",
                     "scan_impl", "ablate", "ewa_impl", "feat_prec"),
)
def composite_windowed_sorted(
    gb: jax.Array,       # [NB_total, CH, 128] anchor-sorted blocked rows
    bases: jax.Array,    # [NT * n_span] span source block ids
    dests: jax.Array,    # [NT * n_span] span dest block offset in the window
    nblks: jax.Array,    # [NT * n_span] blocks allocated to the span
    sstarts: jax.Array,  # [NT * n_span] span start row (global, inclusive)
    sends: jax.Array,    # [NT * n_span] span end row (global, exclusive)
    n_feat: int,
    tile: int,
    tiles_x: int,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
    chunk: int = 256,
    n_span: int = 4,
    w_blocks: int = 12,
    k_tile: int = 512,   # per-tile compositing capacity (depth-nearest)
    interpret: bool = False,
    scan_impl: str = "roll",
    ablate: str = "",
    ewa_impl: str = "vpu",
    feat_prec: str = "highest",
    tile_offset=None,
):
    """Forward-only windowed compositor with in-kernel depth ordering.

    Returns (accum [NT, PIX, n_feat], T_final [NT, PIX], nv [NT] int32 —
    the exact per-tile alpha-gate-valid candidate count, BEFORE the k_tile
    capacity cut). NOT differentiable (render path; training uses the
    table-based or classic paths)."""
    NT = bases.shape[0] // n_span
    CH = gb.shape[1]
    PIX = tile * tile
    CF = n_feat
    assert w_blocks <= _SORT_ROWS, (w_blocks, _SORT_ROWS)
    assert w_blocks * 128 <= (1 << _IDX_BITS) * 1, "window ids exceed key bits"
    K = min(chunk, k_tile)
    assert K % 128 == 0 and k_tile % K == 0
    assert k_tile <= _SORT_ROWS * 128
    NC = k_tile // K

    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    else:
        tile_offset = jnp.asarray(tile_offset, jnp.int32).reshape(1)
    kern = functools.partial(
        _kernel_sorted, tile=tile, tiles_x=tiles_x, alpha_min=alpha_min,
        t_min=t_min, chunk=K, n_span=n_span, w_blocks=w_blocks,
        k_tile=k_tile, scan_impl=scan_impl, ablate=ablate, ewa_impl=ewa_impl,
        feat_prec=feat_prec,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(NT, NC),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, PIX, CF), lambda t, c, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 1), lambda t, c, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t, c, *_: (t // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((w_blocks, CH, 128), jnp.float32),
            pltpu.VMEM((CH, K), jnp.float32),
            pltpu.VMEM((PIX, CF), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((_SORT_ROWS, 128), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((n_span,)),
        ],
    )
    acc, T, nv = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NT, PIX, CF), jnp.float32),
            jax.ShapeDtypeStruct((NT, PIX, 1), jnp.float32),
            jax.ShapeDtypeStruct((-(-NT // 8) * 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(bases.astype(jnp.int32), dests.astype(jnp.int32),
      nblks.astype(jnp.int32), sstarts.astype(jnp.int32),
      sends.astype(jnp.int32), tile_offset, gb)
    return acc, T[..., 0], nv[:NT, 0]
