"""Fused warp + sigma-clip combine Pallas kernel.

The pipeline's peak-memory cost is the materialized warped stack (and
its coverage maps): (N, H, W) float32 each.  This kernel removes them:
the grid is (tile_rows, tile_cols, frame_group) with the frame axis
innermost; each step warps a small GROUP of frames' tiles on-chip
(two-pass separable Lanczos3 with polynomial weights — the same math
as ops/warp.warp_affine_separable; one multi-frame block DMA per
window position, since the window origins are frame-independent) into
a persistent VMEM scratch holding the N warped tile rows, and the
final group step runs the single-pass median/MAD/clip combine and
writes the output tile.  Nothing stack-sized is ever allocated beyond
the (apron-padded) input itself.

Source delivery uses ordinary BlockSpecs (manual ``make_async_copy``
from ANY-space inputs does not compile through this environment's
remote Mosaic toolchain).  The source window for an output tile is a
VBx3 block neighborhood whose origin depends ONLY on the tile, not the
frame: per-tile origins are the union of every frame's tap range,
precomputed outside and fed to the index maps via scalar prefetch.
Because the origin is frame-independent and the frame axis is
innermost, Mosaic's revisiting optimization skips the master-window
DMAs for all N consecutive frame steps of a tile — the dominant HBM
saving versus per-(frame, tile) windows (which re-fetched ~27 blocks of
master planes on every step).  The per-frame sub-window offsets are
realized as dynamic lane/sublane rotates (``pltpu.roll``) — or, as a
fallback, one-hot selection matmuls on the MXU — followed by static
slices.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import _L3_POLY
from .pallas_combine import _batcher_pairs

_MAD_TO_STD = 1.482602218505602


def _bitonic_merge_pairs(n: int):
    """Compare-exchange pairs of Batcher's bitonic MERGER for length n.

    Sorts any bitonic sequence (ascending-then-descending or any cyclic
    rotation — in particular the VALLEY |sorted_k - median| the MAD
    step produces) in log2(m) stages, ~1/3 the comparators of the full
    odd-even mergesort.  Conceptually the network runs on m = next
    power of two with +inf padding at the top; since the padding is
    maximal and exchanges only push maxima toward higher indices, every
    pair touching a pad index is a provable no-op and is elided."""
    m = 1
    while m < n:
        m *= 2
    pairs = []
    k = m // 2
    while k >= 1:
        for i in range(m):
            if (i & k) == 0 and i + k < n:
                pairs.append((i, i + k))
        k //= 2
    return pairs


def _l3(t):
    u = t * t
    acc = jnp.float32(_L3_POLY[-1])
    for c in _L3_POLY[-2::-1]:
        acc = acc * u + jnp.float32(c)
    return jnp.where(u < 9.0, acc, 0.0)




def _frame_bases(mats_ref, f, i, j, th, tw, span):
    """Per-(frame, tile) tap-range bases (scalar math, runs in-kernel).

    vbase/ubase are the first source row/column the vertical/horizontal
    tap loops may touch; identical formulas run vectorized outside in
    :func:`_tile_window_origins` so the per-tile union windows are
    consistent with the kernel's view."""
    m10 = mats_ref[f, 3]
    m11 = mats_ref[f, 4]
    m12 = mats_ref[f, 5]
    inv_m11 = 1.0 / m11
    gx = mats_ref[f, 0] - mats_ref[f, 1] * m10 * inv_m11
    gy = mats_ref[f, 1] * inv_m11
    g0 = mats_ref[f, 2] - mats_ref[f, 1] * m12 * inv_m11
    ti = jnp.float32(i * th) if not hasattr(i, "astype") \
        else (i * th).astype(jnp.float32)
    tj = jnp.float32(j * tw) if not hasattr(j, "astype") \
        else (j * tw).astype(jnp.float32)
    vmin = None
    for dy in (0.0, th - 1.0):
        for dx in (0.0, tw - 1.0):
            cand = m10 * (tj + dx) + m11 * (ti + dy) + m12
            vmin = cand if vmin is None else jnp.minimum(vmin, cand)
    umin = None
    for dy in (-3.0, float(th + span)):
        for dx in (0.0, tw - 1.0):
            cand = gx * (tj + dx) + gy * (vmin + dy) + g0
            umin = cand if umin is None else jnp.minimum(umin, cand)
    vbase = jnp.floor(vmin).astype(jnp.int32) - 3
    ubase = jnp.floor(umin).astype(jnp.int32) - 3
    return vbase, ubase


def _tile_window_origins(mats6, n_ti, n_tj, th, tw, span,
                         npi, npj, vb, hb, oy, ox, bh, bw):
    """Frame-independent per-tile window origins (padded block coords).

    For every tile, the union over frames of the kernel's tap-range
    bases (same corner formulas as :func:`_frame_bases`, vectorized),
    floored to the DELIVERY-block grid (``bh`` x ``bw`` — a sub-tile
    granularity, so quantization wastes at most bh-1/bw-1 pixels
    instead of a full tile) and clipped so a VBxHB neighborhood stays
    in range.  Returns int32 (n_ti, n_tj) arrays (byp, bxp)."""
    m = mats6.astype(jnp.float32)
    m10, m11, m12 = m[:, 3], m[:, 4], m[:, 5]
    inv_m11 = 1.0 / m11
    gx = m[:, 0] - m[:, 1] * m10 * inv_m11
    gy = m[:, 1] * inv_m11
    g0 = m[:, 2] - m[:, 1] * m12 * inv_m11
    ti = (jnp.arange(n_ti, dtype=jnp.float32) * th)[None, :, None]
    tj = (jnp.arange(n_tj, dtype=jnp.float32) * tw)[None, None, :]

    def per_f(a):
        return a[:, None, None]

    vmin = None
    for dy in (0.0, th - 1.0):
        for dx in (0.0, tw - 1.0):
            cand = per_f(m10) * (tj + dx) + per_f(m11) * (ti + dy) \
                + per_f(m12)
            vmin = cand if vmin is None else jnp.minimum(vmin, cand)
    umin = None
    for dy in (-3.0, float(th + span)):
        for dx in (0.0, tw - 1.0):
            cand = per_f(gx) * (tj + dx) + per_f(gy) * (vmin + dy) \
                + per_f(g0)
            umin = cand if umin is None else jnp.minimum(umin, cand)
    vbase = jnp.floor(vmin).astype(jnp.int32) - 3
    ubase = jnp.floor(umin).astype(jnp.int32) - 3
    # center the window on the MEDIAN frame's tap range rather than the
    # min: one garbage matrix (a failed registration) would drag a
    # min-based origin away and exclude every GOOD frame via base_ok;
    # median-centering keeps the majority contained and lets the
    # outlier be the one excluded.  The margin is half the slack that
    # REMAINS after block quantization (floor_divide can place the
    # window start up to a full block-1 below the target, adding bh-1 /
    # bw-1 to the offset) — a naive half-window margin plus that
    # rounding overflowed containment for unlucky translations
    thp = -(-(th + span) // 8) * 8
    margin_y = max((vb * bh - thp - (bh - 1)) // 2, 0)
    margin_x = max((hb * bw - (tw + span) - (bw - 1)) // 2, 0)
    vmed = jnp.median(vbase, axis=0).astype(jnp.int32)
    umed = jnp.median(ubase, axis=0).astype(jnp.int32)
    byp = jnp.clip(jnp.floor_divide(vmed - margin_y, bh) + oy,
                   0, npi - vb)
    bxp = jnp.clip(jnp.floor_divide(umed - margin_x, bw) + ox,
                   0, npj - hb)
    return byp.astype(jnp.int32), bxp.astype(jnp.int32)


def _make_kernel(n, th, tw, span, h_in, w_in, vb, hb, bh, bw, oy, ox,
                 sigma_lo, sigma_hi, align, combine, has_masters,
                 fgroup=1, cchunk=None, lr_tol=0.0,
                 general_taps="exact"):
    cw = tw if cchunk is None else cchunk
    wh = vb * bh     # window height
    ww = hb * bw     # window width
    thp = -(-(th + span) // 8) * 8       # extracted rows (sublane-padded)
    twp = -(-(tw + span) // 128) * 128   # aligned cols (lane-padded)

    def kernel(mats_ref, byp_ref, bxp_ref, *refs):
        nblk = vb * hb
        blocks = refs[:nblk]
        n_in = 2 * nblk if has_masters else nblk
        mblocks = refs[nblk:2 * nblk] if has_masters else None
        out_ref = refs[n_in]
        rows_ref = refs[n_in + 1]
        win_ref = refs[n_in + 2]
        ms_ref = refs[n_in + 3]
        i = pl.program_id(0)
        j = pl.program_id(1)
        grp = pl.program_id(2)

        win_y0 = (byp_ref[i, j] - oy) * bh
        win_x0 = (bxp_ref[i, j] - ox) * bw
        # output-pixel coordinates (shared by every frame of the group)
        rr = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) \
            .astype(jnp.float32)
        cc = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) \
            .astype(jnp.float32)
        y_out = i.astype(jnp.float32) * th + rr
        x_out = j.astype(jnp.float32) * tw + cc
        # source-row coverage bounds: (2, h_in - 4) standalone; a
        # row-sharded caller narrows them so taps never reach the
        # zero-filled halo beyond the global image (parallel/fused.py)
        vlo = mats_ref[0, 9]
        vhi = mats_ref[0, 10]
        big = jnp.float32(3.4e38)

        for g in range(fgroup):
            _warp_one(mats_ref, blocks, mblocks, rows_ref, win_ref,
                      i, j, grp * fgroup + g, g, win_y0, win_x0,
                      rr, cc, y_out, x_out, vlo, vhi, big)

        _run_combine(rows_ref, out_ref, ms_ref, grp, big)

    def _warp_one(mats_ref, blocks, mblocks, rows_ref, win_ref,
                  i, j, f, g, win_y0, win_x0, rr, cc, y_out, x_out,
                  vlo, vhi, big):
        vbase, ubase = _frame_bases(mats_ref, f, i, j, th, tw, span)
        offy = vbase - win_y0
        offx = ubase - win_x0

        # assemble + calibrate the source window on-chip:
        # cal = raw * A - B - exp_ratio * C  with A=1/flat,
        # B=bias/flat, C=dark/flat precomputed outside.  In roll mode
        # only the <= 2 block rows this frame's taps can reach
        # ([offy, offy+th+span)) are calibrated; rows outside feed
        # nothing (stale values pass through the rotate into the
        # never-consumed pad rows only).  The one-hot matmul path must
        # assemble every row: a stale NaN row times a zero one-hot
        # weight still poisons the product.
        exp_r = mats_ref[f, 6]
        flux_s = mats_ref[f, 7]

        def assemble_row(dy):
            for dx in range(hb):
                raw_blk = blocks[dy * hb + dx][g]
                if raw_blk.dtype == jnp.uint16:
                    # Mosaic lacks a direct u16->f32 cast
                    raw = raw_blk.astype(jnp.int32).astype(jnp.float32)
                else:
                    raw = raw_blk.astype(jnp.float32)
                if has_masters:
                    mb = mblocks[dy * hb + dx]
                    cal_blk = (raw * mb[0] - mb[1] - exp_r * mb[2]) \
                        * flux_s  # A, B, C planes, then FSCALE
                else:
                    # pre-calibrated input: FSCALE only (no identity
                    # master planes are delivered or multiplied)
                    cal_blk = raw * flux_s
                win_ref[dy * bh:(dy + 1) * bh, dx * bw:(dx + 1) * bw] = \
                    cal_blk

        for dy in range(vb):
            if align == "roll":
                row_needed = (((dy + 1) * bh > offy)
                              & (dy * bh < offy + th + span))
                pl.when(row_needed)(functools.partial(assemble_row, dy))
            else:
                assemble_row(dy)

        m00 = mats_ref[f, 0]
        m01 = mats_ref[f, 1]
        m02 = mats_ref[f, 2]
        m10 = mats_ref[f, 3]
        m11 = mats_ref[f, 4]
        m12 = mats_ref[f, 5]
        is_trans = mats_ref[f, 8] > 0.5
        inv_m11 = 1.0 / m11
        gx = m00 - m01 * m10 * inv_m11
        gy = m01 * inv_m11
        g0 = m02 - m01 * m12 * inv_m11

        # the window must contain every tap a COVERED pixel can use:
        # coverage restricts absolute taps to [0, h_in) x [0, w_in), and
        # the tap loops reach [vbase, vbase + th + span).  A clipped
        # window origin at a frame edge still satisfies this (the
        # window ends exactly at the frame edge); only extreme
        # misalignment (dither spread beyond the VBx3 union budget)
        # fails, and those (frame, tile) pairs are zeroed instead of
        # reading garbage (rotate wraparound / one-hot zero rows only
        # ever meet coverage-excluded pixels).
        base_ok = ((win_y0 <= jnp.maximum(vbase, 0))
                   & (jnp.minimum(vbase + th + span, h_in) <= win_y0 + wh)
                   & (win_x0 <= jnp.maximum(ubase, 0))
                   & (jnp.minimum(ubase + tw + span, w_in) <= win_x0 + ww))

        # align the per-frame tap range to the window start:
        # ext[r', c'] = win[offy + r', offx + c']  for the thp x twp
        # region the tap loops touch
        if align == "roll":
            rolled = pltpu.roll(win_ref[:, :], jnp.mod(-offy, wh), axis=0)
            ext = rolled[0:thp, :]
            alig = pltpu.roll(ext, jnp.mod(-offx, ww), axis=1)[:, 0:twp]
        else:  # one-hot selection matmuls on the MXU
            r_e = jax.lax.broadcasted_iota(jnp.int32, (thp, wh), 0)
            c_e = jax.lax.broadcasted_iota(jnp.int32, (thp, wh), 1)
            p_e = (c_e == r_e + offy).astype(jnp.float32)
            ext = jnp.dot(p_e, win_ref[:, :],
                          preferred_element_type=jnp.float32)
            r_h = jax.lax.broadcasted_iota(jnp.int32, (ww, twp), 0)
            c_h = jax.lax.broadcasted_iota(jnp.int32, (ww, twp), 1)
            p_h = (r_h == c_h + offx).astype(jnp.float32)
            alig = jnp.dot(ext, p_h, preferred_element_type=jnp.float32)

        v = m10 * x_out + m11 * y_out + m12
        v_loc = v - vbase.astype(jnp.float32)
        sx = m00 * x_out + m01 * y_out + m02
        cover = ((sx >= 2.0) & (sx <= w_in - 4.0)
                 & (v >= vlo) & (v <= vhi) & base_ok)

        # static-span containment gates (general tap bodies only; the
        # snapped path's tap centers are the constants [3, 4)): the tap
        # loops reach s in [0, span) past each floored base, the base
        # anchoring puts the minimum tap center in [3, 4), and Lanczos3
        # support is +-3 — so the SHEAR that moves the needed support
        # across the tile must satisfy shear <= span - 7.  Frames
        # beyond (rotations over ~0.28 deg at (64, 1024) tiles and
        # span 12) are coverage-EXCLUDED per the kernel's
        # graceful-degradation contract instead of silently resampled
        # from PARTIAL tap support (weight-sum normalization over a
        # truncated kernel support biases the sample toward the
        # available side).  eps covers f32 rounding of the base floors
        # at 4k coordinate scale.
        sp_eps = 0.01
        sv_sh = jnp.abs(m10) * (tw - 1.0) + jnp.abs(m11 - 1.0) * (th - 1.0)
        su_ex = jnp.abs(gy) * (thp - 1.0) + jnp.abs(gx - 1.0) * (tw - 1.0)
        span_ok_v = sv_sh <= span - 7.0 - sp_eps

        @pl.when(is_trans)
        def _taps_translation():
            # pure-translation frames (snapped outside when the affine
            # differs from a translation by < snap_tol px anywhere on
            # the grid): u_loc - (sc + s) = j*tw + tx - ubase - s is
            # CONSTANT over the tile, so the Lanczos weights are 2*span
            # scalars — the per-pixel work collapses from ~2*span
            # polynomial evaluations + divides to 2*span scalar FMAs
            a_u = j.astype(jnp.float32) * tw + g0 \
                - ubase.astype(jnp.float32)
            # the floor(min)-3 base anchoring puts a_u/a_v in [3, 4)
            # EXACTLY for snapped (pure-translation) matrices, and
            # Lanczos3 support is |x| < 3 — so taps 0 and >= 7 always
            # carry exactly zero weight on this path.  Restricting the
            # loops statically drops 2 of 8 slides/FMA-planes per pass
            # at the bench span (6 of 12 at the default span)
            t_lo, t_hi = (1, min(span, 7)) if span >= 7 else (0, span)
            taps = list(range(t_lo, t_hi))
            ws = [_l3(a_u - s) for s in taps]
            wsum = functools.reduce(lambda x, y: x + y, ws)
            inv = jnp.where(jnp.abs(wsum) > 1e-3, 1.0 / wsum, 0.0)
            if tw % 128 == 0 and twp == tw + 128 and span <= 128:
                # banded-matrix MXU horizontal pass: with scalar
                # weights mid = alig @ B (B[c+s, c] = ws[s]*inv), run
                # per 128-lane output tile on its 256-lane window.
                # The per-term sliding VPU formulation below costs ~3
                # vector ops per element-term (each tap slice is lane-
                # UNALIGNED — measured 8.3 ms/span-unit of the 100 x
                # 4096^2 kernel, ~4x the FMA roofline); the banded
                # matmul does the alignment inside the MXU.  f32
                # values and weights ride the MXU as an exact hi/lo
                # bf16 split (3 matmuls; the dropped lo@lo term is
                # ~2^-18 relative — far below the unfused path's own
                # reassociation noise)
                jj = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
                cc2 = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
                bmat = jnp.zeros((256, 128), jnp.float32)
                for k, s in enumerate(taps):
                    bmat = bmat + jnp.where(jj == cc2 + s, ws[k] * inv,
                                            0.0)
                b_hi = bmat.astype(jnp.bfloat16)
                b_lo = (bmat - b_hi.astype(jnp.float32)) \
                    .astype(jnp.bfloat16)
                a_f = alig[0:thp, :]
                a_hi = a_f.astype(jnp.bfloat16)
                a_lo = (a_f - a_hi.astype(jnp.float32)) \
                    .astype(jnp.bfloat16)
                tiles = []
                for t2 in range(tw // 128):
                    sl = slice(128 * t2, 128 * t2 + 256)
                    ah = a_hi[:, sl]
                    al = a_lo[:, sl]
                    tiles.append(
                        jnp.dot(ah, b_hi,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(ah, b_lo,
                                  preferred_element_type=jnp.float32)
                        + jnp.dot(al, b_hi,
                                  preferred_element_type=jnp.float32))
                mid = jnp.concatenate(tiles, axis=1)
            else:
                mid = (ws[0] * inv) * alig[0:thp, taps[0]:taps[0] + tw]
                for k, s in list(enumerate(taps))[1:]:
                    mid = mid + (ws[k] * inv) * alig[:, s:s + tw]
            a_v = i.astype(jnp.float32) * th + m12 \
                - vbase.astype(jnp.float32)
            ws2 = [_l3(a_v - s) for s in taps]
            wsum2 = functools.reduce(lambda x, y: x + y, ws2)
            inv2 = jnp.where(jnp.abs(wsum2) > 1e-3, 1.0 / wsum2, 0.0)
            # vertical pass stays on the VPU: its tap slices shift
            # SUBLANES (cheap), and an MXU formulation measured 7.5 ms
            # SLOWER at 100x4096^2 (contraction dim 72 underfills the
            # systolic array and the extra hi/lo splits of mid cost
            # more than the slides)
            warped = (ws2[0] * inv2) * mid[taps[0]:taps[0] + th, :]
            for k, s in list(enumerate(taps))[1:]:
                warped = warped + (ws2[k] * inv2) * mid[s:s + th, :]
            rows_ref[f] = jnp.where(cover, warped, big)

        if general_taps == "lowrank":
            # low-rank weight decomposition: the horizontal tap
            # distance is
            #   t(r', c, s) = [gx*tj + gy*(vbase + r') + g0 - ubase]
            #                 + (gx - 1)*c - s
            # — a per-ROW base plus a per-COLUMN drift of magnitude
            # |gx - 1|*(tw-1)/2 about the tile center (symmetrically
            # (m11 - 1)*(th-1)/2 for the vertical pass).  Dropping the
            # drift collapses the per-tap weight work from a degree-10
            # polynomial over the full (thp, tw) grid to one
            # evaluation on a (thp, 1) / (1, tw) vector.  Because the
            # weight SUM normalizes the taps and sum_s L3'(b - s) ~ 0
            # (it is d/db of the near-constant sum_s L3(b - s)), the
            # value error is a pure sampling-position displacement
            # <= the drift — the SAME error class and bound as the
            # translation-snap path, and ~10x under it at real
            # stacking geometries (0.25 deg at tw=1024: 4.9e-3 px).
            # Frames whose drift exceeds ``lr_tol`` (rotations beyond
            # ~0.8 deg at tw=1024, or garbage registration matrices)
            # are EXCLUDED via coverage — the kernel's established
            # graceful-degradation contract (cf. dither_budget /
            # base_ok) — rather than resampled approximately; callers
            # needing arbitrary-angle warps use general_taps='exact'.
            # This is a compile-time choice so the kernel only ever
            # carries TWO tap bodies: a third live branch measurably
            # taxes Mosaic's register allocation (~25% on the
            # executed path at 100 x 4096^2).
            # static tap restriction: the per-row base bu sits in
            # [3 - drift, 4 + su_lr), so tap 0 carries at most
            # L3(2.95) ~ 3e-4 of weight mass (drift-class, absorbed by
            # normalization) and taps >= 7 + su_lr carry none.  With
            # su_lr gated <= t1hi - 7 the static range [1, t1hi)
            # contains the support: 8 taps instead of span=12 on the
            # (thp, tw) pass-1 grid (at the 0.8 deg drift-gate
            # boundary su_lr = 1.11 at thp=80, inside the t1hi=9
            # budget).  Pass 2 keeps [1, span): its per-column base bv
            # has the same lower anchoring, and the upper side is the
            # span_ok_v vertical-shear gate shared with the exact body.
            t1hi = min(span, 9)
            su_lr = (jnp.abs(gy) * (thp - 1.0)
                     + jnp.abs(gx - 1.0) * ((tw - 1.0) * 0.5))
            in_gate = ((jnp.abs(gx - 1.0) * ((tw - 1) * 0.5) < lr_tol)
                       & (jnp.abs(m11 - 1.0) * ((th - 1) * 0.5)
                          < lr_tol)
                       & (su_lr <= t1hi - 7.0 - sp_eps) & span_ok_v)
            cover_g = cover & in_gate

            @pl.when(jnp.logical_not(is_trans))
            def _taps_lowrank():
                rp = jax.lax.broadcasted_iota(jnp.int32, (thp, 1), 0) \
                    .astype(jnp.float32)
                bu = (gx * (j.astype(jnp.float32) * tw)
                      + gy * (vbase.astype(jnp.float32) + rp) + g0
                      - ubase.astype(jnp.float32)
                      + (gx - 1.0) * ((tw - 1) * 0.5))      # (thp, 1)
                acc0 = jnp.zeros((thp, tw), jnp.float32)
                w0s = jnp.zeros((thp, 1), jnp.float32)
                for s in range(1, t1hi):
                    w0 = _l3(bu - s)
                    acc0 = acc0 + w0 * alig[:, s:s + tw]
                    w0s = w0s + w0
                # rank-1 normalization: the weight sum lives on a
                # (thp, 1) vector, so reciprocate THERE and broadcast a
                # multiply — a full-grid divide (and its two selects)
                # would pay the VPU's worst op on every pixel
                inv0 = jnp.where(jnp.abs(w0s) > 1e-3, 1.0 / w0s, 0.0)
                mid = acc0 * inv0

                # vertical: t(r, c, s) = [m10*x_out + m11*i*th + m12
                # - vbase] + (m11 - 1)*r - s — per-column base
                bv = (m10 * x_out[0:1, :]
                      + m11 * (i.astype(jnp.float32) * th) + m12
                      - vbase.astype(jnp.float32)
                      + (m11 - 1.0) * ((th - 1) * 0.5))     # (1, tw)
                acc2 = jnp.zeros((th, tw), jnp.float32)
                v0s = jnp.zeros((1, tw), jnp.float32)
                for s in range(1, span):
                    w0 = _l3(bv - s)
                    acc2 = acc2 + w0 * mid[s:s + th, :]
                    v0s = v0s + w0
                inv2 = jnp.where(jnp.abs(v0s) > 1e-3, 1.0 / v0s, 0.0)
                warped = acc2 * inv2
                rows_ref[f] = jnp.where(cover_g, warped, big)

            return

        @pl.when(jnp.logical_not(is_trans))
        def _taps_general():
            # horizontal pass over the thp extracted rows (source rows
            # vbase + r'); output columns j*tw + c
            sr = jax.lax.broadcasted_iota(jnp.int32, (thp, tw), 0) \
                .astype(jnp.float32)
            sc = jax.lax.broadcasted_iota(jnp.int32, (thp, tw), 1) \
                .astype(jnp.float32)
            yprime = vbase.astype(jnp.float32) + sr
            x_cols = j.astype(jnp.float32) * tw + sc
            u = gx * x_cols + gy * yprime + g0
            u_loc = u - ubase.astype(jnp.float32)

            acc = jnp.zeros((thp, tw), jnp.float32)
            wsum = jnp.zeros((thp, tw), jnp.float32)
            for s in range(span):
                wgt = _l3(u_loc - (sc + s))
                acc = acc + wgt * alig[:, s:s + tw]
                wsum = wsum + wgt
            safe = jnp.abs(wsum) > 1e-3
            mid = jnp.where(safe, acc / jnp.where(safe, wsum, 1.0), 0.0)

            # vertical pass onto the output tile
            acc2 = jnp.zeros((th, tw), jnp.float32)
            wsum2 = jnp.zeros((th, tw), jnp.float32)
            for s in range(span):
                wgt = _l3(v_loc - (rr + s))
                acc2 = acc2 + wgt * mid[s:s + th, :]
                wsum2 = wsum2 + wgt
            safe2 = jnp.abs(wsum2) > 1e-3
            warped = jnp.where(
                safe2, acc2 / jnp.where(safe2, wsum2, 1.0), 0.0)
            cover_x = (cover & span_ok_v
                       & (su_ex <= span - 7.0 - sp_eps))
            rows_ref[f] = jnp.where(cover_x, warped, big)

    def _run_combine(rows_ref, out_ref, ms_ref, grp, big):
        @pl.when(grp == n // fgroup - 1)
        def _():
            # static column chunks: the sort network keeps ~3 live
            # copies of its n operand planes, so chunking the combine
            # to (th, cw) decouples that VMEM peak from the tile width
            # (wide tiles amortize per-grid-step costs; the combine is
            # a small share of kernel time, so chunking it is ~free)
            for c0 in range(0, tw, cw):
                _combine_chunk(rows_ref, out_ref, ms_ref, big, c0)

    def _combine_chunk(rows_ref, out_ref, ms_ref, big, c0):
            cs = slice(c0, c0 + cw)
            frames = [rows_ref[k, :, cs] for k in range(n)]
            valid = [fr < big * 0.5 for fr in frames]
            count = functools.reduce(
                lambda a, b: a + b,
                [v_.astype(jnp.float32) for v_ in valid])
            counti = count.astype(jnp.int32)

            if combine == "mean":
                # plain coverage-weighted mean, no clipping: skips both
                # Batcher sorts entirely (ccdproc method='average' with
                # sigma_clip=False)
                accm = jnp.zeros((th, cw), jnp.float32)
                for fr, v_ in zip(frames, valid):
                    accm = accm + jnp.where(v_, fr, 0.0)
                out_ref[:, cs] = jnp.where(
                    counti > 0, accm / jnp.maximum(count, 1.0), 0.0)
                return

            srt = list(frames)
            for a, b in _batcher_pairs(n):
                lo = jnp.minimum(srt[a], srt[b])
                hi = jnp.maximum(srt[a], srt[b])
                srt[a], srt[b] = lo, hi
            # full-coverage fast path: on interior tiles every frame
            # covers every pixel, so the median/MAD ranks are the
            # COMPILE-TIME constants (n-1)//2, n//2 and the n-step
            # rank-select where-chains collapse to static picks.  The
            # whole-tile predicate dispatches between the two variants;
            # ms_ref scratch carries med (then std) across the shared
            # deviation-merge stage.
            full_tile = jnp.min(counti) >= n
            lo_idx = jnp.maximum((counti - 1) // 2, 0)
            hi_idx = jnp.maximum(counti // 2, 0)

            @pl.when(full_tile)
            def _med_static():
                ms_ref[:, cs] = 0.5 * (srt[(n - 1) // 2] + srt[n // 2])

            @pl.when(jnp.logical_not(full_tile))
            def _med_select():
                med_lo = jnp.zeros((th, cw), jnp.float32)
                med_hi = jnp.zeros((th, cw), jnp.float32)
                for k in range(n):
                    med_lo = jnp.where(lo_idx == k, srt[k], med_lo)
                    med_hi = jnp.where(hi_idx == k, srt[k], med_hi)
                ms_ref[:, cs] = 0.5 * (med_lo + med_hi)

            med = ms_ref[:, cs]
            # deviations of the SORTED values form a valley (descending
            # to the median, then ascending; invalid entries hold the
            # big sentinel, so their deviations are maximal and already
            # sit at the tail) — a bitonic sequence, so the cheap merge
            # network sorts it instead of a second full sort
            devs = [jnp.abs(s - med) for s in srt]
            for a, b in _bitonic_merge_pairs(n):
                lo = jnp.minimum(devs[a], devs[b])
                hi = jnp.maximum(devs[a], devs[b])
                devs[a], devs[b] = lo, hi

            @pl.when(full_tile)
            def _mad_static():
                ms_ref[:, cs] = _MAD_TO_STD * 0.5 \
                    * (devs[(n - 1) // 2] + devs[n // 2])

            @pl.when(jnp.logical_not(full_tile))
            def _mad_select():
                mad_lo = jnp.zeros((th, cw), jnp.float32)
                mad_hi = jnp.zeros((th, cw), jnp.float32)
                for k in range(n):
                    mad_lo = jnp.where(lo_idx == k, devs[k], mad_lo)
                    mad_hi = jnp.where(hi_idx == k, devs[k], mad_hi)
                ms_ref[:, cs] = _MAD_TO_STD * 0.5 * (mad_lo + mad_hi)

            std = ms_ref[:, cs]
            lo_b = med - sigma_lo * std
            hi_b = med + sigma_hi * std
            acc3 = jnp.zeros((th, cw), jnp.float32)
            cnt = jnp.zeros((th, cw), jnp.float32)
            below = jnp.zeros((th, cw), jnp.int32)
            for fr, v_ in zip(frames, valid):
                keep = v_ & (fr >= lo_b) & (fr <= hi_b)
                acc3 = acc3 + jnp.where(keep, fr, 0.0)
                cnt = cnt + keep.astype(jnp.float32)
                below = below + (v_ & (fr < lo_b)).astype(jnp.int32)
            if combine == "median":
                # masked median of the KEPT values (ops/stack semantics:
                # clip, then median).  Kept values are contiguous in the
                # valid-ascending sort: ranks [below, below + cnt)
                cnti = cnt.astype(jnp.int32)
                klo = below + jnp.maximum((cnti - 1) // 2, 0)
                khi = below + jnp.maximum(cnti // 2, 0)
                m_lo = jnp.zeros((th, cw), jnp.float32)
                m_hi = jnp.zeros((th, cw), jnp.float32)
                for k in range(n):
                    m_lo = jnp.where(klo == k, srt[k], m_lo)
                    m_hi = jnp.where(khi == k, srt[k], m_hi)
                out_ref[:, cs] = jnp.where(cnt > 0, 0.5 * (m_lo + m_hi), 0.0)
            elif combine == "sum":
                # sum of kept values (ops/stack 'sum')
                out_ref[:, cs] = jnp.where(cnt > 0, acc3, 0.0)
            else:
                out_ref[:, cs] = jnp.where(
                    cnt > 0, acc3 / jnp.maximum(cnt, 1.0), 0.0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tile", "span", "sigma_lower",
                                    "sigma_upper", "apron", "align",
                                    "combine", "dither_budget",
                                    "snap_tol", "frame_group",
                                    "block_div", "combine_chunk",
                                    "general_taps", "interpret"))
def pallas_warp_combine(
    cal: jnp.ndarray,
    matrices: jnp.ndarray,
    masters: "jnp.ndarray | None" = None,
    exp_ratios: "jnp.ndarray | None" = None,
    flux_scales: "jnp.ndarray | None" = None,
    tile: "Tuple[int, int] | None" = None,
    span: int = 12,
    sigma_lower: float = 5.0,
    sigma_upper: float = 5.0,
    apron: bool = True,
    align: str = "roll",
    combine: str = "average",
    dither_budget: int = 64,
    snap_tol: float = 0.05,
    v_bounds: "jnp.ndarray | None" = None,
    snap_geom: "jnp.ndarray | None" = None,
    frame_group: "int | None" = None,
    block_div: "Tuple[int, int] | None" = None,
    combine_chunk: "int | None" = None,
    general_taps: str = "exact",
    interpret: bool = False,
) -> jnp.ndarray:
    """Warp every frame by its matrix and sigma-clip-combine, fused —
    optionally calibrating RAW frames on-chip so the f32 calibrated
    stack never exists.

    ``cal`` (N, H, W) float32 calibrated frames, or raw uint16/float
    frames when ``masters`` is given; ``matrices`` (N, 2, 3)
    output->source affine maps with |translation| < one tile and
    stacking-scale rotations — the non-snapped tap paths ENFORCE span
    containment (tile shear |m10|*(tw-1) + |m11-1|*(th-1) and its
    horizontal mirror must stay <= span - 7, ~0.28 deg at (64, 1024)
    tiles and span 12): frames beyond are coverage-excluded per tile,
    never resampled from partial Lanczos support (use ops/warp.py's
    unfused resampler for arbitrary-angle mosaics);
    ``masters`` (3, H, W): A=1/flat,
    B=bias/flat, C=dark/flat so cal = raw*A - B - exp_ratio*C;
    ``exp_ratios`` (N,) light/dark exposure ratios (default 1);
    ``flux_scales`` (N,) per-frame multipliers applied to the
    calibrated values before combining — the swarp FSCALE-from-EXPOSURE
    behavior (reference scripts/resample_all.sh:300-314).
    ``align`` is 'roll' (dynamic lane/sublane rotates) or 'onehot'
    (MXU selection matmuls — fallback for toolchains without dynamic
    rotate).  ``dither_budget`` is the guaranteed per-axis spread
    (max minus min, px) of frame translations the shared per-tile
    windows absorb: any frame set whose offsets span at most this many
    pixels is fully contained regardless of where the median offset
    sits (the window carries a full budget of margin on EACH side of
    the median frame base).  Frames beyond the spread are excluded per
    tile via coverage rather than resampled from out-of-window data
    (raise it for mosaic-scale offsets — it may demand taller tiles).
    ``combine`` is 'average' (sigma-clipped mean), 'median'
    (plain masked median, swarp COMBINE_TYPE MEDIAN), or 'sum'
    (clip-rescaled sum).
    ``snap_tol`` (px, static): frames whose affine differs from a pure
    translation by less than this anywhere on the grid are snapped to
    that translation and take a ~10x cheaper scalar-weight tap path
    (0 disables).
    ``general_taps`` (static): the non-snapped tap path.  'exact'
    (default) evaluates per-pixel Lanczos weights — any affine.
    'lowrank' drops the per-column weight drift (|gx-1|*(tw-1)/2 px,
    and its vertical mirror) so weights collapse to per-row/per-column
    vectors (~25% faster at stacking scale); the committed
    displacement is bounded by ``snap_tol`` — the same error class and
    bound as the snap path — and frames beyond the bound (rotations
    over ~0.8 deg at tw=1024, or garbage matrices) are
    coverage-EXCLUDED rather than approximated.  Use 'lowrank' for
    dither+field-rotation stacking; keep 'exact' for arbitrary-angle
    mosaics.  ``v_bounds`` (2,) traced (vlo, vhi) source-row
    coverage bounds, default (2, H-4) — a row-sharded caller narrows
    them to keep taps off the zero-filled halo beyond the global image.
    ``combine_chunk`` runs the sigma-clip combine over static
    (th, combine_chunk) column chunks so the sort network's ~3 live
    copies of the n operand planes scale with the chunk, not the tile
    width — the enabler for wide tiles under the scoped-VMEM cap
    (None = whole tile).  Returns (H, W).
    """
    import jax as _jax

    if _jax.default_backend() == "cpu" and not interpret:
        # Mosaic kernels need the interpreter on the CPU backend
        return pallas_warp_combine(cal, matrices, masters=masters,
                                   exp_ratios=exp_ratios,
                                   flux_scales=flux_scales, tile=tile,
                                   span=span, sigma_lower=sigma_lower,
                                   sigma_upper=sigma_upper, apron=apron,
                                   align=align, combine=combine,
                                   dither_budget=dither_budget,
                                   snap_tol=snap_tol, v_bounds=v_bounds,
                                   snap_geom=snap_geom,
                                   frame_group=frame_group,
                                   block_div=block_div,
                                   combine_chunk=combine_chunk,
                                   general_taps=general_taps,
                                   interpret=True)
    if combine not in ("average", "median", "sum", "mean"):
        raise ValueError(f"unknown combine '{combine}'")
    if general_taps not in ("exact", "lowrank"):
        raise ValueError(f"unknown general_taps '{general_taps}'")
    if general_taps == "lowrank" and not snap_tol > 0.0:
        raise ValueError("general_taps='lowrank' needs snap_tol > 0 "
                         "(it bounds the committed drift; with 0 every "
                         "non-translation frame would be excluded)")
    n, h0, w0 = cal.shape
    if tile is None:
        # auto tile: per-grid-step fixed costs (DMA descriptors +
        # Mosaic dispatch) dominate this kernel, so fewer/bigger tiles
        # win until the VMEM footprint degrades the scheduler's
        # pipelining.  Measured at n=100 x 4096^2 (ms): (112,512) 220,
        # (96,1024) 305, (80,1024)+cchunk256 206, (64,1024)+cchunk256
        # 204.6 <- peak (and the most VMEM headroom), (80,1536) 345,
        # fgroup=4 282.  The persistent warped-rows scratch
        # (n*th*tw*4 B) bounds th; the chunked combine (below) keeps
        # the sort temporaries off the tile width
        tw = 1024 if w0 >= 3072 else (512 if w0 >= 1536 else 256)
        budget = 27_000_000 if tw >= 1024 else 23_000_000
        cap = 64 if tw >= 1024 else 112
        th = min(cap, max(16, (budget // (max(n, 1) * tw * 4)) // 8 * 8))
        tile = (th, tw)
    th, tw = tile
    if combine_chunk is None and tw >= 1024:
        # wide tiles rely on combine chunking to fit the scoped-VMEM
        # cap (results are chunk-invariant; see docstring).  128 beats
        # 256/512 (155 vs 163/160 ms standalone at 100x4096^2): the
        # smaller sort working set pipelines better through VMEM
        combine_chunk = 128
    if th <= span:
        raise ValueError("tile height must exceed span")
    # source-window DELIVERY blocks: tile-sized by default.  block_div
    # = (ky, kx) subdivides them (bh = th/ky, bw = tw/kx), shrinking
    # the per-tile window toward the minimum that covers taps +
    # quantization + dither — less HBM re-read and smaller roll
    # buffers, but MORE block positions (DMA descriptors) per grid
    # step.  Measured on v5e at 100x4096^2: at the narrow round-2
    # (80, 512) tile, (2, 2) cut window bytes ~2.4x yet gained only
    # ~4% (per-DMA fixed costs offset the byte savings); at the wide
    # (64, 1024)+cchunk256 production tile the savings dominate:
    # (1, 2) 196.9 -> 179.8 ms, (2, 2) -> 175.3 ms (the shared window
    # overreads in BOTH axes once the tile is wide; quartering its
    # bytes costs three extra DMAs per grid step).  On the ROTATION
    # workload (lowrank taps, dither_budget=32) the same tradeoff
    # holds: (2, 4) shrinks window bytes 25% more yet regresses 196.0
    # -> 206.5 ms (36 vs 24 block positions per grid step) — (2, 2)
    # is the production choice there too.  (1, 4) ties (1, 2)
    # at 180.6 ms for more descriptors and compile time; fgroup=4,
    # (80, 1024) and (48, 1024) all regress.  Auto: quarter the
    # delivery blocks on wide tiles.
    if block_div is None:
        if tw >= 1024 and tw % 256 == 0:
            block_div = (2, 2) if th % 32 == 0 else (1, 2)
        else:
            block_div = (1, 1)
    ky, kx = block_div
    if th % ky or (ky > 1 and (th // ky) % 16):
        raise ValueError(f"block_div {block_div}: tile height {th} must "
                         f"split into multiples of 16 (uint16 sublane tile)")
    if tw % kx or (kx > 1 and (tw // kx) % 128):
        raise ValueError(f"block_div {block_div}: tile width {tw} must "
                         f"split into multiples of 128 (lane tile)")
    bh = th // ky
    bw = tw // kx
    # round the image up to the tile grid; coverage bounds use the true
    # geometry so padded pixels never contribute
    ph = (-h0) % th
    pw = (-w0) % tw
    h, w = h0 + ph, w0 + pw
    n_ti, n_tj = h // th, w // tw

    if apron:
        # zero apron: 2 tiles top/bottom, 1 tile left/right, so window
        # origins stay in range for any |translation| up to a tile; one
        # combined pad (sequential pads would each copy the stack)
        cal_p = jnp.pad(cal, ((0, 0), (2 * th, 2 * th + ph), (tw, tw + pw)))
        npi = (h + 4 * th) // bh   # padded DELIVERY-block rows
        npj = (w + 2 * tw) // bw   # padded DELIVERY-block cols
        oy, ox = (2 * th) // bh, tw // bw
    else:
        # apron-free (memory-critical stacks): no padded copy at all;
        # edge tiles whose windows would need the apron are excluded
        # via coverage (a <= 1-tile border ring)
        if n_ti < 3 or n_tj < 3:
            raise ValueError("apron-free mode needs >= 3 tile blocks "
                             "per axis; use apron=True or smaller tiles")
        if ph or pw:
            cal_p = jnp.pad(cal, ((0, 0), (0, ph), (0, pw)))
        else:
            cal_p = cal
        npi = h // bh
        npj = w // bw
        oy, ox = 0, 0
    # window extents in delivery blocks: the fewest that cover the tap
    # range (thp / tw+span), the block quantization of the origin
    # (bh-1 / bw-1), and the dither_budget spread (each extra block
    # costs DMA and an operand pair).  The window centers on the MEDIAN
    # frame base with margin = slack/2 per side; since the median can
    # sit at one END of the spread (max |base - median| = spread), the
    # slack must be 2x the guaranteed spread for containment to hold
    # regardless of where the median lands
    thp_est = -(-(th + span) // 8) * 8
    twp_est = -(-(tw + span) // 128) * 128
    vb = max(-(-(thp_est + bh - 1 + 2 * dither_budget) // bh),
             -(-thp_est // bh))
    hb = max(-(-(tw + span + bw - 1 + 2 * dither_budget) // bw),
             -(-twp_est // bw))
    vb = min(vb, max(npi, -(-thp_est // bh)))
    hb = min(hb, max(npj, -(-twp_est // bw)))
    # when even the largest window cannot absorb dither_budget (small
    # tiles), frames beyond the slack degrade gracefully: base_ok
    # excludes them per tile instead of resampling out-of-window data

    mats6 = matrices.reshape(n, 6).astype(jnp.float32)
    # translation snap: a frame whose affine differs from a pure
    # translation by less than snap_tol px at every output pixel (max
    # |(A - I)(p - c)| over the grid corners, c = grid center) is
    # replaced by that translation and flagged, so the kernel's
    # scalar-weight tap path handles it (~10x fewer VPU ops/px).  Real
    # field rotation (even 0.01 deg on a 4k frame) exceeds any sane
    # tolerance and keeps the general path; snap_tol=0 disables.
    if snap_tol > 0.0:
        # snap_geom (cx, cy, rx, ry): the snap center and half-extents.
        # A row-sharded caller passes the GLOBAL geometry rebased into
        # local coordinates so every shard snaps to the identical
        # translation (parallel/fused.py) — shard-dependent centers
        # would resample each band differently.
        if snap_geom is None:
            cx = jnp.float32((w0 - 1) * 0.5)
            cy = jnp.float32((h0 - 1) * 0.5)
            rx, ry = cx, cy
        else:
            cx, cy = snap_geom[0], snap_geom[1]
            rx, ry = snap_geom[2], snap_geom[3]
        err_u = jnp.abs(mats6[:, 0] - 1.0) * rx + jnp.abs(mats6[:, 1]) * ry
        err_v = jnp.abs(mats6[:, 3]) * rx + jnp.abs(mats6[:, 4] - 1.0) * ry
        is_t = jnp.maximum(err_u, err_v) < snap_tol
        tx = mats6[:, 0] * cx + mats6[:, 1] * cy + mats6[:, 2] - cx
        ty = mats6[:, 3] * cx + mats6[:, 4] * cy + mats6[:, 5] - cy
        ones = jnp.ones_like(tx)
        zeros = jnp.zeros_like(tx)
        snapped = jnp.stack([ones, zeros, tx, zeros, ones, ty], axis=1)
        mats6 = jnp.where(is_t[:, None], snapped, mats6)
        trans_flag = is_t.astype(jnp.float32)
    else:
        trans_flag = jnp.zeros((n,), jnp.float32)
    if exp_ratios is None:
        exp_ratios = jnp.ones((n,), jnp.float32)
    if flux_scales is None:
        flux_scales = jnp.ones((n,), jnp.float32)
    if v_bounds is None:
        vlo_v = jnp.float32(2.0)
        vhi_v = jnp.float32(h0 - 4.0)
    else:
        vlo_v = v_bounds[0].astype(jnp.float32)
        vhi_v = v_bounds[1].astype(jnp.float32)
    mats = jnp.concatenate(
        [mats6, exp_ratios.reshape(n, 1).astype(jnp.float32),
         flux_scales.reshape(n, 1).astype(jnp.float32),
         trans_flag.reshape(n, 1),
         jnp.broadcast_to(vlo_v, (n, 1)),
         jnp.broadcast_to(vhi_v, (n, 1))], axis=1)  # (n, 11)
    byp, bxp = _tile_window_origins(mats6, n_ti, n_tj, th, tw, span,
                                    npi, npj, vb, hb, oy, ox, bh, bw)

    has_masters = masters is not None
    if has_masters:
        if apron:
            mast_p = jnp.pad(masters.astype(jnp.float32),
                             ((0, 0), (2 * th, 2 * th + ph), (tw, tw + pw)))
        else:
            mast_p = jnp.pad(masters.astype(jnp.float32),
                             ((0, 0), (0, ph), (0, pw)))
    # (A=1 inside the apron would pollute coverage-excluded pixels
    # only, which never contribute)

    # frame grouping: warp ``fgroup`` frames per grid step.  The window
    # origins are frame-INDEPENDENT, so one (fgroup, th, tw) block
    # delivers every grouped frame's window in a single DMA, and the
    # per-grid-step Mosaic overhead is amortized fgroup-fold
    # (measured: fgroup=2 is ~7% faster than 1 at (112, 512) n=100;
    # fgroup=4 REGRESSES — the auto choice stops at 2).
    if frame_group is None:
        fgroup = next(g for g in (2, 1) if n % g == 0)
    else:
        if n % frame_group:
            raise ValueError(f"frame_group {frame_group} must divide "
                             f"frame count {n}")
        fgroup = frame_group

    def make_map(dy, dx):
        def index_map(i, j, f, mats_ref, byp_ref, bxp_ref):
            return (f, byp_ref[i, j] + dy, bxp_ref[i, j] + dx)
        return index_map

    def make_mmap(dy, dx):
        def index_map(i, j, f, mats_ref, byp_ref, bxp_ref):
            return (0, byp_ref[i, j] + dy, bxp_ref[i, j] + dx)
        return index_map

    in_specs = [pl.BlockSpec((fgroup, bh, bw), make_map(dy, dx))
                for dy in range(vb) for dx in range(hb)]
    if has_masters:
        # master windows: one (3, bh, bw) block per neighborhood
        # position; their index maps are frame-independent, so Mosaic
        # revisiting fetches each tile's master window once, not once
        # per frame.  Pre-calibrated (masters=None) input skips these
        # operands entirely.
        in_specs += [pl.BlockSpec((3, bh, bw), make_mmap(dy, dx))
                     for dy in range(vb) for dx in range(hb)]

    if combine_chunk is not None:
        if tw % combine_chunk or combine_chunk % 128:
            raise ValueError(f"combine_chunk {combine_chunk} must divide "
                             f"tile width {tw} in multiples of 128 lanes")
    kernel = _make_kernel(n, th, tw, span, h0, w0, vb, hb, bh, bw, oy, ox,
                          float(sigma_lower), float(sigma_upper),
                          align, combine, has_masters, fgroup=fgroup,
                          cchunk=combine_chunk, lr_tol=float(snap_tol),
                          general_taps=general_taps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ti, n_tj, n // fgroup),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((th, tw), lambda i, j, f, *_: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((n, th, tw), jnp.float32),
            pltpu.VMEM((vb * bh, hb * bw), jnp.float32),
            pltpu.VMEM((th, tw), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid_spec=grid_spec,
        # the combine step's sort network keeps ~3 stack-depth copies of
        # the N tile rows live; at N=100 that needs more scoped VMEM
        # than the 16 MB default (measured 16.4 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(mats, byp, bxp, *([cal_p] * (vb * hb)),
      *(([mast_p] * (vb * hb)) if has_masters else []))
    return out[:h0, :w0]
