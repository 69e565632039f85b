"""Fused warp + sigma-clip combine Pallas kernel.

The pipeline's peak-memory cost is the materialized warped stack (and
its coverage maps): (N, H, W) float32 each.  This kernel removes them:
the grid is (tile_rows, tile_cols, frame) with the frame axis
innermost; each step warps one frame's tile on-chip (two-pass separable
Lanczos3 with polynomial weights — the same math as
ops/warp.warp_affine_separable) into a persistent VMEM scratch holding
the N warped tile rows, and the final frame step runs the single-pass
median/MAD/clip/average combine and writes the output tile.  Nothing
stack-sized is ever allocated beyond the (apron-padded) input itself.

Source delivery uses ordinary BlockSpecs (manual ``make_async_copy``
from ANY-space inputs does not compile through this environment's
remote Mosaic toolchain): per (frame, tile) BLOCK-GRANULAR window
origins, precomputed outside, feed the index maps via scalar prefetch
(the documented PrefetchScalarGridSpec pattern), a 3x3 neighborhood of
blocks forms the source window, and the exact sub-block offsets select
the tap range with dynamic-start VMEM slices.  A one-block horizontal /
two-block vertical zero apron keeps window origins in range for any
translation up to a tile.
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


def _l3(t):
    u = t * t
    acc = jnp.float32(_L3_POLY[-1])
    for c in _L3_POLY[-2::-1]:
        acc = acc * u + jnp.float32(c)
    return jnp.where(u < 9.0, acc, 0.0)




def _scalar_bases(mats_ref, f, i, j, th, tw, npi, npj, span, apron):
    """Per (frame, tile) tap bases and window-origin blocks, computed
    from the matrix table alone (scalar math; runs in index maps and in
    the kernel so nothing tile-sized ever occupies SMEM)."""
    m00 = mats_ref[f, 0]
    m01 = mats_ref[f, 1]
    m02 = mats_ref[f, 2]
    m10 = mats_ref[f, 3]
    m11 = mats_ref[f, 4]
    m12 = mats_ref[f, 5]
    inv_m11 = 1.0 / m11
    gx = m00 - m01 * m10 * inv_m11
    gy = m01 * inv_m11
    g0 = m02 - m01 * m12 * inv_m11
    ti = (i * th).astype(jnp.float32) if hasattr(i, "astype") \
        else jnp.float32(i * th)
    tj = (j * tw).astype(jnp.float32) if hasattr(j, "astype") \
        else jnp.float32(j * tw)

    vmin = None
    for dy in (0.0, th - 1.0):
        for dx in (0.0, tw - 1.0):
            cand = m10 * (tj + dx) + m11 * (ti + dy) + m12
            vmin = cand if vmin is None else jnp.minimum(vmin, cand)
    vbase = jnp.floor(vmin).astype(jnp.int32) - 3
    umin = None
    for dy in (-3.0, float(th + span)):
        for dx in (0.0, tw - 1.0):
            cand = gx * (tj + dx) + gy * (vmin + dy) + g0
            umin = cand if umin is None else jnp.minimum(umin, cand)
    ubase = jnp.floor(umin).astype(jnp.int32) - 3
    oy, ox = (2, 1) if apron else (0, 0)
    byp = jnp.clip(jnp.floor_divide(vbase, th) + oy, 0, npi - 3)
    bxp = jnp.clip(jnp.floor_divide(ubase, tw) + ox, 0, npj - 3)
    # bases stay RAW: the kernel accepts a (frame, tile) only when the
    # tap offsets land inside the usable window range, which uniformly
    # covers origin clipping at frame edges and the apron-free mode
    return byp, bxp, vbase, ubase

def _make_kernel(n, th, tw, span, h_in, w_in, npi, npj, sigma_lo, sigma_hi,
                 apron):
    wh = 3 * th

    def kernel(mats_ref,
               b00, b01, b02, b10, b11, b12, b20, b21, b22,
               m00_, m01_, m02_, m10_, m11_, m12_, m20_, m21_, m22_,
               out_ref, rows_ref, win_ref, mid_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        f = pl.program_id(2)
        byp_s, bxp_s, vbase, ubase = _scalar_bases(
            mats_ref, f, i, j, th, tw, npi, npj, span, apron)

        # assemble + calibrate the source window on-chip:
        # cal = raw * A - B - exp_ratio * C  with A=1/flat,
        # B=bias/flat, C=dark/flat precomputed outside
        exp_r = mats_ref[f, 6]
        blocks = ((b00, b01, b02), (b10, b11, b12), (b20, b21, b22))
        mblocks = ((m00_, m01_, m02_), (m10_, m11_, m12_),
                   (m20_, m21_, m22_))
        for dy in range(3):
            for dx in range(3):
                raw_blk = blocks[dy][dx][0]
                if raw_blk.dtype == jnp.uint16:
                    # Mosaic lacks a direct u16->f32 cast
                    raw = raw_blk.astype(jnp.int32).astype(jnp.float32)
                else:
                    raw = raw_blk.astype(jnp.float32)
                mb = mblocks[dy][dx]
                win_ref[dy * th:(dy + 1) * th, dx * tw:(dx + 1) * tw] = \
                    raw * mb[0] - mb[1] - exp_r * mb[2]  # A, B, C planes

        m00 = mats_ref[f, 0]
        m01 = mats_ref[f, 1]
        m02 = mats_ref[f, 2]
        m10 = mats_ref[f, 3]
        m11 = mats_ref[f, 4]
        m12 = mats_ref[f, 5]
        inv_m11 = 1.0 / m11
        gx = m00 - m01 * m10 * inv_m11
        gy = m01 * inv_m11
        g0 = m02 - m01 * m12 * inv_m11

        # window origins in original (unpadded) source coordinates:
        # padded block b maps to original rows (b - oy) * th etc.
        oy, ox = (2, 1) if apron else (0, 0)
        win_y0 = (byp_s - oy) * th
        win_x0 = (bxp_s - ox) * tw
        offy = vbase - win_y0
        offx = ubase - win_x0
        # the window must contain every tap a COVERED pixel can use:
        # coverage restricts absolute taps to [0, h_in) x [0, w_in), and
        # the tap loops reach [vbase, vbase + th + span).  A clipped
        # window origin at a frame edge still satisfies this (the
        # window ends exactly at the frame edge); only extreme
        # misalignment (|translation| beyond the apron budget) fails,
        # and those (frame, tile) pairs are zeroed instead of reading
        # garbage.  Out-of-window one-hot rows/cols are zero and only
        # ever meet zero lanczos weight for covered pixels.
        base_ok = ((win_y0 <= jnp.maximum(vbase, 0))
                   & (jnp.minimum(vbase + th + span, h_in)
                      <= win_y0 + 3 * th)
                   & (win_x0 <= jnp.maximum(ubase, 0))
                   & (jnp.minimum(ubase + tw + span, w_in)
                      <= win_x0 + 3 * tw))

        rr = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) \
            .astype(jnp.float32)
        cc = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) \
            .astype(jnp.float32)
        y_out = i.astype(jnp.float32) * th + rr
        x_out = j.astype(jnp.float32) * tw + cc

        # horizontal pass over the window rows the vertical pass will tap:
        # source rows vbase + s2 for s2 in [0, th + span); we resample
        # rows [offy, offy + th + span) of the window.  mid rows are
        # window-local starting at offy.
        sr = jax.lax.broadcasted_iota(jnp.int32, (wh, tw), 0) \
            .astype(jnp.float32)
        sc = jax.lax.broadcasted_iota(jnp.int32, (wh, tw), 1) \
            .astype(jnp.float32)
        yprime = win_y0.astype(jnp.float32) + sr       # absolute source row
        x_cols = j.astype(jnp.float32) * tw + sc       # output column
        u = gx * x_cols + gy * yprime + g0
        u_loc = u - ubase.astype(jnp.float32)

        # dynamic-start VMEM slices do not compile through this remote
        # Mosaic toolchain; realize the dynamic sub-block shift as a
        # one-hot selection matmul on the MXU, then slice statically.
        twp = tw + 128  # aligned width covering tw + span
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (3 * tw, twp), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (3 * tw, twp), 1)
        p_h = (rows_i == cols_i + offx).astype(jnp.float32)
        aligned_h = jnp.dot(win_ref[:, :], p_h,
                            preferred_element_type=jnp.float32)

        acc = jnp.zeros((wh, tw), jnp.float32)
        wsum = jnp.zeros((wh, tw), jnp.float32)
        for s in range(span):
            w = _l3(u_loc - (sc + s))
            acc = acc + w * aligned_h[:, s:s + tw]
            wsum = wsum + w
        safe = jnp.abs(wsum) > 1e-3
        mid_ref[:, :] = jnp.where(safe, acc / jnp.where(safe, wsum, 1.0),
                                  0.0)

        v = m10 * x_out + m11 * y_out + m12
        v_loc = v - vbase.astype(jnp.float32)
        thp = th + span
        rows_v = jax.lax.broadcasted_iota(jnp.int32, (wh, thp), 0)
        cols_v = jax.lax.broadcasted_iota(jnp.int32, (wh, thp), 1)
        p_v = (rows_v == cols_v + offy).astype(jnp.float32)
        # aligned_v[r', c] = mid[offy + r', c]
        aligned_v = jax.lax.dot_general(
            p_v, mid_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        acc2 = jnp.zeros((th, tw), jnp.float32)
        wsum2 = jnp.zeros((th, tw), jnp.float32)
        for s in range(span):
            w = _l3(v_loc - (rr + s))
            acc2 = acc2 + w * aligned_v[s:s + th, :]
            wsum2 = wsum2 + w
        safe2 = jnp.abs(wsum2) > 1e-3
        warped = jnp.where(safe2, acc2 / jnp.where(safe2, wsum2, 1.0), 0.0)

        sx = m00 * x_out + m01 * y_out + m02
        cover = ((sx >= 2.0) & (sx <= w_in - 4.0)
                 & (v >= 2.0) & (v <= h_in - 4.0) & base_ok)
        big = jnp.float32(3.4e38)
        rows_ref[f] = jnp.where(cover, warped, big)

        @pl.when(f == n - 1)
        def _():
            frames = [rows_ref[k] for k in range(n)]
            valid = [fr < big * 0.5 for fr in frames]
            count = functools.reduce(
                lambda a, b: a + b,
                [v_.astype(jnp.float32) for v_ in valid])
            counti = count.astype(jnp.int32)

            srt = list(frames)
            for a, b in _batcher_pairs(n):
                lo = jnp.minimum(srt[a], srt[b])
                hi = jnp.maximum(srt[a], srt[b])
                srt[a], srt[b] = lo, hi
            lo_idx = jnp.maximum((counti - 1) // 2, 0)
            hi_idx = jnp.maximum(counti // 2, 0)
            med_lo = jnp.zeros((th, tw), jnp.float32)
            med_hi = jnp.zeros((th, tw), jnp.float32)
            for k in range(n):
                med_lo = jnp.where(lo_idx == k, srt[k], med_lo)
                med_hi = jnp.where(hi_idx == k, srt[k], med_hi)
            med = 0.5 * (med_lo + med_hi)

            devs = [jnp.where(v_, jnp.abs(fr - med), big)
                    for fr, v_ in zip(frames, valid)]
            for a, b in _batcher_pairs(n):
                lo = jnp.minimum(devs[a], devs[b])
                hi = jnp.maximum(devs[a], devs[b])
                devs[a], devs[b] = lo, hi
            mad_lo = jnp.zeros((th, tw), jnp.float32)
            mad_hi = jnp.zeros((th, tw), jnp.float32)
            for k in range(n):
                mad_lo = jnp.where(lo_idx == k, devs[k], mad_lo)
                mad_hi = jnp.where(hi_idx == k, devs[k], mad_hi)
            std = _MAD_TO_STD * 0.5 * (mad_lo + mad_hi)

            lo_b = med - sigma_lo * std
            hi_b = med + sigma_hi * std
            acc3 = jnp.zeros((th, tw), jnp.float32)
            cnt = jnp.zeros((th, tw), jnp.float32)
            for fr, v_ in zip(frames, valid):
                keep = v_ & (fr >= lo_b) & (fr <= hi_b)
                acc3 = acc3 + jnp.where(keep, fr, 0.0)
                cnt = cnt + keep.astype(jnp.float32)
            out_ref[:, :] = jnp.where(cnt > 0,
                                      acc3 / jnp.maximum(cnt, 1.0), 0.0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tile", "span", "sigma_lower",
                                    "sigma_upper", "apron", "interpret"))
def pallas_warp_combine(
    cal: jnp.ndarray,
    matrices: jnp.ndarray,
    masters: "jnp.ndarray | None" = None,
    exp_ratios: "jnp.ndarray | None" = None,
    tile: "Tuple[int, int] | None" = None,
    span: int = 12,
    sigma_lower: float = 5.0,
    sigma_upper: float = 5.0,
    apron: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Warp every frame by its matrix and sigma-clip-average, fused —
    optionally calibrating RAW frames on-chip so the f32 calibrated
    stack never exists.

    ``cal`` (N, H, W) float32 calibrated frames, or raw uint16/float
    frames when ``masters`` is given; ``matrices`` (N, 2, 3)
    output->source affine maps with |translation| < one tile and
    stacking-scale rotations; ``masters`` (3, H, W): A=1/flat,
    B=bias/flat, C=dark/flat so cal = raw*A - B - exp_ratio*C;
    ``exp_ratios`` (N,) light/dark exposure ratios (default 1).
    H, W must be divisible by the tile.  Returns (H, W).
    """
    import jax as _jax

    if _jax.default_backend() == "cpu" and not interpret:
        # Mosaic kernels need the interpreter on the CPU backend
        return pallas_warp_combine(cal, matrices, masters=masters,
                                   exp_ratios=exp_ratios, tile=tile,
                                   span=span, sigma_lower=sigma_lower,
                                   sigma_upper=sigma_upper, apron=apron,
                                   interpret=True)
    n, h0, w0 = cal.shape
    if tile is None:
        # auto tile height: the persistent warped-rows scratch is
        # n*th*tw*4 bytes and its sort temporaries set the compile
        # ceiling (measured: (64,256) ok to n<=48, (40,256) ok at
        # n=100, (48,256) fails at n=100; tw>256 fails at any n)
        th = min(64, max(16, (4_200_000 // (max(n, 1) * 256 * 4)) // 8 * 8))
        tile = (th, 256)
    th, tw = tile
    if th <= span:
        raise ValueError("tile height must exceed span")
    # round the image up to the tile grid; coverage bounds use the true
    # geometry so padded pixels never contribute
    ph = (-h0) % th
    pw = (-w0) % tw
    h, w = h0 + ph, w0 + pw
    n_ti, n_tj = h // th, w // tw

    if apron:
        # zero apron: 2 blocks top/bottom, 1 block left/right, so window
        # origins stay in range for any |translation| up to a tile; one
        # combined pad (sequential pads would each copy the stack)
        cal_p = jnp.pad(cal, ((0, 0), (2 * th, 2 * th + ph), (tw, tw + pw)))
        npi = n_ti + 4   # padded block rows
        npj = n_tj + 2   # padded block cols
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
        npi = n_ti
        npj = n_tj

    mats6 = matrices.reshape(n, 6).astype(jnp.float32)
    if exp_ratios is None:
        exp_ratios = jnp.ones((n,), jnp.float32)
    mats = jnp.concatenate(
        [mats6, exp_ratios.reshape(n, 1).astype(jnp.float32),
         jnp.zeros((n, 1), jnp.float32)], axis=1)  # (n, 8)

    if masters is None:
        # identity calibration: A=1, B=0, C=0
        masters = jnp.stack([
            jnp.ones((h0, w0), jnp.float32),
            jnp.zeros((h0, w0), jnp.float32),
            jnp.zeros((h0, w0), jnp.float32)])
    if apron:
        mast_p = jnp.pad(masters.astype(jnp.float32),
                         ((0, 0), (2 * th, 2 * th + ph), (tw, tw + pw)))
    else:
        mast_p = jnp.pad(masters.astype(jnp.float32),
                         ((0, 0), (0, ph), (0, pw)))
    # A=1 inside the apron too would pollute coverage-excluded pixels
    # only, which never contribute

    def make_map(dy, dx):
        def index_map(i, j, f, mats_ref):
            byp, bxp, _vb, _ub = _scalar_bases(
                mats_ref, f, i, j, th, tw, npi, npj, span, apron)
            return (f, byp + dy, bxp + dx)
        return index_map

    def make_mmap(dy, dx, plane):
        def index_map(i, j, f, mats_ref):
            byp, bxp, _vb, _ub = _scalar_bases(
                mats_ref, f, i, j, th, tw, npi, npj, span, apron)
            return (plane, byp + dy, bxp + dx)
        return index_map

    in_specs = [pl.BlockSpec((1, th, tw), make_map(dy, dx))
                for dy in range(3) for dx in range(3)]
    # master windows: one (3, th, tw) block per neighborhood position
    in_specs += [pl.BlockSpec((3, th, tw), make_mmap(dy, dx, 0))
                 for dy in range(3) for dx in range(3)]

    kernel = _make_kernel(n, th, tw, span, h0, w0, npi, npj,
                          float(sigma_lower), float(sigma_upper), apron)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ti, n_tj, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((th, tw), lambda i, j, f, *_: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((n, th, tw), jnp.float32),
            pltpu.VMEM((3 * th, 3 * tw), jnp.float32),
            pltpu.VMEM((3 * th, tw), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(mats, *([cal_p] * 9), *([mast_p] * 9))
    return out[:h0, :w0]
