"""Fused warp + sigma-clip combine Pallas kernel.

The pipeline's peak-memory cost is the materialized warped stack (and
its coverage maps): (N, H, W) float32 each.  This kernel removes them:
the grid tiles the OUTPUT image, and for each tile every frame is
warped on-chip (two-pass separable Lanczos3 with polynomial weights —
the same math as ops/warp.warp_affine_separable) directly into a VMEM
scratch holding the N warped tile rows, which are then combined with
the single-pass median/MAD/clip/average chain (ops/pallas_combine).
The calibrated stack streams through HBM exactly once and nothing
stack-sized is ever allocated.

Per (frame, tile) integer source-block origins are computed outside
(cheap jnp) and delivered via scalar prefetch; the source blocks are
fetched with manual async DMA from the (padded) stack resident in ANY
memory.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

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


def _make_kernel(n, th, tw, span, h_in, w_in, pad, sigma_lo, sigma_hi):
    bh = th + span
    bw = tw + span

    def kernel(vbase_ref, ubase_ref, mats_ref, cal_ref, out_ref,
               rows_ref, block_ref, mid_ref, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)

        rr = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) \
            .astype(jnp.float32)
        cc = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) \
            .astype(jnp.float32)
        y_out = i.astype(jnp.float32) * th + rr
        x_out = j.astype(jnp.float32) * tw + cc
        # block-row/col iotas for the two passes
        sr = jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 0) \
            .astype(jnp.float32)
        sc = jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 1) \
            .astype(jnp.float32)

        def warp_one(f, _):
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

            vb = vbase_ref[f, i, j]
            ub = ubase_ref[f, i, j]

            dma = pltpu.make_async_copy(
                cal_ref.at[f, pl.ds(vb, bh), pl.ds(ub, bw)],
                block_ref, sem)
            dma.start()

            # pass-1 coordinates: u(x, y') for block rows y' = vb - pad + s
            yprime = (vb - pad).astype(jnp.float32) + sr
            x_cols = j.astype(jnp.float32) * tw + sc
            u = gx * x_cols + gy * yprime + g0
            u_loc = u - (ub - pad).astype(jnp.float32)

            dma.wait()

            acc = jnp.zeros((bh, tw), jnp.float32)
            wsum = jnp.zeros((bh, tw), jnp.float32)
            for s in range(span):
                w = _l3(u_loc - (sc + s))
                acc = acc + w * block_ref[:, s:s + tw]
                wsum = wsum + w
            safe = jnp.abs(wsum) > 1e-3
            mid_ref[:, :] = jnp.where(safe, acc / jnp.where(safe, wsum, 1.0),
                                      0.0)

            # pass 2: vertical resample at v(x, y)
            v = m10 * x_out + m11 * y_out + m12
            v_loc = v - (vb - pad).astype(jnp.float32)
            acc2 = jnp.zeros((th, tw), jnp.float32)
            wsum2 = jnp.zeros((th, tw), jnp.float32)
            for s in range(span):
                w = _l3(v_loc - (rr + s))
                acc2 = acc2 + w * mid_ref[s:s + th, :]
                wsum2 = wsum2 + w
            safe2 = jnp.abs(wsum2) > 1e-3
            warped = jnp.where(safe2, acc2 / jnp.where(safe2, wsum2, 1.0),
                               0.0)

            # analytic coverage: footprint fully inside the true frame
            sx = m00 * x_out + m01 * y_out + m02
            sy = m10 * x_out + m11 * y_out + m12
            cover = ((sx >= 2.0) & (sx <= w_in - 4.0)
                     & (sy >= 2.0) & (sy <= h_in - 4.0))
            big = jnp.float32(3.4e38)
            rows_ref[f] = jnp.where(cover, warped, big)
            return 0

        jax.lax.fori_loop(0, n, warp_one, 0)

        # combine: rows hold value or +big (invalid)
        big = jnp.float32(3.4e38)
        frames = [rows_ref[k] for k in range(n)]
        valid = [f < big * 0.5 for f in frames]
        count = functools.reduce(
            lambda a, b: a + b, [v.astype(jnp.float32) for v in valid])
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

        devs = [jnp.where(v, jnp.abs(f - med), big)
                for f, v in zip(frames, valid)]
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
        acc = jnp.zeros((th, tw), jnp.float32)
        cnt = jnp.zeros((th, tw), jnp.float32)
        for f, v in zip(frames, valid):
            keep = v & (f >= lo_b) & (f <= hi_b)
            kf = keep.astype(jnp.float32)
            acc = acc + jnp.where(keep, f, 0.0)
            cnt = cnt + kf
        out_ref[:, :] = jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tile", "span", "sigma_lower",
                                    "sigma_upper", "interpret"))
def pallas_warp_combine(
    cal: jnp.ndarray,
    matrices: jnp.ndarray,
    tile: Tuple[int, int] = (32, 256),
    span: int = 12,
    sigma_lower: float = 5.0,
    sigma_upper: float = 5.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Warp every frame by its matrix and sigma-clip-average, fused.

    ``cal`` (N, H, W) float32; ``matrices`` (N, 2, 3) output->source
    affine maps.  H, W must be divisible by the tile.  Returns (H, W).
    """
    n, h, w = cal.shape
    th, tw = tile
    if h % th or w % tw:
        raise ValueError(f"image {h}x{w} not divisible by tile {tile}")
    pad = span + 6
    bh, bw = th + span, tw + span
    cal_p = jnp.pad(cal, ((0, 0), (pad, pad + bh), (pad, pad + bw)))
    hp, wp = cal_p.shape[1:]

    n_ti, n_tj = h // th, w // tw
    mats = matrices.reshape(n, 6).astype(jnp.float32)
    m00, m01, m02 = mats[:, 0], mats[:, 1], mats[:, 2]
    m10, m11, m12 = mats[:, 3], mats[:, 4], mats[:, 5]
    inv_m11 = 1.0 / m11
    gx = m00 - m01 * m10 * inv_m11
    gy = m01 * inv_m11
    g0 = m02 - m01 * m12 * inv_m11

    # per (frame, tile) source block bases, in PADDED coordinates
    ti = jnp.arange(n_ti, dtype=jnp.float32)[:, None] * th
    tj = jnp.arange(n_tj, dtype=jnp.float32)[None, :] * tw
    # vertical: v over the tile corners (min over y in [ti, ti+th),
    # x in [tj, tj+tw))
    def corner_min(ax, ay, a0):
        vals = []
        for dy in (0.0, th - 1.0):
            for dx in (0.0, tw - 1.0):
                vals.append(ax[:, None, None] * (tj + dx)[None]
                            + ay[:, None, None] * (ti + dy)[None]
                            + a0[:, None, None])
        return functools.reduce(jnp.minimum, vals)

    vmin = corner_min(m10, m11, m12)
    vbase = jnp.clip(jnp.floor(vmin).astype(jnp.int32) - 3 + pad,
                     0, hp - bh)
    # horizontal pass needs u = gx x + gy y' + g0 over x in the tile and
    # block rows y' in [vmin-3, vmin-3+bh)
    def u_corner_min():
        vals = []
        ystart = vmin - 3.0
        for dy in (0.0, float(bh - 1)):
            for dx in (0.0, tw - 1.0):
                vals.append(gx[:, None, None] * (tj + dx)[None]
                            + gy[:, None, None] * (ystart + dy)
                            + g0[:, None, None])
        return functools.reduce(jnp.minimum, vals)

    umin = u_corner_min()
    ubase = jnp.clip(jnp.floor(umin).astype(jnp.int32) - 3 + pad,
                     0, wp - bw)

    kernel = _make_kernel(n, th, tw, span, h, w, pad,
                          float(sigma_lower), float(sigma_upper))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ti, n_tj),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((th, tw), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, th, tw), jnp.float32),
            pltpu.VMEM((bh, bw), jnp.float32),
            pltpu.VMEM((bh, tw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(vbase, ubase, mats, cal_p)
