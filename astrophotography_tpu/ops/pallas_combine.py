"""Pallas kernel: single-pass sigma-clipped stack combine.

The XLA combine (ops/stack.py) reads the (N, H, W) stack from HBM
several times (sort for the median, sort for the MAD, clip, mean).
This kernel tiles the image plane; each grid step DMAs one
(N, TH, TW) column of frames into VMEM and performs the entire
median -> MAD -> clip -> mean chain on-chip, so the stack streams
through HBM exactly once.  The frame-axis sort is a static Batcher
odd-even merge network of jnp.minimum/maximum pairs — pure VPU work on
(TH, TW) tiles.

Semantics match sigma_clip_combine(method='average', maxiters=1) with
an optional per-pixel validity mask (True = use).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAD_TO_STD = 1.482602218505602


def _batcher_pairs(n: int) -> List[Tuple[int, int]]:
    """Compare-exchange pairs of Batcher's odd-even mergesort."""
    pairs: List[Tuple[int, int]] = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


def _sorted_rows(rows: List[jnp.ndarray]) -> List[jnp.ndarray]:
    rows = list(rows)
    for a, b in _batcher_pairs(len(rows)):
        lo = jnp.minimum(rows[a], rows[b])
        hi = jnp.maximum(rows[a], rows[b])
        rows[a], rows[b] = lo, hi
    return rows


def _masked_median_rows(rows: List[jnp.ndarray], count: jnp.ndarray):
    """Median of +inf-sentineled sorted rows given per-pixel counts."""
    n = len(rows)
    lo_idx = jnp.maximum((count - 1) // 2, 0)
    hi_idx = jnp.maximum(count // 2, 0)
    lo = jnp.zeros_like(rows[0])
    hi = jnp.zeros_like(rows[0])
    for k in range(n):
        lo = jnp.where(lo_idx == k, rows[k], lo)
        hi = jnp.where(hi_idx == k, rows[k], hi)
    return 0.5 * (lo + hi)


def _combine_kernel(sigma_lo: float, sigma_hi: float, n: int,
                    stack_ref, mask_ref, out_ref):
    frames = [stack_ref[i] for i in range(n)]
    # mask arrives as float32 (bool blocks trip the Mosaic tiler)
    valid = [mask_ref[i] > 0.5 for i in range(n)]
    big = jnp.float32(3.4e38)
    count = functools.reduce(
        lambda a, b: a + b, [v.astype(jnp.float32) for v in valid])
    counti = count.astype(jnp.int32)

    sent = [jnp.where(v, f, big) for f, v in zip(frames, valid)]
    srt = _sorted_rows(sent)
    med = _masked_median_rows(srt, counti)

    devs = [jnp.where(v, jnp.abs(f - med), big)
            for f, v in zip(frames, valid)]
    dsrt = _sorted_rows(devs)
    mad = _masked_median_rows(dsrt, counti)
    std = _MAD_TO_STD * mad

    lo = med - sigma_lo * std
    hi = med + sigma_hi * std
    acc = jnp.zeros_like(frames[0])
    cnt = jnp.zeros_like(frames[0])
    for f, v in zip(frames, valid):
        keep = v & (f >= lo) & (f <= hi)
        kf = keep.astype(jnp.float32)
        acc = acc + f * kf
        cnt = cnt + kf
    out_ref[:, :] = jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), jnp.nan)


@functools.partial(jax.jit,
                   static_argnames=("sigma_lower", "sigma_upper",
                                    "tile", "interpret"))
def pallas_sigma_clip_combine(
    stack: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    sigma_lower: float = 5.0,
    sigma_upper: float = 5.0,
    #: None = auto-size so the double-buffered (N, th, tw) blocks fit
    #: in VMEM (overflow crashes the Mosaic compiler)
    tile: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-HBM-pass sigma-clipped average over axis 0.

    Pads the image plane to the tile grid (padded pixels are masked
    out) and crops the result.  ``interpret=True`` runs the kernel in
    the Pallas interpreter (CPU tests).
    """
    if jax.default_backend() == "cpu" and not interpret:
        # Mosaic kernels need the interpreter on the CPU backend
        return pallas_sigma_clip_combine(stack, mask=mask,
                                         sigma_lower=sigma_lower,
                                         sigma_upper=sigma_upper,
                                         tile=tile, interpret=True)
    stack = stack.astype(jnp.float32)
    n, h, w = stack.shape
    if mask is None:
        mask = jnp.ones(stack.shape, jnp.float32)
    else:
        mask = mask.astype(jnp.float32)
    if tile is None:
        # 2 inputs x 2 pipeline buffers x (n*th*tw*4) bytes <= ~10 MB
        th = 128
        while th > 8 and n * th * 128 * 4 * 4 > 10 * 2 ** 20:
            th //= 2
        tile = (th, 128)
    th, tw = tile
    ph = (-h) % th
    pw = (-w) % tw
    if ph or pw:
        stack = jnp.pad(stack, ((0, 0), (0, ph), (0, pw)))
        mask = jnp.pad(mask, ((0, 0), (0, ph), (0, pw)))
    hp, wp = h + ph, w + pw

    kernel = functools.partial(_combine_kernel,
                               float(sigma_lower), float(sigma_upper), n)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        grid=(hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((n, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(stack, mask)
    return out[:h, :w]
