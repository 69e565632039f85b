"""Inverse-mapped image warping with Lanczos3 interpolation.

TPU-native replacement for swarp's resampling stage (reference
scripts/resample_all.sh:330-342: LANCZOS3 resampling onto a common
grid before co-addition).  Each output pixel applies the inverse
transform (output/reference grid -> input frame coords) and evaluates a
separable 6x6 Lanczos3 kernel via gathers; out-of-frame taps produce a
fractional weight/coverage map like swarp's weight output
(resample_all.sh:342).

Transforms are (2, 3) affine matrices [A | t] mapping output (x, y)
to input coords — a Similarity.matrix() from ops/register.py slots in
directly (its ref->tgt convention IS the inverse map when warping the
target onto the reference grid).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

LANCZOS_A = 3


def _lanczos_weights(frac: jnp.ndarray, a: int = LANCZOS_A) -> jnp.ndarray:
    """(..., 2a) separable Lanczos weights for tap offsets -a+1 .. a.

    ``frac`` is the fractional coordinate in [0, 1); taps are at integer
    offsets relative to floor(coord).
    """
    offsets = jnp.arange(-a + 1, a + 1, dtype=jnp.float32)  # (2a,)
    x = frac[..., None] - offsets  # distance to each tap
    pix = jnp.pi * x
    eps = 1e-6
    safe = jnp.where(jnp.abs(x) < eps, 1.0, x)
    sinc = jnp.where(
        jnp.abs(x) < eps, 1.0,
        jnp.sin(jnp.pi * safe) / (jnp.pi * safe))
    sinc_a = jnp.where(
        jnp.abs(x) < eps, 1.0,
        jnp.sin(jnp.pi * safe / a) / (jnp.pi * safe / a))
    w = jnp.where(jnp.abs(x) < a, sinc * sinc_a, 0.0)
    return w


@functools.partial(jax.jit, static_argnames=("out_shape",))
def warp_affine_lanczos3(
    img: jnp.ndarray,
    matrix: jnp.ndarray,
    out_shape: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp ``img`` onto an (H_out, W_out) grid.

    ``matrix`` (2, 3) maps output (x, y, 1) to input (x, y).  Returns
    (warped, weight) where weight is the in-bounds kernel coverage in
    [0, 1] (0 outside the source frame) — the swarp-style weight map.
    """
    img = img.astype(jnp.float32)
    h_in, w_in = img.shape
    h_out, w_out = out_shape
    a = LANCZOS_A

    ys = jnp.arange(h_out, dtype=jnp.float32)
    xs = jnp.arange(w_out, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    sx = matrix[0, 0] * xg + matrix[0, 1] * yg + matrix[0, 2]
    sy = matrix[1, 0] * xg + matrix[1, 1] * yg + matrix[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    wx = _lanczos_weights(fx)    # (H, W, 6)
    wy = _lanczos_weights(fy)    # (H, W, 6)

    acc = jnp.zeros(out_shape, jnp.float32)
    wacc = jnp.zeros(out_shape, jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    for dy in range(2 * a):
        ty = y0i + (dy - a + 1)
        in_y = (ty >= 0) & (ty < h_in)
        tyc = jnp.clip(ty, 0, h_in - 1)
        for dx in range(2 * a):
            tx = x0i + (dx - a + 1)
            in_x = (tx >= 0) & (tx < w_in)
            txc = jnp.clip(tx, 0, w_in - 1)
            wgt = wy[..., dy] * wx[..., dx]
            inb = (in_y & in_x).astype(jnp.float32)
            acc = acc + wgt * inb * img[tyc, txc]
            wacc = wacc + wgt * inb
    # value = acc / wacc renormalizes the kernel where taps fell outside
    # the frame (flux-preserving at edges); zero where nothing sampled
    total_w = jnp.sum(wy, axis=-1) * jnp.sum(wx, axis=-1)
    coverage = wacc / jnp.maximum(total_w, 1e-9)
    out = jnp.where(wacc != 0.0, acc / jnp.where(wacc != 0.0, wacc, 1.0), 0.0)
    return out, jnp.clip(coverage, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("out_shape",))
def warp_affine_bilinear(
    img: jnp.ndarray,
    matrix: jnp.ndarray,
    out_shape: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cheaper bilinear warp (swarp COMBINE quick-look analogue)."""
    img = img.astype(jnp.float32)
    h_in, w_in = img.shape
    h_out, w_out = out_shape
    ys = jnp.arange(h_out, dtype=jnp.float32)
    xs = jnp.arange(w_out, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    sx = matrix[0, 0] * xg + matrix[0, 1] * yg + matrix[0, 2]
    sy = matrix[1, 0] * xg + matrix[1, 1] * yg + matrix[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    acc = jnp.zeros(out_shape, jnp.float32)
    wacc = jnp.zeros(out_shape, jnp.float32)
    for dy, dx, wgt in ((0, 0, (1 - fy) * (1 - fx)), (0, 1, (1 - fy) * fx),
                        (1, 0, fy * (1 - fx)), (1, 1, fy * fx)):
        ty = y0i + dy
        tx = x0i + dx
        inb = ((ty >= 0) & (ty < h_in) & (tx >= 0) & (tx < w_in)) \
            .astype(jnp.float32)
        tyc = jnp.clip(ty, 0, h_in - 1)
        txc = jnp.clip(tx, 0, w_in - 1)
        acc = acc + wgt * inb * img[tyc, txc]
        wacc = wacc + wgt * inb
    out = jnp.where(wacc > 0, acc / jnp.maximum(wacc, 1e-9), 0.0)
    return out, jnp.clip(wacc, 0.0, 1.0)
