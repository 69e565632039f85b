"""Bias/dark/flat calibration as one fused elementwise device kernel.

Reproduces the arithmetic of the reference ApCalibrate.calibrate
(reference core/ApCalibrate.py:406-509):

* ``img - bias``                                            (:439)
* optionally ``dark - bias`` when the master dark was not
  bias-subtracted (``dark_still_biased``)                   (:440-445)
* dark scaled by the light/dark exposure-time ratio         (:449-451)
* flat division guarded where flat != 0                     (:461-464)

Unlike the reference (one frame at a time, numpy on host), the batch
form runs over a leading frame axis resident in HBM; XLA fuses the
whole chain into a single pass over memory, so throughput is
HBM-bandwidth-bound.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .badpix import fix_bad_pixels


@functools.partial(jax.jit, static_argnames=("dark_still_biased", "deltapix"))
def calibrate_frame(
    img: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dark: Optional[jnp.ndarray] = None,
    flat: Optional[jnp.ndarray] = None,
    exp_ratio: float = 1.0,
    dark_still_biased: bool = True,
    badpix_mask: Optional[jnp.ndarray] = None,
    deltapix: int = 2,
) -> jnp.ndarray:
    """Calibrate one frame (or a broadcastable batch) of float32 data.

    ``badpix_mask`` (True = bad) triggers the masked-neighborhood-median
    repair after the arithmetic, matching the reference pipeline order
    (reference core/ApCalibrate.py:477-486).
    """
    out = img.astype(jnp.float32)
    if bias is not None:
        out = out - bias
    if dark is not None:
        dark_use = dark - bias if (dark_still_biased and bias is not None) else dark
        out = out - jnp.asarray(exp_ratio, jnp.float32) * dark_use
    if flat is not None:
        out = jnp.where(flat != 0, out / flat, out)
    if badpix_mask is not None:
        out, _ = fix_bad_pixels(out, badpix_mask, deltapix=deltapix)
    return out


@functools.partial(jax.jit, static_argnames=("dark_still_biased", "deltapix"))
def calibrate_batch(
    imgs: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dark: Optional[jnp.ndarray] = None,
    flat: Optional[jnp.ndarray] = None,
    exp_ratios: Optional[jnp.ndarray] = None,
    dark_still_biased: bool = True,
    badpix_mask: Optional[jnp.ndarray] = None,
    deltapix: int = 2,
) -> jnp.ndarray:
    """Calibrate a (N, H, W) stack against shared (H, W) masters.

    ``exp_ratios`` is per-frame (N,); masters broadcast across the
    frame axis, so the whole stack is one fused XLA computation.
    """
    out = imgs.astype(jnp.float32)
    if bias is not None:
        out = out - bias[None]
    if dark is not None:
        dark_use = dark - bias if (dark_still_biased and bias is not None) else dark
        ratios = (jnp.ones(imgs.shape[0], jnp.float32)
                  if exp_ratios is None else exp_ratios.astype(jnp.float32))
        out = out - ratios[:, None, None] * dark_use[None]
    if flat is not None:
        out = jnp.where(flat[None] != 0, out / flat[None], out)
    if badpix_mask is not None:
        repaired = jax.vmap(lambda f: fix_bad_pixels(f, badpix_mask,
                                                     deltapix=deltapix)[0])(out)
        out = repaired
    return out
