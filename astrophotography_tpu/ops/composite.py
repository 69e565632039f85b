"""Color compositing: stretch + channel combination (stiff replacement).

The reference delegates 3-color composites to the external C program
``stiff`` (reference scripts/composite_all.sh:6-27, channel selections
sho/rgb/hgb).  Here the stretch runs on device: per-channel linear
range from percentiles, then asinh (Lupton) or gamma/power intensity
mapping, to uint8/uint16 RGB ready for TIFF/PNG output.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("mode",))
def stretch_channels(
    channels: jnp.ndarray,
    black_pct: float = 0.5,
    white_pct: float = 99.8,
    gamma: float = 2.2,
    asinh_q: float = 8.0,
    mode: str = "asinh",
) -> jnp.ndarray:
    """(3, H, W) linear channels -> (H, W, 3) stretched in [0, 1].

    * 'asinh': Lupton-style — a shared luminance asinh stretch that
      preserves color ratios;
    * 'gamma': independent per-channel power-law (stiff's default
      GAMMA 2.2 behavior);
    * 'linear': percentile window only.
    """
    chans = channels.astype(jnp.float32)
    lo = jnp.percentile(chans.reshape(3, -1), black_pct, axis=1)
    hi = jnp.percentile(chans.reshape(3, -1), white_pct, axis=1)
    scaled = (chans - lo[:, None, None]) / jnp.maximum(
        (hi - lo)[:, None, None], 1e-9)
    scaled = jnp.clip(scaled, 0.0, None)
    if mode == "asinh":
        lum = jnp.mean(scaled, axis=0)
        q = jnp.float32(asinh_q)
        factor = jnp.arcsinh(q * lum) / (jnp.maximum(lum, 1e-9) *
                                         jnp.arcsinh(q))
        out = scaled * factor[None]
    elif mode == "gamma":
        out = jnp.power(jnp.clip(scaled, 0.0, 1.0), 1.0 / gamma)
    elif mode == "linear":
        out = scaled
    else:
        raise ValueError(f"unknown stretch mode {mode!r}")
    return jnp.clip(jnp.transpose(out, (1, 2, 0)), 0.0, 1.0)


def compose_rgb(
    r, g, b,
    mode: str = "asinh",
    black_pct: float = 0.5,
    white_pct: float = 99.8,
    gamma: float = 2.2,
    asinh_q: float = 8.0,
    bits: int = 8,
):
    """Three channel images -> uint8/uint16 (H, W, 3) composite."""
    import numpy as np

    stack = jnp.stack([jnp.asarray(r), jnp.asarray(g), jnp.asarray(b)])
    out = stretch_channels(stack, black_pct=black_pct, white_pct=white_pct,
                           gamma=gamma, asinh_q=asinh_q, mode=mode)
    out = np.asarray(out)
    if bits == 8:
        return np.clip(np.round(out * 255), 0, 255).astype(np.uint8)
    return np.clip(np.round(out * 65535), 0, 65535).astype(np.uint16)
