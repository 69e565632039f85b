"""Multi-chip fused warp+combine: the memory-lean Pallas mega-kernel
under spatial (row) sharding.

The fused kernel (ops/pallas_warp_combine) holds all N warped tile rows
in VMEM, so the natural multi-chip decomposition is spatial: shard the
image rows over the 'space' mesh axis, exchange a row halo wide enough
for the warp's reach (dither + Lanczos support), adjust each shard's
affine matrices into its local band frame, and run the kernel per
device — every chip executes the identical single-chip kernel on its
band, and the only collective is the halo ppermute over ICI.  This is
the sharded form of the reference's swarp+combine step
(scripts/resample_all.sh:62-79), which shards by *file* on one host.

Global-edge semantics: the halo exchange zero-fills beyond the first
and last shard, and each shard narrows the kernel's source-row
coverage bounds (``v_bounds``) to the global [2, H-4] window, so taps
never reach the zero-filled halo: edge rows are excluded or kept by
exactly the single-device rule, and the whole output (edges included)
matches the single-device kernel to float-reassociation / clip-tie
tolerance (bit-identical for pure-translation frames).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from .halo import halo_exchange_rows
from ..ops.pallas_warp_combine import pallas_warp_combine


def sharded_warp_combine(
    frames: jnp.ndarray,
    matrices: jnp.ndarray,
    mesh: Mesh,
    masters: Optional[jnp.ndarray] = None,
    exp_ratios: Optional[jnp.ndarray] = None,
    halo: int = 64,
    axis_name: str = "space",
    **kernel_kwargs,
):
    """Row-sharded fused warp + sigma-clip combine over ``mesh``.

    ``frames`` (N, H, W) raw uint16/float (H divisible by the 'space'
    axis size), ``matrices`` (N, 2, 3) replicated, ``masters``
    (3, H, W) row-sharded like frames (see
    :func:`ops.pallas_warp_combine.pallas_warp_combine` for the
    calibration planes), ``halo`` rows of neighbor context per side —
    must be >= max |row translation| + 6.  Returns the (H, W) stack,
    row-sharded.
    """
    n, h, w = frames.shape
    nsp = mesh.shape[axis_name]
    if h % nsp:
        raise ValueError(f"height {h} not divisible by space axis {nsp}")
    band = h // nsp
    if halo >= band:
        raise ValueError("halo must be smaller than the per-device band")
    if masters is None:
        masters = jnp.stack([
            jnp.ones((h, w), jnp.float32),
            jnp.zeros((h, w), jnp.float32),
            jnp.zeros((h, w), jnp.float32)])
    if exp_ratios is None:
        exp_ratios = jnp.ones((n,), jnp.float32)

    def local(fr_local, mats, mast_local, exp_r):
        idx = jax.lax.axis_index(axis_name)
        fr_pad = halo_exchange_rows(fr_local, halo, axis_name)
        mast_pad = halo_exchange_rows(mast_local, halo, axis_name)
        # local band frame: local output/source row 0 is global row yoff
        yoff = (idx * band - halo).astype(jnp.float32)
        m01 = mats[:, 0, 1]
        m11 = mats[:, 1, 1]
        shift = jnp.stack([m01 * yoff, m11 * yoff - yoff], axis=1)
        mats_local = mats.at[:, :, 2].add(shift)
        # global coverage bounds in LOCAL source rows: the first/last
        # shard's halo beyond the global image is zero-fill, so taps
        # must stop at global rows [2, H-4] exactly as the single-device
        # kernel does — interior shards see no-op bounds
        v_bounds = jnp.stack([2.0 - yoff, (h - 4.0) - yoff])
        # global snap geometry rebased to local rows: every shard then
        # snaps near-translation frames to the IDENTICAL translation
        snap_geom = jnp.stack([jnp.float32((w - 1) * 0.5),
                               jnp.float32((h - 1) * 0.5) - yoff,
                               jnp.float32((w - 1) * 0.5),
                               jnp.float32((h - 1) * 0.5)])
        out = pallas_warp_combine(fr_pad, mats_local, masters=mast_pad,
                                  exp_ratios=exp_r, v_bounds=v_bounds,
                                  snap_geom=snap_geom,
                                  **kernel_kwargs)
        return out[halo:halo + band, :]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(), P(None, axis_name, None),
                  P()),
        out_specs=P(axis_name, None),
        # pallas_call outputs carry no varying-mesh-axes annotation
        check_vma=False)
    return fn(frames, matrices, masters, exp_ratios)
