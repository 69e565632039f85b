"""Fused raw -> detection-candidate Pallas kernel.

The lean pipeline's detection stage (registration-grade star finding,
SURVEY.md §3.5 / reference core/ApFindStars.py:299-340) previously ran
as XLA passes per chunk: u16->f32 calibrate, 2x row bin, four separable
bf16 conv passes, peak search, tile reduction — measured ~7x the HBM
roofline at 100 x 16 Mpix (~210 ms).  This kernel computes the per-tile
strongest density peak straight from the RAW uint16 frames in a single
streaming pass:

* in-kernel 2x row binning (sublane-cheap);
* the separable square-footprint DAOFIND matched filter
  (ops/detect._fast_density math) evaluated in f32 in VMEM;
* calibration folded in ALGEBRAICALLY: the filter is linear with zero
  DC response, so density(raw*A - B - r*C) = density(raw*A) - MF(B) -
  r*MF(C); the (binned) master densities MF(B), MF(C) are precomputed
  once outside and subtracted per band, and A (1/flat) multiplies the
  raw rows before binning.  No calibrated stack ever exists;
* thresholded 3x3 local maxima (raster tie-break, as ops/detect) and a
  per-(64, 256)-raw-pixel-tile max/argmax, so the kernel's output is a
  tiny (N, tiles_y, tiles_x) candidate table.

Host-side code (models/pipeline) turns candidates into the Stars table:
top-k over the tile maxima, the brighter-of-two full-resolution peak
row, and center-of-mass centroids on calibrated CUTOUTS (a few dozen
5x5 gathers per frame — exact calibration where it matters, never the
full stack).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .detect import FWHM_TO_SIGMA, _kernel_radius

#: binned tile geometry — matches ops/detect's topk_mode='tile'
#: (64, 256) raw-pixel tiles at 2x row binning
_TTY = 32
_TTX = 256
_BIN = 2


def _filter_taps(fwhm: float):
    """(gr, gc, gsum/n, 1/denom) of the separable square-footprint
    lowered Gaussian (ops/detect._fast_density with row_sigma_scale=0.5
    — the 2x-binned-row PSF)."""
    r = _kernel_radius(fwhm)
    sigma = fwhm * FWHM_TO_SIGMA
    d = np.arange(-r, r + 1, dtype=np.float32)
    gc = np.exp(-0.5 * d * d / sigma ** 2)             # lane (column) axis
    gr = np.exp(-0.5 * d * d / (sigma * 0.5) ** 2)     # binned row axis
    n = float((2 * r + 1) ** 2)
    gsum = float(np.sum(gr)) * float(np.sum(gc))
    gsq = float(np.sum(gr * gr)) * float(np.sum(gc * gc))
    denom = gsq - gsum * gsum / n
    return gr, gc, r, gsum / n, 1.0 / denom


def master_densities(bias, dark_used, flat, fwhm: float = 3.0):
    """(2, H//2, W) float32: the binned fast densities of B = bias/flat
    and C = dark_used/flat — the amounts the kernel subtracts from
    density(raw * A) to realize density of the CALIBRATED frame.
    Computed once per stack with the same XLA ops the unfused path
    uses (cheap: two single-plane passes)."""
    from .detect import _fast_density

    h, w = bias.shape
    if flat is not None:
        # the kernel bins raw*A with A applied per ORIGINAL row
        # (binned(x*A) = 0.5*(x0*A0 + x1*A1)); the subtracted masters
        # must bin the same way — dividing binned(bias) by binned(flat)
        # leaves a residual wherever the flat varies between the two
        # rows of a pair (e.g. dust-ring edges), incompletely
        # suppressing hot pixels there
        a = 1.0 / flat
        bias = bias * a
        dark_used = dark_used * a
    b2 = 0.5 * (bias[0::2, :] + bias[1::2, :])
    c2 = 0.5 * (dark_used[0::2, :] + dark_used[1::2, :])
    mb = _fast_density(b2, fwhm, row_sigma_scale=0.5).astype(jnp.float32)
    mc = _fast_density(c2, fwhm, row_sigma_scale=0.5).astype(jnp.float32)
    return jnp.stack([mb, mc])


def _make_kernel(n, band, w, h2, r, gr, gc, mean_w, inv_den,
                 has_mf, has_flat):
    hw = 2 * band          # raw rows per band block
    bh = band + 2 * r + 2  # binned rows incl. conv+peak halo
    tyn = band // _TTY
    txn = w // _TTX

    def kernel(scal_ref, *refs):
        pos = 0
        raw3 = refs[pos:pos + 3]; pos += 3
        if has_flat:
            a3 = refs[pos:pos + 3]; pos += 3
        if has_mf:
            mf3 = refs[pos:pos + 3]; pos += 3
        out_max = refs[pos]
        out_idx = refs[pos + 1]
        bin_ref = refs[pos + 2]
        t = pl.program_id(0)
        f = pl.program_id(1)
        halo = r + 1  # binned halo rows needed on each side

        def binned(block, a_block, r0, nrows):
            """0.5*(raw[2i] + raw[2i+1]) of raw rows [r0, r0+2*nrows),
            optionally * A.  The pairwise row sum is a one-hot MXU
            matmul: value-level strided slices (x[0::2]) lower to
            gathers, which this Mosaic toolchain rejects."""
            raw = block[r0:r0 + 2 * nrows]
            x = raw.astype(jnp.int32).astype(jnp.float32)
            if has_flat:
                x = x * a_block[r0:r0 + 2 * nrows]
            rsel = jax.lax.broadcasted_iota(jnp.int32, (nrows, 2 * nrows), 0)
            csel = jax.lax.broadcasted_iota(jnp.int32, (nrows, 2 * nrows), 1)
            p = ((csel == 2 * rsel) | (csel == 2 * rsel + 1)) \
                .astype(jnp.float32) * 0.5
            return jnp.dot(p, x, preferred_element_type=jnp.float32)

        a_prev = a3[0][:] if has_flat else None
        a_self = a3[1][:] if has_flat else None
        a_next = a3[2][:] if has_flat else None
        # assemble binned band + halo into scratch:
        # rows [t*band - halo, (t+1)*band + halo) (clamped neighbors at
        # the global edges deliver duplicate data; the border mask
        # below excludes any peak those rows could produce)
        bin_ref[0:halo, :] = binned(raw3[0][0], a_prev,
                                    hw - 2 * halo, halo)
        bin_ref[halo:halo + band, :] = binned(raw3[1][0], a_self, 0, band)
        bin_ref[halo + band:halo + band + halo, :] = \
            binned(raw3[2][0], a_next, 0, halo)

        # column (binned-row) conv: rows [1, band + 2r + 1) of the
        # scratch = density rows [t*band - 1, (t+1)*band + 1)
        nr = band + 2          # density rows incl. 1-row peak halo
        gcol = None
        bcol = None
        for k in range(2 * r + 1):
            sl = bin_ref[k:k + nr, :]
            gcol = sl * gr[k] if gcol is None else gcol + sl * gr[k]
            bcol = sl if bcol is None else bcol + sl
        # row (lane) conv, full width via static rotates: slicing to
        # the interior + lane-axis concatenates crashed the remote
        # Mosaic compiler; wrapped edge columns are excluded by the
        # border mask below (contamination reach r + 1 < r + 2)
        neg = jnp.float32(-3.0e38)
        g2 = None
        b2 = None
        for s in range(2 * r + 1):
            gsl = pltpu.roll(gcol, (r - s) % w, axis=1)
            bsl = pltpu.roll(bcol, (r - s) % w, axis=1)
            g2 = gsl * gc[s] if g2 is None else g2 + gsl * gc[s]
            b2 = bsl if b2 is None else b2 + bsl
        dens = (g2 - mean_w * b2) * inv_den       # (nr, w)
        if has_mf:
            exp_r = scal_ref[f, 1]
            mprev = mf3[0]
            mself = mf3[1]
            mnext = mf3[2]
            sub = jnp.concatenate([
                mprev[0, band - 1:band, :] + exp_r * mprev[1, band - 1:band, :],
                mself[0] + exp_r * mself[1],
                mnext[0, 0:1, :] + exp_r * mnext[1, 0:1, :]], axis=0)
            dens = dens - sub

        # 3x3 local maxima with the raster tie-break (ops/detect):
        # strict > against raster-earlier neighbors, >= against later
        core = dens[1:1 + band, :]
        up = dens[0:band, :]
        dn = dens[2:2 + band, :]

        def sc(x, d):
            # static column rotate; wrap columns are border-masked
            return pltpu.roll(x, d % w, axis=1)

        earlier = jnp.maximum(
            jnp.maximum(sc(up, 1), up),
            jnp.maximum(sc(up, -1), sc(core, 1)))
        later = jnp.maximum(
            jnp.maximum(sc(core, -1), sc(dn, 1)),
            jnp.maximum(dn, sc(dn, -1)))

        thr = scal_ref[f, 0]
        rows_g = t * band + jax.lax.broadcasted_iota(jnp.int32, (band, w), 0)
        cols_g = jax.lax.broadcasted_iota(jnp.int32, (band, w), 1)
        border = (rows_g >= r + 1) & (rows_g < h2 - r - 1) \
            & (cols_g >= 2 + r) & (cols_g < w - 2 - r)
        is_peak = (core > earlier) & (core >= later) & (core > thr) & border
        score = jnp.where(is_peak, core, neg)

        s4 = score.reshape(tyn, _TTY, txn, _TTX)
        m = jnp.max(s4, axis=(1, 3))
        ly = jax.lax.broadcasted_iota(jnp.int32, s4.shape, 1)
        lx = jax.lax.broadcasted_iota(jnp.int32, s4.shape, 3)
        lidx = ly * _TTX + lx
        hit = s4 >= m[:, None, :, None]
        loc = jnp.min(jnp.where(hit, lidx, jnp.int32(2 ** 30)),
                      axis=(1, 3))
        # pad the (tyn, txn) result to the (8, 128) TPU output tile
        # (concatenate: .at[].set lowers to scatter, rejected by Mosaic)
        m8 = jnp.concatenate(
            [m, jnp.full((8 - tyn, txn), neg, jnp.float32)], axis=0) \
            if tyn < 8 else m
        out_max[0] = jnp.concatenate(
            [m8, jnp.full((8, 128 - txn), neg, jnp.float32)], axis=1) \
            if txn < 128 else m8
        l8 = jnp.concatenate(
            [loc, jnp.zeros((8 - tyn, txn), jnp.int32)], axis=0) \
            if tyn < 8 else loc
        out_idx[0] = jnp.concatenate(
            [l8, jnp.zeros((8, 128 - txn), jnp.int32)], axis=1) \
            if txn < 128 else l8

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("fwhm", "band", "interpret"))
def pallas_detect_tiles(
    frames: jnp.ndarray,
    thresholds: jnp.ndarray,
    mf_bc: Optional[jnp.ndarray] = None,
    a_plane: Optional[jnp.ndarray] = None,
    exp_ratios: Optional[jnp.ndarray] = None,
    fwhm: float = 3.0,
    band: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile strongest calibrated-density peak from raw frames.

    ``frames`` (N, H, W) uint16/float raw; ``thresholds`` (N,) density
    thresholds (nsigma * std); ``mf_bc`` (2, H//2, W) binned master
    densities from :func:`master_densities` (None = no additive
    masters); ``a_plane`` (H, W) 1/flat (None = no flat);
    ``exp_ratios`` (N,) dark scalings.  Returns ``(maxv, idx)`` of
    shape (N, H//2//32, W//256): the strongest in-tile peak's density
    and its row-major position within the (32, 256) binned tile, -3e38
    where a tile has no peak.  Geometry: H % (2*band) == 0,
    W % 256 == 0, band % 32 == 0.
    """
    import jax as _jax

    if _jax.default_backend() == "cpu" and not interpret:
        return pallas_detect_tiles(frames, thresholds, mf_bc=mf_bc,
                                   a_plane=a_plane, exp_ratios=exp_ratios,
                                   fwhm=fwhm, band=band, interpret=True)
    n, h, w = frames.shape
    h2 = h // _BIN
    if h % (2 * band) or w % _TTX or band % _TTY:
        raise ValueError(f"geometry {frames.shape} incompatible with "
                         f"band {band}")
    t_count = h2 // band
    gr, gc, r, mean_w, inv_den = _filter_taps(fwhm)
    if exp_ratios is None:
        exp_ratios = jnp.ones((n,), jnp.float32)
    scal = jnp.stack([thresholds.astype(jnp.float32),
                      exp_ratios.astype(jnp.float32)], axis=1)  # (N, 2)

    has_mf = mf_bc is not None
    has_flat = a_plane is not None
    hw = 2 * band

    def rmap(dt):
        def index_map(t, f, scal_ref):
            return (f, jnp.clip(t + dt, 0, t_count - 1), 0)
        return index_map

    def pmap(dt):
        def index_map(t, f, scal_ref):
            return (jnp.clip(t + dt, 0, t_count - 1), 0)
        return index_map

    def mmap(dt):
        def index_map(t, f, scal_ref):
            return (0, jnp.clip(t + dt, 0, t_count - 1), 0)
        return index_map

    in_specs = [pl.BlockSpec((1, hw, w), rmap(dt)) for dt in (-1, 0, 1)]
    args = [frames]
    if has_flat:
        in_specs += [pl.BlockSpec((hw, w), pmap(dt)) for dt in (-1, 0, 1)]
        args.append(a_plane.astype(jnp.float32))
    if has_mf:
        in_specs += [pl.BlockSpec((2, band, w), mmap(dt))
                     for dt in (-1, 0, 1)]
        args.append(mf_bc.astype(jnp.float32))
    # one operand per *position*: the same array is passed for each of
    # its three neighbor views
    operands = []
    for a in args:
        operands += [a, a, a]

    tyn = band // _TTY
    txn = w // _TTX
    kernel = _make_kernel(n, band, w, h2, r, [float(v) for v in gr],
                          [float(v) for v in gc], mean_w, inv_den,
                          has_mf, has_flat)
    if tyn > 8 or txn > 128:
        raise ValueError("band/width too large for the (8, 128) "
                         "candidate output tile")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_count, n),
        in_specs=in_specs,
        # per-step candidate results are tiny (tyn x txn); they are
        # written padded into (8, 128) blocks to satisfy the TPU
        # output-tiling constraint and sliced back outside
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, f, *_: (f, t, 0)),
            pl.BlockSpec((1, 8, 128), lambda t, f, *_: (f, t, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((band + 2 * (r + 1), w), jnp.float32)],
    )
    maxv, idx = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, t_count * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, t_count * 8, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, *operands)
    maxv = maxv.reshape(n, t_count, 8, 128)[:, :, :tyn, :txn] \
        .reshape(n, t_count * tyn, txn)
    idx = idx.reshape(n, t_count, 8, 128)[:, :, :tyn, :txn] \
        .reshape(n, t_count * tyn, txn)
    return maxv, idx
