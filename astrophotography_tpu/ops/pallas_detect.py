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
top-k over the tile maxima, then either center-of-mass centroids on
calibrated full-resolution CUTOUTS (centroid='com' — a few dozen 5x5
gathers per frame; exact calibration where it matters, never the full
stack) or the kernel's own bias-calibrated parabola peak offsets
(centroid='kernel' — zero host gathers; see _paroff_calibration).
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


def _paroff_calibration(fwhm: float):
    """Odd-quintic corrections ((cy1, cy3, cy5), (cx1, cx3, cx5))
    mapping the raw 3-point-parabola peak-offset ESTIMATE back to the
    true sub-sample offset, computed numerically from the actual
    matched-filter response model at this fwhm.

    The density profile of a point source is NOT Gaussian (the filter
    subtracts mean_w times a box sum — giving negative skirts — and
    rows are 2x box-binned), so the plain parabola estimate carries a
    deterministic phase-dependent bias (~0.1 bin in y at fwhm 3; a
    LOG-parabola is worse still: the negative skirts make its domain
    switch mid-range and the estimator non-monotone).  Simulating the
    1-D response over a grid of true offsets and least-squares fitting
    true = c1*e + c3*e^3 + c5*e^5 leaves < 0.004 bin (0.008 px)
    residual in y and < 1e-4 px in x at fwhm 3."""
    r = _kernel_radius(fwhm)
    sigma = fwhm * FWHM_TO_SIGMA
    d = np.arange(-r, r + 1, dtype=np.float64)
    gr = np.exp(-0.5 * d * d / (sigma * 0.5) ** 2)
    gc = np.exp(-0.5 * d * d / sigma ** 2)
    nbox = float((2 * r + 1) ** 2)
    mean_w = float(np.sum(gr)) * float(np.sum(gc)) / nbox

    def est_from_triple(a, b, c):
        den = a - 2.0 * b + c
        if abs(den) < 1e-12:
            return 0.0
        return float(np.clip(0.5 * (a - c) / den, -0.5, 0.5))

    # cross-axis constants at zero phase
    a1 = float(np.sum(gc * np.exp(-0.5 * d * d / sigma ** 2)))
    a2 = float(np.sum(np.exp(-0.5 * d * d / sigma ** 2)))

    def response_y(p):
        # binned source rows around b0 at true offset p (bins):
        # binned row b averages full-res rows 2b, 2b+1 whose Gaussian
        # has sigma (full-res px); y_true = 2*p relative to the b0 bin
        # center
        b = np.arange(-r - 3, r + 4, dtype=np.float64)
        y0 = 2.0 * p
        s = 0.5 * (np.exp(-0.5 * (2 * b - 0.5 - y0) ** 2 / sigma ** 2)
                   + np.exp(-0.5 * (2 * b + 0.5 - y0) ** 2 / sigma ** 2))
        gy = np.correlate(s, gr, mode="same")
        by = np.correlate(s, np.ones_like(gr), mode="same")
        dens = gy * a1 - mean_w * by * a2
        c0 = len(b) // 2
        return dens[c0 - 1], dens[c0], dens[c0 + 1]

    def response_x(q):
        c = np.arange(-r - 3, r + 4, dtype=np.float64)
        s = np.exp(-0.5 * (c - q) ** 2 / sigma ** 2)
        gx = np.correlate(s, gc, mode="same")
        bx = np.correlate(s, np.ones_like(gc), mode="same")
        # cross-axis (y) constants at zero phase, binned profile
        b = np.arange(-r - 3, r + 4, dtype=np.float64)
        sy = 0.5 * (np.exp(-0.5 * (2 * b - 0.5) ** 2 / sigma ** 2)
                    + np.exp(-0.5 * (2 * b + 0.5) ** 2 / sigma ** 2))
        b1 = float(np.sum(gr * sy[len(b) // 2 - r:len(b) // 2 + r + 1]))
        b2 = float(np.sum(sy[len(b) // 2 - r:len(b) // 2 + r + 1]))
        dens = gx * b1 - mean_w * bx * b2
        c0 = len(c) // 2
        return dens[c0 - 1], dens[c0], dens[c0 + 1]

    def fit(responder):
        ps = np.linspace(-0.49, 0.49, 197)
        es = np.array([est_from_triple(*responder(p)) for p in ps])
        A = np.stack([es, es ** 3, es ** 5], axis=1)
        c1, c3, c5 = np.linalg.lstsq(A, ps, rcond=None)[0]
        return float(c1), float(c3), float(c5)

    return fit(response_y), fit(response_x)


def _lane_filter_matrix(gc, r):
    """(384, 256) banded lane-convolution matrix for the MXU matmul
    formulation of the horizontal filter pass.

    For a 128-lane output tile at absolute columns [128t, 128t+128),
    the input window is columns [128t-128, 128t+256) (a static
    384-lane slice of the side-padded row buffer).  Output column j
    takes taps from window columns 128+j-r .. 128+j+r; result columns
    0-127 carry the Gaussian-weighted sum (weights ``gc``), columns
    128-255 the box sum (weight 1) — one matmul produces both filter
    channels for the stacked [g-rows; box-rows] operand."""
    b = np.zeros((384, 256), np.float32)
    for j in range(128):
        for s in range(2 * r + 1):
            k = 128 + j - r + s
            b[k, j] = gc[s]
            b[k, 128 + j] = 1.0
    return b


def _make_kernel(n, band, w, h2, r, gr, gc, mean_w, inv_den,
                 has_mf, has_flat, cal_y, cal_x):
    hw = 2 * band          # raw rows per band block
    bh = band + 2 * r + 2  # binned rows incl. conv+peak halo
    tyn = band // _TTY
    txn = w // _TTX
    nr = band + 2          # density rows incl. 1-row peak halo
    nrp = -(-nr // 16) * 16  # bf16 sublane-aligned row stride
    sum_gr = float(np.sum(np.asarray(gr, np.float32)))
    nbox = float(2 * r + 1)

    def kernel(scal_ref, *refs):
        pos = 0
        raw3 = refs[pos:pos + 3]; pos += 3
        if has_flat:
            a3 = refs[pos:pos + 3]; pos += 3
        if has_mf:
            mf3 = refs[pos:pos + 3]; pos += 3
        b_ref = refs[pos]; pos += 1
        out_max = refs[pos]
        out_idx = refs[pos + 1]
        out_yoff = refs[pos + 2]
        out_xoff = refs[pos + 3]
        bin_ref = refs[pos + 4]
        xp_ref = refs[pos + 5]
        dens_ref = refs[pos + 6]
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
            # probed and rejected: an exact hi/lo bf16 split of the u16
            # values (two bf16 matmuls) measured 2 ms SLOWER than this
            # single f32 matmul — the hi/lo extraction VPU ops exceed
            # the MXU rate difference at this operand shape
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
        gcol = None
        bcol = None
        for k in range(2 * r + 1):
            sl = bin_ref[k:k + nr, :]
            gcol = sl * gr[k] if gcol is None else gcol + sl * gr[k]
            bcol = sl if bcol is None else bcol + sl
        neg = jnp.float32(-3.0e38)
        # row (lane) conv as banded bf16 MXU matmuls per 128-lane tile
        # (replaces 2*(2r+1) full-width pltpu.rolls — the kernel's
        # dominant VMEM traffic).  The filter has zero DC response
        # (gsum/n * box exactly cancels the constant term), so a scalar
        # background is subtracted BEFORE the bf16 cast: exact in f32,
        # and it removes the large common term whose cancellation would
        # otherwise amplify bf16 rounding into the density values.
        c0 = jnp.mean(bin_ref[halo:halo + band, :])
        xp_ref[0:nr, 128:128 + w] = (gcol - c0 * sum_gr) \
            .astype(jnp.bfloat16)
        xp_ref[nrp:nrp + nr, 128:128 + w] = (bcol - c0 * nbox) \
            .astype(jnp.bfloat16)
        zpad = jnp.zeros((2 * nrp, 128), jnp.bfloat16)
        xp_ref[:, 0:128] = zpad      # side pads: taps beyond the frame
        xp_ref[:, 128 + w:] = zpad   # edge read zeros (border-masked)
        for t2 in range(w // 128):
            xwin = xp_ref[:, 128 * t2:128 * t2 + 384]
            prod = jnp.dot(xwin, b_ref[:, :],
                           preferred_element_type=jnp.float32)
            g2t = prod[0:nr, 0:128]
            b2t = prod[nrp:nrp + nr, 128:256]
            dens_ref[0:nr, 128 * t2:128 * (t2 + 1)] = \
                (g2t - mean_w * b2t) * inv_den
        dens = dens_ref[0:nr, :]                  # (nr, w)
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
        # strict > against raster-earlier neighbors, >= against later.
        # One 3-lane max of the WHOLE density block serves both the up
        # and down rows (its row slices are free), so the neighborhood
        # costs 4 rolls instead of 8; wrap columns are border-masked
        core = dens[1:1 + band, :]

        def sc(x, d):
            return pltpu.roll(x, d % w, axis=1)

        cl = sc(core, 1)
        cr = sc(core, -1)
        dm = jnp.maximum(jnp.maximum(sc(dens, 1), dens), sc(dens, -1))
        earlier = jnp.maximum(dm[0:band, :], cl)
        later = jnp.maximum(dm[2:2 + band, :], cr)

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

        # sub-pixel peak offsets at each tile's winner: a 3-point
        # parabola through the density cross-neighborhood, followed by
        # the odd-quintic bias calibration fitted offline against the
        # filter's exact response model (:func:`_paroff_calibration` —
        # the box-subtracted, row-binned profile is not Gaussian, so
        # the raw parabola alone is ~0.1 bin biased).  The neighbor
        # planes come from the band's density block (halo rows
        # included), so tile-edge peaks interpolate correctly; the
        # winner is extracted with a one-hot masked sum — no dynamic
        # indexing.  Offsets are in BINNED rows / full-res columns;
        # the host converts (models/pipeline, centroid config).
        sel = (lidx == loc[:, None, :, None]).astype(jnp.float32)

        def at_peak(plane):
            return jnp.sum(plane.reshape(tyn, _TTY, txn, _TTX) * sel,
                           axis=(1, 3))

        # the winner's own density is the tile max already in hand
        # (score holds core at the winning peak); neighbor planes reuse
        # the peak test's rolls — 4 masked reductions, no new rolls
        d0 = m
        du = at_peak(dens[0:band, :])
        dd = at_peak(dens[2:2 + band, :])
        dl = at_peak(cl)
        dr = at_peak(cr)

        def paroff(a, b, c, coef):
            # empty tiles carry the -3e38 sentinel in b (the tile max):
            # a - 2b + c would overflow f32 to +inf there, so mask tile
            # validity explicitly instead of relying on 0/inf -> 0
            # under IEEE semantics
            valid = b > jnp.float32(-1e37)
            a = jnp.where(valid, a, 0.0)
            b = jnp.where(valid, b, 0.0)
            c = jnp.where(valid, c, 0.0)
            den = a - 2.0 * b + c
            safe = valid & (jnp.abs(den) > 1e-12)
            off = jnp.where(safe, 0.5 * (a - c)
                            / jnp.where(safe, den, 1.0), 0.0)
            # a true local max keeps |off| < 0.5; ties/flat noise could
            # push it out — clamp to the physical half-sample range
            e = jnp.clip(off, -0.5, 0.5)
            e2 = e * e
            c1, c3, c5 = (jnp.float32(v) for v in coef)
            return jnp.clip(e * (c1 + e2 * (c3 + e2 * c5)), -0.5, 0.5)

        yoff = paroff(du, d0, dd, cal_y)
        xoff = paroff(dl, d0, dr, cal_x)
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

        def pad_f32(x):
            x8 = jnp.concatenate(
                [x, jnp.zeros((8 - tyn, txn), jnp.float32)], axis=0) \
                if tyn < 8 else x
            return jnp.concatenate(
                [x8, jnp.zeros((8, 128 - txn), jnp.float32)], axis=1) \
                if txn < 128 else x8

        out_yoff[0] = pad_f32(yoff)
        out_xoff[0] = pad_f32(xoff)

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
    ``exp_ratios`` (N,) dark scalings.  Returns ``(maxv, idx, yoff,
    xoff)`` of shape (N, H//2//32, W//256): the strongest in-tile
    peak's density, its row-major position within the (32, 256) binned
    tile (-3e38 / 0 where a tile has no peak), and its sub-pixel peak
    offsets — a plain 3-point parabola through the density cross
    neighborhood, passed through an odd-quintic bias calibration fitted
    against the exact filter-response model (``_paroff_calibration``;
    the box-subtracted, row-binned profile is not Gaussian and a
    log-parabola is non-monotone on its negative skirts) — in binned
    rows / full-res columns.  Geometry: H % (2*band) == 0,
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
    # constant banded lane-filter matrix for the MXU matmul pass (its
    # index map never moves, so Mosaic fetches it once)
    in_specs.append(pl.BlockSpec((384, 256), lambda t, f, scal_ref: (0, 0)))
    operands.append(jnp.asarray(_lane_filter_matrix(gc, r), jnp.bfloat16))

    tyn = band // _TTY
    txn = w // _TTX
    cal_y, cal_x = _paroff_calibration(fwhm)
    kernel = _make_kernel(n, band, w, h2, r, [float(v) for v in gr],
                          [float(v) for v in gc], mean_w, inv_den,
                          has_mf, has_flat, cal_y, cal_x)
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
            pl.BlockSpec((1, 8, 128), lambda t, f, *_: (f, t, 0)),
            pl.BlockSpec((1, 8, 128), lambda t, f, *_: (f, t, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((band + 2 * (r + 1), w), jnp.float32),
            # stacked [g-rows; box-rows] operand for the lane-filter
            # matmuls, 128 pad lanes each side, bf16 sublane-aligned
            # row stride between the two channels
            pltpu.VMEM((2 * (-(-(band + 2) // 16) * 16), w + 256),
                       jnp.bfloat16),
            pltpu.VMEM((band + 2, w), jnp.float32),
        ],
    )
    maxv, idx, yoff, xoff = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, t_count * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, t_count * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n, t_count * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, t_count * 8, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, *operands)

    def unpad(x):
        return x.reshape(n, t_count, 8, 128)[:, :, :tyn, :txn] \
            .reshape(n, t_count * tyn, txn)

    return unpad(maxv), unpad(idx), unpad(yoff), unpad(xoff)
