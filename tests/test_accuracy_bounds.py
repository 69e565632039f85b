"""Accuracy bounds for the bench lead config's fast modes.

The 100x16-Mpix north-star configuration uses three accuracy-reducing
modes (tile-mode peak ranking, the apron-free fused kernel, the
separable bf16 matched filter) plus an anti-aliased aperture edge.
These tests bound each one against its exact counterpart so the lean
config is provably registration- and photometry-grade, not comment-ware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from astrophotography_tpu import synth
from astrophotography_tpu.ops import (aperture_photometry, find_stars,
                                      sigma_clipped_stats)
from astrophotography_tpu.ops.register import estimate_similarity


def _field(h=512, w=1024, n_stars=40, seed=7):
    img, truth = synth.make_starfield(
        (h, w), n_stars=n_stars, fwhm=3.0, background=200.0,
        read_noise=5.0, flux_range=(8000.0, 80000.0), seed=seed,
        min_sep=14.0)
    return img, truth


def _detect(img, topk, mode="exact", max_stars=32, bin_rows=False):
    _, med, std = (float(v) for v in sigma_clipped_stats(img, sigma=3.0))
    return find_stars(img - med, fwhm=3.0, threshold=7.0 * std,
                      max_stars=max_stars, topk_mode=topk, mode=mode,
                      stats=not bin_rows, bin_rows=bin_rows)


@pytest.mark.slow
def test_tile_topk_registration_error_bound():
    """Tile-mode peak ranking changes WHICH stars register, not where
    they are; the recovered transform must agree with global mode (and
    the truth) to < 0.05 px.  Bench lead config safety (VERDICT item:
    detect_topk='tile', ops/detect.py:141-160)."""
    img, _ = _field()
    tx_t, ty_t = 3, -2
    img2 = np.roll(np.roll(img, ty_t, axis=0), tx_t, axis=1)

    results = {}
    configs = {
        "global": dict(topk="global"),
        "tile": dict(topk="tile"),
        # the full bench lead config: tile top-k + bf16 separable
        # filter + 2x row-binned peak search
        "tile+fast+bin": dict(topk="tile", mode="fast", bin_rows=True),
    }
    for name, kw in configs.items():
        s1 = _detect(jnp.asarray(img), **kw)
        s2 = _detect(jnp.asarray(img2), **kw)
        sim = estimate_similarity(s1.x, s1.y, s1.flux, s1.valid,
                                  s2.x, s2.y, s2.flux, s2.valid, k=10)
        # estimate maps reference star coords onto the target frame's
        results[name] = (float(sim.tx), float(sim.ty),
                         int(sim.n_inliers))
    for name, (tx, ty, n_in) in results.items():
        assert n_in >= 8, name
        assert abs(tx - tx_t) < 0.05, (name, tx)
        assert abs(ty - ty_t) < 0.05, (name, ty)
    for name in ("tile", "tile+fast+bin"):
        assert abs(results[name][0] - results["global"][0]) < 0.05
        assert abs(results[name][1] - results["global"][1]) < 0.05


def test_fast_mode_matches_exact_on_bright_stars():
    """The separable square-footprint bf16 matched filter
    (ops/detect._fast_density) finds the same bright stars at the same
    centroids (< 0.05 px) as the exact DAOFIND kernel."""
    img, truth = _field(seed=9)
    exact = _detect(jnp.asarray(img), "global", mode="exact")
    fast = _detect(jnp.asarray(img), "global", mode="fast")

    ex = np.asarray(exact.x)[np.asarray(exact.valid)]
    ey = np.asarray(exact.y)[np.asarray(exact.valid)]
    ef = np.asarray(exact.flux)[np.asarray(exact.valid)]
    fx = np.asarray(fast.x)[np.asarray(fast.valid)]
    fy = np.asarray(fast.y)[np.asarray(fast.valid)]

    # the 10 brightest exact detections must all appear in fast mode.
    # A bf16-quantization plateau can move the peak PIXEL by one, which
    # shifts the centroid box and hence the center-of-mass by a few
    # tenths of a pixel; the registration RANSAC averages this over
    # tens of stars (test_tile_topk_registration_error_bound bounds the
    # net transform error at < 0.05 px).
    order = np.argsort(ef)[::-1][:10]
    for i in order:
        d = np.hypot(fx - ex[i], fy - ey[i])
        assert d.min() < 0.3, f"bright star {i} moved {d.min():.3f} px"
    # and the fast centroids stay within 0.3 px of the injected truth
    tx_, ty_ = np.asarray(truth["x"]), np.asarray(truth["y"])
    for i in order:
        j = np.argmin(np.hypot(fx - ex[i], fy - ey[i]))
        dt = np.hypot(tx_ - fx[j], ty_ - fy[j]).min()
        assert dt < 0.3, f"fast centroid {j} off truth by {dt:.3f} px"


def test_binned_detection_centroid_accuracy():
    """2x row-binned peak search (detect_bin_rows): the full-resolution
    center-of-mass centroid keeps every bright star within 0.35 px of
    the injected truth even though the peak row is only known to the
    binned grid."""
    img, truth = _field(seed=13)
    s = _detect(jnp.asarray(img), "global", mode="fast", bin_rows=True)
    fx = np.asarray(s.x)[np.asarray(s.valid)]
    fy = np.asarray(s.y)[np.asarray(s.valid)]
    flux = np.asarray(truth["flux"])
    order = np.argsort(flux)[::-1][:12]
    for i in order:
        d = np.hypot(fx - truth["x"][i], fy - truth["y"][i]).min()
        assert d < 0.35, f"star {i} off truth by {d:.3f} px"


def test_aperture_sum_matches_exact_overlap():
    """The +-0.5 px anti-aliased aperture edge
    (ops/photometry.py:76-78) is within 0.5% of exact circle/pixel
    overlap (photutils method='exact',
    reference core/ApFindStars.py:272-297)."""
    h = w = 64
    cx, cy = 31.37, 32.61   # deliberately off-center
    r_ap = 6
    img = synth.gaussian_star((h, w), cx, cy, 50000.0, 3.0) \
        .astype(np.float32)

    phot = aperture_photometry(jnp.asarray(img), jnp.asarray([cx]),
                               jnp.asarray([cy]), jnp.asarray([True]),
                               r_ap, 9, exposure=1.0)
    got = float(np.asarray(phot.aperture_sum)[0])

    # exact overlap golden: 32x supersampled coverage per pixel
    ss = 32
    off = (np.arange(ss) + 0.5) / ss - 0.5
    yy, xx = np.mgrid[0:h, 0:w]
    sub_y = (yy[..., None, None] + off[None, None, :, None]) - cy
    sub_x = (xx[..., None, None] + off[None, None, None, :]) - cx
    inside = (sub_y ** 2 + sub_x ** 2) <= r_ap ** 2
    cover = inside.mean(axis=(2, 3))
    golden = float(np.sum(img.astype(np.float64) * cover))

    # default edge_method='exact': closed-form overlap, limited only by
    # the 32x supersampling of the golden itself
    assert abs(got - golden) / golden < 1e-3, (got, golden)

    # the cheap ramp mode keeps its documented 0.5% bound
    ramp = aperture_photometry(jnp.asarray(img), jnp.asarray([cx]),
                               jnp.asarray([cy]), jnp.asarray([True]),
                               r_ap, 9, exposure=1.0, edge_method="ramp")
    got_r = float(np.asarray(ramp.aperture_sum)[0])
    assert abs(got_r - golden) / golden < 0.005, (got_r, golden)


def test_aperture_exact_matches_analytic_gaussian():
    """Exact-overlap photometry of a synthetic Gaussian matches the
    ANALYTIC enclosed flux F * (1 - exp(-r^2 / 2 sigma^2)) to < 0.1%
    (VERDICT round 2 item 6)."""
    h = w = 64
    cx, cy = 31.43, 30.77
    fwhm = 3.0
    sigma = fwhm / 2.35482
    flux = 40000.0
    r_ap = 6
    img = synth.gaussian_star((h, w), cx, cy, flux, fwhm) \
        .astype(np.float32)
    phot = aperture_photometry(jnp.asarray(img), jnp.asarray([cx]),
                               jnp.asarray([cy]), jnp.asarray([True]),
                               r_ap, 9, exposure=1.0)
    got = float(np.asarray(phot.aperture_sum)[0])
    analytic = flux * (1.0 - np.exp(-r_ap ** 2 / (2 * sigma ** 2)))
    assert abs(got - analytic) / analytic < 1e-3, (got, analytic)


def test_noise_stats_mean_tracks_median():
    """The sort-free clipped-mean noise center (frame_noise_stats
    default) stays within 0.06 sigma of the exact sigma-clipped MEDIAN
    center on sky-dominated frames with stars (VERDICT round 2 item 9:
    the documented bound tying the fast center to the reference's
    sigma_clipped_stats median semantics)."""
    from astrophotography_tpu.models.pipeline import frame_noise_stats

    rng = np.random.default_rng(17)
    frames = []
    for i in range(4):
        f = 800.0 + rng.normal(0, 8.0, (256, 256)).astype(np.float32)
        for _ in range(30):  # bright stars to stress the clip
            x, y = rng.uniform(16, 240, 2)
            f += synth.gaussian_star((256, 256), x, y,
                                     rng.uniform(2e4, 6e4), 3.0)
        frames.append(f)
    frames = jnp.asarray(np.stack(frames))
    ce_f, std_f = frame_noise_stats(frames)
    ce_m, std_m = frame_noise_stats(frames, center="median")
    ce_f, std_f = np.asarray(ce_f), np.asarray(std_f)
    ce_m, std_m = np.asarray(ce_m), np.asarray(std_m)
    assert np.all(np.abs(ce_f - ce_m) < 0.06 * std_m), (ce_f, ce_m)
    # fast std runs ~15% HIGH here (star wings survive the
    # mean-centered clip on this unrealistically dense field),
    # which makes the 7-sigma detection threshold conservative,
    # never permissive
    assert np.all(std_f > 0.9 * std_m)
    assert np.all(std_f < 1.25 * std_m)
