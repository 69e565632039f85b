"""Tests for batched Gaussian PSF fitting against known truth."""

import numpy as np
import pytest

from astrophotography_tpu import synth
from astrophotography_tpu.ops import (
    find_stars,
    isolated_mask,
    measure_fwhm,
    median_fwhm,
    nearest_neighbor_dist,
    sigma_clipped_stats,
)


def test_fit_single_clean_gaussian():
    img = np.full((32, 32), 100.0, np.float32)
    img += synth.gaussian_star((32, 32), 15.6, 16.3, 50000.0, 3.4).astype(np.float32)
    fits = measure_fwhm(img, np.array([15.6]), np.array([16.3]),
                        np.array([True]), init_fwhm=3.0, box=16)
    assert bool(fits.valid[0])
    assert float(fits.fwhm_x[0]) == pytest.approx(3.4, abs=0.05)
    assert float(fits.fwhm_y[0]) == pytest.approx(3.4, abs=0.05)
    assert float(fits.background[0]) == pytest.approx(100.0, rel=0.05)
    assert float(fits.x0[0]) == pytest.approx(15.6, abs=0.05)
    assert float(fits.y0[0]) == pytest.approx(16.3, abs=0.05)
    assert bool(fits.circular[0])
    assert float(fits.axial_ratio[0]) == pytest.approx(1.0, abs=0.05)


def test_fit_elliptical_gaussian():
    img = np.full((40, 40), 50.0, np.float32)
    img += synth.gaussian_star((40, 40), 20.0, 20.0, 80000.0, 4.0,
                               axial_ratio=1.5, theta=0.0).astype(np.float32)
    fits = measure_fwhm(img, np.array([20.0]), np.array([20.0]),
                        np.array([True]), init_fwhm=4.0, box=20)
    fx, fy = float(fits.fwhm_x[0]), float(fits.fwhm_y[0])
    assert fx == pytest.approx(4.0, abs=0.1)
    assert fy == pytest.approx(6.0, abs=0.15)
    assert float(fits.axial_ratio[0]) == pytest.approx(1.5, abs=0.05)


def test_fit_batch_on_noisy_starfield():
    img, truth = synth.make_starfield(
        (256, 256), n_stars=20, fwhm=3.2, background=300.0,
        read_noise=6.0, flux_range=(20000.0, 90000.0), seed=17, min_sep=20.0)
    _, med, std = (float(v) for v in sigma_clipped_stats(img, sigma=3.0))
    stars = find_stars(img - med, fwhm=3.0, threshold=7.0 * std, max_stars=64)
    fits = measure_fwhm(img, stars.x, stars.y, stars.valid,
                        init_fwhm=3.0, box=16)
    v = np.asarray(fits.valid)
    assert v.sum() >= 18
    (mfx, sfx), (mfy, sfy) = median_fwhm(fits)
    assert float(mfx) == pytest.approx(3.2, abs=0.2)
    assert float(mfy) == pytest.approx(3.2, abs=0.2)
    assert float(sfx) < 0.3


def test_nearest_neighbor_and_isolation():
    x = np.array([10.0, 13.0, 50.0, 90.0])
    y = np.array([10.0, 14.0, 50.0, 90.0])
    valid = np.array([True, True, True, True])
    d = np.asarray(nearest_neighbor_dist(x, y, valid))
    np.testing.assert_allclose(d[0], 5.0)
    np.testing.assert_allclose(d[1], 5.0)
    np.testing.assert_allclose(d[2], np.hypot(50 - 13, 50 - 14))
    iso = np.asarray(isolated_mask(x, y, valid, min_sep=16.0))
    np.testing.assert_array_equal(iso, [False, False, True, True])
    # invalid stars don't count as neighbors
    valid2 = np.array([True, False, True, True])
    d2 = np.asarray(nearest_neighbor_dist(x, y, valid2))
    np.testing.assert_allclose(d2[0], np.hypot(40, 40))
