"""Golden tests for masked/sigma-clipped statistics vs numpy references."""

import numpy as np
import pytest

from astrophotography_tpu.ops import (
    mad_std,
    masked_mean_std,
    masked_median,
    sigma_clip_mask,
    sigma_clipped_stats,
)


def np_sigma_clip(x, sigma=3.0, maxiters=5, cenfunc=np.median, stdfunc=np.std):
    """Reference implementation of astropy-style iterative sigma clip."""
    keep = np.ones_like(x, dtype=bool)
    for _ in range(maxiters):
        vals = x[keep]
        center = cenfunc(vals)
        std = stdfunc(vals)
        keep = keep & (x >= center - sigma * std) & (x <= center + sigma * std)
    return keep


def test_masked_median_odd_even():
    x = np.array([5.0, 1.0, 3.0, 2.0, 4.0, 100.0])
    m = np.array([True, True, True, True, True, False])
    # 5 valid values -> median 3
    assert float(masked_median(x, m)) == 3.0
    m2 = np.array([True, True, True, True, False, False])
    # 4 valid values 1,2,3,5 -> median 2.5 (average of middles, np.median)
    assert float(masked_median(x, m2)) == 2.5
    np.testing.assert_allclose(float(masked_median(x, np.ones(6, bool))),
                               np.median(x))


def test_masked_median_axis():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(7, 11))
    m = rng.uniform(size=(7, 11)) > 0.3
    m[:, 0] = True  # ensure no empty columns
    got = np.asarray(masked_median(x, m, axis=0))
    want = np.array([np.median(x[m[:, j], j]) if m[:, j].any() else np.nan
                     for j in range(11)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_masked_mean_std():
    rng = np.random.default_rng(4)
    x = rng.normal(size=100)
    m = rng.uniform(size=100) > 0.4
    mean, std = masked_mean_std(x, m)
    np.testing.assert_allclose(float(mean), x[m].mean(), rtol=1e-6)
    np.testing.assert_allclose(float(std), x[m].std(), rtol=1e-5)


def test_mad_std_matches_definition():
    rng = np.random.default_rng(5)
    x = rng.normal(scale=7.0, size=10001)
    got = float(mad_std(x))
    med = np.median(x)
    want = 1.482602218505602 * np.median(np.abs(x - med))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # for large gaussian samples mad_std approximates sigma
    assert abs(got - 7.0) < 0.3


def test_sigma_clip_mask_matches_numpy_reference():
    rng = np.random.default_rng(6)
    x = rng.normal(size=500)
    x[::50] += 40.0  # outliers
    got = np.asarray(sigma_clip_mask(x, sigma_lower=3.0, sigma_upper=3.0,
                                     maxiters=5))
    want = np_sigma_clip(x, sigma=3.0, maxiters=5)
    np.testing.assert_array_equal(got, want)


def test_sigma_clipped_stats_robust_to_outliers():
    rng = np.random.default_rng(7)
    x = rng.normal(loc=1000.0, scale=10.0, size=(64, 64))
    x[10, 10] = 65535.0
    x[20, 30] = 0.0
    mean, med, std = sigma_clipped_stats(x, sigma=3.0)
    assert abs(float(mean) - 1000.0) < 1.0
    assert abs(float(med) - 1000.0) < 1.0
    assert abs(float(std) - 10.0) < 1.0


def test_sigma_clip_axis_per_column():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(20, 6))
    x[3, 2] = 50.0
    keep = np.asarray(sigma_clip_mask(x, sigma_lower=3.0, sigma_upper=3.0,
                                      maxiters=3, axis=0))
    assert not keep[3, 2]
    # the outlier must not affect other columns
    assert keep[:, 0].all() or keep[:, 0].sum() >= 18
