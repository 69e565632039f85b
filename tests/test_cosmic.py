"""Tests for the fixed-iteration L.A.Cosmic implementation."""

import numpy as np
import pytest

from astrophotography_tpu import synth
from astrophotography_tpu.ops.cosmic import lacosmic


def test_lacosmic_removes_crs_keeps_stars():
    img, truth = synth.make_starfield(
        (128, 128), n_stars=8, fwhm=3.5, background=300.0,
        read_noise=8.0, flux_range=(20000.0, 60000.0), seed=20, min_sep=16.0)
    hit, crmask_true = synth.inject_cosmic_rays(img, n_rays=8,
                                               amplitude=20000.0, seed=21)
    cleaned, crmask = (np.asarray(a) for a in
                       lacosmic(hit, gain=1.5, readnoise=12.0, niter=4))
    # all CR pixels detected
    assert (crmask & crmask_true).sum() >= 0.9 * crmask_true.sum()
    # CR pixels repaired to near the local background / original value
    resid = cleaned - img
    assert np.abs(resid[crmask_true]).max() < 2000.0
    # stars survive: peak pixels not flagged, flux change small
    for x, y in zip(truth["x"], truth["y"]):
        iy, ix = int(round(y)), int(round(x))
        patch = slice(iy - 3, iy + 4), slice(ix - 3, ix + 4)
        frac = (np.abs(cleaned[patch] - img[patch]).sum()
                / max(img[patch].sum(), 1.0))
        assert frac < 0.05, (x, y, frac)


def test_lacosmic_clean_image_untouched():
    rng = np.random.default_rng(22)
    img = rng.normal(500.0, 8.0, (96, 96)).astype(np.float32)
    cleaned, crmask = (np.asarray(a) for a in
                       lacosmic(img, gain=1.0, readnoise=8.0, niter=3))
    assert crmask.sum() < 15  # almost no false positives
    assert np.abs(cleaned - img).max() < 100.0


def test_lacosmic_saturated_star_not_flagged():
    img = np.full((64, 64), 200.0, np.float32)
    img += synth.gaussian_star((64, 64), 32.0, 32.0, 3.0e6, 3.0).astype(np.float32)
    img = np.clip(img, 0, 65535)
    cleaned, crmask = (np.asarray(a) for a in
                       lacosmic(img, gain=1.0, readnoise=8.0,
                                satlevel_e=60000.0, niter=3))
    core = crmask[29:36, 29:36]
    assert not core.any()
