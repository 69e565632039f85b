"""Tests for the fixed-iteration L.A.Cosmic implementation."""

import numpy as np
import pytest

from astrophotography_tpu import synth
from astrophotography_tpu.ops.cosmic import lacosmic


@pytest.mark.slow
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


@pytest.mark.slow
def test_lacosmic_saturated_star_not_flagged():
    img = np.full((64, 64), 200.0, np.float32)
    img += synth.gaussian_star((64, 64), 32.0, 32.0, 3.0e6, 3.0).astype(np.float32)
    img = np.clip(img, 0, 65535)
    cleaned, crmask = (np.asarray(a) for a in
                       lacosmic(img, gain=1.0, readnoise=8.0,
                                satlevel_e=60000.0, niter=3))
    core = crmask[29:36, 29:36]
    assert not core.any()


@pytest.mark.parametrize("fsmode", ["convolve", "median"])
def test_lacosmic_fsmode_removes_crs_keeps_stars(fsmode):
    """Both fine-structure modes must discriminate CRs from stars; the
    reference invokes astroscrappy with fsmode='convolve'
    (core/ApFixCosmicRays.py:265-284)."""
    img, truth = synth.make_starfield(
        (128, 128), n_stars=8, fwhm=3.5, background=300.0,
        read_noise=8.0, flux_range=(20000.0, 60000.0), seed=30, min_sep=16.0)
    hit, crmask_true = synth.inject_cosmic_rays(img, n_rays=10,
                                               amplitude=25000.0, seed=31)
    cleaned, crmask = (np.asarray(a) for a in
                       lacosmic(hit, gain=1.5, readnoise=12.0, niter=4,
                                fsmode=fsmode))
    assert (crmask & crmask_true).sum() >= 0.9 * crmask_true.sum()
    resid = cleaned - img
    assert np.abs(resid[crmask_true]).max() < 2500.0
    for x, y in zip(truth["x"], truth["y"]):
        iy, ix = int(round(y)), int(round(x))
        patch = slice(iy - 3, iy + 4), slice(ix - 3, ix + 4)
        frac = (np.abs(cleaned[patch] - img[patch]).sum()
                / max(img[patch].sum(), 1.0))
        assert frac < 0.05, (fsmode, x, y, frac)


def test_lacosmic_convolve_protects_undersampled_stars():
    """Borderline case: a sharp (undersampled, fwhm ~ 1.8 px) star looks
    CR-like to the Laplacian; the PSF-template fine structure must keep
    it unflagged while a genuinely single-pixel CR is still caught."""
    rng = np.random.default_rng(40)
    img = rng.normal(300.0, 6.0, (96, 96)).astype(np.float32)
    star = synth.gaussian_star((96, 96), 40.0, 44.0, 30000.0, 1.8)
    img = img + star.astype(np.float32)
    hit = img.copy()
    hit[70, 20] += 20000.0  # single-pixel CR
    cleaned, crmask = (np.asarray(a) for a in
                       lacosmic(hit, gain=1.0, readnoise=6.0, niter=4,
                                fsmode="convolve", psffwhm=1.8))
    assert crmask[70, 20]
    # star core untouched
    assert not crmask[42:47, 38:43].any()
    assert np.abs(cleaned[42:47, 38:43] - img[42:47, 38:43]).max() < 50.0


def test_lacosmic_rejects_bad_fsmode():
    with pytest.raises(ValueError):
        lacosmic(np.zeros((16, 16), np.float32), fsmode="nope")
