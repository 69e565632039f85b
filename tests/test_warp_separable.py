"""The gather-free separable warp must match the direct Lanczos warp."""

import numpy as np
import pytest
import jax.numpy as jnp

from astrophotography_tpu import synth
from astrophotography_tpu.ops.warp import (warp_affine_lanczos3,
                                           warp_affine_separable)


def _scene(h=96, w=128, seed=0):
    img = np.asarray(synth.make_rgb_scene((h, w), seed=seed,
                                          peak=10000)[..., 0], np.float32)
    img += synth.gaussian_star((h, w), w * 0.4, h * 0.6, 50000.0,
                               3.0).astype(np.float32)
    return img


def test_separable_identity():
    img = _scene()
    ident = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    out, cov = warp_affine_separable(img, ident, img.shape)
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-4, atol=0.05)
    assert np.asarray(cov)[4:-4, 4:-4].min() > 0.99


def test_separable_matches_direct_translation():
    img = _scene()
    m = jnp.asarray([[1.0, 0.0, 5.37], [0.0, 1.0, -3.21]], jnp.float32)
    out_s, cov_s = warp_affine_separable(img, m, img.shape)
    out_d, cov_d = warp_affine_lanczos3(img, m, img.shape)
    # identical where fully covered
    full = (np.asarray(cov_d) > 0.999) & (np.asarray(cov_s) > 0.999)
    np.testing.assert_allclose(np.asarray(out_s)[full],
                               np.asarray(out_d)[full], rtol=1e-3, atol=0.5)


@pytest.mark.parametrize("theta", [0.002, -0.005])
def test_separable_matches_direct_rotation(theta):
    img = _scene()
    c, s = np.cos(theta), np.sin(theta)
    m = jnp.asarray([[c, -s, 2.0], [s, c, 1.0]], jnp.float32)
    out_s, cov_s = warp_affine_separable(img, m, img.shape)
    out_d, cov_d = warp_affine_lanczos3(img, m, img.shape)
    # interior only: partial-kernel border pixels renormalize differently
    # (per-pass coverage vs joint coverage), both are valid edge policies
    sl = (slice(8, -8), slice(8, -8))
    full = (np.asarray(cov_d)[sl] > 0.999) & (np.asarray(cov_s)[sl] > 0.999)
    a, b = np.asarray(out_s)[sl][full], np.asarray(out_d)[sl][full]
    denom = np.maximum(np.abs(b), 50.0)
    rel = np.abs(a - b) / denom
    assert np.median(rel) < 1e-4
    assert rel.max() < 5e-3


def test_separable_star_position_and_flux():
    h, w = 96, 128
    img = np.zeros((h, w), np.float32)
    img += synth.gaussian_star((h, w), 60.0, 50.0, 30000.0, 3.0).astype(np.float32)
    theta = 0.004
    c, s = np.cos(theta), np.sin(theta)
    m = jnp.asarray([[c, -s, 3.25], [s, c, -2.5]], jnp.float32)
    out, cov = warp_affine_separable(img, m, (h, w))
    out = np.asarray(out)
    # expected source position of output peak: find output (x,y) mapping
    # to (60, 50): invert the affine
    A = np.array([[c, -s], [s, c]])
    t = np.array([3.25, -2.5])
    ox, oy = np.linalg.solve(A, np.array([60.0, 50.0]) - t)
    peak = np.unravel_index(out.argmax(), out.shape)
    assert abs(peak[1] - ox) <= 1 and abs(peak[0] - oy) <= 1
    assert out.sum() == pytest.approx(img.sum(), rel=2e-3)


def test_separable_analytic_coverage():
    """Analytic coverage: interior matches the warped-ones mode, a thin
    border is excluded (cover=0)."""
    img = _scene()
    m = jnp.asarray([[1.0, 0.0, 4.3], [0.0, 1.0, -2.1]], jnp.float32)
    out_a, cov_a = warp_affine_separable(img, m, img.shape,
                                         analytic_coverage=True)
    out_w, cov_w = warp_affine_separable(img, m, img.shape)
    cov_a = np.asarray(cov_a)
    inner = cov_a > 0.5
    np.testing.assert_allclose(np.asarray(out_a)[inner],
                               np.asarray(out_w)[inner], rtol=1e-4, atol=0.5)
    # borders excluded where the tap footprint crosses the frame edge
    assert cov_a[0, 0] == 0.0
    assert cov_a[50, 60] == 1.0


def test_separable_coverage_borders():
    img = np.ones((64, 64), np.float32) * 100.0
    m = jnp.asarray([[1.0, 0.0, 20.0], [0.0, 1.0, 0.0]], jnp.float32)
    out, cov = warp_affine_separable(img, m, (64, 64))
    cov = np.asarray(cov)
    # output cols >= 44 map beyond the source edge
    assert cov[:, 50:].max() < 0.05
    assert cov[10:-10, 5:40].min() > 0.99
    np.testing.assert_allclose(np.asarray(out)[10:-10, 5:40], 100.0,
                               rtol=1e-3)


def test_separable_large_negative_translation():
    """Translations left/up beyond the warp span must resample
    correctly (regression: a span+6 source pad clipped the tap block,
    zeroing frames translated by more than ~span px while analytic
    coverage still reported them valid)."""
    rng = np.random.default_rng(3)
    img = (np.add.outer(np.linspace(100, 400, 96),
                        np.linspace(0, 100, 96))
           + rng.normal(0, 1, (96, 96))).astype(np.float32)
    for tx, ty in ((-28.0, -27.0), (-40.0, 10.0), (15.0, -35.0)):
        m = jnp.asarray([[1.0, 0.0, tx], [0.0, 1.0, ty]], jnp.float32)
        out_g, cov_g = warp_affine_lanczos3(jnp.asarray(img), m, (96, 96))
        out_s, cov_s = warp_affine_separable(jnp.asarray(img), m, (96, 96))
        inner = np.asarray(cov_s) > 0.5
        assert inner.sum() > 2000
        np.testing.assert_allclose(np.asarray(out_s)[inner],
                                   np.asarray(out_g)[inner],
                                   rtol=1e-4, atol=0.5)


def test_separable_matches_gather_warp_random_transforms():
    """Property fuzz: over random in-domain similarity transforms
    (translations up to half the frame, stacking-scale rotations and
    scale changes), the separable warp must match the direct 6x6 gather
    kernel wherever both report coverage.  This is the net that catches
    window/padding bugs (one hid at |t| > span until round 2)."""
    rng = np.random.default_rng(17)
    img = (np.add.outer(np.linspace(50, 250, 96),
                        np.linspace(0, 120, 96))
           + rng.normal(0, 2, (96, 96))).astype(np.float32)
    for trial in range(12):
        theta = rng.uniform(-0.01, 0.01)
        scale = rng.uniform(0.98, 1.02)
        tx, ty = rng.uniform(-45, 45, 2)
        c, s = scale * np.cos(theta), scale * np.sin(theta)
        m = jnp.asarray([[c, -s, tx], [s, c, ty]], jnp.float32)
        out_g, cov_g = warp_affine_lanczos3(jnp.asarray(img), m, (96, 96))
        out_s, cov_s = warp_affine_separable(jnp.asarray(img), m, (96, 96))
        both = (np.asarray(cov_s) > 0.5) & (np.asarray(cov_g) > 0.5)
        if both.sum() == 0:
            continue
        err = np.abs(np.asarray(out_s)[both] - np.asarray(out_g)[both])
        # the two-pass result samples along sheared rows; equals the
        # 2-D kernel exactly for translations, ~1e-3-level for
        # stacking-scale rotations (ops/warp.py docstring)
        assert np.median(err) < 0.05, (trial, theta, scale, tx, ty)
        assert err.max() < 2.0, (trial, theta, scale, tx, ty,
                                 float(err.max()))


def test_separable_translation_budget_in_budget_parity():
    """A finite translation_budget shrinks the transient pads but must
    be value-identical to the full-safety pads for in-budget shifts."""
    img = _scene()
    m = jnp.asarray([[1.0, 0.0, -21.4], [0.0, 1.0, 17.9]], jnp.float32)
    full, cov_f = warp_affine_separable(img, m, img.shape, span=12,
                                        analytic_coverage=True)
    tight, cov_t = warp_affine_separable(img, m, img.shape, span=12,
                                         analytic_coverage=True,
                                         translation_budget=48)
    ft = np.asarray(cov_t) > 0.5
    np.testing.assert_allclose(np.asarray(tight)[ft],
                               np.asarray(full)[ft], rtol=1e-5, atol=1e-3)
    # the budgeted coverage may only SHRINK, never grow
    assert not np.any(ft & ~(np.asarray(cov_f) > 0.5))


def test_separable_translation_budget_excludes_not_zeroes():
    """A frame shifted beyond the budget must lose COVERAGE (excluded
    from any combine) — zero values counted as data would silently dim
    the stack (the round-2 bug class this parameter must not recreate)."""
    img = _scene()
    m = jnp.asarray([[1.0, 0.0, -70.0], [0.0, 1.0, 0.0]], jnp.float32)
    out, cov = warp_affine_separable(img, m, img.shape, span=12,
                                     analytic_coverage=True,
                                     translation_budget=40)
    cov = np.asarray(cov)
    out = np.asarray(out)
    # every zero-valued pixel is also uncovered: no covered zeros
    assert np.all(out[cov > 0.5] != 0.0) or cov.max() < 0.5
    # and wherever it DOES report coverage, values match the safe path
    safe, _ = warp_affine_separable(img, m, img.shape, span=12,
                                    analytic_coverage=True)
    full = cov > 0.5
    if full.any():
        np.testing.assert_allclose(out[full], np.asarray(safe)[full],
                                   rtol=1e-5, atol=1e-3)
