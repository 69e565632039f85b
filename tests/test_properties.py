"""Property tests (SURVEY.md §4 item b): invariants of the calibration
and conversion math."""

import numpy as np
import pytest

from astrophotography_tpu import synth
from astrophotography_tpu.ops import (calibrate_frame, imarith,
                                      safe_subtract_black,
                                      sigma_clip_combine)


def test_flat_of_ones_is_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1000, (16, 16)).astype(np.float32)
    out = np.asarray(calibrate_frame(img, flat=np.ones((16, 16), np.float32)))
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_zero_bias_dark_identity():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1000, (16, 16)).astype(np.float32)
    z = np.zeros((16, 16), np.float32)
    out = np.asarray(calibrate_frame(img, bias=z, dark=z, exp_ratio=7.3))
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_calibration_linearity():
    """calibrate(a*img) with zero dark == a * calibrate(img) + bias terms."""
    rng = np.random.default_rng(2)
    img = rng.uniform(100, 1000, (16, 16)).astype(np.float32)
    bias = rng.uniform(10, 20, (16, 16)).astype(np.float32)
    flat = rng.uniform(0.5, 1.5, (16, 16)).astype(np.float32)
    out1 = np.asarray(calibrate_frame(img, bias=bias, flat=flat))
    out2 = np.asarray(calibrate_frame(2 * img - bias, bias=bias, flat=flat))
    np.testing.assert_allclose(out2, 2 * out1, rtol=1e-5)


def test_safe_subtract_never_negative():
    rng = np.random.default_rng(3)
    mosaic = rng.integers(0, 2000, (32, 32)).astype(np.uint16)
    cmap = synth.bayer_color_map((32, 32))
    blacks = np.array([1024.0, 900.0, 1100.0, 950.0])
    out = np.asarray(safe_subtract_black(mosaic, cmap, blacks))
    assert (out >= 0).all()
    # values above black subtract exactly
    above = mosaic.astype(np.float64) - blacks[cmap] > 0
    np.testing.assert_allclose(out[above],
                               (mosaic.astype(np.float64)
                                - blacks[cmap])[above])


def test_combine_of_identical_frames_is_identity():
    rng = np.random.default_rng(4)
    frame = rng.uniform(0, 100, (24, 24)).astype(np.float32)
    stack = np.repeat(frame[None], 8, axis=0)
    out = np.asarray(sigma_clip_combine(stack))
    np.testing.assert_allclose(out, frame, rtol=1e-6)


def test_combine_permutation_invariant():
    rng = np.random.default_rng(5)
    stack = rng.normal(50, 5, (10, 16, 16)).astype(np.float32)
    out1 = np.asarray(sigma_clip_combine(stack))
    out2 = np.asarray(sigma_clip_combine(stack[::-1].copy()))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)


def test_imarith_inverses():
    rng = np.random.default_rng(6)
    img = rng.uniform(1, 100, (8, 8)).astype(np.float32)
    other = rng.uniform(1, 10, (8, 8)).astype(np.float32)
    added = imarith(img, "ADD", other)
    np.testing.assert_allclose(np.asarray(imarith(added, "SUB", other)),
                               img, rtol=1e-6)
    mul = imarith(img, "MUL", other)
    np.testing.assert_allclose(np.asarray(imarith(mul, "DIV", other)),
                               img, rtol=1e-5)
