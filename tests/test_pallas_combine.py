"""Pallas combine kernel vs the XLA reference implementation
(interpreter mode on the CPU backend)."""

import numpy as np
import pytest

from astrophotography_tpu.ops.pallas_combine import pallas_sigma_clip_combine
from astrophotography_tpu.ops.stack import sigma_clip_combine


def test_pallas_combine_matches_xla():
    rng = np.random.default_rng(0)
    stack = rng.normal(100, 5, (8, 96, 80)).astype(np.float32)
    stack[2, 10, 10] = 50000.0
    stack[5, 40, 60] = -40000.0
    ref = np.asarray(sigma_clip_combine(stack, sigma_lower=5, sigma_upper=5))
    got = np.asarray(pallas_sigma_clip_combine(stack, tile=(32, 32),
                                               interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-3)


def test_pallas_combine_with_mask():
    rng = np.random.default_rng(1)
    stack = rng.normal(50, 3, (6, 64, 64)).astype(np.float32)
    mask = rng.uniform(size=stack.shape) > 0.2
    mask[:, 5, 5] = False  # fully invalid pixel
    ref = np.asarray(sigma_clip_combine(stack, mask=mask,
                                        sigma_lower=5, sigma_upper=5))
    got = np.asarray(pallas_sigma_clip_combine(stack, mask=mask,
                                               tile=(32, 32), interpret=True))
    valid = ~np.isnan(ref)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=1e-6, atol=1e-3)
    assert np.isnan(got[5, 5])


def test_pallas_combine_non_tile_divisible():
    rng = np.random.default_rng(2)
    stack = rng.normal(10, 1, (4, 50, 70)).astype(np.float32)
    ref = np.asarray(sigma_clip_combine(stack, sigma_lower=4, sigma_upper=4))
    got = np.asarray(pallas_sigma_clip_combine(stack, sigma_lower=4,
                                               sigma_upper=4,
                                               tile=(32, 32), interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-3)
