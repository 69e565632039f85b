"""Fused raw->candidate detection kernel (ops/pallas_detect) vs the
XLA detection path (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from astrophotography_tpu import synth
from astrophotography_tpu.ops.pallas_detect import (master_densities,
                                                    pallas_detect_tiles)

# Pallas-interpreter heavyweights: full-suite tier
pytestmark = pytest.mark.slow


def _decode(maxv, idx, f):
    found = []
    for ty in range(maxv.shape[1]):
        for tx in range(maxv.shape[2]):
            if maxv[f, ty, tx] > -1e37:
                l = int(idx[f, ty, tx])
                found.append((tx * 256 + l % 256,
                              (ty * 32 + l // 256) * 2,
                              float(maxv[f, ty, tx])))
    return found


def test_centroid_config_validated():
    """A typo'd PipelineConfig mode raises at construction instead of
    silently falling back to a default path."""
    from astrophotography_tpu.models.pipeline import PipelineConfig

    with pytest.raises(ValueError, match="centroid"):
        PipelineConfig(centroid="kernal")
    with pytest.raises(ValueError, match="detect_impl"):
        PipelineConfig(detect_impl="fused2")
    with pytest.raises(ValueError, match="noise_center"):
        PipelineConfig(noise_center="mode")


def test_kernel_finds_isolated_stars():
    """Every isolated injected star lands a candidate in its tile at
    the (binned) peak position."""
    rng = np.random.default_rng(0)
    n, h, w = 2, 256, 512
    frames = np.zeros((n, h, w), np.float32)
    truth = []
    for f in range(n):
        img, t = synth.make_starfield((h, w), n_stars=5, background=500.0,
                                      read_noise=4.0, seed=f + 1,
                                      margin=24, min_sep=60.0)
        frames[f] = img + 150.0
        truth.append(t)
    raw = np.clip(frames, 0, 65535).astype(np.uint16)
    maxv, idx, _, _ = pallas_detect_tiles(jnp.asarray(raw),
                                    jnp.asarray([60.0] * n), band=64)
    maxv, idx = np.asarray(maxv), np.asarray(idx)
    for f in range(n):
        found = _decode(maxv, idx, f)
        for x0, y0 in zip(truth[f]["x"], truth[f]["y"]):
            d = min(np.hypot(px - x0, py - y0) for px, py, _v in found)
            assert d < 2.5, (f, x0, y0, d)


def test_kernel_density_matches_xla_fast_density():
    """Candidate density values equal the XLA _fast_density (f32) at
    the same positions to ~1e-2 relative (the kernel evaluates the same
    separable filter — sublane pass in f32 VMEM, lane pass as bf16 MXU
    matmuls — so values agree to bf16-accumulation tolerance)."""
    from astrophotography_tpu.ops.detect import _fast_density

    rng = np.random.default_rng(3)
    h, w = 128, 512
    img, _t = synth.make_starfield((h, w), n_stars=4, background=400.0,
                                   read_noise=3.0, seed=5, margin=20,
                                   min_sep=60.0)
    raw = np.clip(img, 0, 65535).astype(np.uint16)
    maxv, idx, _, _ = pallas_detect_tiles(jnp.asarray(raw[None]),
                                    jnp.asarray([50.0]), band=32)
    maxv, idx = np.asarray(maxv), np.asarray(idx)
    det = 0.5 * (raw.astype(np.float32)[0::2] + raw.astype(np.float32)[1::2])
    dens = np.asarray(_fast_density(jnp.asarray(det), 3.0,
                                    row_sigma_scale=0.5).astype(jnp.float32))
    for px, py, v in _decode(maxv, idx, 0):
        ref = dens[py // 2, px]
        assert abs(v - ref) < 0.02 * abs(ref) + 0.5, (px, py, v, ref)


def test_kernel_masters_suppress_hot_pixels():
    """The additive master-density subtraction removes dark hot pixels
    from the candidate set (they would otherwise register every frame
    at the same detector position and poison the frame-to-frame
    solve)."""
    h, w = 256, 512
    img, truth = synth.make_starfield((h, w), n_stars=4, background=400.0,
                                      read_noise=4.0, seed=9, margin=24,
                                      min_sep=60.0)
    bias = np.full((h, w), 200.0, np.float32)
    dark = np.zeros((h, w), np.float32)
    dark[100, 300] = 5000.0
    raw = np.clip(img + bias + dark, 0, 65535).astype(np.uint16)
    thr = jnp.asarray([60.0])
    # without masters: the hot pixel IS a candidate
    mx0, ix0, _, _ = pallas_detect_tiles(jnp.asarray(raw[None]), thr, band=64)
    naked = _decode(np.asarray(mx0), np.asarray(ix0), 0)
    assert any(abs(px - 300) < 3 and abs(py - 100) < 4
               for px, py, _v in naked)
    # with masters: it is not, and the true stars remain
    mf = master_densities(jnp.asarray(bias), jnp.asarray(dark), None)
    mx, ix, _, _ = pallas_detect_tiles(jnp.asarray(raw[None]), thr, mf_bc=mf,
                                 exp_ratios=jnp.asarray([1.0]), band=64)
    found = _decode(np.asarray(mx), np.asarray(ix), 0)
    assert not any(abs(px - 300) < 3 and abs(py - 100) < 4
                   for px, py, _v in found)
    for x0, y0 in zip(truth["x"], truth["y"]):
        assert min(np.hypot(px - x0, py - y0)
                   for px, py, _v in found) < 2.5


def test_lean_pipeline_fused_detect_matches_chunked():
    """The full lean pipeline with detect_impl='fused' solves the same
    registrations as the chunked XLA detection path."""
    from astrophotography_tpu.models import PipelineConfig
    from astrophotography_tpu.models.pipeline import (
        calibrate_register_stack_lean)
    from tests.test_register_stack import _make_dithered_stack

    h, w = 256, 768   # 12 candidate tiles (4 x 3)
    frames, truths, _ = _make_dithered_stack(n_frames=4, shape=(h, w),
                                             seed=21)
    bias = np.full((h, w), 250.0, np.float32)
    raw = jnp.asarray(np.clip(frames + bias, 0, 65535).astype(np.uint16))
    base = dict(max_stars=24, match_k=10, detect_fast=True,
                detect_bin_rows=True, detect_topk="tile",
                detect_mode="chunked", detect_chunk=2,
                fused_tile=(32, 256), warp_span=8)
    out_f, diag_f = calibrate_register_stack_lean(
        raw, bias=jnp.asarray(bias),
        config=PipelineConfig(detect_impl="fused", **base))
    out_c, diag_c = calibrate_register_stack_lean(
        raw, bias=jnp.asarray(bias),
        config=PipelineConfig(detect_impl="chunked", **base))
    for f in range(4):
        assert int(diag_f["n_inliers"][f]) >= 5
        # the two paths may register DIFFERENT star subsets (12
        # candidate tiles here vs the chunked path's small-frame
        # fallback), so transforms agree to centroid-noise level
        assert abs(float(diag_f["tx"][f]) - float(diag_c["tx"][f])) < 0.25
        assert abs(float(diag_f["ty"][f]) - float(diag_c["ty"][f])) < 0.25
    of, oc = np.asarray(out_f), np.asarray(out_c)
    both = (of != 0) & (oc != 0)
    assert both.mean() > 0.8
    assert np.median(np.abs(of[both] - oc[both])) < 0.5


def test_lean_pipeline_fused_detect_full_masters():
    """Same fused-vs-chunked registration agreement with bias + dark +
    flat all present, so every calibration plane (A, B, C) is active —
    including the exp-ratio-scaled dark term in the per-star centroid
    path (``_calibration_planes`` returns real planes here, None when
    a master is absent)."""
    from astrophotography_tpu.models import PipelineConfig
    from astrophotography_tpu.models.pipeline import (
        calibrate_register_stack_lean)
    from tests.test_register_stack import _make_dithered_stack

    rng = np.random.default_rng(33)
    h, w = 256, 768
    frames, truths, _ = _make_dithered_stack(n_frames=4, shape=(h, w),
                                             seed=33)
    bias = np.full((h, w), 250.0, np.float32) \
        + rng.normal(0, 2.0, (h, w)).astype(np.float32)
    dark = np.abs(rng.normal(3.0, 1.0, (h, w))).astype(np.float32)
    flat = (1.0 + 0.1 * np.cos(np.arange(w) * 0.013)[None, :]) \
        .astype(np.float32) * np.ones((h, 1), np.float32)
    raw = jnp.asarray(np.clip(frames * flat + bias + 2.0 * dark, 0,
                              65535).astype(np.uint16))
    base = dict(max_stars=24, match_k=10, detect_fast=True,
                detect_bin_rows=True, detect_topk="tile",
                detect_mode="chunked", detect_chunk=2,
                fused_tile=(32, 256), warp_span=8)
    kw = dict(bias=jnp.asarray(bias), dark=jnp.asarray(dark),
              flat=jnp.asarray(flat),
              exp_ratios=jnp.full((4,), 2.0, jnp.float32))
    out_f, diag_f = calibrate_register_stack_lean(
        raw, config=PipelineConfig(detect_impl="fused", **base), **kw)
    out_c, diag_c = calibrate_register_stack_lean(
        raw, config=PipelineConfig(detect_impl="chunked", **base), **kw)
    for f in range(4):
        assert int(diag_f["n_inliers"][f]) >= 5
        assert abs(float(diag_f["tx"][f]) - float(diag_c["tx"][f])) < 0.25
        assert abs(float(diag_f["ty"][f]) - float(diag_c["ty"][f])) < 0.25
    of, oc = np.asarray(out_f), np.asarray(out_c)
    both = (of != 0) & (oc != 0)
    assert both.mean() > 0.8
    assert np.median(np.abs(of[both] - oc[both])) < 0.5


def test_masters_exact_with_row_varying_flat():
    """With a flat that varies between the two rows of a binned pair,
    the master-density subtraction still cancels exactly: the masters
    must be binned as binned(B * A) with A applied per ORIGINAL row,
    matching the kernel's binned(raw * A)."""
    h, w = 256, 512
    img, truth = synth.make_starfield((h, w), n_stars=4, background=400.0,
                                      read_noise=4.0, seed=12, margin=24,
                                      min_sep=60.0)
    bias = np.full((h, w), 200.0, np.float32)
    bias[100, 300] = 6000.0                    # hot bias pixel...
    rng = np.random.default_rng(5)
    # ...sitting on a strongly row-structured flat
    flat = 1.0 + 0.3 * np.sin(np.arange(h) * 1.1)[:, None] \
        + rng.normal(0, 0.01, (h, w))
    flat = flat.astype(np.float32)
    raw = np.clip(img * flat + bias, 0, 65535).astype(np.uint16)
    dark = np.zeros((h, w), np.float32)
    mf = master_densities(jnp.asarray(bias), jnp.asarray(dark),
                          jnp.asarray(flat))
    mx, ix, _, _ = pallas_detect_tiles(jnp.asarray(raw[None]),
                                 jnp.asarray([60.0]), mf_bc=mf,
                                 a_plane=jnp.asarray(1.0 / flat),
                                 exp_ratios=jnp.asarray([1.0]), band=64)
    found = _decode(np.asarray(mx), np.asarray(ix), 0)
    assert not any(abs(px - 300) < 3 and abs(py - 100) < 4
                   for px, py, _v in found), "hot pixel not suppressed"
    for x0, y0 in zip(truth["x"], truth["y"]):
        assert min(np.hypot(px - x0, py - y0)
                   for px, py, _v in found) < 2.5


def test_auto_gate_keeps_chunked_on_few_tiles():
    """detect_impl='auto' must NOT engage the fused kernel when the
    frame has fewer (64, 256) tiles than max_stars — find_stars falls
    back to full peak ranking there, and auto must match its capacity."""
    from astrophotography_tpu.models.pipeline import _fused_detect_ok
    from astrophotography_tpu.models import PipelineConfig

    cfg = PipelineConfig(max_stars=64, detect_fast=True,
                         detect_bin_rows=True, detect_topk="tile")
    # geometry valid for the kernel but only 16 tiles
    assert _fused_detect_ok(cfg, 512, 512)
    h, w = 512, 512
    assert (h // 64) * (w // 256) < cfg.max_stars  # the gate condition


def test_kernel_subpixel_offsets_accuracy():
    """The in-kernel calibrated-parabola peak offsets recover known
    sub-pixel star positions to < 0.02 px in BOTH axes on noise-free
    Gaussians (the odd-quintic calibration removes the parabola's
    phase-dependent bias against the exact filter response model —
    tighter than the cutout center-of-mass path, whose box truncation
    biases ~0.05 px)."""
    h, w = 256, 512
    positions = [(100.3, 60.7), (300.8, 141.2), (420.45, 200.95),
                 (200.0, 100.5)]
    img = np.full((h, w), 300.0, np.float32)
    for x0, y0 in positions:
        img += synth.gaussian_star((h, w), x0, y0, 40000.0, 3.0) \
            .astype(np.float32)
    raw = np.clip(img, 0, 65535).astype(np.uint16)
    maxv, idx, yoff, xoff = pallas_detect_tiles(
        jnp.asarray(raw[None]), jnp.asarray([60.0]), band=64)
    maxv, idx = np.asarray(maxv), np.asarray(idx)
    yoff, xoff = np.asarray(yoff), np.asarray(xoff)
    for x0, y0 in positions:
        best = None
        for ty in range(maxv.shape[1]):
            for tx in range(maxv.shape[2]):
                if maxv[0, ty, tx] > -1e37:
                    l = int(idx[0, ty, tx])
                    px = tx * 256 + l % 256
                    rb = ty * 32 + l // 256
                    cx = px + float(xoff[0, ty, tx])
                    cy = (rb + float(yoff[0, ty, tx])) * 2 + 0.5
                    d = np.hypot(cx - x0, cy - y0)
                    if best is None or d < best[0]:
                        best = (d, cx, cy)
        d, cx, cy = best
        assert abs(cx - x0) < 0.02, (x0, y0, cx)
        assert abs(cy - y0) < 0.02, (x0, y0, cy)


def test_lean_pipeline_kernel_centroid_matches_com():
    """centroid='kernel' (in-kernel calibrated density parabola, zero
    host gathers) solves the same registrations as centroid='com'
    (cutout center-of-mass) to centroid-noise level."""
    from astrophotography_tpu.models import PipelineConfig
    from astrophotography_tpu.models.pipeline import (
        calibrate_register_stack_lean)
    from tests.test_register_stack import _make_dithered_stack

    h, w = 256, 768
    frames, truths, _ = _make_dithered_stack(n_frames=4, shape=(h, w),
                                             seed=44)
    bias = np.full((h, w), 250.0, np.float32)
    raw = jnp.asarray(np.clip(frames + bias, 0, 65535).astype(np.uint16))
    base = dict(max_stars=24, match_k=10, detect_fast=True,
                detect_bin_rows=True, detect_topk="tile",
                detect_mode="chunked", detect_chunk=2, detect_impl="fused",
                fused_tile=(32, 256), warp_span=8)
    out_k, diag_k = calibrate_register_stack_lean(
        raw, bias=jnp.asarray(bias),
        config=PipelineConfig(centroid="kernel", **base))
    out_c, diag_c = calibrate_register_stack_lean(
        raw, bias=jnp.asarray(bias),
        config=PipelineConfig(centroid="com", **base))
    for f in range(4):
        assert int(diag_k["n_inliers"][f]) >= 5
        assert abs(float(diag_k["tx"][f]) - float(diag_c["tx"][f])) < 0.2
        assert abs(float(diag_k["ty"][f]) - float(diag_c["ty"][f])) < 0.2
        # and against the injected truth dithers
        _theta, t_tx, t_ty = truths[f]
        assert abs(float(diag_k["tx"][f]) - t_tx) < 0.3
        assert abs(float(diag_k["ty"][f]) - t_ty) < 0.3
