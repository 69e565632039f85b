"""Fused warp+combine kernel vs the unfused pipeline path
(interpreter mode on CPU)."""

import numpy as np
import pytest

# Pallas-interpreter / virtual-mesh / soak heavyweights: full-suite tier
pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from astrophotography_tpu import synth
from astrophotography_tpu.ops.pallas_warp_combine import pallas_warp_combine
from astrophotography_tpu.ops.warp import warp_affine_separable
from astrophotography_tpu.ops.stack import sigma_clip_combine


def _reference(cal, mats, span=12, method="average"):
    outs = []
    covers = []
    for f in range(cal.shape[0]):
        o, c = warp_affine_separable(cal[f], mats[f], cal.shape[1:],
                                     span=span, analytic_coverage=True)
        outs.append(o)
        covers.append(c)
    warped = jnp.stack(outs)
    weights = jnp.stack(covers)
    out = sigma_clip_combine(warped, mask=weights > 0.5,
                             sigma_lower=5.0, sigma_upper=5.0,
                             method=method)
    return np.asarray(jnp.where(jnp.isnan(out), 0.0, out))


def _make_inputs(n=5, h=64, w=128, seed=0):
    rng = np.random.default_rng(seed)
    base = np.asarray(synth.make_rgb_scene((h, w), seed=seed,
                                           peak=5000)[..., 0], np.float32)
    base += synth.gaussian_star((h, w), w * 0.3, h * 0.4, 40000.0,
                                3.0).astype(np.float32)
    cal = np.stack([base + rng.normal(0, 3, (h, w)).astype(np.float32)
                    for _ in range(n)])
    mats = []
    for f in range(n):
        # rotations large enough that the corner displacement exceeds
        # the kernel's default snap_tol (0.05 px), so these frames
        # deterministically exercise the general tap path; frame 0
        # (identity) exercises the snapped translation path
        theta = 0.0 if f == 0 else \
            rng.choice([-1, 1]) * rng.uniform(0.002, 0.004)
        tx, ty = (0.0, 0.0) if f == 0 else rng.uniform(-5, 5, 2)
        c, s = np.cos(theta), np.sin(theta)
        mats.append([[c, -s, tx], [s, c, ty]])
    return jnp.asarray(cal), jnp.asarray(np.asarray(mats, np.float32))


def test_fused_matches_unfused():
    cal, mats = _make_inputs()
    ref = _reference(cal, mats)
    got = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                         interpret=True))
    inner = ref != 0.0
    np.testing.assert_allclose(got[inner], ref[inner], rtol=1e-4, atol=0.5)
    # zero-coverage borders agree too
    np.testing.assert_array_equal(got == 0.0, ref == 0.0)


def test_lowrank_taps_match_exact_path():
    """general_taps='lowrank' (zeroth-order low-rank weights) for
    stacking-scale rotations: the committed error is a sampling
    displacement bounded by the per-tile drift |gx-1|*(tw-1)/2 —
    2.5e-4 px at these rotations/tiles, 200x under the snap path's own
    0.05 px bound — so values match the exact path to ~gradient *
    drift, plus rare sigma-clip tie flips."""
    cal, mats = _make_inputs(n=5, h=96, w=256, seed=13)
    lr = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                        general_taps="lowrank",
                                        interpret=True))
    ex = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                        interpret=True))
    np.testing.assert_array_equal(lr == 0.0, ex == 0.0)
    both = lr != 0.0
    rel = np.abs(lr[both] - ex[both]) / np.maximum(np.abs(ex[both]), 1.0)
    assert np.median(rel) < 1e-5
    # worst case ~ drift * max gradient; tie flips stay rare
    assert (rel > 2e-3).mean() < 5e-4


def test_lowrank_gate_excludes_large_rotations():
    """In lowrank mode, frames whose weight drift exceeds the snap
    tolerance are coverage-EXCLUDED (the dither_budget/base_ok
    graceful-degradation contract), never resampled approximately:
    the stack must equal the unfused reference over the remaining
    frames."""
    rng = np.random.default_rng(55)
    h, w = 96, 256
    base = np.asarray(synth.make_rgb_scene((h, w), seed=55,
                                           peak=5000)[..., 0], np.float32)
    cal = np.stack([base + rng.normal(0, 3, (h, w)).astype(np.float32)
                    for _ in range(4)])
    mats = [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            [[1.0, 0.0, 1.3], [0.0, 1.0, -0.7]],
            [[1.0, 0.0, -2.1], [0.0, 1.0, 0.4]]]
    # 4.6 deg: |1/cos(t) - 1| * (tw-1)/2 = 0.1 px > 0.05 at tw=64
    theta = 0.08
    c, s = np.cos(theta), np.sin(theta)
    mats.append([[c, -s, 2.0], [s, c, -1.0]])
    cal_j = jnp.asarray(cal)
    mats_j = jnp.asarray(np.asarray(mats, np.float32))
    got = np.asarray(pallas_warp_combine(cal_j, mats_j, tile=(32, 64),
                                         general_taps="lowrank",
                                         interpret=True))
    ref = _reference(cal_j[:3], mats_j[:3])
    inner = ref != 0.0
    err = np.abs(got[inner] - ref[inner])
    # snap-vs-exact weight noise plus rare sigma-clip tie flips — the
    # excluded frame must not pull the stack anywhere
    tol = 0.5 + 1e-4 * np.abs(ref[inner])
    assert (err > tol).mean() < 5e-4, float(err.max())
    assert np.median(err) < 1e-3


def test_lowrank_requires_snap_tol():
    cal, mats = _make_inputs(n=2)
    with pytest.raises(ValueError):
        pallas_warp_combine(cal, mats, tile=(32, 64), snap_tol=0.0,
                            general_taps="lowrank", interpret=True)


@pytest.mark.parametrize("method", ["median", "sum"])
def test_fused_combine_modes_match_unfused(method):
    """combine='median'/'sum' (reference swarp COMBINE_TYPE MEDIAN /
    ccdproc sum, resample_all.sh:62-79) match the unfused path."""
    cal, mats = _make_inputs(n=6, seed=11)
    ref = _reference(cal, mats, method=method)
    got = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                         combine=method, interpret=True))
    inner = ref != 0.0
    np.testing.assert_allclose(got[inner], ref[inner], rtol=1e-4, atol=0.5)
    np.testing.assert_array_equal(got == 0.0, ref == 0.0)


def test_fused_onehot_alignment_matches_roll():
    """The one-hot MXU alignment fallback is numerically identical to
    the dynamic-rotate path."""
    cal, mats = _make_inputs(n=4, seed=2)
    a = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                       align="roll", interpret=True))
    b = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                       align="onehot", interpret=True))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_fused_rejects_outlier_frame():
    cal, mats = _make_inputs(n=8, seed=3)
    cal = np.asarray(cal).copy()
    cal[3, 30, 50] = 60000.0  # cosmic ray
    got = np.asarray(pallas_warp_combine(jnp.asarray(cal), mats,
                                         tile=(32, 64), interpret=True))
    # identity frame 0: output pixel ~ (30,50); clipped combine stays background
    region = got[28:34, 46:56]
    assert region.max() < 6000.0


def test_lean_pipeline_matches_standard():
    """The memory-lean raw-in pipeline (in-kernel calibration) matches
    the standard pipeline."""
    from astrophotography_tpu.models import PipelineConfig
    from astrophotography_tpu.models.pipeline import (
        calibrate_register_stack, calibrate_register_stack_lean)
    from tests.test_register_stack import _make_dithered_stack

    frames, _t, _ = _make_dithered_stack(n_frames=4, shape=(192, 192),
                                         seed=5)
    bias = np.full((192, 192), 250.0, np.float32)
    raw = np.clip(frames + bias, 0, 65535).astype(np.uint16)
    cfg = PipelineConfig(max_stars=32, match_k=10, detect_mode="chunked",
                         detect_chunk=2)
    s_lean, d = calibrate_register_stack_lean(
        jnp.asarray(raw), bias=jnp.asarray(bias), config=cfg)
    s_ref, _ = calibrate_register_stack(
        jnp.asarray(raw), bias=jnp.asarray(bias),
        config=PipelineConfig(max_stars=32, match_k=10))
    a, b = np.asarray(s_lean), np.asarray(s_ref)
    both = (a != 0) & (b != 0)
    assert np.median(np.abs(a[both] - b[both])) < 1e-3
    assert np.percentile(np.abs(a[both] - b[both]), 99) < 0.1

def test_lean_flux_scales_match_standard():
    """swarp FSCALE in the lean path: in-kernel per-frame flux scaling
    matches the standard pipeline's pre-warp multiply (reference
    scripts/resample_all.sh:300-314)."""
    from astrophotography_tpu.models import PipelineConfig
    from astrophotography_tpu.models.pipeline import (
        calibrate_register_stack, calibrate_register_stack_lean)
    from tests.test_register_stack import _make_dithered_stack

    frames, _t, _ = _make_dithered_stack(n_frames=4, shape=(192, 192),
                                         seed=6)
    bias = np.full((192, 192), 250.0, np.float32)
    raw = np.clip(frames + bias, 0, 65535).astype(np.uint16)
    scales = jnp.asarray([1.0, 2.0, 0.5, 1.5], jnp.float32)
    cfg = PipelineConfig(max_stars=32, match_k=10, detect_mode="chunked",
                         detect_chunk=2)
    s_lean, _ = calibrate_register_stack_lean(
        jnp.asarray(raw), bias=jnp.asarray(bias), flux_scales=scales,
        config=cfg)
    s_ref, _ = calibrate_register_stack(
        jnp.asarray(raw), bias=jnp.asarray(bias), flux_scales=scales,
        config=PipelineConfig(max_stars=32, match_k=10))
    a, b = np.asarray(s_lean), np.asarray(s_ref)
    both = (a != 0) & (b != 0)
    assert np.median(np.abs(a[both] - b[both])) < 1e-2
    assert np.percentile(np.abs(a[both] - b[both]), 99) < 0.5


def test_fused_apron_free_interior_matches():
    """apron=False skips the padded stack copy; interior pixels (one
    tile + span away from every edge) must match the apron path."""
    cal, mats = _make_inputs(n=4, h=96, w=256, seed=7)
    full = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                          interpret=True))
    free = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                          apron=False, interpret=True))
    m = 32 + 12 + 4
    np.testing.assert_allclose(free[m:-m, m:-m], full[m:-m, m:-m],
                               rtol=1e-4, atol=0.5)
    # outside the interior, apron-free only ever drops pixels (zeros),
    # never invents values
    diff = (free != full)
    assert np.all(free[diff] == 0.0)
    # ...and every dropped pixel lies inside the documented border ring
    # (one tile + warp span + lanczos margin from the nearest edge)
    ys, xs = np.nonzero(diff)
    h, w = free.shape
    edge_dist = np.minimum(np.minimum(ys, h - 1 - ys),
                           np.minimum(xs, w - 1 - xs))
    assert edge_dist.size == 0 or edge_dist.max() < m


def test_large_dithers_degrade_gracefully_and_taller_tiles_recover():
    """Frame offsets beyond the shared-window dither budget are
    EXCLUDED per tile (zeros), never resampled from out-of-window data;
    a taller tile (more slack) recovers full parity."""
    rng = np.random.default_rng(9)
    h, w = 192, 192
    base = np.asarray(synth.make_rgb_scene((h, w), seed=9,
                                           peak=5000)[..., 0], np.float32)
    cal = np.stack([base + rng.normal(0, 3, (h, w)).astype(np.float32)
                    for _ in range(4)])
    mats = [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]
    for tx, ty in ((-28.0, 27.0), (25.0, -26.0), (27.0, 24.0)):
        mats.append([[1.0, 0.0, tx], [0.0, 1.0, ty]])
    cal = jnp.asarray(cal)
    mats = jnp.asarray(np.asarray(mats, np.float32))
    ref = _reference(cal, mats)

    # small tile: ~49 px of window slack < the ~55 px dither spread;
    # some (frame, tile) pairs drop out, so affected pixels average
    # fewer frames — still a valid (finite, in-range) stack, never
    # out-of-window garbage
    small = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                           interpret=True))
    assert np.all(np.isfinite(small))
    assert small.min() >= 0.0
    assert small.max() <= float(np.asarray(cal).max()) * 1.5

    # taller/wider tile: enough slack on both axes (vertical
    # vb*th - thp - (th-1), horizontal tw - span + 1) -> exact parity
    tall = np.asarray(pallas_warp_combine(cal, mats, tile=(64, 128),
                                          interpret=True))
    inner = ref != 0.0
    np.testing.assert_allclose(tall[inner], ref[inner], rtol=1e-4,
                               atol=0.5)
    np.testing.assert_array_equal(tall == 0.0, ref == 0.0)


def test_dither_budget_absorbs_full_spread_worst_case_median():
    """dither_budget is a SPREAD (max-minus-min) guarantee: a frame set
    whose offsets span exactly the budget must be fully contained even
    when the median offset sits at one END of the spread (the worst
    case for the median-centered window).  Regression: the window
    margin used to be half the budget, silently coverage-excluding
    frames > budget/2 from the median."""
    rng = np.random.default_rng(21)
    h, w = 192, 192
    base = np.asarray(synth.make_rgb_scene((h, w), seed=21,
                                           peak=5000)[..., 0], np.float32)
    cal = np.stack([base + rng.normal(0, 3, (h, w)).astype(np.float32)
                    for _ in range(4)])
    budget = 16
    # median offset ~0 on both axes; one frame deviates by a full
    # budget — legal under the spread guarantee, lost under margin=B/2
    offs = [(0.0, 0.0), (0.4, -0.3), (0.8, 0.5),
            (float(budget), float(budget))]
    mats = jnp.asarray(np.asarray(
        [[[1.0, 0.0, tx], [0.0, 1.0, ty]] for tx, ty in offs], np.float32))
    cal = jnp.asarray(cal)
    ref = _reference(cal, mats)
    got = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 64),
                                         dither_budget=budget,
                                         interpret=True))
    inner = ref != 0.0
    np.testing.assert_allclose(got[inner], ref[inner], rtol=1e-4, atol=0.5)
    np.testing.assert_array_equal(got == 0.0, ref == 0.0)


def test_span_containment_gate_excludes_rather_than_degrades():
    """Even on the EXACT tap path, a frame whose tile shear
    |m10|*(tw-1) + |m11-1|*(th-1) exceeds span - 7 cannot fit the full
    Lanczos support in the static tap range; such frames must be
    coverage-EXCLUDED (graceful-degradation contract), not resampled
    from partial support (normalizing over a truncated kernel biases
    the sample toward the available taps)."""
    rng = np.random.default_rng(77)
    h, w = 96, 256
    base = np.asarray(synth.make_rgb_scene((h, w), seed=77,
                                           peak=5000)[..., 0], np.float32)
    cal = np.stack([base + rng.normal(0, 3, (h, w)).astype(np.float32)
                    for _ in range(4)])
    mats = [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            [[1.0, 0.0, 1.1], [0.0, 1.0, -0.4]],
            [[1.0, 0.0, -0.8], [0.0, 1.0, 0.9]]]
    # theta = 0.1 rad (5.7 deg): vertical shear 0.0998*(64-1) = 6.3 px
    # > span-7 = 5 at tile (32, 64)/span 12 — beyond containment
    theta = 0.1
    c, s = np.cos(theta), np.sin(theta)
    mats.append([[c, -s, 1.0], [s, c, 0.5]])
    cal_j = jnp.asarray(cal)
    mats_j = jnp.asarray(np.asarray(mats, np.float32))
    got = np.asarray(pallas_warp_combine(cal_j, mats_j, tile=(32, 64),
                                         interpret=True))
    ref = _reference(cal_j[:3], mats_j[:3])
    inner = ref != 0.0
    err = np.abs(got[inner] - ref[inner])
    tol = 0.5 + 1e-4 * np.abs(ref[inner])
    assert (err > tol).mean() < 5e-4, float(err.max())
    assert np.median(err) < 1e-3


def test_tight_budget_contains_rotation_spread():
    """The bench rotation config class: general_taps='lowrank' with a
    dither_budget sized to the ROTATION-induced window spread
    (2*(sin(theta_max)*(size/2) + |dither|), bench.py rotation line).
    Constant frames alternating 800/900 stack to exactly 850 at every
    full-depth pixel, so a budget-excluded frame is visible as a
    ~±8 ADU shift.  Angles are signed with the median base at one END
    of the spread — the documented worst case for the median-centered
    window (max |base - median| = spread, needing a full budget of
    margin per side)."""
    n, h, w = 6, 192, 192
    cal = jnp.asarray(np.stack(
        [np.full((h, w), 800.0 + 100.0 * (f % 2), np.float32)
         for f in range(n)]))
    cx = cy = (w - 1) / 2.0
    # spread = 2*(sin(0.036)*96 + 0.5) = 7.9 px, budget 8: contained
    # with ~0.1 px margin; 2 positive vs 4 negative angles pin the
    # median at the negative end
    thetas = [0.036, 0.036, -0.036, -0.036, -0.036, -0.036]
    dith = [0.5, -0.5, 0.3, -0.3, 0.1, -0.1]
    mats = []
    for th_f, dx in zip(thetas, dith):
        c, s = np.cos(th_f), np.sin(th_f)
        mats.append([[c, -s, cx - c * cx + s * cy + dx],
                     [s, c, cy - s * cx - c * cy + dx]])
    # drift gate headroom: |cos(0.036)-1|*(64-1)/2 = 0.02 px < 0.05
    got = np.asarray(pallas_warp_combine(
        cal, jnp.asarray(np.asarray(mats, np.float32)), tile=(32, 64),
        dither_budget=8, general_taps="lowrank", interpret=True))
    interior = got[24:-24, 24:-24]
    np.testing.assert_allclose(interior, 850.0, atol=0.01)


def test_garbage_matrix_does_not_poison_good_frames():
    """A failed registration (wild matrix) must only lose ITS frame:
    the shared per-tile window centers on the median frame base, so the
    remaining frames still stack with exact parity."""
    cal, mats = _make_inputs(n=5, h=96, w=256, seed=15)
    mats_bad = np.asarray(mats).copy()
    mats_bad[4] = [[1.0, 0.0, 5000.0], [0.0, 1.0, -7000.0]]  # nonsense
    ref = _reference(cal[:4], mats[:4])
    got = np.asarray(pallas_warp_combine(cal, jnp.asarray(mats_bad),
                                         tile=(32, 64), interpret=True))
    inner = ref != 0.0
    np.testing.assert_allclose(got[inner], ref[inner], rtol=1e-4, atol=0.5)


def test_translation_mxu_taps_match_sliding_taps():
    """The banded bf16-split MXU horizontal pass (engaged when
    tw % 128 == 0) matches the sliding VPU formulation (engaged at
    other tile widths) to hi/lo-split tolerance (~2^-16 relative) —
    same frames, same transforms, different tile geometry only."""
    rng = np.random.default_rng(77)
    n, h, w = 4, 96, 512
    cal = jnp.asarray(rng.uniform(0, 60000, (n, h, w)).astype(np.float32))
    mats = np.tile(np.eye(2, 3, dtype=np.float32), (n, 1, 1))
    mats[:, 0, 2] = rng.uniform(-3, 3, n)
    mats[:, 1, 2] = rng.uniform(-3, 3, n)
    mats_j = jnp.asarray(mats)
    mxu = np.asarray(pallas_warp_combine(cal, mats_j, tile=(32, 128),
                                         span=8, interpret=True))
    sliding = np.asarray(pallas_warp_combine(cal, mats_j, tile=(32, 64),
                                             span=8, interpret=True))
    both = (mxu != 0) & (sliding != 0)
    assert both.mean() > 0.8
    np.testing.assert_allclose(mxu[both], sliding[both], rtol=2e-4,
                               atol=0.05)


def test_translation_snap_matches_general_path():
    """Exact-translation frames take the scalar-weight fast tap path;
    it must agree with the general per-pixel path to float
    reassociation noise."""
    rng = np.random.default_rng(31)
    n, h, w = 6, 96, 384
    cal = jnp.asarray(rng.uniform(0, 1000, (n, h, w)).astype(np.float32))
    mats = np.tile(np.eye(2, 3, dtype=np.float32), (n, 1, 1))
    mats[:, 0, 2] = rng.uniform(-3, 3, n)
    mats[:, 1, 2] = rng.uniform(-3, 3, n)
    mats_j = jnp.asarray(mats)
    fast = np.asarray(pallas_warp_combine(cal, mats_j, tile=(32, 128),
                                          span=8, interpret=True))
    slow = np.asarray(pallas_warp_combine(cal, mats_j, tile=(32, 128),
                                          span=8, snap_tol=0.0,
                                          interpret=True))
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=0.05)


def test_translation_snap_geometric_tolerance():
    """A sub-tolerance rotation is snapped to the best-fit translation:
    the fused output must equal the unfused reference warped with that
    SNAPPED matrix (validating the snap formula), and rotations above
    the tolerance must not snap."""
    cal, _ = _make_inputs(n=4, h=64, w=128, seed=41)
    h, w = cal.shape[1:]
    theta = 3e-4  # corner err ~0.02 px < 0.05 default tol
    c, s = np.cos(theta), np.sin(theta)
    mats = np.tile(np.eye(2, 3, dtype=np.float32), (4, 1, 1))
    for f in range(1, 4):
        mats[f] = [[c, -s, f * 0.7], [s, c, -f * 0.3]]
    got = np.asarray(pallas_warp_combine(cal, jnp.asarray(mats),
                                         tile=(32, 64), interpret=True))
    # snap each matrix the way the kernel does (displacement at center)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    snapped = np.tile(np.eye(2, 3, dtype=np.float32), (4, 1, 1))
    for f in range(4):
        snapped[f, 0, 2] = mats[f, 0] @ [cx, cy, 1.0] - cx
        snapped[f, 1, 2] = mats[f, 1] @ [cx, cy, 1.0] - cy
    ref = _reference(cal, jnp.asarray(snapped))
    inner = ref != 0.0
    np.testing.assert_allclose(got[inner], ref[inner], rtol=1e-4, atol=0.5)


def test_fused_apron_free_needs_three_blocks():
    cal, mats = _make_inputs(n=2, h=64, w=128, seed=1)
    with pytest.raises(ValueError):
        pallas_warp_combine(cal, mats, tile=(32, 64), apron=False,
                            interpret=True)


def test_fused_matches_unfused_random_transforms():
    """Property fuzz over random in-budget transforms: the fused kernel
    must match the unfused pipeline wherever the reference reports
    coverage (catches shared-window containment bugs)."""
    rng = np.random.default_rng(23)
    h, w = 96, 256
    base = np.asarray(synth.make_rgb_scene((h, w), seed=23,
                                           peak=5000)[..., 0], np.float32)
    for trial in range(6):
        n = int(rng.integers(3, 7))
        cal = np.stack([base + rng.normal(0, 3, (h, w)).astype(np.float32)
                        for _ in range(n)])
        mats = [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]
        for _f in range(n - 1):
            # above the snap tolerance (see _make_inputs)
            theta = rng.choice([-1, 1]) * rng.uniform(0.0015, 0.004)
            tx, ty = rng.uniform(-10, 10, 2)
            c, s = np.cos(theta), np.sin(theta)
            mats.append([[c, -s, tx], [s, c, ty]])
        cal_j = jnp.asarray(cal)
        mats_j = jnp.asarray(np.asarray(mats, np.float32))
        ref = _reference(cal_j, mats_j)
        got = np.asarray(pallas_warp_combine(cal_j, mats_j, tile=(32, 64),
                                             interpret=True))
        inner = ref != 0.0
        err = np.abs(got[inner] - ref[inner])
        assert np.median(err) < 1e-3, trial
        # tolerate rare sigma-clip tie flips, nothing else
        tol = 0.5 + 1e-4 * np.abs(ref[inner])
        assert (err > tol).mean() < 1e-4, (trial, float(err.max()))
        np.testing.assert_array_equal(got == 0.0, ref == 0.0)


def test_full_coverage_fast_path_matches():
    """Interior tiles where every frame covers every pixel take the
    static-rank median/MAD fast path; edge tiles keep the per-pixel
    rank selects.  One call over a 3x3 tile grid with small dithers
    exercises both branches, and both must match the unfused path."""
    rng = np.random.default_rng(21)
    h, w, n = 96, 384, 7
    base = np.asarray(synth.make_rgb_scene((h, w), seed=21,
                                           peak=5000)[..., 0], np.float32)
    base += synth.gaussian_star((h, w), w * 0.5, h * 0.5, 40000.0,
                                3.0).astype(np.float32)
    cal = np.stack([base + rng.normal(0, 3, (h, w)).astype(np.float32)
                    for _ in range(n)])
    mats = []
    for f in range(n):
        # pure small translations: every frame covers the whole center
        # tile (rows 32-63, cols 128-255 sit >= 30 px from any border),
        # so its min coverage count == n and the static-rank branch
        # runs; border tiles stay partial and run the select branch
        tx, ty = (0.0, 0.0) if f == 0 else rng.uniform(-2, 2, 2)
        mats.append([[1.0, 0.0, tx], [0.0, 1.0, ty]])
    cal_d = jnp.asarray(cal)
    mats_d = jnp.asarray(np.asarray(mats, np.float32))
    ref = _reference(cal_d, mats_d)
    got = np.asarray(pallas_warp_combine(cal_d, mats_d, tile=(32, 128),
                                         interpret=True))
    inner = ref != 0.0
    err = np.abs(got[inner] - ref[inner])
    # this geometry (tw=128, span 12) takes the banded bf16-split MXU
    # horizontal tap path, whose dropped lo@lo term is ~2^-18 relative
    # — ~0.01 ADU on these few-thousand-ADU values (the VPU sibling
    # test above sits at f32 reassociation noise, ~1e-3)
    assert np.median(err / np.maximum(np.abs(ref[inner]), 1.0)) < 1e-5
    # tolerate rare sigma-clip tie flips (that same 2^-18 difference
    # can flip a sample sitting exactly on the clip threshold), nothing
    # else
    tol = 0.5 + 1e-4 * np.abs(ref[inner])
    assert (err > tol).mean() < 1e-4, float(err.max())
    np.testing.assert_array_equal(got == 0.0, ref == 0.0)


@pytest.mark.parametrize("method", ["average", "median", "mean", "sum"])
def test_combine_chunk_invariance(method):
    """The chunked combine (wide-tile VMEM enabler) must be exactly
    chunk-invariant in every combine mode."""
    cal, mats = _make_inputs(n=5, h=96, w=256, seed=4)
    whole = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 128),
                                           combine=method, interpret=True))
    chunked = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 128),
                                             combine=method,
                                             combine_chunk=128,
                                             interpret=True))
    np.testing.assert_allclose(chunked, whole, rtol=1e-6, atol=1e-3)


def test_block_div_delivery_matches_whole_tile():
    """block_div sub-tile delivery windows change only HOW source data
    reaches VMEM — output must match the whole-tile default exactly."""
    cal, mats = _make_inputs(n=4, h=96, w=256, seed=7)
    base = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 128),
                                          interpret=True))
    div = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 128),
                                         block_div=(2, 1),
                                         interpret=True))
    np.testing.assert_allclose(div, base, rtol=1e-6, atol=1e-3)
    # column split — the production auto default on wide (>= 1024)
    # tiles; exercised here at the interpreter-sized geometry
    base_w = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 256),
                                            interpret=True))
    div_w = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 256),
                                           block_div=(1, 2),
                                           interpret=True))
    np.testing.assert_allclose(div_w, base_w, rtol=1e-6, atol=1e-3)
    # both-axis quartering — the production auto default on wide tiles
    div_q = np.asarray(pallas_warp_combine(cal, mats, tile=(32, 256),
                                           block_div=(2, 2),
                                           interpret=True))
    np.testing.assert_allclose(div_q, base_w, rtol=1e-6, atol=1e-3)
