"""Row-sharded fused warp+combine (parallel/fused.py) vs the
single-device kernel on the 8-device CPU mesh.

Geometry note: the Pallas interpreter's per-grid-step cost scales with
the full operand size on this 1-core host, so the in-suite test runs
8-way sharding at 512^2; the same parity was validated one-off at
6 x 1024^2 / 8-way (max |err| 5e-4, identical zero pattern — see
PERFORMANCE.md "Multi-chip").
"""

import numpy as np
import pytest

# Pallas-interpreter / virtual-mesh / soak heavyweights: full-suite tier
pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from astrophotography_tpu.parallel import frame_space_mesh, sharded_warp_combine
from astrophotography_tpu.ops.pallas_warp_combine import pallas_warp_combine


def _stack(n=8, h=2048, w=2048, seed=0, dither=6.0):
    rng = np.random.default_rng(seed)
    # smooth synthetic field: a gradient + coarse-grid structure (full
    # per-pixel noise would dominate interpreter runtime without
    # changing what the test checks)
    yy = np.linspace(0, 30, h, dtype=np.float32)[:, None]
    xx = np.linspace(0, 20, w, dtype=np.float32)[None, :]
    base = 800.0 + yy + xx
    small = rng.normal(0, 5, (h // 16, w // 16)).astype(np.float32)
    base = base + np.kron(small, np.ones((16, 16), np.float32))
    frames = np.stack([base + float(i) for i in range(n)])
    mats = []
    for f in range(n):
        theta = 0.0 if f == 0 else rng.uniform(-0.0005, 0.0005)
        tx, ty = (0.0, 0.0) if f == 0 else rng.uniform(-dither, dither, 2)
        c, s = np.cos(theta), np.sin(theta)
        mats.append([[c, -s, tx], [s, c, ty]])
    return (jnp.asarray(frames.astype(np.float32)),
            jnp.asarray(np.asarray(mats, np.float32)))


def test_sharded_fused_matches_single_device():
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = frame_space_mesh(n_frame=1, n_space=8, devices=devs[:8])
    cal, mats = _stack(n=4, h=256, w=512, dither=3.0)

    # big tiles: the CPU interpreter pays per-grid-step overhead, and
    # unlike the real chip has no VMEM ceiling
    ref = np.asarray(pallas_warp_combine(cal, mats, tile=(128, 512)))
    with mesh:
        got = np.asarray(sharded_warp_combine(cal, mats, mesh, halo=16,
                                              tile=(64, 512)))
    assert got.shape == ref.shape
    # FULL-frame parity including the global edges: v_bounds keeps each
    # shard's taps off the zero-filled halo, so edge rows follow the
    # single-device coverage rule exactly (parallel/fused.py)
    inner_g = got
    inner_r = ref
    both = (inner_g != 0) & (inner_r != 0)
    assert both.mean() > 0.9
    # allow a few ulp-level sigma-clip tie flips (a frame value exactly
    # at a clip bound can be kept in one arithmetic order and rejected
    # in the other); everything else must agree tightly
    err = np.abs(inner_g[both] - inner_r[both])
    tol = 0.5 + 1e-4 * np.abs(inner_r[both])
    assert (err > tol).mean() < 1e-4
    assert np.median(err) < 1e-3
    np.testing.assert_array_equal(inner_g == 0.0, inner_r == 0.0)


def test_sharded_fused_with_calibration_masters():
    """Row-sharded fused kernel with uint16 raw frames + in-kernel
    calibration (masters sharded like the frames) matches the
    single-device kernel."""
    cal, mats = _stack(n=3, h=256, w=512, dither=3.0)
    bias = 250.0
    raw = jnp.asarray(np.clip(np.asarray(cal) + bias, 0,
                              65535).astype(np.uint16))
    h, w = 256, 512
    masters = jnp.stack([jnp.ones((h, w), jnp.float32),
                         jnp.full((h, w), bias, jnp.float32),
                         jnp.zeros((h, w), jnp.float32)])
    ref = np.asarray(pallas_warp_combine(raw, mats, masters=masters,
                                         tile=(128, 512)))
    mesh = frame_space_mesh(n_frame=1, n_space=8, devices=jax.devices()[:8])
    with mesh:
        got = np.asarray(sharded_warp_combine(raw, mats, mesh,
                                              masters=masters, halo=16,
                                              tile=(64, 512)))
    both = (got != 0) & (ref != 0)
    assert both.mean() > 0.9
    err = np.abs(got[both] - ref[both])
    assert (err > 0.5 + 1e-4 * np.abs(ref[both])).mean() < 3e-4
    np.testing.assert_array_equal(got == 0.0, ref == 0.0)


def test_sharded_lean_pipeline_matches_single_device():
    """The FULL memory-lean pipeline (chunked detection loop +
    in-kernel-calibrating fused kernel) jitted over the mesh with
    frame-sharded raw uint16 input matches the unsharded run — the
    multi-chip form of the 100x16-Mpix bench path (SURVEY.md 2.6).
    Geometry is interpreter-bounded (1-core host)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from astrophotography_tpu.models import PipelineConfig
    from astrophotography_tpu.models.pipeline import (
        calibrate_register_stack_lean)
    from tests.test_register_stack import _make_dithered_stack

    h = w = 128
    frames, _t, _ = _make_dithered_stack(n_frames=4, shape=(h, w), seed=9)
    bias = np.full((h, w), 250.0, np.float32)
    raw = jnp.asarray(np.clip(frames + bias, 0, 65535).astype(np.uint16))
    bias_d = jnp.asarray(bias)
    cfg = PipelineConfig(max_stars=24, match_k=10, detect_mode="chunked",
                         detect_chunk=2, detect_topk="tile",
                         detect_fast=True, fused_tile=(16, w))

    ref, ref_diag = calibrate_register_stack_lean(raw, bias=bias_d,
                                                  config=cfg)
    ref = np.asarray(ref)

    devs = jax.devices()
    mesh = frame_space_mesh(n_frame=2, n_space=4, devices=devs[:8])

    def step(fr, b):
        stacked, diag = calibrate_register_stack_lean(fr, bias=b,
                                                      config=cfg)
        stacked = jax.lax.with_sharding_constraint(
            stacked, NamedSharding(mesh, P("space", None)))
        return stacked, diag["n_inliers"]

    with mesh:
        stepc = jax.jit(step, in_shardings=(
            NamedSharding(mesh, P("frame", None, None)),
            NamedSharding(mesh, P(None, None))))
        got, inl = stepc(raw, bias_d)
        got = np.asarray(got)
    np.testing.assert_array_equal(np.asarray(inl),
                                  np.asarray(ref_diag["n_inliers"]))
    both = (got != 0) & (ref != 0)
    assert both.mean() > 0.8
    err = np.abs(got[both] - ref[both])
    assert (err > 0.5 + 1e-4 * np.abs(ref[both])).mean() < 3e-4


@pytest.mark.slow_multichip
def test_sharded_fused_large_geometry_parity():
    """The PERFORMANCE.md large-geometry multi-chip parity claim,
    regenerable on demand (opt-in — the Pallas interpreter needs tens
    of minutes for this geometry on a 1-core host):

        python -m pytest tests/test_parallel_fused.py -m slow_multichip

    6 x 1024^2 frames, 8-way row sharding vs the single-device kernel:
    tight value parity on jointly-covered pixels and an identical zero
    (coverage) pattern."""
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = frame_space_mesh(n_frame=1, n_space=8, devices=devs[:8])
    cal, mats = _stack(n=6, h=1024, w=1024, dither=6.0)
    ref = np.asarray(pallas_warp_combine(cal, mats, tile=(128, 512)))
    with mesh:
        got = np.asarray(sharded_warp_combine(cal, mats, mesh, halo=16,
                                              tile=(64, 512)))
    both = (got != 0) & (ref != 0)
    assert both.mean() > 0.9
    err = np.abs(got[both] - ref[both])
    # ulp-level sigma-clip tie flips allowed, everything else tight
    tol = 0.5 + 1e-4 * np.abs(ref[both])
    assert (err > tol).mean() < 1e-4
    assert np.median(err) < 1e-3
    np.testing.assert_array_equal(got == 0.0, ref == 0.0)


def test_sharded_fused_rejects_bad_halo():
    devs = jax.devices()
    mesh = frame_space_mesh(n_frame=1, n_space=8, devices=devs[:8])
    cal, mats = _stack(n=2, h=256, w=512)
    with pytest.raises(ValueError):
        sharded_warp_combine(cal, mats, mesh, halo=64)  # halo >= band


def test_sharded_fused_rotation_general_path_matches():
    """Sharded parity with rotations ABOVE the snap tolerance: the
    per-band matrix re-basing (shift = [m01*yoff, m11*yoff - yoff],
    parallel/fused.py) carries rotation terms that pure translations
    never exercise, and every shard must take the general per-pixel
    tap path (corner deviation ~0.5 px >> snap_tol 0.05)."""
    devs = jax.devices()
    assert len(devs) >= 4
    mesh = frame_space_mesh(n_frame=1, n_space=4, devices=devs[:4])
    rng = np.random.default_rng(23)
    h, w = 256, 256
    yy = np.linspace(0, 30, h, dtype=np.float32)[:, None]
    xx = np.linspace(0, 20, w, dtype=np.float32)[None, :]
    base = 800.0 + yy + xx
    small = rng.normal(0, 5, (h // 16, w // 16)).astype(np.float32)
    base = base + np.kron(small, np.ones((16, 16), np.float32))
    frames = np.stack([base + float(i) for i in range(4)])
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    mats = []
    for f in range(4):
        theta = 0.0 if f == 0 else float(
            rng.choice([-1.0, 1.0]) * rng.uniform(0.002, 0.004))
        tx, ty = (0.0, 0.0) if f == 0 else rng.uniform(-2, 2, 2)
        c, s = np.cos(theta), np.sin(theta)
        # rotate about the frame center so offsets stay halo-sized
        mats.append([[c, -s, tx + cx - c * cx + s * cy],
                     [s, c, ty + cy - s * cx - c * cy]])
    cal = jnp.asarray(frames.astype(np.float32))
    mats = jnp.asarray(np.asarray(mats, np.float32))

    ref = np.asarray(pallas_warp_combine(cal, mats, tile=(128, 256)))
    with mesh:
        got = np.asarray(sharded_warp_combine(cal, mats, mesh, halo=16,
                                              tile=(32, 256)))
    assert got.shape == ref.shape
    both = (got != 0) & (ref != 0)
    assert both.mean() > 0.9
    # identical coverage pattern and tight value parity
    np.testing.assert_array_equal(got == 0, ref == 0)
    err = np.abs(got[both] - ref[both])
    assert np.median(err) < 1e-3
    assert err.max() < 0.05
