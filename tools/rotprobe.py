#!/usr/bin/env python
"""Kernel-only timing probe for the fused warp+combine general path.

Times ``pallas_warp_combine`` alone (no detect/register stages) on the
bench rotation workload — 100 x 4096^2 uint16 frames with full master
planes, per-frame field rotations of 0.1-0.25 deg about the center plus
sub-pixel dithers — so tap-path variants can be A/B'd without paying
the full-pipeline compile.  Matches the lean pipeline's kernel
invocation (models/pipeline.py lean path: masters on, apron off,
combine 'average').

Usage:
    python tools/rotprobe.py [--snap-tol T] [--span N]
                             [--dither-budget N] [--frames N] [--size N]

Each distinct (snap_tol, span, dither_budget, geometry) is a separate
~10 min Mosaic compile the first time; the repo-local cache makes
re-runs ~1 min.  NEVER run concurrently with pytest or another TPU job
(1-core host: dispatch starvation contaminates timings ~26x).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--size", type=int, default=4096)
    p.add_argument("--snap-tol", type=float, default=0.05)
    p.add_argument("--span", type=int, default=12)
    p.add_argument("--dither-budget", type=int, default=64)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--general", default="exact",
                   choices=("exact", "lowrank"),
                   help="non-snapped tap path variant")
    p.add_argument("--rot-deg", type=float, default=0.25,
                   help="max |rotation| (uniform 0.4x..1x of this)")
    p.add_argument("--block-div", default=None,
                   help="delivery-block subdivision 'ky,kx' "
                        "(default: kernel auto — (2,2) on wide tiles)")
    p.add_argument("--ramp", action="store_true",
                   help="full-depth verification instead of timing: "
                        "constant frames alternating 800/900 ADU (after "
                        "calibration) must stack to exactly 850 at every "
                        "interior pixel; a coverage- or budget-excluded "
                        "frame shifts its tile by ~0.5 ADU.  Same static "
                        "config as the timing run, so the compile cache "
                        "is reused")
    args = p.parse_args()

    from astrophotography_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    import jax
    import jax.numpy as jnp
    from astrophotography_tpu.ops.pallas_warp_combine import \
        pallas_warp_combine

    n, size = args.frames, args.size
    rng = np.random.default_rng(0)
    if args.ramp:
        # cal = raw*A - B - r*C = raw - 320 with these masters; raw
        # 1120/1220 -> calibrated 800/900 alternating by frame, so the
        # sigma-clipped mean at any FULL-DEPTH pixel is exactly
        # (800*ceil(n/2) + 900*(n//2))/n and dropping any single frame
        # moves it by ~0.5 ADU — a per-pixel depth detector
        frames = np.empty((n, size, size), np.uint16)
        for f in range(n):
            frames[f] = 1120 + 100 * (f % 2)
    else:
        frames = rng.integers(500, 60000, (n, size, size), dtype=np.uint16)
    ones = np.ones((size, size), np.float32)
    masters = np.stack([ones, 300.0 * ones, 40.0 * ones])
    cx = cy = (size - 1) / 2.0
    mats = []
    for f in range(n):
        theta = 0.0 if f == 0 else float(
            rng.choice([-1.0, 1.0])
            * np.deg2rad(rng.uniform(0.4 * args.rot_deg, args.rot_deg)))
        dx, dy = (0.0, 0.0) if f == 0 else rng.uniform(-4, 4, 2)
        c, s = np.cos(theta), np.sin(theta)
        mats.append([[c, -s, cx - c * cx + s * cy + dx],
                     [s, c, cy - s * cx - c * cy + dy]])
    frames_d = jnp.asarray(frames)
    masters_d = jnp.asarray(masters)
    mats_d = jnp.asarray(np.asarray(mats, np.float32))
    ratios_d = jnp.full((n,), 0.5, jnp.float32)

    bdiv = (tuple(int(x) for x in args.block_div.split(","))
            if args.block_div else None)

    def run():
        out = pallas_warp_combine(
            frames_d, mats_d, masters=masters_d, exp_ratios=ratios_d,
            span=args.span, apron=False, snap_tol=args.snap_tol,
            dither_budget=args.dither_budget, block_div=bdiv,
            general_taps=args.general)
        return out

    t0 = time.perf_counter()
    out = run()
    chk = float(jnp.sum(out))
    print(f"# warmup (compile or cache load): "
          f"{time.perf_counter() - t0:.1f} s, checksum {chk:.6g}")
    if args.ramp:
        expect = (800.0 * ((n + 1) // 2) + 900.0 * (n // 2)) / n
        # 32-px trim clears the legitimate rotation/v_bounds coverage
        # ring; everything inside must be full-depth
        interior = np.asarray(out)[32:-32, 32:-32]
        dev = np.abs(interior - expect)
        print(f"ramp full-depth: expect {expect:.3f}, interior max|dev| "
              f"{dev.max():.4f} at {np.unravel_index(dev.argmax(), dev.shape)}"
              f", mean {interior.mean():.4f}  "
              f"(budget={args.dither_budget} general={args.general})")
        ok = dev.max() < 0.1
        print("ramp full-depth:", "PASS" if ok else
              "FAIL — some frame was coverage/budget-excluded")
        return 0 if ok else 1
    k = 3
    best = None
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _i in range(k):
            out = run()
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
    gpix = n * size * size / best / 1e9
    print(f"kernel-only sustained: {best * 1000:.1f} ms  "
          f"{gpix:.3f} GPix/s  (snap_tol={args.snap_tol} span={args.span} "
          f"budget={args.dither_budget} block_div={bdiv} "
          f"general={args.general})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
