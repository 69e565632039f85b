"""Stage-level timing of the lean north-star pipeline on the TPU.

Measures the stages of the 100 x 16-Mpix bench configuration
separately (fused detection, fused warp+combine kernel, full lean
pipeline) so PERFORMANCE.md's stage budget stays reproducible.

Usage: python tools/stagebench.py [--frames N] [--size S]
       [--stage detect|kernel|register|floor|full|all]

Timings are min-of-3 with a device-reduction sync (block_until_ready
does not synchronize through the axon tunnel).
"""
import os

# repo-local persistent XLA compile cache (see bench.py)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import argparse
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from astrophotography_tpu.utils.compile_cache import enable_compile_cache

# this JAX build ignores the env vars above; activate via config
enable_compile_cache(os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp

from astrophotography_tpu import synth
from astrophotography_tpu.models import PipelineConfig
from astrophotography_tpu.models.pipeline import (
    calibrate_register_stack_lean, _detect_stars_fused)
from astrophotography_tpu.ops.pallas_warp_combine import pallas_warp_combine


def make_inputs(n, s, seed=0):
    rng = np.random.default_rng(seed)
    base = np.full((s, s), 800.0, np.float32)
    xs = rng.uniform(32, s - 32, 40)
    ys = rng.uniform(32, s - 32, 40)
    fl = rng.uniform(20000, 60000, 40)
    for x, y, f in zip(xs, ys, fl):
        x0, y0 = int(x) - 12, int(y) - 12
        base[y0:y0 + 25, x0:x0 + 25] += synth.gaussian_star(
            (25, 25), x - x0, y - y0, f, 3.0)
    frames = np.empty((n, s, s), np.uint16)
    bias = np.full((s, s), 300.0, np.float32)
    noise = [rng.normal(0, 8.0, (s, s)).astype(np.float32) for _ in range(4)]
    for i in range(n):
        dx, dy = (rng.uniform(-4, 4, 2) if i else (0.0, 0.0))
        sh = np.roll(np.roll(base, int(round(dy)), 0), int(round(dx)), 1)
        frames[i] = np.clip(sh + noise[i % 4] + bias, 0,
                            65535).astype(np.uint16)
    return jnp.asarray(frames), jnp.asarray(bias)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--stage", default="all",
                    choices=["floor", "detect", "kernel", "register",
                             "full", "all"])
    args = ap.parse_args()
    n, s = args.frames, args.size

    frames_d, bias_d = make_inputs(n, s)
    cfg = PipelineConfig(max_stars=48, match_k=10, detect_mode="chunked",
                         detect_chunk=2, detect_topk="tile",
                         detect_fast=True, detect_bin_rows=True,
                         centroid="kernel", warp_span=8, fused_apron=False,
                         dither_budget=8)

    def sync(x):
        return float(jnp.sum(x))

    def timeit(label, fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{label}: {best * 1000:.1f} ms "
              f"({n * s * s / best / 1e9:.2f} GPix/s)", flush=True)

    if args.stage in ("floor", "register", "all"):
        # per-invocation tunnel/dispatch floor: a trivial jit round
        # trip costs ~25 ms through the remote axon tunnel, so NO
        # standalone stage can measure below it — subtract this from
        # the stage numbers to get device time
        tiny = jnp.ones((8,), jnp.float32)

        @jax.jit
        def triv(a):
            return jnp.sum(a * 2.0)

        timeit("dispatch floor (trivial jit round trip)",
               lambda: float(triv(tiny)))

    if args.stage in ("detect", "all"):
        @jax.jit
        def det_only(fr, b):
            st = _detect_stars_fused(fr, b, None, None,
                                     jnp.ones((n,), jnp.float32), cfg)
            return jnp.sum(st.x) + jnp.sum(st.flux)

        timeit("fused detect stage", lambda: float(det_only(frames_d,
                                                            bias_d)))

    if args.stage in ("kernel", "all"):
        ones = jnp.ones((s, s), jnp.float32)
        masters = jnp.stack([ones, jnp.asarray(bias_d),
                             jnp.zeros((s, s), jnp.float32)])
        rng = np.random.default_rng(3)
        mats = []
        for f in range(n):
            tx, ty = (0.0, 0.0) if f == 0 else rng.uniform(-4, 4, 2)
            mats.append([[1.0, 0.0, tx], [0.0, 1.0, ty]])
        mats_d = jnp.asarray(np.asarray(mats, np.float32))

        def kern():
            out = pallas_warp_combine(frames_d, mats_d, masters=masters,
                                      span=8, apron=False, dither_budget=8)
            return sync(out)

        timeit("fused warp+combine kernel", kern)

    if args.stage in ("register", "all"):
        from astrophotography_tpu.models.pipeline import (
            _solve_frame_similarities)

        @jax.jit
        def det_stars(fr, b):
            return _detect_stars_fused(fr, b, None, None,
                                       jnp.ones((n,), jnp.float32), cfg)

        stars = det_stars(frames_d, bias_d)
        _ = float(jnp.sum(stars.x))  # materialize off the timed path

        @jax.jit
        def reg_only(st):
            _sims, matrices, _ref = _solve_frame_similarities(st, n, cfg)
            return jnp.sum(matrices)

        timeit("registration stage", lambda: float(reg_only(stars)))

    if args.stage in ("full", "all"):
        def full():
            out, _ = calibrate_register_stack_lean(frames_d, bias=bias_d,
                                                   config=cfg)
            return sync(out)

        timeit("full lean pipeline", full)


if __name__ == "__main__":
    main()
