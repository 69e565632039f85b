"""Stage-split measurement at the 100x4096^2 north star (TPU)."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys
import numpy as np
import jax
import jax.numpy as jnp

from astrophotography_tpu.models import PipelineConfig
from astrophotography_tpu.models.pipeline import (
    calibrate_register_stack_lean, frame_noise_stats)
from astrophotography_tpu.ops.pallas_warp_combine import pallas_warp_combine
from astrophotography_tpu.ops.calibrate import calibrate_batch
from astrophotography_tpu.ops.detect import find_stars

N, S = 100, 4096
rng = np.random.default_rng(0)
frames = rng.integers(700, 1200, (N, S, S), dtype=np.uint16)
frames_d = jnp.asarray(frames)
bias_d = jnp.asarray(np.full((S, S), 300.0, np.float32))
mats = np.tile(np.eye(2, 3, dtype=np.float32), (N, 1, 1))
mats[:, 0, 2] = rng.uniform(-4, 4, N)
mats[:, 1, 2] = rng.uniform(-4, 4, N)
mats_d = jnp.asarray(mats)
masters = jnp.stack([jnp.ones((S, S), jnp.float32),
                     bias_d, jnp.zeros((S, S), jnp.float32)])

def sync(x):
    return float(jnp.sum(x))

def timeit(label, fn, reps=3):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.1f} ms", flush=True)
    return min(ts)

# 1. fused kernel standalone, lean config (masters, uint16, apron-free)
def k_run(snap):
    out = pallas_warp_combine(frames_d, mats_d, masters=masters,
                              span=8, apron=False, snap_tol=snap)
    return sync(out)
timeit("kernel fast (snap)", lambda: k_run(0.05))
timeit("kernel general (snap=0)", lambda: k_run(0.0))

# 2. detection chunk sweep (the lean pipeline's detect loop, standalone jit)
import functools
@functools.partial(jax.jit, static_argnames=("c",))
def detect_all(frames, bias, c):
    n = frames.shape[0]
    cfg = PipelineConfig(max_stars=48, match_k=10, detect_topk="tile",
                         detect_fast=True, detect_bin_rows=True)
    def detect(frame, ce, s):
        return find_stars(frame - ce, fwhm=cfg.fwhm,
                          threshold=cfg.detect_nsigma * s,
                          max_stars=cfg.max_stars, topk_mode="tile",
                          mode="fast", stats=False, bin_rows=True)
    parts = []
    token = jnp.float32(0.0)
    for k in range(0, n, c):
        chunk, _tok = jax.lax.optimization_barrier((frames[k:k + c], token))
        calc = calibrate_batch(chunk, bias, None, None, None)
        ce, s = frame_noise_stats(calc)
        part = jax.vmap(detect)(calc, ce, s)
        token = jax.lax.optimization_barrier(part.x[0, 0])
        parts.append(part)
    xs = jnp.concatenate([p.x for p in parts], axis=0)
    return jnp.sum(xs)

for c in (2, 4, 10):
    try:
        timeit(f"detect chunk={c}", lambda c=c: float(detect_all(frames_d, bias_d, c)))
    except Exception as e:
        print(f"detect chunk={c} failed: {type(e).__name__} {str(e)[:120]}", flush=True)

# 3. full lean pipeline (current bench config) for reference
cfg = PipelineConfig(max_stars=48, match_k=10, detect_mode="chunked",
                     detect_chunk=2, detect_topk="tile", detect_fast=True,
                     detect_bin_rows=True, warp_span=8, fused_apron=False)
def full():
    out, _ = calibrate_register_stack_lean(frames_d, bias=bias_d, config=cfg)
    return sync(out)
timeit("full lean pipeline", full)
