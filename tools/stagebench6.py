"""Full lean pipeline with fused detect (TPU)."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax.numpy as jnp

from astrophotography_tpu.models import PipelineConfig
from astrophotography_tpu.models.pipeline import (
    calibrate_register_stack_lean, _detect_stars_fused)

N, S = 100, 4096
rng = np.random.default_rng(0)
base = np.full((S, S), 800.0, np.float32)
from astrophotography_tpu import synth
xs = rng.uniform(32, S - 32, 40); ys = rng.uniform(32, S - 32, 40)
fl = rng.uniform(20000, 60000, 40)
for x, y, f in zip(xs, ys, fl):
    x0, y0 = int(x) - 12, int(y) - 12
    base[y0:y0+25, x0:x0+25] += synth.gaussian_star((25, 25), x-x0, y-y0, f, 3.0)
frames = np.empty((N, S, S), np.uint16)
bias = np.full((S, S), 300.0, np.float32)
noise = [rng.normal(0, 8.0, (S, S)).astype(np.float32) for _ in range(4)]
for i in range(N):
    dx, dy = (rng.uniform(-4, 4, 2) if i else (0.0, 0.0))
    sh = np.roll(np.roll(base, int(round(dy)), 0), int(round(dx)), 1)
    frames[i] = np.clip(sh + noise[i % 4] + bias, 0, 65535).astype(np.uint16)
frames_d = jnp.asarray(frames)
bias_d = jnp.asarray(bias)

def sync(x): return float(jnp.sum(x))
def timeit(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label}: {best*1000:.1f} ms ({N*S*S/best/1e9:.2f} GPix/s)", flush=True)

cfg = PipelineConfig(max_stars=48, match_k=10, detect_mode="chunked",
                     detect_chunk=2, detect_topk="tile", detect_fast=True,
                     detect_bin_rows=True, warp_span=8, fused_apron=False)

# detection alone (fused kernel + host topk + centroids)
import jax
@jax.jit
def det_only(fr, b):
    st = _detect_stars_fused(fr, b, None, None, jnp.ones((N,), jnp.float32), cfg)
    return jnp.sum(st.x) + jnp.sum(st.flux)
timeit("fused detect stage", lambda: float(det_only(frames_d, bias_d)))

def full():
    out, _ = calibrate_register_stack_lean(frames_d, bias=bias_d, config=cfg)
    return sync(out)
timeit("full lean pipeline (fused detect)", full)
