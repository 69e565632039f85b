"""Round 2 of kernel/detect sweeps (TPU)."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import numpy as np
import jax
import jax.numpy as jnp

from astrophotography_tpu.models import PipelineConfig
from astrophotography_tpu.models.pipeline import frame_noise_stats
from astrophotography_tpu.ops.calibrate import calibrate_batch
from astrophotography_tpu.ops.detect import find_stars
from astrophotography_tpu.ops.pallas_warp_combine import pallas_warp_combine

N, S = 100, 4096
rng = np.random.default_rng(0)
frames_d = jnp.asarray(rng.integers(700, 1200, (N, S, S), dtype=np.uint16))
bias_d = jnp.asarray(np.full((S, S), 300.0, np.float32))
mats = np.tile(np.eye(2, 3, dtype=np.float32), (N, 1, 1))
mats[:, 0, 2] = rng.uniform(-4, 4, N)
mats[:, 1, 2] = rng.uniform(-4, 4, N)
mats_d = jnp.asarray(mats)
masters = jnp.stack([jnp.ones((S, S), jnp.float32), bias_d,
                     jnp.zeros((S, S), jnp.float32)])

def sync(x): return float(jnp.sum(x))
def timeit(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.1f} ms", flush=True)

# kernel with bitonic MAD at fgroup 1/2
for fg in (1, 2):
    try:
        timeit(f"kernel bitonic fgroup={fg}",
               lambda fg=fg: sync(pallas_warp_combine(
                   frames_d, mats_d, masters=masters, span=8,
                   apron=False, frame_group=fg)))
    except Exception as e:
        print(f"kernel fg={fg} failed: {type(e).__name__} {str(e)[:90]}", flush=True)

# detection: chunk x token sweep
@functools.partial(jax.jit, static_argnames=("c", "token"))
def detect_all(frames, bias, c, token):
    n = frames.shape[0]
    def detect(frame, ce, s):
        return find_stars(frame - ce, fwhm=3.0, threshold=7.0 * s,
                          max_stars=48, topk_mode="tile", mode="fast",
                          stats=False, bin_rows=True)
    parts = []
    tok = jnp.float32(0.0)
    for k in range(0, n, c):
        if token:
            chunk, _t = jax.lax.optimization_barrier((frames[k:k + c], tok))
        else:
            chunk = frames[k:k + c]
        calc = calibrate_batch(chunk, bias, None, None, None)
        ce, s = frame_noise_stats(calc)
        part = jax.vmap(detect)(calc, ce, s)
        if token:
            tok = jax.lax.optimization_barrier(part.x[0, 0])
        parts.append(part)
    return jnp.sum(jnp.concatenate([p.x for p in parts]))

for c, token in ((4, False), (5, True), (10, True), (20, True), (25, True)):
    try:
        timeit(f"detect chunk={c} token={token}",
               lambda c=c, t=token: float(detect_all(frames_d, bias_d, c, t)))
    except Exception as e:
        print(f"detect chunk={c} token={token} failed: {type(e).__name__} {str(e)[:90]}", flush=True)
