"""Micro-profile: detection sub-stages + kernel sort cost (TPU)."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp

from astrophotography_tpu.models import PipelineConfig
from astrophotography_tpu.models.pipeline import frame_noise_stats
from astrophotography_tpu.ops.calibrate import calibrate_batch
from astrophotography_tpu.ops.detect import find_stars, _fast_density

N, S = 100, 4096
rng = np.random.default_rng(0)
frames = rng.integers(700, 1200, (N, S, S), dtype=np.uint16)
frames_d = jnp.asarray(frames)
bias_d = jnp.asarray(np.full((S, S), 300.0, np.float32))

def timeit(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.1f} ms", flush=True)

def sync(x): return float(jnp.sum(x))

C = 4

# (a) calibrate only, chunked
@jax.jit
def cal_only(frames, bias):
    acc = jnp.float32(0)
    token = jnp.float32(0.0)
    for k in range(0, N, C):
        chunk, _t = jax.lax.optimization_barrier((frames[k:k + C], token))
        calc = calibrate_batch(chunk, bias, None, None, None)
        token = jax.lax.optimization_barrier(calc[0, 0, 0])
        acc = acc + jnp.sum(calc[:, ::512, ::512])
    return acc

timeit("cal only (chunked 4)", lambda: sync(cal_only(frames_d, bias_d)))

# (b) density only from raw (no calibrate), binned, chunked
@jax.jit
def dens_only(frames):
    acc = jnp.float32(0)
    token = jnp.float32(0.0)
    for k in range(0, N, C):
        chunk, _t = jax.lax.optimization_barrier((frames[k:k + C], token))
        x = chunk.astype(jnp.float32)
        det = 0.5 * (x[:, 0::2, :] + x[:, 1::2, :])
        d = jax.vmap(lambda a: _fast_density(a, 3.0, row_sigma_scale=0.5))(det)
        token = jax.lax.optimization_barrier(d[0, 0, 0].astype(jnp.float32))
        acc = acc + jnp.sum(d[:, ::512, ::512].astype(jnp.float32))
    return acc

timeit("density only raw (chunked 4, binned)", lambda: sync(dens_only(frames_d)))

# (c) noise stats only, chunked
@jax.jit
def stats_only(frames, bias):
    acc = jnp.float32(0)
    token = jnp.float32(0.0)
    for k in range(0, N, C):
        chunk, _t = jax.lax.optimization_barrier((frames[k:k + C], token))
        calc = calibrate_batch(chunk, bias, None, None, None)
        ce, s = frame_noise_stats(calc)
        token = jax.lax.optimization_barrier(ce[0])
        acc = acc + jnp.sum(ce) + jnp.sum(s)
    return acc

timeit("cal+stats (chunked 4)", lambda: sync(stats_only(frames_d, bias_d)))

# (d) full find_stars on raw (no cal) chunked
cfg = PipelineConfig()
@jax.jit
def detect_raw(frames):
    token = jnp.float32(0.0)
    parts = []
    for k in range(0, N, C):
        chunk, _t = jax.lax.optimization_barrier((frames[k:k + C], token))
        x = chunk.astype(jnp.float32)
        ce, s = frame_noise_stats(x)
        part = jax.vmap(lambda a, c, ss: find_stars(
            a - c, fwhm=3.0, threshold=7.0 * ss, max_stars=48,
            topk_mode="tile", mode="fast", stats=False,
            bin_rows=True))(x, ce, s)
        token = jax.lax.optimization_barrier(part.x[0, 0])
        parts.append(part)
    return jnp.sum(jnp.concatenate([p.x for p in parts]))

timeit("find_stars raw (chunked 4)", lambda: sync(detect_raw(frames_d)))

# (e) kernel combine cost: mean (no sorts) vs average (sorted clip)
from astrophotography_tpu.ops.pallas_warp_combine import pallas_warp_combine
mats = np.tile(np.eye(2, 3, dtype=np.float32), (N, 1, 1))
mats[:, 0, 2] = rng.uniform(-4, 4, N)
mats[:, 1, 2] = rng.uniform(-4, 4, N)
mats_d = jnp.asarray(mats)
masters = jnp.stack([jnp.ones((S, S), jnp.float32), bias_d,
                     jnp.zeros((S, S), jnp.float32)])
for comb in ("mean", "average"):
    try:
        timeit(f"kernel combine={comb}",
               lambda c=comb: sync(pallas_warp_combine(
                   frames_d, mats_d, masters=masters, span=8,
                   apron=False, combine=c)))
    except Exception as e:
        print(f"kernel combine={comb} failed: {type(e).__name__} {str(e)[:120]}",
              flush=True)
