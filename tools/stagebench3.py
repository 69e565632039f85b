"""Frame-group + tile sweep for the fused kernel (TPU)."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax.numpy as jnp

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
    print(f"{label}: {min(ts)*1000:.1f} ms "
          f"({N*S*S/min(ts)/1e9:.2f} GPix/s)", flush=True)

for fg, tile in ((1, None), (2, None), (4, None), (4, (112, 1024)),
                 (2, (112, 1024)), (4, (56, 1024)), (5, None), (10, None)):
    try:
        timeit(f"fgroup={fg} tile={tile}",
               lambda fg=fg, tile=tile: sync(pallas_warp_combine(
                   frames_d, mats_d, masters=masters, span=8,
                   apron=False, tile=tile, frame_group=fg)))
    except Exception as e:
        print(f"fgroup={fg} tile={tile} failed: {type(e).__name__} "
              f"{str(e)[:100]}", flush=True)
