"""Probe warp+combine kernel configs (tile, frame_group) on TPU."""
import os

# repo-local persistent XLA compile cache (see bench.py)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from astrophotography_tpu.utils.compile_cache import enable_compile_cache

# this JAX build ignores the env vars above; activate via config
enable_compile_cache(os.environ["JAX_COMPILATION_CACHE_DIR"])

from astrophotography_tpu.ops.pallas_warp_combine import pallas_warp_combine
from tools.stagebench import make_inputs


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--tile", default="96,512")
    ap.add_argument("--fgroup", type=int, default=2)
    ap.add_argument("--bdiv", default="1,1")
    ap.add_argument("--cchunk", type=int, default=0)
    ap.add_argument("--budget", type=int, default=64)
    args = ap.parse_args()
    bdiv = tuple(int(v) for v in args.bdiv.split(","))
    n, s = args.frames, args.size
    th, tw = (int(v) for v in args.tile.split(","))

    frames_d, bias_d = make_inputs(n, s)
    ones = jnp.ones((s, s), jnp.float32)
    masters = jnp.stack([ones, bias_d, jnp.zeros((s, s), jnp.float32)])
    rng = np.random.default_rng(3)
    mats = []
    for f in range(n):
        tx, ty = (0.0, 0.0) if f == 0 else rng.uniform(-4, 4, 2)
        mats.append([[1.0, 0.0, tx], [0.0, 1.0, ty]])
    mats_d = jnp.asarray(np.asarray(mats, np.float32))

    def run():
        out = pallas_warp_combine(frames_d, mats_d, masters=masters,
                                  span=8, apron=False, tile=(th, tw),
                                  frame_group=args.fgroup, block_div=bdiv,
                                  combine_chunk=args.cchunk or None,
                                  dither_budget=args.budget)
        return float(jnp.sum(out))

    t0 = time.perf_counter()
    run()
    print(f"compile+first: {time.perf_counter() - t0:.0f} s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"tile=({th},{tw}) fgroup={args.fgroup} bdiv={bdiv} "
          f"cchunk={args.cchunk} budget={args.budget} n={n} s={s}: "
          f"{best * 1000:.1f} ms ({n * s * s / best / 1e9:.2f} GPix/s)",
          flush=True)


if __name__ == "__main__":
    main()
