"""Measured device peaks for the roofline table (PERFORMANCE.md).

Grounds the roofline empirically instead of assuming ALU counts:

* f32 elementwise FMA throughput (the warp taps' currency),
* f32 min/max pair throughput (the combine sort networks' currency),
* HBM streaming bandwidth (u16 read + f32 write),
* the per-invocation dispatch floor of this environment.

All timings min-of-5 with a device-reduction sync; the dispatch floor
is subtracted from every quoted device time.

Usage: python tools/peakprobe.py
"""
import os

# repo-local persistent XLA compile cache (see bench.py)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import functools
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from astrophotography_tpu.utils.compile_cache import enable_compile_cache

# this JAX build ignores the env vars above; activate via config
enable_compile_cache(os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp


def timeit(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    # dispatch floor: warm the tunnel with several calls first (a fresh
    # connection shows multi-hundred-ms transients), then min-of-10
    tiny = jnp.ones((8,), jnp.float32)
    triv = jax.jit(lambda a: jnp.sum(a * 2.0))
    for _ in range(8):
        float(triv(tiny))
    floor = timeit(lambda: float(triv(tiny)), reps=10)
    print(f"dispatch floor: {floor * 1000:.1f} ms", flush=True)

    h = w = 8192
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0.5, 1.5, (h, w)).astype(np.float32))

    # f32 FMA chain: K fused multiply-adds per element per pass.
    # jnp.float32 scalar constants keep everything on the VPU.
    K = 256

    @jax.jit
    def fma_chain(a):
        acc = a
        for i in range(K):
            acc = acc * jnp.float32(1.0000001) + jnp.float32(1e-7)
        return jnp.sum(acc)

    t = timeit(lambda: float(fma_chain(x))) - floor
    flops = h * w * K * 2
    print(f"f32 FMA chain ({K} FMAs/elt): {t * 1000:.1f} ms = "
          f"{flops / t / 1e12:.2f} TFLOP/s", flush=True)

    # f32 min/max pairs (compare-exchange currency of the sorts)
    y = x + 0.5

    @jax.jit
    def minmax_chain(a, b):
        lo, hi = a, b
        for i in range(K // 2):
            lo2 = jnp.minimum(lo, hi)
            hi = jnp.maximum(lo, hi) + jnp.float32(1e-7)
            lo = lo2 + jnp.float32(1e-7)
        return jnp.sum(lo) + jnp.sum(hi)

    t = timeit(lambda: float(minmax_chain(x, y))) - floor
    ops = h * w * (K // 2) * 4   # min+max+2 adds per pair per element
    print(f"f32 min/max chain: {t * 1000:.1f} ms = "
          f"{ops / t / 1e12:.2f} Tops/s", flush=True)

    # HBM streaming: u16 read -> f32 sum (read-dominated)
    big = jnp.asarray(np.random.default_rng(1)
                      .integers(0, 65535, (64, 2048, 2048))
                      .astype(np.uint16))          # 512 MB

    @jax.jit
    def stream(a):
        return jnp.sum(a.astype(jnp.float32))

    t = timeit(lambda: float(stream(big))) - floor
    nbytes = big.size * 2
    print(f"HBM u16 stream read: {t * 1000:.1f} ms = "
          f"{nbytes / t / 1e9:.0f} GB/s", flush=True)

    # HBM f32 streaming read (+reduce); a plain copy is not measurable
    # here because block_until_ready does not sync through the tunnel,
    # so the sum forces completion and the metric is read-side only
    big32 = x  # 256 MB

    @jax.jit
    def copy_sum(a):
        return jnp.sum(a * jnp.float32(1.0000001)) + a[0, 0]

    t = timeit(lambda: float(copy_sum(big32))) - floor
    print(f"HBM f32 read(+reduce): {t * 1000:.1f} ms = "
          f"{big32.size * 4 / t / 1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
