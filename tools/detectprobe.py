"""Break the fused detect stage into its pieces and time each on TPU.

Pieces: (a) the pallas_detect_tiles kernel alone, (b) noise stats on
subsampled rows, (c) the post-kernel top-k + centroid path.
"""
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
import jax

from astrophotography_tpu.utils.compile_cache import enable_compile_cache

# this JAX build ignores the env vars above; activate via config
enable_compile_cache(os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp

from astrophotography_tpu.models import PipelineConfig
from astrophotography_tpu.models.pipeline import (
    _detect_stars_fused, _noise_stats_from_sub)
from astrophotography_tpu.ops.pallas_detect import pallas_detect_tiles
from tools.stagebench import make_inputs


def timeit(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts) * 1000:.1f} ms", flush=True)


def main():
    n, s = 100, 4096
    frames_d, bias_d = make_inputs(n, s)
    cfg = PipelineConfig(max_stars=48, match_k=10, detect_mode="chunked",
                         detect_chunk=2, detect_topk="tile",
                         detect_fast=True, detect_bin_rows=True,
                         warp_span=8, fused_apron=False)
    thr = jnp.full((n,), 60.0, jnp.float32)

    @jax.jit
    def kern_only(fr):
        mv, ix, _, _ = pallas_detect_tiles(fr, thr, mf_bc=None, a_plane=None,
                                     fwhm=cfg.fwhm, band=128)
        return jnp.sum(mv) + jnp.sum(ix)

    timeit("pallas_detect_tiles kernel", lambda: float(kern_only(frames_d)))

    @jax.jit
    def noise_only(fr):
        rows = fr[:, ::8, :].astype(jnp.float32)
        ce, std = _noise_stats_from_sub(rows.reshape(n, -1), "mean")
        return jnp.sum(ce) + jnp.sum(std)

    timeit("noise stats (rows ::8)", lambda: float(noise_only(frames_d)))

    @jax.jit
    def full(fr, b):
        st = _detect_stars_fused(fr, b, None, None,
                                 jnp.ones((n,), jnp.float32), cfg)
        return jnp.sum(st.x) + jnp.sum(st.flux)

    timeit("full fused detect stage", lambda: float(full(frames_d, bias_d)))


if __name__ == "__main__" and "--pieces" not in sys.argv:
    main()


def probe_pieces():
    """Extra attribution probes: kernel WITH master densities, and the
    centroid path cost via max_stars scaling."""
    import jax
    import jax.numpy as jnp
    from astrophotography_tpu.models import PipelineConfig
    from astrophotography_tpu.models.pipeline import _detect_stars_fused
    from astrophotography_tpu.ops.pallas_detect import (master_densities,
                                                        pallas_detect_tiles)
    from tools.stagebench import make_inputs
    n, s = 100, 4096
    frames_d, bias_d = make_inputs(n, s)
    thr = jnp.full((n,), 60.0, jnp.float32)
    zeros = jnp.zeros((s, s), jnp.float32)
    mf = master_densities(bias_d, zeros, None)

    @jax.jit
    def kern_mf(fr):
        mv, ix, _, _ = pallas_detect_tiles(fr, thr, mf_bc=mf, a_plane=None,
                                     band=128)
        return jnp.sum(mv) + jnp.sum(ix)

    timeit("kernel with master densities", lambda: float(kern_mf(frames_d)))

    for ms in (1, 48):
        cfg = PipelineConfig(max_stars=ms, match_k=10,
                             detect_mode="chunked", detect_chunk=2,
                             detect_topk="tile", detect_fast=True,
                             detect_bin_rows=True, warp_span=8,
                             fused_apron=False)

        @jax.jit
        def full(fr, b, cfg=cfg):
            st = _detect_stars_fused(fr, b, None, None,
                                     jnp.ones((n,), jnp.float32), cfg)
            return jnp.sum(st.x) + jnp.sum(st.flux)

        timeit(f"full stage max_stars={ms}",
               lambda: float(full(frames_d, bias_d)))


if __name__ == "__main__" and "--pieces" in sys.argv:
    probe_pieces()
    sys.exit(0)
