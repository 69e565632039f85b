#!/usr/bin/env python
"""Benchmark: calibrate + register + sigma-clip stack throughput (GPix/s).

The BASELINE.json north-star metric: sustained GPix/s for the fused
calibrate->detect->register->warp->stack pipeline on one TPU chip
(target > 5 GPix/s; the reference has no published numbers — it runs
this chain as single-threaded Python over FITS files).

Prints the north-star JSON line first:
{"metric", "value", "unit", "vs_baseline"} — vs_baseline is measured
GPix/s divided by the 5 GPix/s target — then a SECOND JSON line with
the BASELINE.md secondary metric (RAW->grey FITS frames/s via
bench_rawgrey.run, with the tunnel-bound caveat encoded as a field),
so the driver captures both metrics every round.

Env overrides: BENCH_FRAMES, BENCH_SIZE (square frame edge),
BENCH_REPEATS; BENCH_SKIP_RAWGREY=1 skips the secondary metric;
BENCH_RAW_FRAMES / BENCH_RAW_SIZE size it (defaults 6 x 3904^2 here —
smaller than bench_rawgrey.py's standalone default to bound driver
wall time on the tunnel-I/O-dominated path).
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: the fused mega-kernel compiles in
# ~8-10 min on this host's single core; a repo-local cache turns every
# later bench invocation (including the driver's) into a ~1 min run.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def _attempt(n_frames: int, size: int, repeats: int,
             combine_impl: str = "pallas") -> dict:
    import jax
    import jax.numpy as jnp

    from astrophotography_tpu.models import PipelineConfig, calibrate_register_stack
    from astrophotography_tpu.models.pipeline import calibrate_register_stack_lean
    from astrophotography_tpu import synth

    rng = np.random.default_rng(0)

    # synthetic field: ~40 stars, realistic levels, per-frame dithers
    base = np.full((size, size), 800.0, np.float32)
    xs = rng.uniform(32, size - 32, 40)
    ys = rng.uniform(32, size - 32, 40)
    fl = rng.uniform(20000, 60000, 40)
    for x, y, f in zip(xs, ys, fl):
        # add stars on a small patch only (cheap host-side construction)
        x0, y0 = int(x) - 12, int(y) - 12
        patch = synth.gaussian_star((25, 25), x - x0, y - y0, f, 3.0)
        base[y0:y0 + 25, x0:x0 + 25] += patch
    # frames in uint16, as real detectors deliver them (the pipeline
    # converts on device; halves the resident input stack).  A small
    # bank of pre-generated noise fields keeps host-side construction
    # fast for the 100x16-Mpix lead config (fresh 16-Mpix gaussians per
    # frame would cost minutes; throughput is value-independent)
    frames = np.empty((n_frames, size, size), np.uint16)
    bias = np.full((size, size), 300.0, np.float32)
    noise_bank = [rng.normal(0, 8.0, (size, size)).astype(np.float32)
                  for _ in range(min(4, n_frames))]
    for i in range(n_frames):
        dx, dy = (rng.uniform(-4, 4, 2) if i else (0.0, 0.0))
        shifted = np.roll(np.roll(base, int(round(dy)), axis=0),
                          int(round(dx)), axis=1)
        frames[i] = np.clip(shifted + noise_bank[i % len(noise_bank)]
                            + bias, 0, 65535).astype(np.uint16)

    n_bands = int(os.environ.get("BENCH_BANDS", "0"))
    if combine_impl == "lean":
        # memory-lean path: raw uint16 stack + in-kernel calibration,
        # apron-free fused warp+combine, tile-mode peak ranking — the
        # only configuration that fits 100x16-Mpix on one chip
        cfg = PipelineConfig(max_stars=48, match_k=10,
                             detect_mode="chunked", detect_chunk=2,
                             detect_topk="tile", detect_fast=True,
                             detect_bin_rows=True, centroid="kernel",
                             warp_span=8, fused_apron=False,
                             # the bench workload dithers by <= +-4 px
                             # (known observing pattern), so the
                             # translation SPREAD is <= 8 px; declaring
                             # it shrinks the source window one
                             # delivery block vs the safe default
                             dither_budget=8)
        frames_d = jnp.asarray(frames)
        bias_d = jnp.asarray(bias)

        def run_lean():
            stacked, _ = calibrate_register_stack_lean(frames_d, bias=bias_d,
                                                       config=cfg)
            return float(jnp.sum(stacked))

        run_lean()
        # single-run latency (includes one ~25 ms tunnel round trip —
        # the <2 s north-star latency check)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run_lean()
            times.append(time.perf_counter() - t0)
        single_ms = min(times) * 1000.0
        # SUSTAINED throughput (the BASELINE.md metric): k back-to-back
        # dispatches, one sync.  The device executes modules in order,
        # so syncing the last result bounds all k runs; the fixed
        # per-invocation tunnel round trip (~25 ms here; absent on a
        # PCIe-attached chip) amortizes over k instead of taxing every
        # run
        k = 3
        sus = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            outs = None
            for _i in range(k):
                outs, _ = calibrate_register_stack_lean(
                    frames_d, bias=bias_d, config=cfg)
            float(jnp.sum(outs))
            sus.append((time.perf_counter() - t0) / k)
        best = min(sus)
        gpix = n_frames * size * size / best / 1e9
        return {
            "metric": f"calibrate+register+stack GPix/s ({n_frames}x{size}^2"
                      f" lean, sustained over {k} back-to-back runs, "
                      f"{jax.devices()[0].device_kind})",
            "value": round(gpix, 3),
            "unit": "GPix/s",
            "vs_baseline": round(gpix / 5.0, 3),
            "single_run_ms": round(single_ms, 1),
        }
    if combine_impl == "fused":
        # the fused warp+combine kernel never materializes stack-sized
        # temporaries, so banding is unnecessary at any size
        n_bands = 1
    elif n_bands == 0:
        # unbanded is fastest (each band costs an extra device dispatch);
        # band only when the ~7 stack-sized temporaries would overflow HBM
        peak_bytes = n_frames * size * size * 4 * 7
        budget = 8e9
        n_bands = 1
        while peak_bytes / n_bands > budget and size % (n_bands * 2) == 0:
            n_bands *= 2
    cfg = PipelineConfig(max_stars=48, match_k=10, interp="separable",
                         n_bands=n_bands, detect_mode="vmap",
                         combine_impl=combine_impl)
    frames_d = jnp.asarray(frames)
    bias_d = jnp.asarray(bias)

    def run_once():
        stacked, diag = calibrate_register_stack(frames_d, bias=bias_d,
                                                 config=cfg)
        # force real completion: a device-side reduction transferred to
        # host (block_until_ready alone does not synchronize through the
        # axon remote tunnel)
        return float(jnp.sum(stacked))

    run_once()  # compile + drain
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    gpix = n_frames * size * size / best / 1e9
    return {
        "metric": f"calibrate+register+stack GPix/s ({n_frames}x{size}^2, "
                  f"{jax.devices()[0].device_kind})",
        "value": round(gpix, 3),
        "unit": "GPix/s",
        "vs_baseline": round(gpix / 5.0, 3),
    }


def main() -> int:
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    if "BENCH_FRAMES" in os.environ or "BENCH_SIZE" in os.environ:
        ladder = [(int(os.environ.get("BENCH_FRAMES", "40")),
                   int(os.environ.get("BENCH_SIZE", "2048")),
                   ("lean", "pallas", "fused", "xla"))]
    else:
        # the lead config is the BASELINE.md north star — the full
        # 100x16-Mpix stack, which only the memory-lean path fits on one
        # chip; then fall back to smaller configs on OOM or other device
        # failures so the driver always records a number
        ladder = [(100, 4096, ("lean",)),
                  (24, 4096, ("pallas", "fused")),
                  (40, 2048, ("pallas", "fused")),
                  (16, 2048, ("pallas", "fused", "xla")),
                  (16, 1024, ("pallas", "fused", "xla")),
                  (8, 1024, ("pallas", "fused", "xla"))]
    last_err = None
    for n_frames, size, impls in ladder:
        for impl in impls:
            try:
                result = _attempt(n_frames, size, repeats, combine_impl=impl)
                print(json.dumps(result), flush=True)
                _secondary(repeats)
                return 0
            except Exception as exc:  # OOM, compile failure, ...
                last_err = exc
                print(f"# bench config {n_frames}x{size}^2 ({impl}) failed: "
                      f"{type(exc).__name__}: {exc}", file=sys.stderr)
    print(json.dumps({"metric": "calibrate+register+stack GPix/s",
                      "value": 0.0, "unit": "GPix/s", "vs_baseline": 0.0,
                      "error": str(last_err)}))
    return 1


def _secondary(repeats: int) -> None:
    """Emit the BASELINE.md secondary metric (RAW->grey frames/s) as a
    second JSON line; failures never mask the north-star result."""
    if os.environ.get("BENCH_SKIP_RAWGREY") == "1":
        return
    try:
        import bench_rawgrey

        result = bench_rawgrey.run(
            n_frames=int(os.environ.get("BENCH_RAW_FRAMES", "6")),
            size=int(os.environ.get("BENCH_RAW_SIZE", "3904")),
            repeats=min(repeats, 2),
            compression=int(os.environ.get("BENCH_RAW_COMPRESSION", "7")))
        print(json.dumps(result), flush=True)
    except Exception as exc:
        print(f"# secondary (RAW->grey) metric failed: "
              f"{type(exc).__name__}: {exc}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
