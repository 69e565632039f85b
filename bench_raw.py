#!/usr/bin/env python
"""Benchmark: dksraw RAW -> greyscale FITS end-to-end frames/sec.

The BASELINE.md secondary metric ("RAW -> greyscale FITS conversion,
frames/sec; no reference number exists").  Measures the complete
file-to-file path a reference `dksraw grey` user runs: container decode
(lossless-JPEG strip through the native T.81 decoder), device black
subtraction + white balance + demosaic + luminance, FITS encode + write.

Fixture: Canon EOS XTi geometry (3906x2602, BASELINE.md "typical frame
geometry") lossless-JPEG-compressed DNGs — the same compression real
CR2s carry.  The mosaic is encoded once and the payload reused across
the K fixture files (decode cost is per-file and value-independent).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by 1.0 frames/s — the estimated reference
throughput for the same geometry (rawpy/LibRaw decode + postprocess +
astropy writeto, single-threaded; see PERFORMANCE.md "dksraw
conversion").

Env overrides: BENCH_RAW_FILES (default 8), BENCH_RAW_REPEATS (2),
BENCH_RAW_SIZE ("HxW", default 2602x3906).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def main() -> int:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores JAX_PLATFORMS; force the backend
        # before the package's first jax use so CPU validation runs
        # don't open the device tunnel
        import jax
        jax.config.update("jax_platforms", "cpu")
    n_files = int(os.environ.get("BENCH_RAW_FILES", "8"))
    repeats = int(os.environ.get("BENCH_RAW_REPEATS", "2"))
    h, w = (int(v) for v in
            os.environ.get("BENCH_RAW_SIZE", "2602x3906").split("x"))

    from astrophotography_tpu.api import commands
    from astrophotography_tpu.io.losslessjpeg import encode_lossless_jpeg
    from astrophotography_tpu.io.raw import write_dng
    from astrophotography_tpu import synth

    rng = np.random.default_rng(0)
    # starfield mosaic with realistic levels + photon-ish noise; smooth
    # backgrounds compress harder than noise, so noise keeps the
    # entropy-decode cost honest
    base, _ = synth.make_starfield((min(h, 512), min(w, 512)), n_stars=25,
                                   background=0.0, seed=3, margin=24)
    field = np.zeros((h, w), np.float32)
    field[:base.shape[0], :base.shape[1]] = np.asarray(base)
    mosaic = np.clip(field + rng.normal(900.0, 35.0, (h, w)),
                     0, 65535).astype(np.uint16)

    with tempfile.TemporaryDirectory() as td:
        payload = encode_lossless_jpeg(mosaic)  # once; reused per file
        paths = []
        for i in range(n_files):
            p = os.path.join(td, f"frame_{i:03d}.dng")
            write_dng(p, mosaic, black_levels=(256,) * 4, white_level=65535,
                      camera_wb=(2.0, 1.0, 1.6, 1.0), compression=7,
                      strip_payload=payload,
                      exif={"Make": "Canon", "Model": "EOS XTi",
                            "ExposureTime": 120.0, "ISOSpeedRatings": 400})
            paths.append(p)

        def run() -> float:
            t0 = time.perf_counter()
            for i, p in enumerate(paths):
                commands.grey(p, os.path.join(td, f"out_{i:03d}.fits"),
                              wb_method="camera")
            return time.perf_counter() - t0

        run()  # compile + warm caches
        best = min(run() for _ in range(repeats))

    fps = n_files / best
    print(json.dumps({
        "metric": f"dksraw RAW->grey FITS frames/s ({h}x{w} "
                  "lossless-JPEG DNG)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 1.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
