#!/usr/bin/env python
"""Secondary benchmark: RAW -> greyscale FITS conversion, frames/sec.

The BASELINE.md secondary metric (no reference number exists — the
reference runs LibRaw + numpy single-threaded): end-to-end file-to-file
dksraw-grey throughput over a directory of DNGs, including host decode,
device black-sub/WB/demosaic/luma, and FITS encode, using the threaded
prefetch/writer pipeline (parallel/pipeline.py).

Prints ONE JSON line like bench.py.  Env: BENCH_RAW_FRAMES,
BENCH_RAW_SIZE (square mosaic edge), BENCH_REPEATS.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def main() -> int:
    n_frames = int(os.environ.get("BENCH_RAW_FRAMES", "24"))
    size = int(os.environ.get("BENCH_RAW_SIZE", "3904"))  # ~CR2-scale
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    import jax

    from astrophotography_tpu import synth
    from astrophotography_tpu.core.raw_conv import RawConv
    from astrophotography_tpu.io.fits import Header
    from astrophotography_tpu.io.raw import write_dng
    from astrophotography_tpu.parallel.pipeline import AsyncWriter

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_rawgrey_")
    # one synthetic mosaic, written to n_frames distinct files (decode
    # cost is content-independent; distinct paths defeat nothing — the
    # loader has no cache)
    base = rng.integers(200, 16000, (size, size)).astype(np.uint16)
    paths = []
    for i in range(n_frames):
        p = os.path.join(tmp, f"f{i:03d}.dng")
        write_dng(p, base, black_levels=(128, 128, 128, 128))
        paths.append(p)

    def run_once() -> float:
        t0 = time.perf_counter()
        writer = AsyncWriter()
        for p in paths:
            conv = RawConv(p)
            img, _exif = conv.grey(wb_method="daylight", renorm=False)
            out = p[:-4] + ".fits"
            writer.submit(out, img, Header())
        writer.close()
        return time.perf_counter() - t0

    run_once()  # compile + warm
    best = min(run_once() for _ in range(repeats))
    fps = n_frames / best
    mpix = size * size / 1e6
    print(json.dumps({
        "metric": f"RAW->grey FITS frames/s ({n_frames}x{mpix:.0f}Mpix DNG,"
                  f" {jax.devices()[0].device_kind})",
        "value": round(fps, 2),
        "unit": "frames/s",
        # no reference number exists (BASELINE.md); report vs a 1 fps
        # single-threaded-Python strawman the reference's stack implies
        "vs_baseline": round(fps / 1.0, 2),
    }))
    for p in paths:
        for q in (p, p[:-4] + ".fits"):
            try:
                os.remove(q)
            except OSError:
                pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
