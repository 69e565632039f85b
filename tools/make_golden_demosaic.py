#!/usr/bin/env python
"""Generate the pinned demosaic golden arrays (run ONCE, output
committed).

Produces tests/data/demosaic_golden.npz: a deterministic 24x24 RGGB
mosaic (synthetic scene with gradients + a star-like feature + an
edge, the structures that distinguish bilinear/MHC/AHD) and the
expected float32 RGB output of each algorithm, computed on the CPU
backend at the time of pinning.  The value-asserting test
(tests/test_demosaic.py::test_demosaic_goldens_pinned) catches any
algorithm regression even on hosts without rawpy — the postage-stamp
pattern of the reference's own golden tests
(/root/reference/test/AstroPhotography/test_core.py:315-353, generated
once via Octave per scripts/split.m).

Regenerate ONLY on an intentional algorithm change, and record why in
the commit message.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def build_mosaic():
    from astrophotography_tpu import synth

    h = w = 24
    scene = synth.make_rgb_scene((h, w), seed=42, peak=30000.0)
    # structure that exercises directional interpolation: a bright
    # star (radial gradients), a hard vertical edge, a diagonal ramp
    scene += synth.gaussian_star((h, w), 8.3, 9.1, 300000.0, 2.6)[..., None]
    scene[:, 16:, 1] += 12000.0
    yy, xx = np.mgrid[0:h, 0:w]
    scene[..., 2] += (yy + xx) * 300.0
    scene = np.clip(scene, 0, 60000.0)
    mosaic = synth.mosaic_from_rgb(scene, black_levels=(0, 0, 0, 0))
    cmap = synth.bayer_color_map((h, w))
    return mosaic, cmap


def main() -> int:
    from astrophotography_tpu.ops import demosaic_bilinear
    from astrophotography_tpu.ops.demosaic import demosaic_ahd, demosaic_mhc

    mosaic, cmap = build_mosaic()
    vals = mosaic.astype(np.float32)
    out = {
        "mosaic": mosaic,
        "color_map": cmap.astype(np.uint8),
        "bilinear": np.asarray(demosaic_bilinear(vals, cmap), np.float32),
        "mhc": np.asarray(demosaic_mhc(vals, cmap), np.float32),
        "ahd": np.asarray(demosaic_ahd(vals, cmap), np.float32),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                        "demosaic_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {os.path.abspath(path)}:",
          {k: v.shape for k, v in out.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
