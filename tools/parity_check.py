#!/usr/bin/env python
"""CPU <-> TPU numerical parity check (SURVEY.md §4 item c).

Runs the core kernels on both backends in one process and compares.
The CPU backend serves as the reference implementation ("fake
backend" — no cluster needed); run on a machine with a TPU attached:

    python tools/parity_check.py
"""

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from astrophotography_tpu import synth
    from astrophotography_tpu.models import (PipelineConfig,
                                             calibrate_register_stack)
    from astrophotography_tpu.ops import (find_stars, sigma_clip_combine,
                                          sigma_clipped_stats)
    from astrophotography_tpu.ops.warp import warp_affine_separable

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    if accel.platform == "cpu":
        print("no accelerator present; nothing to compare")
        return 0
    print(f"comparing {accel.device_kind} vs cpu")

    rng = np.random.default_rng(0)
    failures = 0

    def compare(name, fn, *arrays, rtol=1e-4, atol=1e-2):
        nonlocal failures
        outs = {}
        for dev, label in ((cpu, "cpu"), (accel, "accel")):
            staged = [jax.device_put(a, dev) for a in arrays]
            outs[label] = np.asarray(jax.tree_util.tree_leaves(fn(*staged))[0])
        diff = np.nanmax(np.abs(outs["cpu"] - outs["accel"]))
        scale = max(1.0, float(np.nanmax(np.abs(outs["cpu"]))))
        ok = diff <= atol + rtol * scale
        print(f"{'PASS' if ok else 'FAIL'} {name}: max|diff| = {diff:.3e}")
        if not ok:
            failures += 1

    img, _ = synth.make_starfield((256, 256), n_stars=12, seed=1,
                                  min_sep=18.0)
    stack = np.stack([img + rng.normal(0, 2, img.shape).astype(np.float32)
                      for _ in range(6)])
    m = np.asarray([[1.0, 0.001, 2.2], [-0.001, 1.0, -1.3]], np.float32)

    compare("sigma_clipped_stats",
            lambda x: jnp.stack(sigma_clipped_stats(x, sigma=3.0)), img)
    compare("sigma_clip_combine", lambda s: sigma_clip_combine(s), stack)
    compare("warp_separable",
            lambda x, mm: warp_affine_separable(x, mm, x.shape)[0], img, m)
    compare("find_stars x",
            lambda x: find_stars(x, fwhm=3.0, threshold=300.0,
                                 max_stars=32).x, img)
    cfg = PipelineConfig(max_stars=24, match_k=8)
    # cross-backend float divergence in the registration solve shifts
    # warp taps by an ulp, which shows up as a few ADU at star edges on
    # ~60k-ADU data; that is expected, not a kernel defect
    compare("full pipeline",
            lambda s: calibrate_register_stack(s, config=cfg)[0], stack,
            atol=5.0)
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
