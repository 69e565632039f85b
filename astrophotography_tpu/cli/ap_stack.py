"""ap_stack: register and sigma-clip stack calibrated FITS frames.

The standalone form of the reference's swarp resample + combine step
(scripts/resample_all.sh:62-79 COMBINE_TYPE / FSCALE handling) over the
device pipeline: star detection, similarity registration, Lanczos3
warp, and sigma-clipped combine run as one jitted computation — no
astrometric solve required.  Mixed exposures are scaled into the
reference frame's flux units via EXPTIME (swarp
FSCALE-from-EXPOSURE, resample_all.sh:300-314).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List, Optional

import numpy as np

from .common import add_loglevel, cli_main
from ..io.fits import Header, read_image, write_image
from ..utils.logger import get_logger

logger = get_logger("cli.ap_stack")


def parse(argv: Optional[List[str]]) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="ap_stack",
        description="Register + sigma-clip stack calibrated FITS frames")
    p.add_argument("inputs", nargs="+", help="input calibrated FITS frames")
    p.add_argument("-o", "--output", required=True,
                   help="output stacked FITS image")
    p.add_argument("--combine", default="average",
                   choices=("average", "median", "sum"),
                   help="combine method (swarp COMBINE_TYPE; default average)")
    p.add_argument("--sigma", type=float, default=5.0,
                   help="sigma clip bound (default 5)")
    p.add_argument("--engine", default="xla",
                   choices=("xla", "pallas", "fused"),
                   help="combine engine; 'fused' = memory-lean Pallas "
                        "warp+combine mega-kernel")
    p.add_argument("--ref_frame", default="auto",
                   help="registration reference: frame index or 'auto' "
                        "(frame with the most detected stars)")
    p.add_argument("--search_fwhm", type=float, default=3.0)
    p.add_argument("--search_nsigma", type=float, default=7.0)
    p.add_argument("--no-fscale", action="store_true",
                   help="do not scale mixed exposures by EXPTIME")
    add_loglevel(p)
    return p.parse_args(argv)


def run(ns: argparse.Namespace) -> None:
    import jax.numpy as jnp

    from ..models.pipeline import PipelineConfig, calibrate_register_stack

    if len(ns.inputs) < 2:
        raise ValueError("ap_stack needs at least 2 input frames")
    frames = []
    exps = []
    hdr0 = None
    for path in ns.inputs:
        data, hdr = read_image(path)
        if frames and data.shape != frames[0].shape:
            raise ValueError(
                f"{path!r} shape {data.shape} differs from first frame "
                f"{frames[0].shape}")
        frames.append(data)
        exps.append(float(hdr.get("EXPTIME", 0.0) or 0.0))
        if hdr0 is None:
            hdr0 = hdr
    stack = np.stack(frames)
    if ns.no_fscale or not exps[0]:
        scales = None
    else:
        scales = jnp.asarray([exps[0] / e if e else 1.0 for e in exps],
                             jnp.float32)

    ref_frame = (int(ns.ref_frame)
                 if str(ns.ref_frame).lstrip("-").isdigit()
                 else ns.ref_frame)
    cfg = PipelineConfig(
        fwhm=ns.search_fwhm, detect_nsigma=ns.search_nsigma,
        sigma_lower=ns.sigma, sigma_upper=ns.sigma,
        combine=ns.combine, combine_impl=ns.engine, ref_frame=ref_frame)
    t0 = time.perf_counter()
    stacked, diag = calibrate_register_stack(
        jnp.asarray(stack), flux_scales=scales, config=cfg)
    stacked = np.asarray(stacked)
    dt = time.perf_counter() - t0

    inl = np.asarray(diag["n_inliers"])
    ref_idx = int(diag["ref_frame"])
    bad = [os.path.basename(ns.inputs[i]) for i in range(len(inl))
           if inl[i] < 4 and i != ref_idx]
    if bad:
        logger.warning(f"{len(bad)} frame(s) registered with < 4 inliers "
                       f"and contribute little or nothing: {bad}")

    out_hdr = hdr0.copy() if hdr0 else Header()
    out_hdr["IMAGETYP"] = ("STACK", "Registered stacked image")
    out_hdr["NSTACK"] = (len(frames), "Number of frames in stack")
    if exps[0]:
        out_hdr["EXPTOTAL"] = (float(np.sum(exps)),
                               "[s] Total stacked exposure")
    for i, path in enumerate(ns.inputs):
        out_hdr[f"ISTK{i:04d}"] = os.path.basename(path)
    out_hdr.add_history(
        f"ap_stack: {len(frames)} frames, combine={ns.combine}, "
        f"sigma={ns.sigma}, engine={ns.engine}, ref={ref_idx}")
    write_image(ns.output, stacked, out_hdr)
    rms = np.asarray(diag["rms"])
    others = np.delete(rms, ref_idx) if len(rms) > 1 else rms
    logger.info(f"Stacked {len(frames)} frames -> {ns.output} "
                f"(ref frame {ref_idx}, reg rms median "
                f"{np.median(others):.3f} px, {dt:.2f} s)")


main = cli_main(run, parse)

if __name__ == "__main__":
    import sys
    sys.exit(main())
