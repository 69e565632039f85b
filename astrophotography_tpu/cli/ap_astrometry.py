"""ap_astrometry: astrometric solution via astrometry.net source lists.

Reference surface (scripts/ap_astrometry.py:55-91): positional image,
srclist, output; --key (API key), --user_scale, --scale_err_ratio,
--xy_extension AP_XYPOS.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

from .common import add_loglevel, cli_main
from ..wcs.astrometry import Astrometry, nova_transport


def parse(argv: Optional[List[str]]) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="ap_astrometry",
        description="Plate-solve an image using its detected source list")
    p.add_argument("image", help="input FITS image")
    p.add_argument("srclist", help="FITS source list from ap_find_stars")
    p.add_argument("output", help="output WCS-stamped FITS image")
    p.add_argument("--key", default=os.environ.get("ASTROMETRY_API_KEY"),
                   help="astrometry.net API key (or ASTROMETRY_API_KEY env)")
    p.add_argument("--user_scale", type=float, default=None,
                   help="plate scale hint in arcsec/pixel")
    p.add_argument("--scale_err_ratio", type=float, default=1.3,
                   help="plate scale bound ratio (default 1.3)")
    p.add_argument("--xy_extension", default="AP_XYPOS",
                   help="source list extension with X/Y (default AP_XYPOS)")
    p.add_argument("--timeout", type=float, default=180.0,
                   help="solve timeout in seconds (default 180)")
    p.add_argument("--use-sip", dest="use_sip", action="store_true",
                   help="allow fitting a SIP distortion polynomial of "
                        "order 2 (reference scripts/ap_astrometry.py:"
                        "63-66; some downstream software, e.g. swarp, "
                        "may not handle SIP correctly)")
    add_loglevel(p)
    return p.parse_args(argv)


def run(ns: argparse.Namespace) -> None:
    if not ns.key:
        raise RuntimeError(
            "astrometry.net API key required (--key or ASTROMETRY_API_KEY)")
    ast = Astrometry(transport=nova_transport(ns.key, use_sip=ns.use_sip),
                     user_scale=ns.user_scale,
                     scale_err_ratio=ns.scale_err_ratio)
    wcs = ast.solve(ns.image, ns.srclist, ns.output,
                    xy_extension=ns.xy_extension, timeout=ns.timeout)
    if wcs is None:
        raise RuntimeError("plate solve failed")


main = cli_main(run, parse)

if __name__ == "__main__":
    import sys
    sys.exit(main())
