"""Per-frame error isolation in the batch driver (SURVEY.md §5 failure
detection: one bad file must not kill the run)."""

import os

import numpy as np

from astrophotography_tpu.io.fits import Header, write_image
from astrophotography_tpu.core.reduce import ReduceConfig, reduce_all
from tests.test_reduce_composite import _make_dataset


def test_corrupt_frame_isolated(tmp_path):
    datadir, caldir, _ = _make_dataset(tmp_path, n_frames=3)
    # drop a corrupt "FITS" file into the data directory
    with open(datadir / "light99.fits", "wb") as fh:
        fh.write(b"SIMPLE  =                    T" + b"\0" * 100)
    outdir = tmp_path / "out"
    cfg = ReduceConfig(quality=False)
    # classify_light will fail on the corrupt file during scanning; the
    # driver must either skip it or fail the single frame, not the run
    try:
        produced = reduce_all(str(datadir), str(caldir), str(outdir), cfg)
    except Exception as exc:
        raise AssertionError(
            f"one corrupt frame killed the whole run: {exc}")
    assert len(produced["stacks"]) == 1
    assert len(produced["calibrated"]) >= 3


def test_find_masters_no_cross_filter_flat(tmp_path):
    """A V-band group must never pick up another filter's flat
    (only the exact unfiltered master_flat.fits is a safe fallback)."""
    from astrophotography_tpu.core.reduce import find_masters

    caldir = tmp_path / "cal"
    caldir.mkdir()
    for name in ("master_bias.fits", "master_dark.fits",
                 "master_flat_R.fits"):
        (caldir / name).write_bytes(b"")
    m = find_masters(str(caldir), filt="V")
    assert m["flat"] is None
    assert m["bias"] is not None
    # exact unfiltered fallback is allowed
    (caldir / "master_flat.fits").write_bytes(b"")
    m = find_masters(str(caldir), filt="V")
    assert m["flat"].endswith("master_flat.fits")
    # and the filter-specific flat wins when present
    (caldir / "master_flat_V.fits").write_bytes(b"")
    m = find_masters(str(caldir), filt="V")
    assert m["flat"].endswith("master_flat_V.fits")
