"""Tests for the threaded prefetch/stream/write I/O pipeline and
region-based PSF candidate selection."""

import os
import time

import numpy as np
import pytest

from astrophotography_tpu.io.fits import Header, read_image, write_image
from astrophotography_tpu.parallel import (AsyncWriter, PrefetchLoader,
                                           stream_stacks)
from astrophotography_tpu.core.star_finder import StarFinder


@pytest.fixture()
def fits_files(tmp_path):
    paths = []
    for i in range(10):
        data = np.full((32, 32), float(i), np.float32)
        hdr = Header()
        hdr["FRAMEIDX"] = i
        p = str(tmp_path / f"f{i:02d}.fits")
        write_image(p, data, hdr)
        paths.append(p)
    return paths


def test_prefetch_loader_order_and_content(fits_files):
    loader = PrefetchLoader(fits_files, depth=3, workers=3)
    assert len(loader) == 10
    out = list(loader)
    assert [os.path.basename(p) for p, _, _ in out] == \
        [f"f{i:02d}.fits" for i in range(10)]
    for i, (_p, data, hdr) in enumerate(out):
        assert hdr["FRAMEIDX"] == i
        np.testing.assert_allclose(data, float(i))


def test_stream_stacks_chunks(fits_files):
    chunks = list(stream_stacks(fits_files, chunk=4, depth=2, workers=2))
    sizes = [c[1].shape[0] for c in chunks]
    assert sizes == [4, 4, 2]
    names0 = [os.path.basename(n) for n in chunks[0][0]]
    assert names0 == ["f00.fits", "f01.fits", "f02.fits", "f03.fits"]
    np.testing.assert_allclose(np.asarray(chunks[2][1])[1], 9.0)
    assert chunks[0][2][3]["FRAMEIDX"] == 3


def test_async_writer_roundtrip(tmp_path):
    with AsyncWriter() as w:
        for i in range(5):
            hdr = Header()
            hdr["IDX"] = i
            w.submit(str(tmp_path / f"o{i}.fits"),
                     np.full((8, 8), float(i), np.float32), hdr)
    for i in range(5):
        data, hdr = read_image(str(tmp_path / f"o{i}.fits"))
        np.testing.assert_allclose(data, float(i))
        assert hdr["IDX"] == i


def test_async_writer_error_surfaces(tmp_path):
    w = AsyncWriter()
    w.submit(str(tmp_path / "nodir" / "x.fits"), np.zeros((4, 4)))
    with pytest.raises(Exception):
        w.close()


def test_select_fit_candidates_regions():
    rng = np.random.default_rng(0)
    n = 200
    x = rng.uniform(0, 256, n)
    y = rng.uniform(0, 256, n)
    flux = rng.uniform(1, 100, n)
    sel = StarFinder.select_fit_candidates(x, y, flux, (256, 256), box=16,
                                           per_region=5)
    assert sel.sum() <= 25
    assert sel.sum() >= 20  # dense field: every region gets its 5
    # edge-excluded stars never selected
    margin = 8
    edge = (x < margin) | (x >= 256 - margin) | (y < margin) | (y >= 256 - margin)
    assert not (sel & edge).any()
    # the globally brightest interior star must be selected
    interior = np.where(~edge)[0]
    brightest = interior[np.argmax(flux[interior])]
    assert sel[brightest]
