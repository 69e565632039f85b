"""Tests for RAW container decode (DNG round-trip, PGM, FITS mosaic)."""

import numpy as np
import pytest

from astrophotography_tpu import synth
from astrophotography_tpu.io.fits import Header, write_image
from astrophotography_tpu.io.raw import (
    load_dng,
    load_fits_mosaic,
    load_pgm,
    load_raw,
    normalize_wb,
    write_dng,
)


def test_dng_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mosaic = rng.integers(0, 65536, (24, 32)).astype(np.uint16)
    path = str(tmp_path / "test.dng")
    write_dng(path, mosaic, black_levels=(512, 500, 520, 508),
              white_level=16383, camera_wb=(2.0, 1.0, 1.5, 1.0),
              exif={"Make": "SynthCam", "Model": "SynthCam X1",
                    "ExposureTime": 0.005, "FNumber": 5.6,
                    "ISOSpeedRatings": 800, "FocalLength": 200.0,
                    "DateTime": "2026:08:16 01:02:03"})
    raw = load_dng(path)
    np.testing.assert_array_equal(raw.mosaic, mosaic)
    assert raw.white_level == 16383
    np.testing.assert_allclose(raw.black_levels, [512, 500, 520, 508])
    np.testing.assert_allclose(raw.camera_wb, [2.0, 1.0, 1.5, 1.0], rtol=1e-5)
    # RGGB pattern: (0,0)=R,(0,1)=G1,(1,0)=G2,(1,1)=B
    assert raw.color_map[0, 0] == 0
    assert raw.color_map[0, 1] == 1
    assert raw.color_map[1, 0] == 3
    assert raw.color_map[1, 1] == 2
    assert raw.exif["Model"] == "SynthCam X1"
    assert raw.exif["ExposureTime"] == pytest.approx(0.005)
    assert raw.exif["ISOSpeedRatings"] == 800


def test_pgm_roundtrip(tmp_path):
    mosaic = np.arange(48, dtype=np.uint16).reshape(6, 8) * 100
    path = str(tmp_path / "m.pgm")
    with open(path, "wb") as fh:
        fh.write(b"P5\n# comment line\n8 6\n65535\n")
        fh.write(mosaic.astype(">u2").tobytes())
    raw = load_pgm(path)
    np.testing.assert_array_equal(raw.mosaic, mosaic)
    assert raw.white_level == 65535


def test_fits_mosaic(tmp_path):
    mosaic = np.full((8, 8), 5000, np.uint16)
    hdr = Header()
    hdr["BAYERPAT"] = "RGGB"
    hdr["BLKLEVR"] = 512
    hdr["BLKLEVG1"] = 500
    hdr["BLKLEVB"] = 520
    hdr["BLKLEVG2"] = 508
    hdr["WHITELEV"] = 16383
    hdr["WB_R"] = 2.0
    hdr["WB_G1"] = 1.0
    hdr["WB_B"] = 1.5
    hdr["WB_G2"] = 1.0
    hdr["EXPTIME"] = 30.0
    path = str(tmp_path / "mosaic.fits")
    write_image(path, mosaic, hdr)
    raw = load_fits_mosaic(path)
    np.testing.assert_array_equal(raw.mosaic, mosaic)
    np.testing.assert_allclose(raw.black_levels, [512, 500, 520, 508])
    np.testing.assert_allclose(raw.camera_wb, [2.0, 1.0, 1.5, 1.0])
    assert raw.exif["ExposureTime"] == 30.0


def test_load_raw_dispatch(tmp_path):
    mosaic = np.zeros((4, 4), np.uint16)
    dng = str(tmp_path / "a.dng")
    write_dng(dng, mosaic)
    assert load_raw(dng).mosaic.shape == (4, 4)
    # magic-based dispatch with unknown extension
    import shutil
    odd = str(tmp_path / "a.rawbin")
    shutil.copy(dng, odd)
    assert load_raw(odd).mosaic.shape == (4, 4)
    with pytest.raises(ValueError):
        bad = str(tmp_path / "bad.rawbin")
        with open(bad, "wb") as fh:
            fh.write(b"\x00\x01\x02\x03\x04\x05garbage")
        load_raw(bad)


def test_cr2_unslice():
    from astrophotography_tpu.io.raw import _unslice_cr2

    h, w = 8, 10
    truth = np.arange(h * w, dtype=np.uint16).reshape(h, w)
    # build the sliced stream: slices of widths [4, 4, 2]
    widths = [4, 4, 2]
    parts = []
    col = 0
    for ws in widths:
        parts.append(truth[:, col:col + ws].reshape(-1))
        col += ws
    stream = np.concatenate(parts).reshape(h, w)
    back = _unslice_cr2(stream, [2, 4, 2], h, w)
    np.testing.assert_array_equal(back, truth)
    with pytest.raises(ValueError):
        _unslice_cr2(stream, [2, 4, 5], h, w)


def test_normalize_wb():
    np.testing.assert_allclose(normalize_wb([2000, 1000, 3000, 1000]),
                               [2.0, 1.0, 3.0, 1.0])
    # daylight-style with zero G2 -> reuse G1 (reference
    # core/RawConv.py:154-156)
    np.testing.assert_allclose(normalize_wb([2.4, 0.9, 1.15, 0.0]),
                               [2.4 / 0.9, 1.0, 1.15 / 0.9, 1.0], rtol=1e-6)
    # 3-value form expands G2 = G1
    np.testing.assert_allclose(normalize_wb([2.0, 1.0, 1.6]),
                               [2.0, 1.0, 1.6, 1.0])
