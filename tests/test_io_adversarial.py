"""Adversarial inputs for the from-scratch codecs.

The reference inherits robustness against corrupt files from astropy
and LibRaw; this suite pins the same guarantee for the from-scratch
FITS codec (io/fits.py), the native lossless-JPEG decoder
(native/losslessjpeg.cpp via io/losslessjpeg.py), and the TIFF/DNG
container parser (io/raw.py): every corruption yields a clean Python
exception — no hang, no segfault, no partial output file.
"""

import gzip
import os

import numpy as np
import pytest

from astrophotography_tpu.io.fits import (Header, open_fits, read_image,
                                          write_image)
from astrophotography_tpu.io.losslessjpeg import (decode_lossless_jpeg,
                                                  encode_lossless_jpeg)
from astrophotography_tpu.io.raw import load_raw, write_dng


# --------------------------------------------------------------------------
# FITS
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fits_bytes(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("adv") / "good.fits")
    write_image(p, np.arange(64 * 64, dtype=np.float32).reshape(64, 64),
                Header())
    with open(p, "rb") as fh:
        return fh.read()


def _reject(tmp_path, name, data, exc=(ValueError, EOFError)):
    p = str(tmp_path / name)
    with open(p, "wb") as fh:
        fh.write(data)
    with pytest.raises(exc):
        open_fits(p)


def _poke(raw: bytes, key: bytes, card: bytes) -> bytes:
    """Overwrite the card starting with ``key`` in a FITS byte image."""
    i = raw.index(key)
    assert len(card) <= 80
    return raw[:i] + card + raw[i + len(card):]


def test_fits_truncated_header(tmp_path, fits_bytes):
    _reject(tmp_path, "t.fits", fits_bytes[:100], EOFError)
    # one byte short of a full 2880 block
    _reject(tmp_path, "t2.fits", fits_bytes[:2879], EOFError)


def test_fits_truncated_data(tmp_path, fits_bytes):
    _reject(tmp_path, "t.fits", fits_bytes[:2880 + 100], EOFError)


def test_fits_not_fits(tmp_path):
    _reject(tmp_path, "png.fits", b"\x89PNG" + os.urandom(500))
    # a full block of garbage must not be block-scanned for END
    _reject(tmp_path, "rand.fits", os.urandom(2880 * 3), ValueError)
    _reject(tmp_path, "empty.fits", b"", ValueError)


def test_fits_corrupt_bitpix(tmp_path, fits_bytes):
    bad = _poke(fits_bytes, b"BITPIX",
                b"BITPIX  =                   17")
    _reject(tmp_path, "b.fits", bad, ValueError)


def test_fits_negative_axis(tmp_path, fits_bytes):
    bad = _poke(fits_bytes, b"NAXIS1",
                b"NAXIS1  =                  -64")
    _reject(tmp_path, "n.fits", bad, ValueError)


def test_fits_absurd_axis_is_eof_not_memoryerror(tmp_path, fits_bytes):
    # claims a terabyte image; must fail on the (small) file running
    # out, never by trying to allocate the claimed size
    bad = _poke(fits_bytes, b"NAXIS1",
                b"NAXIS1  =        1099511627776")
    _reject(tmp_path, "h.fits", bad, EOFError)


def test_fits_naxis_count_without_cards(tmp_path, fits_bytes):
    bad = _poke(fits_bytes, b"NAXIS ",
                b"NAXIS   =                  500")
    _reject(tmp_path, "c.fits", bad, ValueError)
    bad = _poke(fits_bytes, b"NAXIS ",
                b"NAXIS   =                 1000")
    _reject(tmp_path, "c2.fits", bad, ValueError)


def test_fits_non_numeric_naxis(tmp_path, fits_bytes):
    bad = _poke(fits_bytes, b"NAXIS ",
                b"NAXIS   = 'banana'            ")
    _reject(tmp_path, "s.fits", bad, ValueError)


def test_fits_gzip_garbage_and_truncation(tmp_path, fits_bytes):
    _reject(tmp_path, "g.fits.gz", gzip.compress(os.urandom(1000)))
    _reject(tmp_path, "t.fits.gz", gzip.compress(fits_bytes)[:50],
            (EOFError, OSError))


def test_fits_write_is_atomic(tmp_path):
    """An interrupted write must never leave a partial file at the
    destination: the writer publishes via temp-file + rename."""
    target = tmp_path / "out.fits"
    write_image(str(target), np.zeros((8, 8), np.float32), Header())
    good = target.read_bytes()

    # serialization failures happen before the path is touched
    class Boom:
        pass

    with pytest.raises(Exception):
        write_image(str(target), np.zeros((2, 2), dtype=object), Header())
    assert target.read_bytes() == good
    # no temp litter left behind
    assert [p.name for p in tmp_path.iterdir()] == ["out.fits"]


# --------------------------------------------------------------------------
# lossless JPEG (native decoder)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def jpeg_payload():
    rng = np.random.default_rng(3)
    img = np.clip(rng.normal(900, 35, (128, 128)), 0, 65535) \
        .astype(np.uint16)
    return img, encode_lossless_jpeg(img)


def test_lljpeg_roundtrip_still_exact(jpeg_payload):
    img, payload = jpeg_payload
    assert np.array_equal(decode_lossless_jpeg(payload, 128, 128), img)


def test_lljpeg_garbage_and_empty(jpeg_payload):
    for data in (b"", b"\x00" * 100, os.urandom(2000)):
        with pytest.raises(ValueError):
            decode_lossless_jpeg(data, 128, 128)


def test_lljpeg_truncated_stream(jpeg_payload):
    _, payload = jpeg_payload
    for cut in (len(payload) // 2, len(payload) - 4):
        with pytest.raises(ValueError, match="truncated"):
            decode_lossless_jpeg(payload[:cut], 128, 128)


def test_lljpeg_bit_flips(jpeg_payload):
    """Random bit damage anywhere in the stream raises; it never
    crashes the process or silently returns wrong data as success."""
    _, payload = jpeg_payload
    for seed in range(8):
        rng = np.random.default_rng(seed)
        bad = bytearray(payload)
        for pos in rng.integers(4, len(payload) - 2, 8):
            bad[pos] ^= 0xFF
        with pytest.raises(ValueError):
            decode_lossless_jpeg(bytes(bad), 128, 128)


def test_lljpeg_huge_sof_dims_no_overflow(jpeg_payload):
    """Crafted 60000x60000 SOF dims used to overflow the int32
    capacity check and segfault; must now be a clean rejection."""
    _, payload = jpeg_payload
    i = payload.index(b"\xff\xc3")
    bad = bytearray(payload)
    bad[i + 5:i + 9] = (60000).to_bytes(2, "big") * 2
    with pytest.raises(ValueError):
        decode_lossless_jpeg(bytes(bad), 128, 128)


def test_lljpeg_implausible_expected_geometry(jpeg_payload):
    _, payload = jpeg_payload
    with pytest.raises(ValueError, match="implausible"):
        decode_lossless_jpeg(payload, 2 ** 20, 2 ** 20)


# --------------------------------------------------------------------------
# TIFF / DNG container
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dng_bytes(tmp_path_factory):
    rng = np.random.default_rng(3)
    img = np.clip(rng.normal(900, 35, (128, 128)), 0, 65535) \
        .astype(np.uint16)
    p = str(tmp_path_factory.mktemp("adv") / "x.dng")
    write_dng(p, img, black_levels=(128,) * 4, compression=7)
    with open(p, "rb") as fh:
        return fh.read()


def _reject_dng(tmp_path, name, data):
    p = str(tmp_path / name)
    with open(p, "wb") as fh:
        fh.write(data)
    with pytest.raises(ValueError):
        load_raw(p)


def test_dng_truncations(tmp_path, dng_bytes):
    for n, cut in (("a", 4), ("b", 30), ("c", len(dng_bytes) // 2)):
        _reject_dng(tmp_path, f"{n}.dng", dng_bytes[:cut])


def test_dng_garbage(tmp_path):
    _reject_dng(tmp_path, "g.dng", os.urandom(4000))


def test_dng_bad_ifd_offset(tmp_path, dng_bytes):
    bad = bytearray(dng_bytes)
    bad[4:8] = b"\xff\xff\xff\xff"
    _reject_dng(tmp_path, "i.dng", bytes(bad))


def test_dng_bit_flips(tmp_path, dng_bytes):
    for seed in (9, 10, 11, 12):
        rng = np.random.default_rng(seed)
        bad = bytearray(dng_bytes)
        for pos in rng.integers(100, len(dng_bytes) - 2, 12):
            bad[pos] ^= 0xFF
        _reject_dng(tmp_path, f"f{seed}.dng", bytes(bad))


def test_read_image_still_works_after_guards(tmp_path):
    """The hardened reader still accepts every file the writer
    produces (guards must never reject valid output)."""
    for dtype in (np.uint8, np.int16, np.uint16, np.int32, np.float32,
                  np.float64):
        p = str(tmp_path / f"ok_{np.dtype(dtype).name}.fits")
        data = np.arange(48, dtype=dtype).reshape(6, 8)
        write_image(p, data, Header())
        back, _ = read_image(p, as_float32=False)
        np.testing.assert_array_equal(back, data)
