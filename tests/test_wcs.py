"""Tests for the TAN/SIP WCS, astrometry client (mock transport), and
local registration-based solving."""

import numpy as np
import pytest

from astrophotography_tpu.io.fits import Header
from astrophotography_tpu.wcs import TanWCS
from astrophotography_tpu.wcs.astrometry import (Astrometry, generate_hints,
                                                 solve_from_reference)


def _example_wcs(with_sip=False):
    cd = np.array([[-1.5e-4, 1.0e-6], [1.1e-6, 1.5e-4]])
    sip_a = {(2, 0): 1e-7, (0, 2): -5e-8, (1, 1): 2e-8} if with_sip else None
    sip_b = {(2, 0): -8e-8, (0, 2): 4e-8} if with_sip else None
    return TanWCS((123.456, -45.678), (1024.0, 768.0), cd, sip_a, sip_b)


@pytest.mark.parametrize("with_sip", [False, True])
def test_wcs_roundtrip_world_pix(with_sip):
    wcs = _example_wcs(with_sip)
    rng = np.random.default_rng(0)
    x = rng.uniform(1, 2048, 50)
    y = rng.uniform(1, 1536, 50)
    ra, dec = wcs.pix2world(x, y)
    x2, y2 = wcs.world2pix(ra, dec)
    np.testing.assert_allclose(x2, x, atol=1e-6)
    np.testing.assert_allclose(y2, y, atol=1e-6)


def test_wcs_reference_point():
    wcs = _example_wcs()
    ra, dec = wcs.pix2world(1024.0, 768.0)
    assert float(ra) == pytest.approx(123.456, abs=1e-9)
    assert float(dec) == pytest.approx(-45.678, abs=1e-9)


@pytest.mark.parametrize("with_sip", [False, True])
def test_wcs_header_roundtrip(with_sip):
    wcs = _example_wcs(with_sip)
    hdr = wcs.to_header()
    back = TanWCS.from_header(hdr)
    rng = np.random.default_rng(1)
    x = rng.uniform(1, 2048, 20)
    y = rng.uniform(1, 1536, 20)
    ra1, dec1 = wcs.pix2world(x, y)
    ra2, dec2 = back.pix2world(x, y)
    np.testing.assert_allclose(ra2, ra1, atol=1e-10)
    np.testing.assert_allclose(dec2, dec1, atol=1e-10)


def test_wcs_pixel_scale():
    wcs = _example_wcs()
    assert wcs.pixel_scale_arcsec == pytest.approx(1.5e-4 * 3600, rel=1e-3)


def test_wcs_fit_recovers_solution():
    truth = _example_wcs()
    rng = np.random.default_rng(2)
    x = rng.uniform(1, 2048, 40)
    y = rng.uniform(1, 1536, 40)
    ra, dec = truth.pix2world(x, y)
    fit = TanWCS.fit(x, y, ra, dec)
    ra2, dec2 = fit.pix2world(x, y)
    # sub-milliarcsecond agreement
    np.testing.assert_allclose(ra2, ra, atol=1e-7)
    np.testing.assert_allclose(dec2, dec, atol=1e-7)


def test_generate_hints_from_srclist_header():
    hdr = Header()
    hdr["APRX_RA"] = 187.5
    hdr["APRX_DEC"] = 12.34
    hdr["APRX_FOV"] = 1.0
    hdr["APRX_XPS"] = 1.4
    hdr["APRX_YPS"] = 1.4
    hints = generate_hints(hdr)
    assert hints["center_ra"] == 187.5
    assert hints["center_dec"] == 12.34
    assert hints["radius"] == 2  # ceil(1.0 * 1.5 * 1.3)
    assert hints["scale_type"] == "ul"
    assert hints["scale_lower"] == pytest.approx(1.4 / 1.3)
    assert hints["scale_upper"] == pytest.approx(1.4 * 1.3)
    # user_scale path
    hdr2 = Header()
    hdr2["APRX_RA"] = 10.0
    hdr2["APRX_DEC"] = 20.0
    hdr2["IMG_COLS"] = 1000
    hdr2["IMG_ROWS"] = 1000
    hints2 = generate_hints(hdr2, user_scale=2.0)
    assert hints2["scale_lower"] == pytest.approx(2.0 / 1.3)
    assert hints2["radius"] >= 1


def test_astrometry_solve_with_mock_transport(tmp_path):
    from astrophotography_tpu.io.fits import (BinTableHDU, HDUList, ImageHDU,
                                              open_fits, write_image)

    truth = _example_wcs()
    rng = np.random.default_rng(3)
    x = rng.uniform(50, 1998, 25)
    y = rng.uniform(50, 1486, 25)
    img_path = str(tmp_path / "img.fits")
    write_image(img_path, np.zeros((1536, 2048), np.float32))

    src_hdr = Header()
    src_hdr["IMG_FILE"] = "img.fits"
    src_hdr["APRX_RA"] = 123.4
    src_hdr["APRX_DEC"] = -45.7
    src_hdr["APRX_XPS"] = 0.54
    src_hdr["APRX_YPS"] = 0.54
    src_path = str(tmp_path / "src.fits")
    HDUList([ImageHDU(None, src_hdr),
             BinTableHDU({"X": x, "Y": y}, name="AP_XYPOS")]).writeto(src_path)

    calls = {}

    def mock_transport(xs, ys, w, h, hints, timeout=None):
        calls["hints"] = hints
        calls["n"] = len(xs)
        return {k: v for k, v in truth.to_header().items()}

    ast = Astrometry(transport=mock_transport)
    out_path = str(tmp_path / "wcs.fits")
    wcs = ast.solve(img_path, src_path, out_path)
    assert wcs is not None
    assert calls["n"] == 25
    assert calls["hints"]["center_ra"] == 123.4
    # output image has WCS keys
    out = open_fits(out_path)[0]
    assert out.header["CRVAL1"] == pytest.approx(123.456)
    assert out.header["ASTRSOLV"] is True
    # source list updated with ra/dec columns
    src = open_fits(src_path)
    xy = src["AP_XYPOS"]
    ra_want, dec_want = truth.pix2world(x, y)
    np.testing.assert_allclose(xy["ra"], ra_want, atol=1e-6)
    np.testing.assert_allclose(xy["dec"], dec_want, atol=1e-6)


def test_astrometry_solve_failure_returns_none(tmp_path):
    from astrophotography_tpu.io.fits import (BinTableHDU, HDUList, ImageHDU,
                                              write_image)

    img_path = str(tmp_path / "img.fits")
    write_image(img_path, np.zeros((64, 64), np.float32))
    src_path = str(tmp_path / "src.fits")
    hdr = Header()
    hdr["APRX_RA"] = 10.0
    hdr["APRX_DEC"] = 20.0
    HDUList([ImageHDU(None, hdr),
             BinTableHDU({"X": np.array([1.0]), "Y": np.array([2.0])},
                         name="AP_XYPOS")]).writeto(src_path)
    ast = Astrometry(transport=lambda *a, **k: None)
    out = str(tmp_path / "o.fits")
    assert ast.solve(img_path, src_path, out) is None
    import os
    assert not os.path.exists(out)
    # no transport configured -> clear error
    with pytest.raises(RuntimeError):
        Astrometry(transport=None).solve(img_path, src_path, out)


def test_solve_from_reference_registration():
    from astrophotography_tpu.ops.register import Similarity
    import jax.numpy as jnp

    ref = _example_wcs()
    sim = Similarity(scale=jnp.float32(1.0), theta=jnp.float32(0.01),
                     tx=jnp.float32(12.0), ty=jnp.float32(-8.0),
                     n_inliers=jnp.int32(20), rms=jnp.float32(0.05))
    tgt_wcs = solve_from_reference(ref, sim)
    # a reference pixel and its mapped target pixel must agree on sky
    for px, py in [(300.0, 200.0), (1500.0, 1200.0), (1024.0, 768.0)]:
        ra_ref, dec_ref = ref.pix2world(px, py)
        mx, my = sim.apply(px - 1.0, py - 1.0)
        ra_tgt, dec_tgt = tgt_wcs.pix2world(float(mx) + 1.0, float(my) + 1.0)
        assert float(ra_tgt) == pytest.approx(float(ra_ref), abs=3e-5)
        assert float(dec_tgt) == pytest.approx(float(dec_ref), abs=3e-5)


def test_xylist_fits_bytes_roundtrip(tmp_path):
    """The nova upload payload is a valid FITS xylist binary table."""
    from astrophotography_tpu.io.fits import open_fits
    from astrophotography_tpu.wcs.astrometry import xylist_fits_bytes

    x = np.array([10.5, 200.0, 3000.25])
    y = np.array([20.0, 150.5, 900.75])
    raw = xylist_fits_bytes(x, y)
    path = tmp_path / "sources.xyls"
    path.write_bytes(raw)
    hdus = open_fits(str(path))
    tbl = hdus["XYLIST"]
    np.testing.assert_allclose(np.asarray(tbl["X"]), x)
    np.testing.assert_allclose(np.asarray(tbl["Y"]), y)
    assert np.asarray(tbl["X"]).dtype == np.float64


def test_multipart_body_format():
    from astrophotography_tpu.wcs.astrometry import _multipart_body

    body, ctype = _multipart_body({"request-json": '{"a": 1}'},
                                  "file", "sources.xyls", b"\x00\x01FITS")
    assert ctype.startswith("multipart/form-data; boundary=")
    boundary = ctype.split("boundary=")[1]
    assert body.startswith(f"--{boundary}\r\n".encode())
    assert body.endswith(f"\r\n--{boundary}--\r\n".encode())
    assert b'name="request-json"' in body
    assert b'filename="sources.xyls"' in body
    assert b"\x00\x01FITS" in body


def test_wcs_fit_recovers_sip_distortion():
    """TanWCS.fit(sip_order=2) recovers a distorted solution to
    sub-milli-pixel sky accuracy where the pure TAN fit cannot."""
    truth = _example_wcs(with_sip=True)
    rng = np.random.default_rng(11)
    x = rng.uniform(1, 2048, 120)
    y = rng.uniform(1, 1536, 120)
    ra, dec = truth.pix2world(x, y)

    tan = TanWCS.fit(x, y, ra, dec, crpix=truth.crpix, sip_order=0)
    sip = TanWCS.fit(x, y, ra, dec, crpix=truth.crpix, sip_order=2)

    gx, gy = np.meshgrid(np.linspace(10, 2040, 9), np.linspace(10, 1530, 9))
    ra_t, dec_t = truth.pix2world(gx.ravel(), gy.ravel())
    scale = abs(truth.cd[0, 0])  # deg/pix

    def max_err(w):
        ra_f, dec_f = w.pix2world(gx.ravel(), gy.ravel())
        dra = (np.asarray(ra_f) - np.asarray(ra_t)) * np.cos(
            np.radians(np.asarray(dec_t)))
        ddec = np.asarray(dec_f) - np.asarray(dec_t)
        return np.max(np.hypot(dra, ddec)) / scale  # in pixels

    assert max_err(sip) < 0.01          # SIP fit: < 0.01 px
    assert max_err(sip) < 0.05 * max_err(tan)  # and >> better than TAN
    assert sip.sip_a and sip.sip_b


def test_solve_from_reference_carries_sip():
    """Local solves against a SIP reference keep the distortion terms
    (the network solve requests SIP order 2; reference
    core/ApAstrometry.py:382-409)."""
    from astrophotography_tpu.ops.register import Similarity
    import jax.numpy as jnp

    ref = _example_wcs(with_sip=True)
    sim = Similarity(scale=jnp.float32(1.0), theta=jnp.float32(0.004),
                     tx=jnp.float32(20.0), ty=jnp.float32(-15.0),
                     n_inliers=jnp.int32(30), rms=jnp.float32(0.03))
    tgt = solve_from_reference(ref, sim)
    assert tgt.sip_a  # distortion carried through
    scale = abs(ref.cd[0, 0])
    for px, py in [(200.0, 150.0), (1800.0, 1400.0), (1024.0, 768.0)]:
        ra_r, dec_r = ref.pix2world(px, py)
        mx, my = sim.apply(px - 1.0, py - 1.0)
        ra_t, dec_t = tgt.pix2world(float(mx) + 1.0, float(my) + 1.0)
        err_px = np.hypot((float(ra_t) - float(ra_r))
                          * np.cos(np.radians(float(dec_r))),
                          float(dec_t) - float(dec_r)) / scale
        assert err_px < 0.05, (px, py, err_px)
    # TAN-only reference stays TAN (no spurious SIP terms)
    plain = solve_from_reference(_example_wcs(False), sim)
    assert not plain.sip_a and not plain.sip_b


def _src_and_img(tmp_path, shape=(1536, 2048), n=25, seed=3):
    from astrophotography_tpu.io.fits import (BinTableHDU, HDUList,
                                              ImageHDU, write_image)

    rng = np.random.default_rng(seed)
    x = rng.uniform(50, shape[1] - 50, n)
    y = rng.uniform(50, shape[0] - 50, n)
    img_path = str(tmp_path / "img.fits")
    write_image(img_path, np.zeros(shape, np.float32))
    src_hdr = Header()
    src_hdr["IMG_FILE"] = "img.fits"
    src_hdr["APRX_RA"] = 123.4
    src_hdr["APRX_DEC"] = -45.7
    src_hdr["APRX_XPS"] = 0.54
    src_hdr["APRX_YPS"] = 0.54
    src_path = str(tmp_path / "src.fits")
    HDUList([ImageHDU(None, src_hdr),
             BinTableHDU({"X": x, "Y": y}, name="AP_XYPOS")]).writeto(src_path)
    return img_path, src_path, x, y


def test_wcs_file_keys_extraction():
    """wcs_keys_from_wcs_file lifts the full TAN+SIP solution from a
    solver wcs_file and drops structural/irrelevant keys (the
    reference receives the same header via astroquery,
    core/ApAstrometry.py:398-409)."""
    from astrophotography_tpu.io.fits import HDUList, ImageHDU
    from astrophotography_tpu.wcs.astrometry import wcs_keys_from_wcs_file

    truth = _example_wcs(with_sip=True)
    hdr = truth.to_header()
    hdr["DATE"] = "2026-01-01"          # structural noise the solver adds
    hdr["AN_JOBID"] = 12345
    blob = HDUList([ImageHDU(None, hdr)]).tobytes()
    keys = wcs_keys_from_wcs_file(blob)
    assert keys["CTYPE1"].startswith("RA---TAN")
    assert keys["A_ORDER"] == 2 and keys["B_ORDER"] == 2
    assert "A_2_0" in keys and "B_0_2" in keys
    assert "DATE" not in keys and "AN_JOBID" not in keys and \
        "NAXIS" not in keys


def test_astrometry_solve_propagates_sip(tmp_path):
    """A SIP solution from the (mock) wcs_file download survives into
    the stamped image: A_ORDER/B_ORDER + coefficients present, and
    pix2world through the stamped header matches the solver's solution
    including distortion (VERDICT item: full WCS from nova solves)."""
    from astrophotography_tpu.io.fits import HDUList, ImageHDU, open_fits
    from astrophotography_tpu.wcs.astrometry import wcs_keys_from_wcs_file

    truth = _example_wcs(with_sip=True)
    img_path, src_path, x, y = _src_and_img(tmp_path)
    blob = HDUList([ImageHDU(None, truth.to_header())]).tobytes()

    def mock_transport(xs, ys, w, h, hints, timeout=None):
        return wcs_keys_from_wcs_file(blob)

    ast = Astrometry(transport=mock_transport)
    out_path = str(tmp_path / "wcs.fits")
    wcs = ast.solve(img_path, src_path, out_path)
    assert wcs is not None
    hdr = open_fits(out_path)[0].header
    assert hdr["A_ORDER"] == 2 and hdr["B_ORDER"] == 2
    assert hdr["A_2_0"] == pytest.approx(1e-7)
    assert hdr["CTYPE1"] == "RA---TAN-SIP"
    stamped = TanWCS.from_header(hdr)
    gx, gy = np.meshgrid(np.linspace(1, 2048, 7), np.linspace(1, 1536, 7))
    ra_t, dec_t = truth.pix2world(gx.ravel(), gy.ravel())
    ra_s, dec_s = stamped.pix2world(gx.ravel(), gy.ravel())
    np.testing.assert_allclose(ra_s, ra_t, atol=1e-9)
    np.testing.assert_allclose(dec_s, dec_t, atol=1e-9)
    # distortion actually matters at this level: a pure-TAN header from
    # the same CD would disagree by the SIP terms
    pure = TanWCS(truth.crval, truth.crpix, truth.cd)
    ra_p, _ = pure.pix2world(gx.ravel(), gy.ravel())
    assert np.abs(ra_p - ra_t).max() > 1e-6


def test_astrometry_timeout_monitors_same_submission(tmp_path):
    """First timeout -> the solve monitors the SAME submission id once
    more (reference core/ApAstrometry.py:411-425); a second timeout
    gives up with None."""
    from astrophotography_tpu.wcs.astrometry import SolveTimeout

    truth = _example_wcs()
    img_path, src_path, _x, _y = _src_and_img(tmp_path)
    calls = []

    def timeout_once(xs, ys, w, h, hints, timeout=None, submission_id=None):
        calls.append(submission_id)
        if submission_id is None:
            raise SolveTimeout(4242)
        assert submission_id == 4242
        return {k: v for k, v in truth.to_header().items()}

    ast = Astrometry(transport=timeout_once)
    out_path = str(tmp_path / "wcs.fits")
    wcs = ast.solve(img_path, src_path, out_path)
    assert wcs is not None
    assert calls == [None, 4242]

    def timeout_always(xs, ys, w, h, hints, timeout=None,
                       submission_id=None):
        raise SolveTimeout(777)

    ast2 = Astrometry(transport=timeout_always)
    assert ast2.solve(img_path, src_path,
                      str(tmp_path / "wcs2.fits")) is None


def test_ap_astrometry_ref_local_solve(tmp_path):
    """`ap_astrometry --ref` performs the network-free registration
    solve: the target output carries a WCS consistent with the anchor's
    (same star, same sky position), with ra/dec columns added to the
    target source list — no API key involved."""
    import glob
    import os
    import tempfile

    from astrophotography_tpu import synth
    from astrophotography_tpu.cli.ap_astrometry import main as ap_astrometry
    from astrophotography_tpu.cli.ap_find_stars import main as ap_find_stars
    from astrophotography_tpu.io.fits import open_fits, write_image

    truth = _example_wcs()
    h, w = 192, 256
    anchor_img, stars = synth.make_starfield(
        (h, w), n_stars=12, fwhm=3.0, background=120.0, seed=5,
        min_sep=26.0)
    dx, dy = 3, -2  # integer dither: the target is a rolled copy
    target_img = np.roll(np.roll(np.asarray(anchor_img), dy, axis=0),
                         dx, axis=1)

    anchor_hdr = Header([("EXPTIME", 30.0)])
    truth.to_header(anchor_hdr)
    anchor = str(tmp_path / "anchor.fits")
    write_image(anchor, np.asarray(anchor_img, np.float32), anchor_hdr)
    target = str(tmp_path / "target.fits")
    write_image(target, np.asarray(target_img, np.float32),
                Header([("EXPTIME", 30.0)]))

    a_src = str(tmp_path / "a_src.fits")
    t_src = str(tmp_path / "t_src.fits")
    assert ap_find_stars([anchor, a_src, "-l", "ERROR"]) == 0
    assert ap_find_stars([target, t_src, "-l", "ERROR"]) == 0

    out = str(tmp_path / "nav.fits")
    assert ap_astrometry([target, t_src, out, "--ref", anchor,
                          "--ref_srclist", a_src, "-l", "ERROR"]) == 0
    assert os.path.exists(out)
    got = open_fits(out)[0].header
    assert got["ASTRSOLV"] is True

    from astrophotography_tpu.wcs.wcs import TanWCS

    tgt_wcs = TanWCS.from_header(got)
    # a star at (x, y) in the anchor appears at (x+dx, y+dy) in the
    # target; both WCS must map the SAME physical star to the same sky
    ax, ay = stars["x"][:6] + 1.0, stars["y"][:6] + 1.0  # FITS 1-based
    ra_a, dec_a = truth.pix2world(ax, ay)
    ra_t, dec_t = tgt_wcs.pix2world(ax + dx, ay + dy)
    np.testing.assert_allclose(ra_t, ra_a, atol=2e-5)    # < 0.1 arcsec
    np.testing.assert_allclose(dec_t, dec_a, atol=2e-5)
    # ra/dec columns landed in the target source list
    xy = open_fits(t_src)["AP_XYPOS"]
    assert "ra" in xy.columns and "dec" in xy.columns

    # without --ref_srclist the anchor's sources are detected on the
    # fly (temporary source list, cleaned up afterwards)
    out2 = str(tmp_path / "nav2.fits")
    assert ap_astrometry([target, t_src, out2, "--ref", anchor,
                          "-l", "ERROR"]) == 0
    got2 = TanWCS.from_header(open_fits(out2)[0].header)
    ra_t2, dec_t2 = got2.pix2world(ax + dx, ay + dy)
    np.testing.assert_allclose(ra_t2, ra_a, atol=2e-5)
    np.testing.assert_allclose(dec_t2, dec_a, atol=2e-5)
    assert not glob.glob(os.path.join(tempfile.gettempdir(),
                                      "refsrc_*.fits"))
