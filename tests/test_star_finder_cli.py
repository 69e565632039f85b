"""End-to-end tests for ap_find_stars, ap_measure_background,
ap_quality_summary."""

import os

import numpy as np
import pytest
import yaml

from astrophotography_tpu import synth
from astrophotography_tpu.io.fits import Header, open_fits, read_image, write_image
from astrophotography_tpu.cli.ap_find_stars import main as ap_find_stars
from astrophotography_tpu.cli.ap_measure_background import main as ap_measure_background
from astrophotography_tpu.cli.ap_quality_summary import main as ap_quality_summary


@pytest.fixture(scope="module")
def starfield_fits(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sf")
    img, truth = synth.make_starfield(
        (256, 256), n_stars=18, fwhm=3.4, background=250.0,
        read_noise=6.0, flux_range=(20000.0, 90000.0), seed=31, min_sep=22.0)
    hdr = Header()
    hdr["EXPTIME"] = 60.0
    hdr["OBJECT"] = "SynthField"
    hdr["TELESCOP"] = "T05"
    hdr["FILTER"] = "V"
    hdr["DATE-OBS"] = "2026-08-16T01:00:00"
    hdr["FOCALLEN"] = 450.0
    hdr["XPIXSZ"] = 5.4
    hdr["YPIXSZ"] = 5.4
    hdr["RA"] = "12:30:45"
    hdr["DEC"] = "-10:15:30"
    path = str(tmp / "field.fits")
    write_image(path, img, hdr)
    return path, truth, tmp


@pytest.mark.slow
def test_ap_find_stars_end_to_end(starfield_fits):
    path, truth, tmp = starfield_fits
    srclist = str(tmp / "srclist.fits")
    qual = str(tmp / "qual_field.yml")
    ds9 = str(tmp / "field.reg")
    rc = ap_find_stars([path, srclist, "--quality_report", qual,
                        "--ds9", ds9, "-l", "ERROR"])
    assert rc == 0
    hdus = open_fits(srclist)
    names = [h.name for h in hdus]
    assert "AP_XYPOS" in names and "AP_L1MAG" in names and "AP_L1PSF" in names
    xy = hdus["AP_XYPOS"]
    # 1-based coordinates for astrometry.net
    mag = hdus["AP_L1MAG"]
    np.testing.assert_allclose(xy["X"], mag["xcenter"] + 1.0, atol=1e-4)
    assert len(xy["X"]) == len(truth["x"])
    # all truth stars present (1-based)
    for tx, ty in zip(truth["x"], truth["y"]):
        d = np.hypot(xy["X"] - 1 - tx, xy["Y"] - 1 - ty).min()
        assert d < 1.0
    # sorted brightest first
    adu = mag["adu_per_sec"]
    assert (np.diff(adu) <= 1e-3).all()
    # primary header keywords
    pri = hdus[0].header
    assert pri["AP_NDET"] == len(truth["x"])
    assert pri["APRX_RA"] == pytest.approx(12.5125 * 15, abs=0.01)
    assert pri["APRX_DEC"] == pytest.approx(-10.2583, abs=0.01)
    assert pri["AP_FWHM"] == pytest.approx(3.4, abs=0.3)
    assert "APRX_XPS" in pri and "AP_BGMED" in pri

    # quality report schema
    with open(qual) as fh:
        q = yaml.safe_load(fh)
    assert set(q) == {"image_info", "background_info", "source_info",
                      "saturation_info", "psf_info"}
    assert q["image_info"]["object"] == "SynthField"
    assert q["background_info"]["median"] == pytest.approx(250.0, abs=10)
    assert q["source_info"]["num_detected"] == len(truth["x"])
    assert q["psf_info"]["fwhm_xandy"]["fwhm_val_pix"] == pytest.approx(
        3.4, abs=0.3)
    assert q["psf_info"]["circular_psf"] is True
    assert q["psf_info"]["fwhm_x"]["fwhm_val_arcs"] > 0

    # ds9 region file
    content = open(ds9).read()
    assert content.count("circle(") == len(truth["x"])


def test_ap_measure_background_cli(tmp_path):
    rng = np.random.default_rng(40)
    h, w = 200, 150  # deliberately not divisible by 16
    yy, xx = np.mgrid[0:h, 0:w]
    sky = 120.0 + 0.2 * xx + 0.15 * yy
    img = sky + rng.normal(0, 4.0, (h, w))
    img += synth.gaussian_star((h, w), 70.0, 90.0, 60000.0, 3.0)
    p = str(tmp_path / "in.fits")
    write_image(p, img.astype(np.float32), Header())
    out = str(tmp_path / "bg.fits")
    sub = str(tmp_path / "sub.fits")
    rc = ap_measure_background([p, out, "--subtract", sub, "-l", "ERROR"])
    assert rc == 0
    bg, bhdr = read_image(out)
    assert bg.shape == (h, w)
    assert bhdr["IMAGETYP"] == "Background Sky"
    # a coarse box grid (48-px minimum boxes on a 200x150 frame) has an
    # inherent corner bias from the 3x3 grid median filter plus the
    # half-box constant extrapolation — the reference's photutils
    # Background2D shares both; bound the model accordingly
    err = np.abs(bg - sky)
    assert np.median(err) < 3.0
    assert err.max() < 20.0
    subbed, _ = read_image(sub)
    assert abs(np.median(subbed)) < 2.0


@pytest.mark.slow
def test_ap_measure_background_srclist(tmp_path):
    """--srclist builds the exclusion mask from an ap_find_stars source
    list instead of re-detecting (reference flag,
    scripts/ap_measure_background.py:67-74): the supplied list drives
    the mask, and on the same stars the model matches the auto-detect
    path."""
    from astrophotography_tpu.cli.ap_measure_background import srclist_mask

    rng = np.random.default_rng(41)
    h, w = 256, 256
    yy, xx = np.mgrid[0:h, 0:w]
    sky = 150.0 + 0.1 * xx + 0.05 * yy
    img, truth = synth.make_starfield(
        (h, w), n_stars=12, fwhm=3.0, background=0.0, read_noise=0.0,
        flux_range=(30000.0, 80000.0), seed=7, min_sep=30.0)
    img = img + sky + rng.normal(0, 4.0, (h, w))
    p = str(tmp_path / "in.fits")
    write_image(p, img.astype(np.float32), Header([("EXPTIME", 30.0)]))

    srclist = str(tmp_path / "src.fits")
    assert ap_find_stars([p, srclist, "-l", "ERROR"]) == 0

    out_auto = str(tmp_path / "bg_auto.fits")
    out_src = str(tmp_path / "bg_src.fits")
    assert ap_measure_background([p, out_auto, "-l", "ERROR"]) == 0
    assert ap_measure_background([p, out_src, "--srclist", srclist,
                                  "-l", "ERROR"]) == 0
    bg_auto, _ = read_image(out_auto)
    bg_src, _ = read_image(out_src)
    # both model the true sky; srclist path matches the auto path
    assert np.median(np.abs(bg_src - sky)) < 3.0
    np.testing.assert_allclose(bg_src, bg_auto, atol=3.0)

    # the supplied list is what drives the mask: every detected star is
    # excluded, and a different srclist yields a different mask
    m_full = srclist_mask((h, w), truth["x"], truth["y"], 6.0)
    for tx, ty in zip(truth["x"], truth["y"]):
        assert m_full[int(round(ty)), int(round(tx))]
    m_one = srclist_mask((h, w), truth["x"][:1], truth["y"][:1], 6.0)
    assert m_one.sum() < m_full.sum()

    # srclist whose AP_FWHM is blank/undefined (zero stars fit writes a
    # blank card — FITS headers cannot encode the NaN median) falls
    # back to the 6 px default radius instead of crashing
    from astrophotography_tpu.io.fits import open_fits

    hdus = open_fits(srclist)
    hdus[0].header["AP_FWHM"] = None
    nan_src = str(tmp_path / "src_nan.fits")
    hdus.writeto(nan_src)
    out_nan = str(tmp_path / "bg_nan.fits")
    assert ap_measure_background([p, out_nan, "--srclist", nan_src,
                                  "-l", "ERROR"]) == 0
    bg_nan, _ = read_image(out_nan)
    assert np.median(np.abs(bg_nan - sky)) < 3.0


def test_ap_find_stars_zero_detections(tmp_path):
    """A starless image must produce an empty source list (blank
    AP_FWHM card — FITS cannot encode the NaN median) and a quality
    report, not crash on zero-size reductions; --srclist consumes the
    empty list with the 6 px fallback radius."""
    rng = np.random.default_rng(3)
    img = (100.0 + rng.normal(0, 3.0, (128, 128))).astype(np.float32)
    p = str(tmp_path / "blank.fits")
    write_image(p, img, Header([("EXPTIME", 10.0)]))
    src = str(tmp_path / "src.fits")
    qual = str(tmp_path / "qual.yml")
    assert ap_find_stars([p, src, "--quality_report", qual,
                          "-l", "ERROR"]) == 0
    hdus = open_fits(src)
    assert hdus[0].header.get("AP_FWHM") is None
    assert len(hdus["AP_XYPOS"]["X"]) == 0
    out = str(tmp_path / "bg.fits")
    assert ap_measure_background([p, out, "--srclist", src,
                                  "-l", "ERROR"]) == 0
    bg, _ = read_image(out)
    assert abs(np.median(bg) - 100.0) < 1.0


def test_ap_quality_summary_cli(tmp_path):
    reports = [
        {"image_info": {"object": "M42", "telescope": "T05", "filter": "V",
                        "date-obs": "2026-01-01T00:00:00"},
         "background_info": {"median": 100.0, "stddev": 5.0},
         "source_info": {"num_detected": 10},
         "saturation_info": {"num_saturated_in_image": 1},
         "psf_info": {"num_fit": 8,
                      "fwhm_xandy": {"fwhm_val_pix": 3.2,
                                     "fwhm_err_pix": 0.1}}},
        {"image_info": {"object": "M42", "telescope": "T05", "filter": "R",
                        "date-obs": "2026-01-01T01:00:00"},
         "background_info": {"median": 110.0, "stddev": 6.0},
         "source_info": {"num_detected": 12},
         "saturation_info": {"num_saturated_in_image": 0},
         "psf_info": {"num_fit": 9,
                      "fwhm_xandy": {"fwhm_val_pix": 3.5,
                                     "fwhm_err_pix": 0.2}}},
    ]
    for i, rep in enumerate(reports):
        with open(tmp_path / f"qual_img{i}.yml", "w") as fh:
            yaml.safe_dump(rep, fh)
    out = str(tmp_path / "summary.csv")
    rc = ap_quality_summary([str(tmp_path), out, "-l", "ERROR"])
    assert rc == 0
    import csv
    with open(out) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2
    assert {r["group"] for r in rows} == {"M42:T05:V", "M42:T05:R"}
    v_row = next(r for r in rows if r["filter"] == "V")
    assert float(v_row["fwhm_xandy_fwhm_val_pix"]) == 3.2
    assert v_row["quality_file"] == "qual_img0.yml"
    # empty directory -> error exit
    empty = tmp_path / "empty"
    empty.mkdir()
    assert ap_quality_summary([str(empty), out, "-l", "CRITICAL"]) == 1
