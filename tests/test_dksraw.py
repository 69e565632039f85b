"""End-to-end tests for RawConv and the dksraw CLI."""

import os

import numpy as np
import pytest

from astrophotography_tpu import synth
from astrophotography_tpu.core import RawConv
from astrophotography_tpu.io import open_fits
from astrophotography_tpu.io.raw import write_dng
from astrophotography_tpu.cli.dksraw import main as dksraw_main


@pytest.fixture()
def dng_file(tmp_path):
    # grey scene (equal RGB) so 'auto' whitebalance recovers the sensor gains
    scene = synth.make_rgb_scene((32, 48), seed=7, peak=20000)
    scene = np.repeat(scene[..., :1], 3, axis=-1)
    blacks = (512, 512, 512, 512)
    wb = (2.0, 1.0, 1.4, 1.0)
    mosaic = synth.mosaic_from_rgb(scene, black_levels=blacks, wb_gains=wb)
    path = str(tmp_path / "scene.dng")
    write_dng(path, mosaic, black_levels=blacks, white_level=65535,
              camera_wb=wb, exif={"Model": "SynthCam", "ExposureTime": 0.01,
                                  "ISOSpeedRatings": 400})
    return path, scene, wb


def test_rawconv_whitebalance_methods(dng_file):
    path, scene, wb = dng_file
    conv = RawConv(path)
    np.testing.assert_allclose(conv.get_whitebalance("camera"), wb, rtol=1e-5)
    np.testing.assert_allclose(conv.get_whitebalance("daylight"), wb, rtol=1e-5)
    # auto: scene is grey-balanced after wb gains, so recovered multipliers
    # should roughly equal the sensor gains
    auto = conv.get_whitebalance("auto")
    np.testing.assert_allclose(auto, wb, rtol=0.1)
    region = conv.get_whitebalance("region[4,27,4,43]")
    np.testing.assert_allclose(region, wb, rtol=0.15)
    user = conv.get_whitebalance("user[2.0,1.0,1.5,1.0]")
    np.testing.assert_allclose(user, [2.0, 1.0, 1.5, 1.0])
    with pytest.raises(RuntimeError):
        conv.get_whitebalance("bogus")


def test_rawconv_grey_and_rgb(dng_file):
    path, scene, wb = dng_file
    conv = RawConv(path)
    rgb, exif = conv.rgb(wb_method="camera")
    assert rgb.dtype == np.uint16 and rgb.shape == (32, 48, 3)
    grey, _ = conv.grey(wb_method="camera")
    assert grey.dtype == np.uint16 and grey.shape == (32, 48)
    # linear grey == CCIR601 of rgb (within rounding)
    luma = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    np.testing.assert_allclose(grey[2:-2, 2:-2], luma[2:-2, 2:-2], atol=2.0)
    direct, _ = conv.grey(luminance_method="direct", wb_method="camera")
    assert direct.shape == (32, 48)
    with pytest.raises(RuntimeError):
        conv.grey(luminance_method="bogus")
    # fetch=False leaves the identical uint16 image on device (the
    # pipelined-writer path: the worker thread pulls it down)
    dev, _ = conv.grey(wb_method="camera", fetch=False)
    assert not isinstance(dev, np.ndarray)
    np.testing.assert_array_equal(np.asarray(dev), grey)
    # print_stats forces the host path and must agree too
    stats, _ = conv.grey(wb_method="camera", print_stats=True)
    np.testing.assert_array_equal(stats, grey)


def test_rawconv_split_matches_mosaic(dng_file):
    path, scene, wb = dng_file
    conv = RawConv(path)
    r, g1, b, g2, exif = conv.split(subtract_black=False)
    from astrophotography_tpu.io.raw import load_raw
    raw = load_raw(path)
    for img, color in ((r, 0), (g1, 1), (b, 2), (g2, 3)):
        sites = raw.color_map == color
        np.testing.assert_array_equal(img[sites], raw.mosaic[sites])
        assert (img[~sites] == 0).all()


def test_dksraw_cli_grey_fits(dng_file, tmp_path):
    path, _, _ = dng_file
    out = str(tmp_path / "out.fits")
    rc = dksraw_main(["grey", path, "-o", out, "-w", "camera", "-l", "ERROR"])
    assert rc == 0
    hdus = open_fits(out)
    assert hdus[0].data.shape == (32, 48)
    assert hdus[0].data.dtype == np.uint16
    # EXIF propagated to header
    assert hdus[0].header["INSTRUME"] == "SynthCam"
    assert hdus[0].header["EXPTIME"] == pytest.approx(0.01)
    assert hdus[0].header["ISONUM"] == 400


def test_dksraw_cli_rgb_fits_three_hdus(dng_file, tmp_path):
    path, _, _ = dng_file
    out = str(tmp_path / "out.fits")
    rc = dksraw_main(["rgb", path, "-o", out, "-w", "camera", "-l", "ERROR"])
    assert rc == 0
    hdus = open_fits(out)
    names = [h.name for h in hdus]
    assert "R" in names and "G" in names and "B" in names
    assert hdus["R"].header["FILTER"] == "R"


def test_dksraw_cli_split_outputs(dng_file, tmp_path):
    path, _, _ = dng_file
    out = str(tmp_path / "chan.fits")
    rc = dksraw_main(["split", path, "-o", out, "-e", "fits", "-l", "ERROR"])
    assert rc == 0
    for suffix in ("r", "g1", "b", "g2"):
        assert os.path.exists(str(tmp_path / f"chan_{suffix}.fits"))


def test_dksraw_cli_png_output(dng_file, tmp_path):
    path, _, _ = dng_file
    out = str(tmp_path / "out.png")
    rc = dksraw_main(["grey", path, "-o", out, "-w", "camera", "-r",
                      "-l", "ERROR"])
    assert rc == 0
    import imageio.v3 as iio
    img = iio.imread(out)
    assert img.dtype == np.uint16
    assert img.max() > 60000  # renormalized to full range


def test_dksraw_cli_missing_file_returns_1(tmp_path):
    rc = dksraw_main(["grey", str(tmp_path / "nope.dng"), "-l", "CRITICAL"])
    assert rc == 1
