"""Tests for metadata enrichment: filename parsing, sites, airmass."""

import numpy as np
import pytest

from astrophotography_tpu.core import metadata as md
from astrophotography_tpu.io.fits import Header, open_fits, write_image
from astrophotography_tpu.cli.ap_add_metadata import main as ap_add_metadata


def test_parse_itelescope_filename():
    t, o, tgt = md.parse_itelescope_filename(
        "raw-T05-davestrickland-NGC_6888-20200716-231744-Ha-BIN1-E-180-001.fit")
    assert t == "T05"
    assert o == "davestrickland"
    assert tgt == "NGC 6888"
    # Telescopius mosaic suffix stripped
    _, _, tgt2 = md.parse_itelescope_filename(
        "raw-T20-obs-Cygnus_Loop x1 y2-20200101-etc-more.fit")
    assert tgt2 == "Cygnus Loop"
    with pytest.raises(RuntimeError):
        md.parse_itelescope_filename("too-few.fit")


def test_site_table():
    s = md.get_site("T05")
    assert s.name == "iTelescope New Mexico"
    assert s.latitude == pytest.approx(32.9033, abs=1e-3)
    assert s.longitude == pytest.approx(-105.5287, abs=1e-3)
    assert md.get_site("iTelescope T31").name == "iTelescope Siding Spring"
    with pytest.raises(RuntimeError):
        md.get_site("T99")


def test_resolve_target():
    ra, dec = md.resolve_target("M42")
    assert ra == pytest.approx(83.8221, abs=1e-3)
    assert dec == pytest.approx(-5.3911, abs=1e-3)
    ra2, dec2 = md.resolve_target("ngc 6888")
    assert ra2 == pytest.approx(303.06, abs=0.01)
    # resolver hook
    ra3, dec3 = md.resolve_target("Betelgeuse",
                                  resolver=lambda n: (88.79, 7.41))
    assert ra3 == 88.79
    with pytest.raises(RuntimeError):
        md.resolve_target("Unknown Object X")


def test_julian_date_and_sidereal():
    # J2000.0 epoch: 2000-01-01T12:00:00 UT -> JD 2451545.0
    assert md._julian_date("2000-01-01T12:00:00") == pytest.approx(2451545.0)
    # GMST at J2000.0 is 280.46061837 deg
    assert md._gmst_deg(2451545.0) == pytest.approx(280.4606, abs=1e-3)


def test_airmass_sanity():
    site = md.SITES["mayhill"]
    # pick a time when RA is near the local meridian: LST = RA
    # zenith target: dec = site latitude, HA = 0
    # find a DATE-OBS where GMST + lon ~ RA: solve roughly by scanning
    ra = 100.0
    best = None
    for hour in range(24):
        for minute in (0, 30):
            date = f"2026-01-15T{hour:02d}:{minute:02d}:00"
            jd = md._julian_date(date)
            lst = (md._gmst_deg(jd) + site.longitude) % 360
            diff = abs(((lst - ra + 180) % 360) - 180)
            if best is None or diff < best[0]:
                best = (diff, date)
    _, date = best
    airmass_zenith = md.compute_airmass(ra, site.latitude, site, date)
    assert airmass_zenith == pytest.approx(1.0, abs=0.02)
    # low-altitude target has much higher airmass
    airmass_low = md.compute_airmass((ra + 80) % 360, site.latitude, site, date)
    assert airmass_low > 2.0 or airmass_low == float("inf")


def test_ap_add_metadata_itelescope_mode(tmp_path):
    hdr = Header()
    hdr["DATE-OBS"] = "2026-01-15T06:30:00"
    path = str(tmp_path /
               "cal-T05-someone-M42-20260115-063000-Ha-BIN1-E-180-001.fits")
    write_image(path, np.zeros((8, 8), np.float32), hdr)
    rc = ap_add_metadata([path, "-l", "ERROR"])
    assert rc == 0
    out = open_fits(path)[0].header
    assert out["TELESCOP"] == "iTelescope T05"
    assert out["OBSERVER"] == "someone"
    assert out["OBJECT"] == "M42"
    assert out["RA-OBJ"] == pytest.approx(83.82, abs=0.01)
    assert out["OBSERVAT"] == "iTelescope New Mexico"
    assert out["LAT-OBS"] == pytest.approx(32.90, abs=0.01)
    assert "AIRMASS" in out
    assert out["AIRMASS"] >= 1.0
    # image data untouched
    assert open_fits(path)[0].data.shape == (8, 8)


def test_ap_add_metadata_yamlkeyval_mode(tmp_path):
    import yaml
    path = str(tmp_path / "img.fits")
    write_image(path, np.zeros((4, 4), np.float32), Header())
    ymlpath = str(tmp_path / "meta.yml")
    with open(ymlpath, "w") as fh:
        yaml.safe_dump({"filter": "Ha", "exptime": 180.0,
                        "set-temp": -15.0}, fh)
    rc = ap_add_metadata([path, "--mode", "yamlkeyval",
                          "--yamlfile", ymlpath, "-l", "ERROR"])
    assert rc == 0
    out = open_fits(path)[0].header
    assert out["FILTER"] == "Ha"
    assert out["EXPTIME"] == 180.0
    assert out["SET-TEMP"] == -15.0


def test_simbad_resolver_parses_tap_json():
    """simbad_resolver with an injected transport: ADQL query encodes
    the (quote-escaped) name; TAP JSON rows parse to (ra, dec)."""
    import json
    import urllib.parse

    from astrophotography_tpu.core.metadata import (resolve_target,
                                                    simbad_resolver)

    seen = {}

    def transport(url):
        seen["url"] = url
        q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
        assert q["FORMAT"] == ["json"]
        assert "O'Neill 1" .replace("'", "''") in q["QUERY"][0]
        return json.dumps({"data": [[83.6331, 22.0145]]}).encode()

    resolver = simbad_resolver(transport=transport)
    ra, dec = resolve_target("O'Neill 1", resolver)
    assert (ra, dec) == (83.6331, 22.0145)
    assert seen["url"].startswith(
        "https://simbad.cds.unistra.fr/simbad/sim-tap/sync?")


def test_simbad_resolver_no_match_and_failure():
    import json

    from astrophotography_tpu.core.metadata import simbad_resolver

    empty = simbad_resolver(transport=lambda url: json.dumps(
        {"data": []}).encode())
    assert empty("Nonexistent Object 9") is None

    def broken(url):
        raise OSError("no network")

    assert simbad_resolver(transport=broken)("M31") is None


def test_builtin_catalog_wins_over_resolver():
    from astrophotography_tpu.core.metadata import resolve_target

    def never(name):
        raise AssertionError("resolver must not be called for catalog hits")

    ra, dec = resolve_target("m 31", never)
    assert round(ra, 3) == 10.685
