"""End-to-end integration soak: ap_reduce over a multi-filter dataset
with masters, cosmic rays, sky background, quality reports, the fused
stack engine, and idempotent re-runs — the full calibrate_all.sh /
navigate_all.sh / resample_all.sh chain in one driver invocation."""

import glob
import os

import numpy as np

from astrophotography_tpu import synth
from astrophotography_tpu.io.fits import Header, read_image, write_image
from astrophotography_tpu.cli.ap_reduce import main as ap_reduce


def test_ap_reduce_multi_filter_soak(tmp_path):
    rng = np.random.default_rng(99)
    data = str(tmp_path / "data")
    cal = str(tmp_path / "cal")
    out = str(tmp_path / "out")
    os.makedirs(data)
    os.makedirs(cal)

    shape = (128, 128)
    bias = rng.normal(300.0, 2.0, shape).astype(np.float32)
    dark_rate = np.abs(rng.normal(0.5, 0.1, shape)).astype(np.float32)
    flat = ((1.0 + 0.08 * np.sin(np.arange(shape[1]) / 9.0))[None, :]
            * np.ones(shape)).astype(np.float32)

    h = Header()
    h["IMAGETYP"] = "MASTER BIAS"
    write_image(os.path.join(cal, "master_bias.fits"), bias, h)
    h = Header()
    h["IMAGETYP"] = "MASTER DARK"
    h["EXPTIME"] = 60.0
    write_image(os.path.join(cal, "master_dark.fits"),
                (bias + dark_rate * 60.0).astype(np.float32), h)
    for f in ("V", "R"):
        h = Header()
        h["IMAGETYP"] = "MASTER FLAT"
        h["FILTER"] = f
        write_image(os.path.join(cal, f"master_flat_{f}.fits"),
                    flat * 2.0, h)

    scene, _ = synth.make_starfield(shape, n_stars=6, fwhm=3.0,
                                    background=80.0, read_noise=0.0,
                                    flux_range=(20000.0, 50000.0),
                                    seed=7, min_sep=16.0)
    for filt in ("V", "R"):
        for i in range(4):
            dx, dy = (0, 0) if i == 0 else rng.integers(-3, 4, 2)
            sky = np.roll(np.roll(scene, dy, 0), dx, 1)
            img = (sky * flat + bias + dark_rate * 120.0
                   + rng.normal(0, 3, shape))
            img[rng.integers(20, 108), rng.integers(20, 108)] += 30000.0
            h = Header()
            h["IMAGETYP"] = "Light Frame"
            h["OBJECT"] = "M42"
            h["TELESCOP"] = "T05"
            h["FILTER"] = filt
            h["EXPTIME"] = 120.0
            h["DATE-OBS"] = f"2026-01-0{i + 1}T00:00:00"
            write_image(os.path.join(data, f"M42-T05-{filt}-{i:03d}.fits"),
                        img.astype(np.float32), h)

    rc = ap_reduce([data, cal, out, "--fixcosmic", "--skybg",
                    "--stack_engine", "fused", "-l", "ERROR"])
    assert rc == 0
    stacks = sorted(glob.glob(os.path.join(out, "stack-*.fits")))
    cals = sorted(glob.glob(os.path.join(out, "cal-*.fits")))
    quals = sorted(glob.glob(os.path.join(out, "*qual*")))
    assert len(stacks) == 2 and len(cals) == 8 and len(quals) == 8
    for sp in stacks:
        s, hdr = read_image(sp)
        assert hdr["IMAGETYP"] == "STACK"
        assert hdr["NSTACK"] == 4
        assert hdr["EXPTOTAL"] == 480.0
        assert np.isfinite(s).all()
        inner = s[25:-25, 25:-25]
        # robust sky scatter ~ Poisson(80)/sqrt(4); stars excluded by
        # the percentile clip, CRs removed by fixcosmic + sigma clip
        lo, hi = np.percentile(inner, [5, 85])
        skypix = inner[(inner >= lo) & (inner <= hi)]
        assert np.std(skypix) < 8.0, (sp, float(np.std(skypix)))
        # stars survived every stage
        assert inner.max() > np.median(inner) + 500.0, sp

    # idempotency: a second run skips all existing outputs and succeeds
    rc2 = ap_reduce([data, cal, out, "--fixcosmic", "--skybg",
                     "--stack_engine", "fused", "-l", "ERROR"])
    assert rc2 == 0
