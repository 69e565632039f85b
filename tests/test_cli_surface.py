"""CLI surface smoke tests: every tool parses --help and bad args fail
cleanly (the reference's test_cli.py pattern,
test/AstroPhotography/test_cli.py:17-41)."""

import importlib

import pytest

TOOLS = [
    "dksraw",
    "ap_calibrate",
    "ap_combine_darks",
    "ap_imarith",
    "ap_find_badpix",
    "ap_fix_badpix",
    "ap_auto_badcol",
    "ap_fix_cosmic_rays",
    "ap_calc_read_noise",
    "ap_find_stars",
    "ap_measure_background",
    "ap_astrometry",
    "ap_add_metadata",
    "ap_quality_summary",
    "ap_composite",
    "ap_reduce",
    "ap_tidy_files",
]


@pytest.mark.parametrize("tool", TOOLS)
def test_help_exits_zero(tool):
    mod = importlib.import_module(f"astrophotography_tpu.cli.{tool}")
    with pytest.raises(SystemExit) as exc:
        mod.main(["--help"])
    assert exc.value.code == 0


@pytest.mark.parametrize("tool", [t for t in TOOLS if t != "dksraw"])
def test_no_args_usage_error(tool):
    mod = importlib.import_module(f"astrophotography_tpu.cli.{tool}")
    with pytest.raises(SystemExit) as exc:
        mod.main([])
    assert exc.value.code == 2  # argparse usage error


def test_dksraw_subcommand_help():
    from astrophotography_tpu.cli.dksraw import main
    for sub in ("grey", "rgb", "split"):
        with pytest.raises(SystemExit) as exc:
            main([sub, "--help"])
        assert exc.value.code == 0


def test_dksraw_missing_file_is_error(tmp_path):
    from astrophotography_tpu.cli.dksraw import main
    assert main(["grey", str(tmp_path / "no.dng"), "-l", "CRITICAL"]) == 1


def test_all_cli_tools_have_entry_points():
    """Every ap_*/dksraw CLI module is installed as a console script
    (reference setup.py:33-36 installs everything it ships)."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(repo, "pyproject.toml")).read()
    scripts = dict(re.findall(
        r'^(\w+) = "astrophotography_tpu\.cli\.(\w+):main"$', text, re.M))
    cli_dir = os.path.join(repo, "astrophotography_tpu", "cli")
    tools = {f[:-3] for f in os.listdir(cli_dir)
             if f.endswith(".py") and not f.startswith("_")
             and f != "common.py"}
    missing = tools - set(scripts.values())
    assert not missing, f"CLI tools without console entry points: {missing}"
