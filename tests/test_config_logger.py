"""Tests for the config and logging foundations (reference
test/AstroPhotography/core/test_config.py and test_logger.py analogues)."""

import io
import logging

from astrophotography_tpu.utils import AstroLogger, YamlConfig, get_logger


def test_config_attr_and_item_access(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("core:\n  logging: INFO\n  depth: 3\n")
    cfg = YamlConfig().load(str(p))
    assert cfg.core.logging == "INFO"
    assert cfg["core"]["depth"] == 3


def test_config_multi_file_merge(tmp_path):
    a = tmp_path / "a.yml"
    b = tmp_path / "b.yml"
    a.write_text("core:\n  logging: INFO\n  keep: 1\nx: 10\n")
    b.write_text("core:\n  logging: DEBUG\ny: 20\n")
    cfg = YamlConfig().load([str(a), str(b)])
    assert cfg.core.logging == "DEBUG"  # later file wins
    assert cfg.core.keep == 1           # non-conflicting keys survive
    assert cfg.x == 10 and cfg.y == 20


def test_config_macro_substitution(tmp_path):
    p = tmp_path / "m.yml"
    p.write_text(
        "paths:\n  root: /data\n  cal: '%paths.root;/cal'\n"
        "  masters: '%paths.cal;/masters'\n")
    cfg = YamlConfig().load(str(p))
    assert cfg.paths.cal == "/data/cal"
    assert cfg.paths.masters == "/data/cal/masters"  # nested macros resolve


def test_logger_start_stop():
    stream = io.StringIO()
    log = AstroLogger("test_astro_logger")
    assert not log.running
    log.start("DEBUG", stream)
    assert log.running
    log.info("hello world")
    log.stop()
    log.info("after stop")  # must not raise, must not write
    out = stream.getvalue()
    assert "hello world" in out
    assert "after stop" not in out


def test_get_logger_inherits_root_handler():
    stream = io.StringIO()
    from astrophotography_tpu.utils import logger as app_logger
    app_logger.start("INFO", stream)
    child = get_logger("unit_test_child")
    child.info("child message")
    app_logger.stop()
    assert "child message" in stream.getvalue()
    assert logging.getLogger(
        "astrophotography_tpu.unit_test_child").propagate is True
