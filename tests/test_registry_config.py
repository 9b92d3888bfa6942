import pytest

from livetalking_tpu import registry
from livetalking_tpu.config import default_opt, parse_args


def test_register_and_create():
    @registry.register("tts", "_dummy")
    class Dummy:
        def __init__(self, opt=None, parent=None):
            self.opt = opt

    inst = registry.create("tts", "_dummy", opt=42)
    assert isinstance(inst, Dummy)
    assert inst.opt == 42


def test_create_unknown_raises_with_available():
    with pytest.raises(ValueError, match="Available"):
        registry.create("tts", "_no_such_plugin")


def test_output_category_alias():
    @registry.register("output", "_alias_check")
    class Out:
        pass

    assert registry.create("streamout", "_alias_check") is not None
    assert "_alias_check" in registry.list_plugins("output")["streamout"]


def test_parse_args_defaults():
    opt = parse_args(["--config", ""])
    assert opt.fps == 25
    assert opt.model == "wav2lip"
    assert opt.batch_size == 16
    assert opt.l == 10 and opt.r == 10
    assert opt.max_session == 5
    assert opt.customopt == []


def test_cli_beats_yaml(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("batch_size: 4\nmodel: musetalk\n")
    opt = parse_args(["--config", str(cfg), "--batch_size", "8"])
    assert opt.batch_size == 8  # CLI wins
    assert opt.model == "musetalk"  # YAML beats default


def test_default_opt_overrides():
    opt = default_opt(batch_size=2, tts="dummy")
    assert opt.batch_size == 2
    assert opt.tts == "dummy"
