import dataclasses
from pathlib import Path
from typing import Optional, Tuple

import pytest

from tpunerf.core import config as cfglib


@dataclasses.dataclass
class Inner:
    text: str = ""
    scale: float = 0.6
    steps: int = 5000
    flag: bool = False
    rng: Tuple[float, float] = (1.0, 1.5)
    maybe: Optional[str] = None
    path: Optional[Path] = None


@dataclasses.dataclass
class Outer:
    guide: Inner = dataclasses.field(default_factory=Inner)
    name: str = "exp"


def test_defaults():
    cfg = cfglib.parse(Outer, args=[])
    assert cfg.guide.steps == 5000 and cfg.name == "exp"


def test_dotted_overrides():
    cfg = cfglib.parse(Outer, args=[
        "--guide.text", "a goldfish", "--guide.scale", "0.7",
        "--guide.flag", "True", "--guide.rng", "[2.0,3.0]",
        "--name", "run1", "--guide.maybe", "None",
        "--guide.path", "shapes/blub.obj",
    ])
    assert cfg.guide.text == "a goldfish"
    assert cfg.guide.scale == pytest.approx(0.7)
    assert cfg.guide.flag is True
    assert cfg.guide.rng == (2.0, 3.0)
    assert cfg.guide.maybe is None
    assert cfg.guide.path == Path("shapes/blub.obj")


def test_yaml_plus_cli(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("guide:\n  text: yaml-text\n  steps: 100\nname: yml\n")
    cfg = cfglib.parse(Outer, args=["--config_path", str(p),
                                    "--guide.steps", "200"])
    assert cfg.guide.text == "yaml-text"
    assert cfg.guide.steps == 200  # CLI wins
    assert cfg.name == "yml"


def test_unknown_key_rejected(tmp_path):
    with pytest.raises(KeyError):
        cfglib.parse(Outer, args=["--guide.nope", "1"])


def test_dump_roundtrip(tmp_path):
    cfg = cfglib.parse(Outer, args=["--guide.text", "x"])
    out = tmp_path / "dump.yaml"
    cfglib.dump_yaml(cfg, out)
    cfg2 = cfglib.parse(Outer, args=["--config_path", str(out)])
    assert cfg2 == cfg


def test_equals_syntax():
    cfg = cfglib.parse(Outer, args=["--guide.steps=42"])
    assert cfg.guide.steps == 42
