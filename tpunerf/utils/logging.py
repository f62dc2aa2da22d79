"""Run logging: console + per-run `log.txt` sink, loguru-free.

Mirrors the reference's loguru setup (latent_paint/training/trainer.py:107-111:
stderr + `<exp_dir>/log.txt`, `time | message` format) on the stdlib, plus a
JSONL scalar-metrics sink for the benchmark harness (SURVEY.md §5.5).
"""
from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional

_FMT = logging.Formatter("%(asctime)s | %(levelname)s | %(message)s",
                         datefmt="%Y-%m-%d %H:%M:%S")


def get_logger(name: str = "tpunerf") -> logging.Logger:
    return logging.getLogger(name)


def init_logger(exp_dir: Optional[Path] = None,
                name: str = "tpunerf") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(_FMT)
    logger.addHandler(sh)
    if exp_dir is not None:
        Path(exp_dir).mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(Path(exp_dir) / "log.txt")
        fh.setFormatter(_FMT)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricsWriter:
    """Append scalar metrics as JSONL for the bench harness."""

    def __init__(self, path: Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def write(self, step: int, **scalars: Any) -> None:
        rec: Dict[str, Any] = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
