"""Small host-side utilities (reference: src/utils.py)."""
from __future__ import annotations

import os
import random
from pathlib import Path

import numpy as np


def seed_everything(seed: int) -> None:
    """Seed host RNGs (reference utils.py:68-75). Device randomness in this
    framework flows through explicit jax PRNG keys instead of global state."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


def tensor2numpy(array) -> np.ndarray:
    """Image array → uint8, auto-rescaling [−1,1] → [0,1]
    (reference utils.py:57-62)."""
    array = np.asarray(array)
    if array.min() < 0:
        array = array * 0.5 + 0.5
    return (np.clip(array, 0.0, 1.0) * 255).astype(np.uint8)


def make_path(path: Path) -> Path:
    path = Path(path)
    path.mkdir(exist_ok=True, parents=True)
    return path
