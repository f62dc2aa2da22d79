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


def resolve_dtype(spec: str):
    """Dtype-policy string → jnp dtype: "auto" = bfloat16 on TPU / float32
    elsewhere; else an explicit dtype name ("float32" / "bfloat16").
    Shared by `render.mlp_dtype` and `guide.unet_dtype` (PARITY.md pins
    "float32" for the reference allclose gate)."""
    import jax
    import jax.numpy as jnp
    if spec == "auto":
        return jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32
    return jnp.dtype(spec)


def make_path(path: Path) -> Path:
    path = Path(path)
    path.mkdir(exist_ok=True, parents=True)
    return path


def enable_persistent_compilation_cache(
        cache_dir: str | None = None) -> None:
    """Point XLA's persistent compilation cache at a repo-local directory so
    repeated CLI/bench invocations skip the multi-minute UNet compiles.
    No-op if the running jax lacks the knobs. Overridable via
    TPUNERF_CACHE_DIR; disable with TPUNERF_CACHE_DIR=0."""
    import jax

    cache_dir = cache_dir or os.environ.get("TPUNERF_CACHE_DIR") or \
        str(Path(__file__).resolve().parents[2] / ".jax_cache")
    if cache_dir == "0":
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
