"""Checkpoint save / resume with rolling retention and mode migration.

Same contract as the reference (SURVEY.md §5.4; latent_paint/training/
trainer.py:235-310): `step_%06d` checkpoints holding
{train_step, params, opt_state?}, rolling window `max_keep_ckpts`, two load
modes (latest-full-resume vs explicit-path model-only), and the latent→RGB
texture migration applied by the caller on cross-mode load.

Serialization is flax msgpack (host-agnostic numpy trees) — multihost-safe
because only process 0 writes and every process can read.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


@dataclasses.dataclass
class CheckpointManager:
    ckpt_dir: Path
    max_keep: int = 2

    def __post_init__(self):
        self.ckpt_dir = Path(self.ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)

    def _path(self, step: int) -> Path:
        return self.ckpt_dir / f"step_{step:06d}.ckpt"

    def existing(self) -> List[Path]:
        return sorted(self.ckpt_dir.glob("step_*.ckpt"))

    def save(self, step: int, params: Any, opt_state: Optional[Any] = None,
             full: bool = True, is_main_process: bool = True) -> Path:
        path = self._path(step)
        if not is_main_process:
            return path
        state: Dict[str, Any] = {
            "train_step": step,
            "params": serialization.to_state_dict(_to_host(params))}
        if full and opt_state is not None:
            state["opt_state"] = serialization.to_state_dict(
                _to_host(opt_state))
        path.write_bytes(serialization.msgpack_serialize(state))
        # rolling retention (reference trainer.py:306-308)
        ckpts = self.existing()
        while len(ckpts) > self.max_keep:
            ckpts.pop(0).unlink()
        return path

    def save_debug(self, name: str, step: int, params: Any,
                   is_main_process: bool = True) -> Path:
        """Save params under `<name>.ckpt` — OUTSIDE the `step_*` glob, so it
        is never evicted by rolling retention and never picked up by a
        latest-checkpoint resume (used for NaN post-mortems)."""
        path = self.ckpt_dir / f"{name}.ckpt"
        if not is_main_process:
            return path
        state: Dict[str, Any] = {
            "train_step": step,
            "params": serialization.to_state_dict(_to_host(params))}
        path.write_bytes(serialization.msgpack_serialize(state))
        return path

    def load(self, path: Optional[Path] = None,
             params_template: Optional[Any] = None,
             opt_state_template: Optional[Any] = None
             ) -> Tuple[Optional[Any], Optional[Any], int]:
        """Returns (params, opt_state, next_step). `path=None` → newest
        (reference trainer.py:236-243)."""
        if path is None:
            ckpts = self.existing()
            if not ckpts:
                return None, None, 0
            path = ckpts[-1]
        state = serialization.msgpack_restore(Path(path).read_bytes())
        params = state["params"]
        if params_template is not None:
            params = serialization.from_state_dict(params_template, params)
        opt_state = state.get("opt_state")
        if opt_state is not None and opt_state_template is not None:
            try:
                opt_state = serialization.from_state_dict(opt_state_template,
                                                          opt_state)
            except Exception:
                opt_state = None  # best-effort (reference trainer.py:281-286)
        return params, opt_state, int(state.get("train_step", 0)) + 1
