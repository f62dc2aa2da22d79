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
import threading
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
        self._thread: Optional[threading.Thread] = None
        self._worker_exc: Optional[BaseException] = None

    def _path(self, step: int) -> Path:
        return self.ckpt_dir / f"step_{step:06d}.ckpt"

    def existing(self) -> List[Path]:
        return sorted(self.ckpt_dir.glob("step_*.ckpt"))

    def flush(self) -> None:
        """Join the in-flight async save (if any); re-raise its failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._worker_exc is not None:
            exc, self._worker_exc = self._worker_exc, None
            raise exc

    def _write(self, path: Path, step: int, params: Any,
               opt_state: Optional[Any], full: bool) -> None:
        # start all device→host DMAs before the first blocking asarray:
        # the transfers then run concurrently with the training loop's
        # dispatches instead of serializing leaf-by-leaf under the GIL
        for leaf in (jax.tree_util.tree_leaves(params)
                     + (jax.tree_util.tree_leaves(opt_state)
                        if full and opt_state is not None else [])):
            if hasattr(leaf, "copy_to_host_async"):
                try:
                    leaf.copy_to_host_async()
                except Exception:
                    pass
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

    def save(self, step: int, params: Any, opt_state: Optional[Any] = None,
             full: bool = True, is_main_process: bool = True,
             async_write: bool = False) -> Path:
        """`async_write=True` runs the device→host fetch + serialize +
        retention on a background thread (at most one in flight; a new save
        joins the previous). On the tunneled TPU the host fetch of a
        production-shape state is seconds of dead time per save — async, it
        overlaps the next block of train dispatches (jax arrays are
        immutable, so snapshotting the tree refs is safe). Call `flush()`
        before reading checkpoints, at train end, and before exiting."""
        path = self._path(step)
        if not is_main_process:
            return path
        if async_write:
            self.flush()

            def work():
                try:
                    self._write(path, step, params, opt_state, full)
                except BaseException as e:     # surfaced at next flush/save
                    self._worker_exc = e

            self._thread = threading.Thread(target=work, daemon=True,
                                            name="ckpt-writer")
            self._thread.start()
            return path
        self._write(path, step, params, opt_state, full)
        return path

    def save_debug(self, name: str, step: int, params: Any,
                   is_main_process: bool = True) -> Path:
        """Save params under `<name>.ckpt` — OUTSIDE the `step_*` glob, so it
        is never evicted by rolling retention and never picked up by a
        latest-checkpoint resume (used for NaN post-mortems)."""
        path = self.ckpt_dir / f"{name}.ckpt"
        if not is_main_process:
            return path
        self.flush()
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
        self.flush()
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
