"""Profiling & tracing hooks (SURVEY.md §5.1).

The reference's only instrumentation is commented-out
`torch.cuda.synchronize(); print(f'[TIME] ...')` blocks
(src/stable_diffusion.py:264-331). Here: a real `jax.profiler` trace server
+ named-scope annotations + a phase timer that forces device sync, feeding
the per-step scalars the trainer writes to metrics.jsonl.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Path) -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live profiling endpoint (connect with TensorBoard's profile tab)."""
    return jax.profiler.start_server(port)


def annotate(name: str):
    """Named scope visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Wall-clock per phase with forced device sync — the honest timer for
    environments where async dispatch makes naive timing meaningless."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = True) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # sync all live arrays created in the phase is impossible;
                # callers should block on their outputs — this sync point
                # flushes the dispatch queue as a best effort
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}
