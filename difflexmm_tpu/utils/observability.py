"""Tracing, structured metrics, and checkpoint/resume for long runs.

The reference has none of this (SURVEY.md section 5: print() statements and
whole-problem pickles only). This module adds:

- ``trace``: a context manager wrapping ``jax.profiler`` traces (Perfetto
  dumps) plus wall-clock phase timing.
- ``MetricsLogger``: per-iteration structured metrics appended to JSONL
  (objective, grad norm, constraint violation, steps/sec).
- ``OptimizationCheckpoint``: periodic snapshot of the optimizer state
  (design, histories, RNG-free) to disk, resumable across processes — the
  elastic-recovery story for multi-hour design runs.
"""

import json
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax

from difflexmm_tpu.utils.types import load_data, save_data


@contextmanager
def trace(label: str, trace_dir: Optional[Union[str, Path]] = None,
          verbose: bool = True):
    """Time a phase; optionally capture a jax.profiler trace (Perfetto).

    Usage::

        with trace("fwd+grad", trace_dir="/tmp/traces"):
            value, grad = step(design)
    """

    if trace_dir is not None:
        jax.profiler.start_trace(str(trace_dir))
    t0 = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - t0
        if trace_dir is not None:
            jax.profiler.stop_trace()
        if verbose:
            print(f"[trace] {label}: {elapsed:.4f} s")


class MetricsLogger:
    """Append-only JSONL metrics stream with wall-clock deltas."""

    def __init__(self, path: Union[str, Path]):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._last_time = time.perf_counter()

    def log(self, step: int, **metrics: Any) -> None:
        now = time.perf_counter()
        record = {
            "step": step,
            "time": time.time(),
            "seconds_since_last": round(now - self._last_time, 6),
        }
        self._last_time = now
        for key, value in metrics.items():
            try:
                record[key] = float(value)
            except (TypeError, ValueError):
                record[key] = value
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def read(self) -> list:
        if not self.path.exists():
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


@dataclass
class OptimizationCheckpoint:
    """Periodic snapshot of an optimization run, resumable.

    Stores the current design, iteration histories, and arbitrary extras.
    The artifact model matches the reference's restart-from-
    ``design_values[-1]`` pattern (quads_focusing notebook cell 12) but is
    automatic and periodic instead of manual.
    """

    path: Union[str, Path]
    every: int = 10

    def save(self, iteration: int, design: Any,
             objective_values=None, design_values=None,
             extras: Optional[Dict[str, Any]] = None, force: bool = False) -> bool:
        """Snapshot if due (every ``self.every`` iterations). Returns True
        when a snapshot was written."""

        if not force and (iteration % self.every != 0):
            return False
        save_data(
            self.path,
            {
                "iteration": iteration,
                "design": design,
                "objective_values": objective_values or [],
                "design_values": design_values or [],
                "extras": extras or {},
            },
        )
        return True

    def restore(self) -> Optional[Dict[str, Any]]:
        """Load the last snapshot, or None if absent."""

        path = Path(self.path)
        if not path.exists():
            return None
        return load_data(path)

    def exists(self) -> bool:
        return Path(self.path).exists()
