"""Auxiliary benchmark: FULL constrained-optimization iteration wall-clock.

The headline bench (bench.py) times forward+adjoint only — the quantity the
measured reference baseline times (BASELINE_MEASURED.json). This tool times
what a design-optimization user actually waits for: one complete MMA
iteration on the flagship problem — objective+adjoint, the ~4,400
void/block-angle and edge-length constraints with jacobians, the on-device
dual solve, trust-region bookkeeping, and history/metrics logging.

Run on the TPU-attached environment:

    python tools/bench_end_to_end.py [n_iterations]

Prints ONE JSON line. Reference context: the paper's optimization budget
was 80 MMA iterations capped at 8 h => <= 6 min/iteration on CPU
(reference notebooks/quads_focusing_3dp_pla_shims.ipynb cell 12).
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main(n_iterations: int = 12) -> int:
    if n_iterations < 4:
        raise SystemExit("need n_iterations >= 4 for a warm median")
    import jax
    from bench import build_flagship

    optimization, design = build_flagship()
    stamps = []

    from difflexmm_tpu.models import runner as runner_mod
    orig_run_mma = runner_mod.run_mma

    def timed_run_mma(*args, **kwargs):
        callback = kwargs.get("callback")

        def wrapped(it, x, value, violation, fi):
            stamps.append(time.perf_counter())
            if callback is not None:
                callback(it, x, value, violation, fi)

        kwargs["callback"] = wrapped
        return orig_run_mma(*args, **kwargs)

    runner_mod.run_mma = timed_run_mma
    try:
        t0 = time.perf_counter()
        optimization.run_optimization_mma(
            design,
            n_iterations=n_iterations,
            lower_bound=-0.35 * 15,
            upper_bound=0.35 * 15,
            min_void_angle=0.0,
            min_block_angle=0.0,
            min_edge_length=0.05 * 15,
            move_limit=0.08,  # FRACTION of the bound span (run_mma contract)
            verbose=False,
        )
        total = time.perf_counter() - t0
    finally:
        runner_mod.run_mma = orig_run_mma

    deltas = np.diff(stamps)
    values = optimization.objective_values
    record = {
        "metric": "quads_focusing_full_mma_seconds_per_iteration",
        "value": round(float(np.median(deltas[2:])), 4),
        "unit": "s",
        "n_iterations": n_iterations,
        "total_seconds_incl_compile": round(total, 1),
        "objective_initial": round(values[0], 4),
        "objective_final": round(values[-1], 4),
        "per_iteration_seconds": [round(float(d), 3) for d in deltas],
        "device": str(jax.devices()[0]),
        "reference_budget_seconds_per_iteration": 360.0,
    }
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 12))
