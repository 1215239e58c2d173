"""Decompose the guarded adjoint's on-chip cost at the paper flagship.

The stored-state backward of a guarded solver dispatches per interval on a
risk flag (ops/pallas/core.trajectory_bwd): non-risky intervals take the
fused unguarded vjp, risky ones differentiate the guarded (lax.cond
micro-stepping) body. This tool separates the three cost components by
forcing the risk mask via core._GUARD_FORCE_RISKY:

- structure:   force "none" - unguarded  = monitor sweep + cond-in-scan
               overhead at zero firing rate.
- risky branch: force "all" - force "none" = differentiating the guarded
               body for every interval.
- real:        the monitored mask; firing rate is estimated by linear
               interpolation between the forced extremes.

Writes the results under "GUARDED_ADJOINT" in TUNNELING.json (the guard's
accuracy artifact). Run on the TPU (nohup — remote-compile tunnel):

    nohup python -u tools/guarded_adjoint_bench.py > /tmp/gab.log 2>&1 &

Reference behavior context: the upstream package integrates with adaptive
Dormand-Prince (reference difflexmm/dynamics.py:166) and pays adaptivity
on every step; here the fixed-step fast path pays only where the risk
predicate fires, and this tool records what that dispatch costs.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import paper_config
from difflexmm_tpu.models.quads_focusing import (
    ForwardProblem,
    OptimizationProblem,
)
from difflexmm_tpu.ops.pallas import core


def build(method, guard, n_substeps):
    cfg = paper_config(method, n_substeps)
    problem = ForwardProblem(guard=guard, **cfg)
    opt = OptimizationProblem(problem, target_size=(2, 2), target_shift=(4, 5))
    opt.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(
        25 * jnp.pi / 180
    )
    return opt.objective_fn, design


def timeit(fn, design, reps=5):
    jitted = jax.jit(fn)
    t0 = time.time()
    out = jitted(design)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = jitted(design)
    jax.block_until_ready(out)
    run_s = (time.time() - t0) / reps
    val = out[0] if isinstance(out, tuple) else out
    return compile_s, run_s, float(val)


def measure(label, method, guard, n_substeps, grad=True, force=None,
            dispatch=True, results=None):
    core._GUARD_FORCE_RISKY = force
    core._GUARD_ADJOINT_DISPATCH = dispatch
    try:
        fn, design = build(method, guard, n_substeps)
        if grad:
            fn = jax.value_and_grad(fn)
        compile_s, run_s, val = timeit(fn, design)
    finally:
        core._GUARD_FORCE_RISKY = None
        core._GUARD_ADJOINT_DISPATCH = True
    entry = dict(run_ms=round(run_s * 1e3, 2), value=val,
                 compile_s=round(compile_s, 1))
    print(f"{label}: {entry}", flush=True)
    if results is not None:
        results[label] = entry
    return entry


def main():
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("refusing to record: no TPU attached", file=sys.stderr)
        return 2

    results = {"config": dict(flagship="24x16, 200 timepoints",
                              method="verlet_pallas", n_substeps=10,
                              reps=5, device=str(dev))}
    m = "verlet_pallas"
    measure("unguarded_fwd", m, None, 10, grad=False, results=results)
    measure("unguarded", m, None, 10, results=results)
    measure("guarded_fwd", m, "auto", 10, grad=False, results=results)
    base = measure("guarded_real", m, "auto", 10, results=results)
    none = measure("guarded_force_none", m, "auto", 10, force="none",
                   results=results)
    alla = measure("guarded_force_all", m, "auto", 10, force="all",
                   results=results)
    measure("guarded_nodispatch", m, "auto", 10, dispatch=False,
            results=results)
    # The NaN-rescue case the guard exists for (plain n=5 blows up).
    measure("guarded_real_n5", m, "auto", 5, results=results)

    span = alla["run_ms"] - none["run_ms"]
    if span > 0:
        rate = (base["run_ms"] - none["run_ms"]) / span
        results["estimated_firing_rate"] = round(max(0.0, min(1.0, rate)), 3)
    results["notes"] = (
        "structure = force_none - unguarded (monitor + cond-in-scan at zero"
        " firing); risky-branch cost = force_all - force_none; firing rate"
        " interpolated between the forced extremes."
    )

    path = Path(__file__).resolve().parents[1] / "TUNNELING.json"
    doc = json.loads(path.read_text())
    doc["GUARDED_ADJOINT"] = results
    path.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote GUARDED_ADJOINT to {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
