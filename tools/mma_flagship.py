"""Validate the JAX MMA optimizer end-to-end at the paper budget.

Two artifacts (VERDICT r3 missing #2):

1. ``--flagship`` (TPU): the full constrained 80-iteration quads-focusing
   optimization at the flagship config — the workflow of reference
   problems/quads_focusing.py:546-649 (80 iterations, 8 h wall cap on a
   CPU cluster; here minutes on one chip). Records the objective
   trajectory, per-iteration max constraint violation, rejected-iteration
   flags, and wall clock to MMA_FLAGSHIP.json.

2. ``--crosscheck`` (CPU f64): cross-validate ``optim.mma.run_mma``
   against ``scipy.optimize.minimize(method="SLSQP")`` on a downsized
   constrained focusing problem — same jitted objective/constraint
   functions, same bounds. Both must land feasible designs with final
   objectives within a stated tolerance; written into the same artifact
   under "slsqp_crosscheck" (and pinned live by
   tests/test_mma_crosscheck.py at a smaller config).

Usage:
    python tools/mma_flagship.py --flagship        # on the TPU env
    python tools/mma_flagship.py --crosscheck      # CPU f64
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / "MMA_FLAGSHIP.json"


def _load():
    if OUT.exists():
        return json.loads(OUT.read_text())
    return {}


def _save(record):
    OUT.write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record, indent=2))


def flagship(n_iterations: int = 80, guarded: bool = False):
    import jax
    import numpy as np
    from bench import build_flagship, paper_config

    if guarded:
        # guard="auto" keeps every candidate's fixed-step dynamics accurate
        # at force spikes, so the optimizer's objective tracks the f64
        # oracle instead of drifting near the integrator's accuracy edge
        # (the unguarded run's best design reads 22% high vs the oracle).
        import jax.numpy as jnp
        from difflexmm_tpu.models.quads_focusing import (
            ForwardProblem,
            OptimizationProblem,
        )

        method = (
            "verlet_pallas" if jax.default_backend() == "tpu" else "verlet"
        )
        problem = ForwardProblem(guard="auto", **paper_config(method, 10))
        optimization = OptimizationProblem(
            problem, target_size=(2, 2), target_shift=(4, 5)
        )
        optimization.setup_objective()
        design = problem.geometry.get_design_from_rotated_square(
            25 * jnp.pi / 180
        )
    else:
        optimization, design = build_flagship()
    spacing = 15.0

    # Steady-state s/iter from per-iteration callback stamps: with the
    # r5 on-device loop (run_mma_fused) iterations land in chunks of one
    # device dispatch each, so chunk 0 absorbs the scan compile and the
    # later chunks are the production rate.
    stamps = []

    class _Stamps:
        def log(self, *a, **k):
            stamps.append(time.perf_counter())

    t0 = time.perf_counter()
    optimization.run_optimization_mma(
        design,
        n_iterations=n_iterations,
        lower_bound=-0.35 * spacing,
        upper_bound=0.35 * spacing,
        min_void_angle=0.0,
        min_block_angle=0.0,
        min_edge_length=0.05 * spacing,
        move_limit=0.08,
        verbose=True,
        metrics_logger=_Stamps(),
        # The drivers now re-arm guard="auto" by default; the unguarded
        # baseline record must opt out explicitly to stay a baseline.
        guard="auto" if guarded else None,
        chunk=10,
    )
    total = time.perf_counter() - t0
    chunk = 10
    ends = [t for i, t in enumerate(stamps) if (i + 1) % chunk == 0]
    steady = (
        min(b - a for a, b in zip(ends[:-1], ends[1:])) / chunk
        if len(ends) > 2
        else total / max(n_iterations, 1)
    )

    values = [float(v) for v in optimization.objective_values]
    violations = {
        name: [float(v) for v in history]
        for name, history in optimization.constraints_violation.items()
    }
    max_violation_final = max(
        (history[-1] for history in violations.values()), default=0.0
    )
    # Persist the best design so the f64 odeint oracle can re-evaluate it
    # (guards against an optimizer that "wins" by gaming the fixed-step
    # integrator's stability region instead of the physics).
    best_design = optimization.design_values[
        int(np.argmax(np.asarray(values)))
    ]
    key = "flagship_guarded" if guarded else "flagship"
    np.savez(
        REPO / f"MMA_{key.upper()}_DESIGN.npz",
        *[np.asarray(leaf) for leaf in jax.tree.leaves(best_design)],
    )
    record = _load()
    record[key] = {
        "device": str(jax.devices()[0]),
        "n_iterations": n_iterations,
        "total_seconds": round(total, 1),
        "seconds_per_iteration": round(total / n_iterations, 3),
        "steady_seconds_per_iteration": round(steady, 4),
        "loop": "run_mma_fused device scan, chunk=10",
        "reference_budget": "80 iterations / 8 h (problems/quads_focusing.py:546-649)",
        "objective_initial": values[0],
        "objective_final": values[-1],
        "objective_best": max(values),
        "improvement_factor": round(max(values) / values[0], 2),
        "max_constraint_violation_final": max_violation_final,
        "objective_values": [round(v, 5) for v in values],
        "constraints_violation_final": {
            name: history[-1] for name, history in violations.items()
        },
    }
    _save(record)


def _downsized(n1=8, n2=6):
    """Downsized paper-physics focusing problem for the SLSQP cross-check."""

    import jax.numpy as jnp
    from bench import paper_config
    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    cfg = paper_config("verlet", 10)
    dt_out = cfg["simulation_time"] / (cfg["n_timepoints"] - 1)
    cfg.update(
        n1_blocks=n1, n2_blocks=n2,
        n_timepoints=40, simulation_time=39 * dt_out,
        # paper_config bakes the flagship block count into the per-DOF
        # damping array; one row broadcasts to any lattice size.
        damping=cfg["damping"][0],
    )
    # guard="auto": without it, BOTH optimizers exploit designs outside
    # the fixed-step integrator's stability region (finite-garbage
    # objectives of 1e7+ from numerical blow-up, geometrically feasible) —
    # the reactive substep guard keeps every candidate's dynamics sane, so
    # the cross-check compares optimizers on physics, not on who games the
    # integrator harder.
    problem = ForwardProblem(guard="auto", **cfg)
    optimization = OptimizationProblem(
        problem, target_size=(2, 2), target_shift=(2, 2)
    )
    optimization.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(
        25 * jnp.pi / 180
    )
    return optimization, design


def crosscheck(n_iterations: int = 40, n1: int = 8, n2: int = 6):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.flatten_util import ravel_pytree
    from scipy.optimize import minimize

    from difflexmm_tpu.optim.mma import run_mma

    optimization, design = _downsized(n1, n2)
    spacing = 15.0
    bounds = (-0.35 * spacing, 0.35 * spacing)
    min_edge = 0.05 * spacing

    flat0, unflatten = ravel_pytree(design)
    objective_and_grad = jax.jit(
        jax.value_and_grad(lambda x: optimization.objective_fn(unflatten(x)))
    )
    constraint_fns = optimization._design_constraints(0.0, 0.0, min_edge)
    fns = [fn for _, fn in constraint_fns]

    def stacked(x):
        return jnp.concatenate([fn(unflatten(x)) for fn in fns])

    constraints_and_jac = jax.jit(
        lambda x: (stacked(x), jax.jacobian(stacked)(x))
    )
    xmin = jnp.full_like(flat0, bounds[0])
    xmax = jnp.full_like(flat0, bounds[1])

    # --- our MMA (maximize) ---
    t0 = time.perf_counter()
    x_mma, history = run_mma(
        objective_and_grad, flat0, xmin, xmax, n_iterations,
        constraints_and_jac=constraints_and_jac, maximize=True,
        move_limit=0.08,
    )
    t_mma = time.perf_counter() - t0
    mma_obj = float(objective_and_grad(x_mma)[0])
    mma_viol = float(jnp.max(stacked(x_mma)))

    # --- scipy SLSQP (minimize -objective) ---
    nev = [0]

    def f(x):
        nev[0] += 1
        v, g = objective_and_grad(jnp.asarray(x))
        return -float(v), -np.asarray(g, dtype=np.float64)

    def c(x):
        fi, _ = constraints_and_jac(jnp.asarray(x))
        return -np.asarray(fi, dtype=np.float64)  # scipy wants c(x) >= 0

    def cjac(x):
        _, dfi = constraints_and_jac(jnp.asarray(x))
        return -np.asarray(dfi, dtype=np.float64)

    t0 = time.perf_counter()
    res = minimize(
        f, np.asarray(flat0), jac=True, method="SLSQP",
        bounds=[bounds] * flat0.size,
        constraints=[{"type": "ineq", "fun": c, "jac": cjac}],
        options={"maxiter": n_iterations, "ftol": 1e-8},
    )
    t_slsqp = time.perf_counter() - t0
    slsqp_obj = float(objective_and_grad(jnp.asarray(res.x))[0])
    slsqp_viol = float(jnp.max(stacked(jnp.asarray(res.x))))

    initial_obj = float(objective_and_grad(flat0)[0])
    record = _load()
    record["slsqp_crosscheck"] = {
        "config": (
            f"{n1}x{n2} paper physics, 40 timepoints, "
            f"{n_iterations} iters, guard=auto, f64 CPU"
        ),
        "design_dim": int(flat0.size),
        "n_constraints": int(stacked(flat0).shape[0]),
        "objective_initial": initial_obj,
        "mma": {
            "objective_final": mma_obj,
            "max_violation": mma_viol,
            "seconds": round(t_mma, 1),
        },
        "slsqp": {
            "objective_final": slsqp_obj,
            "max_violation": slsqp_viol,
            "seconds": round(t_slsqp, 1),
            "n_evaluations": nev[0],
            "status": res.message,
        },
        "mma_over_slsqp": round(mma_obj / slsqp_obj, 4) if slsqp_obj else None,
    }
    _save(record)


def oracle_eval(guarded: bool = False):
    """CPU f64 odeint re-evaluation of the flagship-optimized design.

    Appends objective_f64_odeint (+ rel err vs the recorded f32 fixed-step
    value) to the artifact's flagship section: if the two agree, the
    optimizer's gains are physics, not integrator gaming.
    """

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    from bench import build_flagship

    key = "flagship_guarded" if guarded else "flagship"
    data = np.load(REPO / f"MMA_{key.upper()}_DESIGN.npz")
    design = tuple(data[k] for k in data.files)
    optimization, _ = build_flagship(method="odeint")
    v64 = float(optimization.objective_fn(design))
    record = _load()
    f32 = record[key]["objective_best"]
    record[key]["objective_best_f64_odeint"] = v64
    record[key]["f32_vs_f64_rel_err"] = abs(f32 - v64) / abs(v64)
    _save(record)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--guarded", action="store_true")
    ap.add_argument("--crosscheck", action="store_true")
    ap.add_argument("--oracle-eval", action="store_true")
    ap.add_argument("--iters", type=int, default=None)
    args = ap.parse_args()
    if args.flagship:
        flagship(args.iters or 80, guarded=args.guarded)
    if args.crosscheck:
        crosscheck(args.iters or 40)
    if args.oracle_eval:
        oracle_eval(guarded=args.guarded)
    if not (args.flagship or args.crosscheck or args.oracle_eval):
        raise SystemExit(
            "pass --flagship (TPU), --crosscheck (CPU), and/or --oracle-eval"
        )
