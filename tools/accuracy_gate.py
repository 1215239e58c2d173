"""Accuracy gate for the headline benchmark config.

Runs on CPU float64 and validates, at the *paper* flagship configuration
(24x16 quads, 200 timepoints — the exact physics measured for
BASELINE_MEASURED.json):

1. cross-code parity — our solver with the odeint backend (atol=1e-4, the
   reference's optimization tolerance) reproduces the reference
   implementation's objective value recorded in BASELINE_MEASURED.json;
2. integrator resolution — sweep of the fixed-step Verlet ``n_substeps``
   against the odeint objective/gradient, so the benchmark's substep count is
   chosen from data (VERDICT round 1, weak #1).

Writes ACCURACY.json at the repo root.

Usage: python tools/accuracy_gate.py [--substeps 5 10 15 20 30]
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def rel_err(a, b):
    return float(abs(a - b) / max(abs(b), 1e-30))


def grad_rel_err(ga, gb):
    fa = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(ga)])
    fb = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(gb)])
    return float(jnp.linalg.norm(fa - fb) / jnp.maximum(jnp.linalg.norm(fb), 1e-30))


def main():
    from bench import build_flagship

    substeps = [int(a) for a in sys.argv[1:] if a.isdigit()] or [5, 10, 15, 20, 30]

    measured = json.loads((REPO / "BASELINE_MEASURED.json").read_text())

    # Reference-tolerance odeint oracle (our framework, odeint backend).
    optimization, design = build_flagship(method="odeint")
    vg = jax.jit(jax.value_and_grad(optimization.objective_fn))
    t0 = time.perf_counter()
    v_ode, g_ode = vg(design)
    jax.block_until_ready(v_ode)
    print(f"odeint oracle: objective={float(v_ode):.9f} "
          f"({time.perf_counter() - t0:.0f} s incl. compile)", flush=True)

    cross_code = rel_err(float(v_ode), measured["objective_value"])
    print(f"cross-code parity vs reference odeint: rel err {cross_code:.2e}",
          flush=True)

    sweep = {}
    for n in substeps:
        optimization, design = build_flagship(method="verlet", n_substeps=n)
        vg = jax.jit(jax.value_and_grad(optimization.objective_fn))
        t0 = time.perf_counter()
        v, g = vg(design)
        jax.block_until_ready(v)
        sweep[n] = {
            "objective": float(v),
            "objective_rel_err": rel_err(float(v), float(v_ode)),
            "grad_rel_err": grad_rel_err(g, g_ode),
            "seconds_incl_compile": time.perf_counter() - t0,
        }
        print(f"n_substeps={n}: obj rel err {sweep[n]['objective_rel_err']:.2e}, "
              f"grad rel err {sweep[n]['grad_rel_err']:.2e}", flush=True)

    result = {
        "config": "paper flagship (24x16, 200 timepoints, f64 CPU)",
        "reference_objective": measured["objective_value"],
        "our_odeint_objective": float(v_ode),
        "cross_code_objective_rel_err": cross_code,
        "verlet_substep_sweep": sweep,
    }
    (REPO / "ACCURACY.json").write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
