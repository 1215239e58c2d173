"""Measure the reference implementation's baseline: CPU float64 seconds per
fwd+adjoint evaluation of the paper's flagship quads-focusing objective.

This executes BASELINE.md's measurement protocol with the *unmodified*
reference code from /root/reference (jax-md/nlopt satisfied by the thin API
shims in tools/refshim). The timed quantity is exactly the per-iteration hot
path of the reference's MMA loop — ``jit(value_and_grad(objective_fn))``
(reference problems/quads_focusing.py:565) — at the paper configuration
(notebooks/quads_focusing_3dp_pla_shims.ipynb cell 8: 24x16 quads, units
mm/N/s, 200 timepoints, adaptive odeint atol=1e-4).

Writes BASELINE_MEASURED.json at the repo root, including the objective value
and gradient norm so the TPU build can cross-validate against the reference's
numbers on identical physics.

Usage:
    python tools/measure_reference_baseline.py           # full paper config
    python tools/measure_reference_baseline.py --smoke   # tiny validation run
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools" / "refshim"))
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402

# The sitecustomize axon plugin clobbers JAX_PLATFORMS; the reference is a
# CPU float64 code (its pyproject has no GPU deps; tests enable x64).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax import value_and_grad, jit, flatten_util  # noqa: E402


def build_paper_problem(smoke=False):
    from problems.quads_focusing import ForwardProblem, OptimizationProblem
    from difflexmm.geometry import QuadGeometry

    # Paper config: notebooks/quads_focusing_3dp_pla_shims.ipynb cell 8.
    # Smoke must be at least 8x8: on smaller lattices the corner clamps
    # overlap the driven blocks and (clamps being scattered last) zero the
    # drive entirely — a reference quirk, not a harness bug.
    n1_blocks, n2_blocks = (8, 8) if smoke else (24, 16)
    spacing = 15.0  # mm
    hinge_length = 0.15 * spacing
    initial_angle = 25 * jnp.pi / 180
    k_stretch = 120.0  # N/mm
    k_shear = 1.19  # N/mm
    k_rot = 1.50  # N mm
    density = 6.18e-9  # Mg/mm^2
    damping = 0.0186 * jnp.array([
        2 * (0.36125 * density * spacing**2 * k_shear) ** 0.5,
        2 * (0.36125 * density * spacing**2 * k_shear) ** 0.5,
        2 * (0.02175026 * density * spacing**4 * k_rot) ** 0.5,
    ]) * jnp.ones((n1_blocks * n2_blocks, 3))
    frequency = 30.0  # Hz

    problem = ForwardProblem(
        n1_blocks=n1_blocks,
        n2_blocks=n2_blocks,
        spacing=spacing,
        bond_length=hinge_length,
        k_stretch=k_stretch,
        k_shear=k_shear,
        k_rot=k_rot,
        density=density,
        damping=damping,
        use_contact=True,
        k_contact=k_rot,
        min_angle=-15 * jnp.pi / 180,
        cutoff_angle=-10 * jnp.pi / 180,
        amplitude=0.5 * spacing,
        loading_rate=frequency,
        input_delay=0.1 / frequency,
        n_excited_blocks=2,
        loaded_side="left",
        input_shift=0,
        simulation_time=2 / frequency,
        n_timepoints=20 if smoke else 200,
        atol=1e-4,
        name="baseline_measurement",
    )
    optimization = OptimizationProblem(
        forward_problem=problem,
        target_size=(2, 2),
        target_shift=(1, 1) if smoke else (4, 5),
    )
    optimization.setup_objective()
    design = QuadGeometry(
        n1_blocks, n2_blocks, spacing=spacing, bond_length=hinge_length
    ).get_design_from_rotated_square(angle=initial_angle)
    return optimization, design


def main():
    smoke = "--smoke" in sys.argv
    t_setup = time.perf_counter()
    optimization, design = build_paper_problem(smoke=smoke)
    objective_and_grad = jit(value_and_grad(optimization.objective_fn))

    t0 = time.perf_counter()
    value, grad = objective_and_grad(design)
    jax.block_until_ready((value, grad))
    t_first = time.perf_counter() - t0
    print(f"first eval (incl. compile): {t_first:.1f} s, objective={value}",
          flush=True)

    n_reps = 3 if smoke else 2
    times = []
    for i in range(n_reps):
        t0 = time.perf_counter()
        value, grad = objective_and_grad(design)
        jax.block_until_ready((value, grad))
        times.append(time.perf_counter() - t0)
        print(f"eval {i + 1}/{n_reps}: {times[-1]:.1f} s", flush=True)

    # Forward-only solve timing (the other BASELINE.json config).
    solve = jit(lambda d: optimization.forward_problem.solve(d).fields)
    fields = solve(design)
    jax.block_until_ready(fields)
    t0 = time.perf_counter()
    fields = solve(design)
    jax.block_until_ready(fields)
    t_fwd = time.perf_counter() - t0

    grad_flat = flatten_util.ravel_pytree(grad)[0]
    result = {
        "config": "paper flagship (quads_focusing_3dp_pla_shims cell 8)"
        if not smoke else "smoke (6x4)",
        "lattice": [optimization.forward_problem.n1_blocks,
                    optimization.forward_problem.n2_blocks],
        "n_timepoints": optimization.forward_problem.n_timepoints,
        "atol": optimization.forward_problem.atol,
        "device": str(jax.devices()[0]),
        "dtype": "float64",
        "fwd_adjoint_seconds_per_iteration": sum(times) / len(times),
        "fwd_adjoint_seconds_all": times,
        "first_eval_seconds_incl_compile": t_first,
        "fwd_only_seconds": t_fwd,
        "objective_value": float(value),
        "grad_norm": float(jnp.linalg.norm(grad_flat)),
        "total_harness_seconds": time.perf_counter() - t_setup,
    }
    out = REPO / ("BASELINE_MEASURED_smoke.json" if smoke
                  else "BASELINE_MEASURED.json")
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2), flush=True)


if __name__ == "__main__":
    main()
