"""Headline benchmark: forward+adjoint wall-clock per optimization iteration
on the canonical quads-focusing problem (24x16 lattice, 200 timepoints —
the paper's problem size, BASELINE.md row 2).

Baseline: the reference runs JAX-on-CPU (float64, adaptive odeint) at
<= 6 min per fwd+adjoint+constraints MMA iteration for its published
results (BASELINE.md: 80 iterations under an 8 h cap). We use 360 s/iter as
the baseline number; vs_baseline = 360 / our_seconds_per_iteration.

Prints ONE JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


BASELINE_SECONDS_PER_ITERATION = 360.0


def build_flagship(method=None):
    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    if method is None:
        # Compiled Pallas kernels need a real TPU; elsewhere (e.g. a CPU
        # compile check) the XLA verlet path is the drop-in equivalent.
        method = (
            "verlet_pallas" if jax.default_backend() == "tpu" else "verlet"
        )

    problem = ForwardProblem(
        n1_blocks=24,
        n2_blocks=16,
        spacing=1.0,
        bond_length=0.1,
        k_stretch=1.0,
        k_shear=0.02,
        k_rot=1e-3,
        density=1.0,
        damping=0.02,
        amplitude=0.2,
        loading_rate=0.5,  # pulse spans ~2 lattice transit units
        input_delay=0.0,
        n_excited_blocks=4,
        loaded_side="left",
        input_shift=0,
        # Wave speed ~ spacing*sqrt(k/m) ~ 1.1: the pulse crosses the
        # half-lattice to the central target and keeps ringing.
        simulation_time=20.0,
        n_timepoints=200,
        n_substeps=10,
        method=method,
    )
    optimization = OptimizationProblem(problem, target_size=(3, 3))
    optimization.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(0.25)
    return optimization, design


def _measure(method=None):
    optimization, design = build_flagship(method)
    value_and_grad = jax.jit(jax.value_and_grad(optimization.objective_fn))

    # Compile (excluded from the measurement).
    val, grad = value_and_grad(design)
    jax.block_until_ready((val, grad))

    n_reps = 3
    t0 = time.perf_counter()
    for _ in range(n_reps):
        val, grad = value_and_grad(design)
        jax.block_until_ready((val, grad))
    return (time.perf_counter() - t0) / n_reps


def main():
    try:
        seconds_per_iteration = _measure()
    except Exception as error:  # pragma: no cover - environment safety net
        # If the Pallas path ever fails to compile in a new environment,
        # still report the XLA verlet number rather than nothing.
        sys.stderr.write(f"bench: default path failed ({error}); "
                         f"falling back to method='verlet'\n")
        seconds_per_iteration = _measure("verlet")

    print(
        json.dumps(
            {
                "metric": "quads_focusing_fwd_adjoint_seconds_per_opt_iteration",
                "value": round(seconds_per_iteration, 4),
                "unit": "s",
                "vs_baseline": round(
                    BASELINE_SECONDS_PER_ITERATION / seconds_per_iteration, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.stderr.write(f"bench device: {jax.devices()[0]}\n")
    main()
