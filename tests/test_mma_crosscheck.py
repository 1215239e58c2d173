"""MMA-vs-SLSQP optimizer cross-validation (VERDICT r3 missing #2).

The full-size evidence is MMA_FLAGSHIP.json (tools/mma_flagship.py):
the 80-iteration paper-budget run on TPU plus a scipy SLSQP cross-check on
a downsized constrained focusing problem. This test pins the cross-check
live at a smaller config: both optimizers run the SAME jitted objective
and constraint functions with the same bounds; both must land feasible
designs that clearly improve the objective, with final values in the same
ballpark (the problem is nonconvex, so bit-level agreement is not the
contract — "neither optimizer is broken or wildly behind" is).

The forward problem runs with guard="auto": without it both optimizers
exploit designs outside the fixed-step integrator's stability region
(finite-garbage objectives of 1e7+ from numerical blow-up that are
geometrically feasible), and the comparison measures integrator gaming
instead of optimization quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.flatten_util import ravel_pytree

from difflexmm_tpu.models.quads_focusing import (
    ForwardProblem,
    OptimizationProblem,
)
from difflexmm_tpu.optim.mma import run_mma

SPACING = 15.0  # mm (paper units)


@pytest.fixture(scope="module")
def problem():
    # Downsized paper physics (see bench.paper_config): 6x5 blocks,
    # truncated output window at the identical step size.
    frequency = 30.0
    density = 6.18e-9
    k_shear = 1.19
    problem = ForwardProblem(
        n1_blocks=6, n2_blocks=5, spacing=SPACING,
        bond_length=0.15 * SPACING,
        k_stretch=120.0, k_shear=k_shear, k_rot=1.50,
        density=density,
        damping=0.0186 * 2 * (0.36125 * density * SPACING**2 * k_shear) ** 0.5,
        use_contact=True, k_contact=1.50,
        min_angle=-15 * jnp.pi / 180, cutoff_angle=-10 * jnp.pi / 180,
        amplitude=0.5 * SPACING, loading_rate=frequency,
        input_delay=0.1 / frequency,
        n_excited_blocks=2, loaded_side="left", input_shift=0,
        simulation_time=(2 / frequency) * (24 / 199),
        n_timepoints=25, n_substeps=10,
        method="verlet", guard="auto",
        n_blocks_clamped_corner=1,
    )
    optimization = OptimizationProblem(
        problem, target_size=(2, 2), target_shift=(1, 1)
    )
    optimization.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(
        25 * jnp.pi / 180
    )
    return optimization, design


@pytest.mark.slow
def test_mma_matches_slsqp_on_downsized_problem(problem):
    from scipy.optimize import minimize

    optimization, design = problem
    bounds = (-0.35 * SPACING, 0.35 * SPACING)
    flat0, unflatten = ravel_pytree(design)
    objective_and_grad = jax.jit(
        jax.value_and_grad(lambda x: optimization.objective_fn(unflatten(x)))
    )
    fns = [
        fn
        for _, fn in optimization._design_constraints(0.0, 0.0, 0.05 * SPACING)
    ]

    def stacked(x):
        return jnp.concatenate([fn(unflatten(x)) for fn in fns])

    constraints_and_jac = jax.jit(
        lambda x: (stacked(x), jax.jacobian(stacked)(x))
    )

    n_iters = 12
    x_mma, _ = run_mma(
        objective_and_grad, flat0,
        jnp.full_like(flat0, bounds[0]), jnp.full_like(flat0, bounds[1]),
        n_iters, constraints_and_jac=constraints_and_jac,
        maximize=True, move_limit=0.08,
    )
    mma_obj = float(objective_and_grad(x_mma)[0])
    mma_viol = float(jnp.max(stacked(x_mma)))

    def f(x):
        v, g = objective_and_grad(jnp.asarray(x))
        return -float(v), -np.asarray(g, dtype=np.float64)

    res = minimize(
        f, np.asarray(flat0), jac=True, method="SLSQP",
        bounds=[bounds] * flat0.size,
        constraints=[{
            "type": "ineq",
            "fun": lambda x: -np.asarray(
                constraints_and_jac(jnp.asarray(x))[0], dtype=np.float64
            ),
            "jac": lambda x: -np.asarray(
                constraints_and_jac(jnp.asarray(x))[1], dtype=np.float64
            ),
        }],
        options={"maxiter": n_iters, "ftol": 1e-10},
    )
    slsqp_obj = float(objective_and_grad(jnp.asarray(res.x))[0])
    slsqp_viol = float(jnp.max(stacked(jnp.asarray(res.x))))

    initial = float(objective_and_grad(flat0)[0])
    assert initial > 0
    # Both feasible (SLSQP is allowed a hair of slack at its ftol).
    assert mma_viol <= 1e-8, mma_viol
    assert slsqp_viol <= 1e-6, slsqp_viol
    # Both genuinely optimize...
    assert mma_obj > 1.5 * initial, (mma_obj, initial)
    assert slsqp_obj > 1.2 * initial, (slsqp_obj, initial)
    # ... and MMA is never meaningfully BEHIND SLSQP. (At the full-size
    # cross-check, MMA_FLAGSHIP.json, MMA lands 53.6x AHEAD — SLSQP
    # terminates early with 'Singular matrix E' on the 888-constraint
    # problem, which is why the reference uses MMA for this class — so
    # only the lower side is pinned.)
    assert mma_obj > 0.5 * slsqp_obj, (mma_obj, slsqp_obj)
