"""Numerical regression fixtures: golden objective/gradient values.

The BASELINE.json north star asks for stable objectives across changes;
these fixtures pin the end-to-end pipeline (geometry -> grid energy ->
verlet solver -> target-KE objective -> adjoint) to values recorded on the
float64 CPU path. A drift beyond 1e-9 relative means the physics changed —
intentional changes must update the goldens with a note.
"""

import jax
import jax.numpy as jnp

from difflexmm_tpu.models.quads_focusing import ForwardProblem, OptimizationProblem

GOLDEN_OBJECTIVE = 0.00018378665130556898
GOLDEN_GRADNORM = 0.0017117756136895744


def test_quads_focusing_objective_regression():
    problem = ForwardProblem(
        n1_blocks=6,
        n2_blocks=6,
        spacing=1.0,
        bond_length=0.1,
        k_stretch=1.0,
        k_shear=0.02,
        k_rot=1e-3,
        density=1.0,
        damping=0.02,
        amplitude=0.15,
        loading_rate=2.0,
        input_delay=0.0,
        n_excited_blocks=2,
        loaded_side="left",
        input_shift=0,
        simulation_time=3.0,
        n_timepoints=16,
        n_substeps=24,
        method="verlet",
    )
    opt = OptimizationProblem(problem, target_size=(2, 2))
    opt.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(0.25)

    value = opt.objective_fn(design)
    grad = jax.grad(opt.objective_fn)(design)
    gradnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grad)))

    assert jnp.allclose(value, GOLDEN_OBJECTIVE, rtol=1e-9), float(value)
    assert jnp.allclose(gradnorm, GOLDEN_GRADNORM, rtol=1e-8), float(gradnorm)
