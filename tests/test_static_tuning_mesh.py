"""Static-tuning scenarios sharded over the virtual device mesh.

Locks the BASELINE config: static pre-compression chained into dynamics,
scenario-parallel objective over the mesh (the reference's pmap pattern),
gradient through the sharded objective.
"""

import jax
import pytest
import jax.numpy as jnp

from difflexmm_tpu.models.quads_static_tuning import (
    ForwardInput,
    ForwardProblem,
    OptimizationProblem,
)
from difflexmm_tpu.parallel import make_mesh


def _problem():
    return ForwardProblem(
        n1_blocks=5,
        n2_blocks=5,
        spacing=1.0,
        bond_length=0.1,
        k_stretch=1.0,
        k_shear=0.02,
        k_rot=1e-3,
        density=1.0,
        damping=0.1,
        n_excited_blocks=1,
        simulation_time_dynamic=1.5,
        n_timepoints=5,
        n_timepoints_static=5,
        n_substeps=16,
        method="verlet",
    )


@pytest.mark.slow
def test_static_tuning_sharded_objective_matches_vmap():
    problem = _problem()
    problem.setup()
    design = problem.geometry.get_design_from_rotated_square(0.25)

    n = 8
    forward_input = ForwardInput(
        *design,
        amplitude=tuple(0.05 + 0.01 * i for i in range(n)),
        loading_rate=(2.0,) * n,
        compressive_strain=tuple(0.01 + 0.005 * i for i in range(n)),
        compressive_strain_rate=(0.05,) * n,
    )
    targets = tuple((1, 1) for _ in range(n))
    shifts = tuple((0, 0) for _ in range(n))
    weights = tuple(1.0 if i % 2 == 0 else -0.5 for i in range(n))

    opt_vmap = OptimizationProblem(
        problem, forward_input, targets, shifts, weights
    )
    opt_vmap.setup_objective()
    value_vmap, grad_vmap = jax.jit(jax.value_and_grad(opt_vmap.objective_fn))(design)

    opt_mesh = OptimizationProblem(
        problem, forward_input, targets, shifts, weights
    )
    opt_mesh.setup_objective(mesh=make_mesh())
    value_mesh, grad_mesh = jax.jit(jax.value_and_grad(opt_mesh.objective_fn))(design)

    assert jnp.allclose(value_mesh, value_vmap, rtol=1e-10)
    for a, b in zip(jax.tree.leaves(grad_mesh), jax.tree.leaves(grad_vmap)):
        assert jnp.allclose(a, b, rtol=1e-8, atol=1e-12)
