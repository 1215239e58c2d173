"""Batched multi-start optimization tests (vmap and mesh-sharded)."""

import jax
import pytest
import jax.numpy as jnp

from difflexmm_tpu.parallel import (
    make_mesh,
    random_initial_designs,
    run_multistart_optax,
)


def test_multistart_analytic():
    # Multimodal objective: candidates converge to different optima; the
    # best is reported.
    def objective(x):
        return -jnp.sum((x["a"] ** 2 - 1.0) ** 2)  # maxima at a = +-1

    base = {"a": jnp.zeros(3)}
    designs = random_initial_designs(jax.random.PRNGKey(0), base, 8, scale=0.5)
    result = run_multistart_optax(
        objective, designs, n_iterations=300, maximize=True
    )
    assert result.objective_values.shape == (300, 8)
    assert jnp.allclose(jnp.abs(result.best_design["a"]), 1.0, atol=1e-2)
    # Objectives improved for every candidate
    assert jnp.all(result.objective_values[-1] >= result.objective_values[0])


def test_multistart_sharded_matches_vmap():
    def objective(x):
        return -jnp.sum((x - 2.0) ** 2)

    designs = jnp.linspace(-1.0, 1.0, 8)[:, None] * jnp.ones((8, 4))
    r_vmap = run_multistart_optax(objective, designs, n_iterations=50)
    r_mesh = run_multistart_optax(
        objective, designs, n_iterations=50, mesh=make_mesh()
    )
    assert jnp.allclose(r_vmap.objective_values, r_mesh.objective_values)
    assert jnp.allclose(r_vmap.best_design, r_mesh.best_design)


@pytest.mark.slow
def test_multistart_on_simulation():
    """Batched multi-start on a real (tiny) focusing problem."""

    from difflexmm_tpu.models.quads_focusing import ForwardProblem, OptimizationProblem

    problem = ForwardProblem(
        n1_blocks=6, n2_blocks=6, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.15, loading_rate=2.0, input_delay=0.0,
        n_excited_blocks=2, loaded_side="left",
        simulation_time=2.0, n_timepoints=6, n_substeps=16,
    )
    opt = OptimizationProblem(problem, target_size=(2, 2))
    opt.setup_objective()
    base = problem.geometry.get_design_from_rotated_square(0.25)
    designs = random_initial_designs(jax.random.PRNGKey(1), base, 4, scale=0.02)

    result = run_multistart_optax(
        opt.objective_fn, designs, n_iterations=3,
        lower_bound=-0.3, upper_bound=0.3,
    )
    assert result.objective_values.shape == (3, 4)
    assert jnp.all(jnp.isfinite(result.objective_values))
    assert jax.tree.structure(result.best_design) == jax.tree.structure(base)
