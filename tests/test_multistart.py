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


def test_multistart_mma_matches_sequential():
    """Batched constrained MMA == a loop of sequential run_mma restarts
    (identical update math; per-candidate trust-region scales)."""

    import numpy as np
    from difflexmm_tpu.optim.mma import run_mma
    from difflexmm_tpu.parallel import run_multistart_mma

    # Constrained quadratic: min ||x - t||^2 s.t. sum(x) <= 1.
    target = jnp.array([1.0, 0.8, -0.2])

    def objective_and_grad(x):
        return jnp.sum((x - target) ** 2), 2.0 * (x - target)

    def constraints_and_jac(x):
        return (jnp.sum(x) - 1.0)[None], jnp.ones((1, 3))

    designs = jnp.stack([jnp.zeros(3), 0.3 * jnp.ones(3), -0.5 * jnp.ones(3)])
    xmin, xmax = -2.0 * jnp.ones(3), 2.0 * jnp.ones(3)

    result = run_multistart_mma(
        objective_and_grad, designs, xmin, xmax, n_iterations=40,
        constraints_and_jac=constraints_and_jac, move_limit=0.3,
    )
    assert result.objective_values.shape == (40, 3)
    assert not result.rejected.any()

    for b in range(3):
        x_seq, hist = run_mma(
            objective_and_grad, designs[b], xmin, xmax, n_iterations=40,
            constraints_and_jac=lambda x: constraints_and_jac(x),
            move_limit=0.3,
        )
        assert np.allclose(np.asarray(result.designs[b]), np.asarray(x_seq),
                           atol=1e-12), b
        assert np.allclose(np.asarray(result.objective_values[:, b]),
                           np.asarray(hist["objective_values"]), atol=1e-12)

    # Feasible (asymptotically) at the constraint surface.
    assert float(jnp.sum(result.best_design)) <= 1.0 + 1e-3


def test_multistart_mma_sharded_matches_vmap():
    from difflexmm_tpu.parallel import run_multistart_mma

    def objective_and_grad(x):
        v = jnp.sum((x - 1.5) ** 2)
        return v, 2.0 * (x - 1.5)

    designs = jnp.linspace(-1.0, 1.0, 8)[:, None] * jnp.ones((8, 4))
    xmin, xmax = -2.0 * jnp.ones(4), 2.0 * jnp.ones(4)
    r_vmap = run_multistart_mma(
        objective_and_grad, designs, xmin, xmax, n_iterations=30
    )
    r_mesh = run_multistart_mma(
        objective_and_grad, designs, xmin, xmax, n_iterations=30,
        mesh=make_mesh(),
    )
    assert jnp.allclose(r_vmap.objective_values, r_mesh.objective_values)
    assert jnp.allclose(r_vmap.designs, r_mesh.designs)


def test_multistart_mma_rejects_nonfinite_candidates():
    """A candidate stepping past a stability wall retreats per-candidate
    while the others advance unaffected."""

    from difflexmm_tpu.parallel import run_multistart_mma

    def objective_and_grad(x):
        v = jnp.sum((x - 1.0) ** 2)
        bad = jnp.any(x > 0.6)
        return jnp.where(bad, jnp.nan, v), jnp.where(bad, jnp.nan, 2 * (x - 1.0))

    designs = jnp.stack([jnp.zeros(2), jnp.full((2,), -1.5)])
    result = run_multistart_mma(
        objective_and_grad, designs, -2.0 * jnp.ones(2), 2.0 * jnp.ones(2),
        n_iterations=25, move_limit=0.5,
    )
    assert result.rejected.any()
    assert jnp.all(jnp.isfinite(result.objective_values[-1]))
    assert jnp.all(result.designs <= 0.6 + 1e-9)
    # Both candidates still approached the wall.
    assert jnp.all(jnp.max(result.designs, axis=1) > 0.4)


@pytest.mark.slow
def test_multistart_mma_on_simulation():
    """Batched constrained restarts on a tiny focusing problem, vs the
    sequential restart workflow (reference random_initial_guess pattern,
    problems/quads_focusing.py:546-649)."""

    import numpy as np
    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )
    from difflexmm_tpu.optim.loops import ravel_pytree
    from difflexmm_tpu.optim.mma import run_mma
    from difflexmm_tpu.parallel import run_multistart_mma

    problem = ForwardProblem(
        n1_blocks=5, n2_blocks=5, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.15, loading_rate=2.0, input_delay=0.0,
        n_excited_blocks=2, loaded_side="left",
        n_blocks_clamped_corner=1,  # clamps clear of driven rows on 5x5
        simulation_time=2.0, n_timepoints=5, n_substeps=12,
        method="verlet_ckpt",
    )
    opt = OptimizationProblem(problem, target_size=(2, 2))
    opt.setup_objective()
    base = problem.geometry.get_design_from_rotated_square(0.25)
    flat0, unflatten = ravel_pytree(base)

    def objective_and_grad(x):
        v, g = jax.value_and_grad(lambda xx: opt.objective_fn(unflatten(xx)))(x)
        return v, g

    constraint = opt.forward_problem.geometry  # noqa: F841 (geometry built)
    fns = opt._design_constraints(0.0, 0.0, 0.05, False)
    stacked = lambda x: jnp.concatenate([fn(unflatten(x)) for _, fn in fns])
    constraints_and_jac = lambda x: (stacked(x), jax.jacobian(stacked)(x))

    B = 3
    key = jax.random.PRNGKey(2)
    designs = flat0[None] + 0.01 * jax.random.normal(key, (B, flat0.size))
    xmin = jnp.full_like(flat0, -0.3)
    xmax = jnp.full_like(flat0, 0.3)

    result = run_multistart_mma(
        objective_and_grad, designs, xmin, xmax, n_iterations=2,
        constraints_and_jac=constraints_and_jac, maximize=True,
        move_limit=0.1,
    )
    assert result.objective_values.shape == (2, B)
    assert jnp.all(jnp.isfinite(result.objective_values))

    # Candidate 0 must match a sequential run_mma restart exactly.
    x_seq, hist = run_mma(
        jax.jit(objective_and_grad), designs[0], xmin, xmax, n_iterations=2,
        constraints_and_jac=jax.jit(constraints_and_jac), maximize=True,
        move_limit=0.1,
    )
    assert np.allclose(
        np.asarray(result.objective_values[:, 0]),
        np.asarray(hist["objective_values"]), rtol=1e-12,
    )
    assert np.allclose(np.asarray(result.designs[0]), np.asarray(x_seq),
                       atol=1e-10)


@pytest.mark.slow
def test_model_level_multistart_mma():
    """OptimizationProblem.run_multistart_mma: the restart workflow through
    the model layer, histories wired for compute_best_forward."""

    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    problem = ForwardProblem(
        n1_blocks=5, n2_blocks=5, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.15, loading_rate=2.0, input_delay=0.0,
        n_excited_blocks=2, loaded_side="left",
        n_blocks_clamped_corner=1,  # clamps clear of driven rows on 5x5
        simulation_time=2.0, n_timepoints=5, n_substeps=12,
        method="verlet_ckpt",
    )
    opt = OptimizationProblem(problem, target_size=(2, 2))
    opt.setup_objective()
    base = problem.geometry.get_design_from_rotated_square(0.25)
    guesses = [
        jax.tree.map(lambda x, s=s: x * s, tuple(base))
        for s in (1.0, 0.95, 1.05)
    ]
    result = opt.run_multistart_mma(
        guesses, n_iterations=2, lower_bound=-0.3, upper_bound=0.3,
        min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
        move_limit=0.1,
    )
    assert result.objective_values.shape == (2, 3)
    assert jnp.all(jnp.isfinite(result.objective_values))
    # Histories stay index-aligned: ONE (value, design) pair per
    # multistart call; full curves live on the result.
    assert len(opt.objective_values) == 1
    assert len(opt.design_values) == 1
    solution = opt.compute_best_forward()
    assert jnp.all(jnp.isfinite(solution.fields))


def test_multistart_mma_raises_on_nonfinite_initial_candidate():
    """Parity with run_mma's iteration-0 guard: a candidate whose initial
    evaluation is non-finite fails loudly instead of silently returning
    an unoptimized design."""

    from difflexmm_tpu.parallel import run_multistart_mma

    def objective_and_grad(x):
        v = jnp.sum(x**2)
        bad = jnp.any(x > 0.5)
        return jnp.where(bad, jnp.nan, v), jnp.where(bad, jnp.nan, 2 * x)

    designs = jnp.stack([jnp.zeros(2), jnp.ones(2)])  # candidate 1 starts bad
    with pytest.raises(FloatingPointError, match=r"candidate\(s\) \[1\]"):
        run_multistart_mma(
            objective_and_grad, designs, -2.0 * jnp.ones(2),
            2.0 * jnp.ones(2), n_iterations=5,
        )


def test_population_value_and_grad_chunked_matches_straight():
    """Backward chunking (population_value_and_grad grad_chunk) is a pure
    scheduling change: values and per-candidate gradients must match the
    single whole-population vjp bit-for-bit-ish (same math, different
    loop nesting)."""

    from difflexmm_tpu.parallel.multistart import population_value_and_grad

    def objective(x):
        return jnp.sum(jnp.sin(x["a"])) * jnp.sum(x["b"] ** 2)

    key = jax.random.PRNGKey(1)
    designs = {
        "a": jax.random.normal(key, (8, 5)),
        "b": jax.random.normal(jax.random.PRNGKey(2), (8, 3)),
    }
    v0, g0 = population_value_and_grad(objective, designs, grad_chunk=None)
    v1, g1 = population_value_and_grad(objective, designs, grad_chunk=2)
    assert jnp.allclose(v0, v1, rtol=1e-12)
    for l0, l1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert jnp.allclose(l0, l1, rtol=1e-12)
    # auto on a small population = single vjp (no chunking surprises)
    v2, g2 = population_value_and_grad(objective, designs)
    assert jnp.array_equal(v0, v2)
    # indivisible chunk falls back to the single vjp
    v3, _ = population_value_and_grad(objective, designs, grad_chunk=3)
    assert jnp.array_equal(v0, v3)


def test_reevaluate_finalists_reranks():
    from difflexmm_tpu.parallel import reevaluate_finalists

    # Screening picks candidates 4, 3, 2 (values 40, 30, 20); the truth
    # objective inverts their order, so the re-ranked winner is index 2.
    designs = {"a": jnp.arange(5.0)}
    screen = jnp.array([0.0, 10.0, 20.0, 30.0, 40.0])

    def truth(d):
        return -d["a"]  # smaller index is better under the truth

    res = reevaluate_finalists(truth, designs, screen, k=3, maximize=True)
    assert list(res.indices) == [4, 3, 2]
    assert jnp.allclose(res.values, jnp.array([-4.0, -3.0, -2.0]))
    assert jnp.allclose(res.screen_values, jnp.array([40.0, 30.0, 20.0]))
    assert int(res.best_index) == 2
    assert float(res.best_design["a"]) == 2.0


def test_reevaluate_finalists_nan_handling():
    from difflexmm_tpu.parallel import reevaluate_finalists

    # NaN screening values rank last (blown-up unguarded solves only enter
    # the finalist set if fewer than k candidates survived); NaN truth
    # values never win.
    designs = {"a": jnp.arange(4.0)}
    screen = jnp.array([jnp.nan, 1.0, 2.0, jnp.nan])

    def truth(d):
        # candidate 2 (the screening winner) turns out non-finite under
        # the guarded/oracle objective; candidate 1 must win.
        return jnp.where(d["a"] == 2.0, jnp.nan, d["a"])

    res = reevaluate_finalists(truth, designs, screen, k=2, maximize=True)
    assert set(map(int, res.indices)) == {1, 2}
    assert int(res.best_index) == 1

    # k larger than the population clips; minimize mode ranks accordingly.
    res = reevaluate_finalists(
        lambda d: d["a"], designs, screen, k=10, maximize=False
    )
    assert res.indices.shape == (4,)
    assert int(res.best_index) == 0  # truth value 0.0 is the minimum

