"""Optimizer tests: MMA on constrained analytic problems, optax loop."""

import jax
import jax.numpy as jnp

from difflexmm_tpu.optim import naive_gd, run_mma, run_optimization_optax


def test_mma_unconstrained_quadratic():
    target = jnp.array([1.0, -2.0, 0.5])

    def f_and_g(x):
        return jax.value_and_grad(lambda z: jnp.sum((z - target) ** 2))(x)

    x0 = jnp.zeros(3)
    x, hist = run_mma(
        f_and_g, x0, xmin=-5 * jnp.ones(3), xmax=5 * jnp.ones(3), n_iterations=40
    )
    assert jnp.allclose(x, target, atol=1e-3)
    assert hist["objective_values"][-1] < hist["objective_values"][0]


def test_mma_constrained_projection():
    """min (x-1)^2 + (y-2)^2 s.t. x + y <= 2, 0 <= x,y <= 3 -> (0.5, 1.5)."""

    def f_and_g(x):
        return jax.value_and_grad(lambda z: (z[0] - 1) ** 2 + (z[1] - 2) ** 2)(x)

    def cons(x):
        fi = jnp.array([x[0] + x[1] - 2.0])
        dfi = jnp.array([[1.0, 1.0]])
        return fi, dfi

    x, hist = run_mma(
        f_and_g,
        jnp.array([0.0, 0.0]),
        xmin=jnp.zeros(2),
        xmax=3 * jnp.ones(2),
        n_iterations=60,
        constraints_and_jac=cons,
    )
    assert jnp.allclose(x, jnp.array([0.5, 1.5]), atol=5e-3)
    assert x[0] + x[1] <= 2.0 + 1e-6


def test_mma_active_bound():
    """min (x+1)^2 with 0 <= x <= 3 -> x = 0 (bound active)."""

    def f_and_g(x):
        return jax.value_and_grad(lambda z: jnp.sum((z + 1) ** 2))(x)

    x, _ = run_mma(
        f_and_g, jnp.array([2.0]), xmin=jnp.zeros(1), xmax=3 * jnp.ones(1),
        n_iterations=30,
    )
    assert jnp.allclose(x, 0.0, atol=1e-6)


def test_mma_maximize():
    def f_and_g(x):
        return jax.value_and_grad(lambda z: -jnp.sum((z - 2.0) ** 2))(x)

    x, _ = run_mma(
        f_and_g, jnp.zeros(2), xmin=-5 * jnp.ones(2), xmax=5 * jnp.ones(2),
        n_iterations=40, maximize=True,
    )
    assert jnp.allclose(x, 2.0, atol=1e-3)


def test_mma_many_constraints():
    """n=20 variables, m=40 box-halfspace constraints x_j <= 0.3."""

    n = 20
    A = jnp.concatenate([jnp.eye(n), -jnp.eye(n)])
    ub = jnp.concatenate([0.3 * jnp.ones(n), 0.3 * jnp.ones(n)])  # |x_j| <= 0.3

    def f_and_g(x):
        return jax.value_and_grad(lambda z: jnp.sum((z - 1.0) ** 2))(x)

    def cons(x):
        return A @ x - ub, A

    x, _ = run_mma(
        f_and_g, jnp.zeros(n), xmin=-2 * jnp.ones(n), xmax=2 * jnp.ones(n),
        n_iterations=60, constraints_and_jac=cons,
    )
    assert jnp.allclose(x, 0.3, atol=5e-3)


def test_optax_loop_with_bounds():
    def objective(tree):
        return -jnp.sum((tree["a"] - 0.7) ** 2)  # maximize -> a = 0.7

    result = run_optimization_optax(
        objective,
        {"a": jnp.zeros(4)},
        n_iterations=400,
        maximize=True,
        lower_bound=0.0,
        upper_bound=0.5,
    )
    assert jnp.allclose(result.design["a"], 0.5, atol=1e-3)  # clipped at bound
    assert len(result.objective_values) == 400


def test_optax_loop_with_pytree_bounds():
    """Per-leaf bound pytrees (e.g. design0 +/- delta) clip independently."""

    def objective(tree):
        a, b = tree
        return -jnp.sum((a - 1.0) ** 2) - jnp.sum((b + 1.0) ** 2)

    design0 = (jnp.zeros(3), jnp.zeros(2))
    result = run_optimization_optax(
        objective,
        design0,
        n_iterations=400,
        maximize=True,
        lower_bound=jax.tree.map(lambda x: x - 0.25, design0),
        upper_bound=jax.tree.map(lambda x: x + 0.25, design0),
    )
    assert jnp.allclose(result.design[0], 0.25, atol=1e-3)   # clipped up
    assert jnp.allclose(result.design[1], -0.25, atol=1e-3)  # clipped down


def test_naive_gd():
    def oag(x):
        return jax.value_and_grad(lambda z: jnp.sum(z**2))(x)

    x, vals, _ = naive_gd(oag, jnp.ones(3), n_iterations=200, learning_rate=0.1)
    assert jnp.allclose(x, 0.0, atol=1e-6)
    assert vals[-1] < vals[0]


def test_run_mma_trust_region_recovers_from_nonfinite():
    """A step into a region where the objective is non-finite (fixed-step
    solver instability in real problems) is bisected back and, if still
    bad, rejected entirely with a shrunken move limit - the run continues
    instead of raising."""

    import numpy as np
    from difflexmm_tpu.optim.mma import run_mma

    # Quadratic bowl with a "stability wall": nan beyond x > 0.6.
    def objective_and_grad(x):
        value = jnp.sum((x - 1.0) ** 2)
        bad = jnp.any(x > 0.6)
        value = jnp.where(bad, jnp.nan, value)
        grad = jnp.where(bad, jnp.nan, 2.0 * (x - 1.0))
        return value, grad

    x0 = jnp.zeros((3,))
    x_final, history = run_mma(
        objective_and_grad,
        x0,
        xmin=-2.0 * jnp.ones(3),
        xmax=2.0 * jnp.ones(3),
        n_iterations=25,
        move_limit=0.5,
    )
    values = np.asarray(history["objective_values"])
    assert np.all(np.isfinite(values))
    # Converges toward the wall (x -> 0.6-), improving on the start.
    assert values[-1] < values[0]
    assert np.all(np.asarray(x_final) <= 0.6 + 1e-9)
    assert float(jnp.max(x_final)) > 0.45  # actually approached the wall


def test_run_mma_returns_last_evaluated_iterate():
    """run_mma must return the last EVALUATED design (history's last
    entry), not the final un-evaluated proposal - restarts and best-forward
    solves depend on it."""

    import numpy as np
    from difflexmm_tpu.optim.mma import run_mma

    def objective_and_grad(x):
        return jnp.sum(x**2), 2.0 * x

    x_final, history = run_mma(
        objective_and_grad,
        jnp.ones((2,)),
        xmin=-2.0 * jnp.ones(2),
        xmax=2.0 * jnp.ones(2),
        n_iterations=5,
        move_limit=0.3,
    )
    assert np.allclose(
        np.asarray(x_final), np.asarray(history["design_values"][-1])
    )
