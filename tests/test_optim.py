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


def test_run_mma_rejected_iterations_are_flagged():
    """Fully rejected steps re-log the last accepted iterate; the history
    tags them so convergence plots / resume logic can skip duplicates."""

    import numpy as np
    from difflexmm_tpu.optim.mma import run_mma

    def objective_and_grad(x):
        value = jnp.sum((x - 1.0) ** 2)
        bad = jnp.any(x > 0.3)
        value = jnp.where(bad, jnp.nan, value)
        grad = jnp.where(bad, jnp.nan, 2.0 * (x - 1.0))
        return value, grad

    _, history = run_mma(
        objective_and_grad,
        jnp.zeros((2,)),
        xmin=-2.0 * jnp.ones(2),
        xmax=2.0 * jnp.ones(2),
        n_iterations=12,
        move_limit=0.5,
        max_backtracks=0,  # force full rejections at the wall
    )
    rejected = np.asarray(history["rejected"])
    assert len(rejected) == len(history["objective_values"])
    assert rejected.any()
    # A rejected iteration duplicates the previous accepted entry.
    values = history["objective_values"]
    for i in np.nonzero(rejected)[0]:
        if i > 0:
            assert values[i] == values[i - 1]


def test_run_mma_max_seconds_stops_early():
    """Wall-clock cap (parity with nlopt opt.set_maxtime): the loop stops
    between iterations and reports it in the history."""

    import time
    from difflexmm_tpu.optim.mma import run_mma

    def slow_objective_and_grad(x):
        time.sleep(0.05)
        return jnp.sum(x**2), 2.0 * x

    t0 = time.monotonic()
    _, history = run_mma(
        slow_objective_and_grad,
        jnp.ones((2,)),
        xmin=-2.0 * jnp.ones(2),
        xmax=2.0 * jnp.ones(2),
        n_iterations=10_000,
        move_limit=0.3,
        max_seconds=0.5,
    )
    elapsed = time.monotonic() - t0
    assert history.get("stopped_early") == "max_seconds"
    assert 0 < len(history["objective_values"]) < 10_000
    assert elapsed < 30  # stopped promptly (allowing jit compile time)


def test_mma_dual_kkt_residual_on_ill_conditioned_constraints():
    """The fixed-budget projected-Adam dual solve must actually converge:
    on a large, ill-conditioned constraint set the accepted subproblem
    solution must satisfy the KKT conditions of the ORIGINAL problem at the
    converged iterate (stationarity via the multipliers, primal
    feasibility, complementary slackness) — not just look plausible."""

    import numpy as np
    from difflexmm_tpu.optim.mma import run_mma

    n, m = 60, 500
    rng = np.random.default_rng(0)
    # Ill-conditioned jacobian: exponentially decaying row scales across
    # 8 orders of magnitude plus many nearly-parallel rows.
    A = rng.normal(size=(m, n))
    A[m // 2:] = A[: m - m // 2] + 1e-4 * rng.normal(size=(m - m // 2, n))
    scales = np.logspace(0, -8, m)[:, None]
    A = jnp.asarray(A * scales)
    b = jnp.asarray(np.abs(rng.normal(size=m)) * scales[:, 0])
    target = jnp.asarray(rng.normal(size=n)) * 2.0

    def objective_and_grad(x):
        return 0.5 * jnp.sum((x - target) ** 2), x - target

    def constraints_and_jac(x):
        return A @ x - b, A

    xmin, xmax = -5.0 * jnp.ones(n), 5.0 * jnp.ones(n)
    x, hist = run_mma(
        objective_and_grad, jnp.zeros(n), xmin, xmax, n_iterations=200,
        constraints_and_jac=constraints_and_jac, move_limit=0.5,
    )
    x = jnp.asarray(x)

    # Primal feasibility at the returned iterate (1e-4 of the O(1) top
    # constraint scale; without the in-update row normalization this
    # stalls at ~3e-3 no matter the iteration budget).
    fi = A @ x - b
    assert float(jnp.max(fi)) < 1e-4, float(jnp.max(fi))

    # KKT stationarity: grad f + A^T lam = 0 on the active set's span,
    # with lam >= 0 recovered by nonnegative least squares on the active
    # constraints (tolerance-active). If the dual solve had not converged,
    # the iterate would sit strictly interior in a direction of descent.
    g = np.asarray(x - target)
    act = np.asarray(fi) > -1e-5
    at_lower = np.asarray(x) < -5.0 + 1e-9
    at_upper = np.asarray(x) > 5.0 - 1e-9
    if act.any():
        Aact = np.asarray(A)[act]
        lam, *_ = np.linalg.lstsq(Aact.T, -g, rcond=None)
        resid = g + Aact.T @ lam
        # Residual only needs to vanish on coordinates not pinned by bounds.
        free = ~(at_lower | at_upper)
        rel = np.linalg.norm(resid[free]) / max(np.linalg.norm(g), 1e-12)
        assert rel < 5e-3, rel
    else:
        # Interior: plain stationarity (clipped by bounds).
        free = ~(at_lower | at_upper)
        assert np.linalg.norm(g[free]) < 1e-4

    # The run must have improved monotonically-ish to a better value than
    # the unconstrained projection would suggest it skipped.
    values = np.asarray(hist["objective_values"])
    assert values[-1] <= values[0]


def test_run_mma_fused_matches_host_loop():
    """The on-device chunked-scan driver must reproduce the host loop's
    trajectory (identical update math; only last-bit XLA fusion
    differences between the traced scan and the eager per-iteration
    path are allowed)."""

    import numpy as np
    from difflexmm_tpu.optim.mma import run_mma, run_mma_fused

    def objective_and_grad(x):
        return jax.value_and_grad(
            lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2
        )(x)

    def constraints_and_jac(x):
        stacked = lambda z: jnp.array([z[0] + z[1] - 2.0])
        return stacked(x), jax.jacobian(stacked)(x)

    x0 = jnp.zeros((2,))
    lo, hi = -5.0 * jnp.ones(2), 5.0 * jnp.ones(2)
    for kwargs in (
        dict(),
        dict(constraints_and_jac=constraints_and_jac),
    ):
        x_host, h_host = run_mma(
            objective_and_grad, x0, lo, hi, 23, **kwargs
        )
        # chunk=7 exercises the ragged last chunk (23 = 3*7 + 2).
        x_dev, h_dev = run_mma_fused(
            objective_and_grad, x0, lo, hi, 23, chunk=7, **kwargs
        )
        np.testing.assert_allclose(
            np.asarray(x_host), np.asarray(x_dev), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(h_host["objective_values"]),
            np.asarray(h_dev["objective_values"]),
            rtol=1e-5, atol=1e-6,
        )
        assert len(h_dev["design_values"]) == 23
        assert len(h_dev["constraints_violation"]) == 23
        np.testing.assert_allclose(
            np.asarray(x_dev), np.asarray(h_dev["design_values"][-1])
        )


def test_run_mma_fused_rejects_nonfinite_steps_on_device():
    """The device loop's full-reject branch: a step over the stability
    wall retreats to the last accepted iterate (flagged in the history)
    and the run keeps improving instead of raising."""

    import numpy as np
    from difflexmm_tpu.optim.mma import run_mma_fused

    def objective_and_grad(x):
        value = jnp.sum((x - 1.0) ** 2)
        bad = jnp.any(x > 0.6)
        value = jnp.where(bad, jnp.nan, value)
        grad = jnp.where(bad, jnp.nan, 2.0 * (x - 1.0))
        return value, grad

    x_final, history = run_mma_fused(
        objective_and_grad,
        jnp.zeros((3,)),
        xmin=-2.0 * jnp.ones(3),
        xmax=2.0 * jnp.ones(3),
        n_iterations=25,
        move_limit=0.5,
        chunk=6,
    )
    values = np.asarray(history["objective_values"])
    assert np.all(np.isfinite(values))
    assert np.asarray(history["rejected"]).any()
    assert values[-1] < values[0]
    assert np.all(np.asarray(x_final) <= 0.6 + 1e-9)
    assert float(jnp.max(jnp.asarray(x_final))) > 0.45


def test_run_mma_fused_raises_on_bad_initial_design():
    import pytest
    from difflexmm_tpu.optim.mma import run_mma_fused

    def objective_and_grad(x):
        return jnp.nan * jnp.sum(x), jnp.nan * x

    with pytest.raises(FloatingPointError, match="iteration 0"):
        run_mma_fused(
            objective_and_grad,
            jnp.ones((2,)),
            xmin=-2.0 * jnp.ones(2),
            xmax=2.0 * jnp.ones(2),
            n_iterations=4,
        )


def test_run_mma_fused_callback_and_max_seconds():
    import time

    from difflexmm_tpu.optim.mma import run_mma_fused

    seen = []

    def objective_and_grad(x):
        return jnp.sum(x**2), 2.0 * x

    _, history = run_mma_fused(
        objective_and_grad,
        jnp.ones((2,)),
        xmin=-2.0 * jnp.ones(2),
        xmax=2.0 * jnp.ones(2),
        n_iterations=9,
        chunk=4,
        callback=lambda it, x, v, viol, fi: seen.append(
            (it, float(v), fi.shape)
        ),
    )
    assert [s[0] for s in seen] == list(range(9))
    assert all(s[2] == (0,) for s in seen)  # unconstrained: empty fi

    t0 = time.monotonic()
    _, history = run_mma_fused(
        objective_and_grad,
        jnp.ones((2,)),
        xmin=-2.0 * jnp.ones(2),
        xmax=2.0 * jnp.ones(2),
        n_iterations=10_000,
        chunk=2,
        callback=lambda *a: time.sleep(0.05),
        max_seconds=0.5,
    )
    assert history.get("stopped_early") == "max_seconds"
    assert 0 < len(history["objective_values"]) < 10_000
    assert time.monotonic() - t0 < 30


def test_mma_feasibility_restoration_at_termination():
    """nlopt-parity feasibility: a run terminated while still infeasible
    gets constraint-only restoration iterations; the returned design
    satisfies max(fi) <= feasibility_tol and the history records the
    restoration (one extra, re-evaluated entry)."""

    import numpy as np
    from difflexmm_tpu.optim.mma import run_mma, run_mma_fused

    def objective_and_grad(x):
        return jax.value_and_grad(lambda z: jnp.sum((z - 2.0) ** 2))(x)

    def constraints_and_jac(x):
        stacked = lambda z: jnp.array([z[0] + z[1] - 2.0])
        return stacked(x), jax.jacobian(stacked)(x)

    tol = 1e-6
    for driver, kwargs in (
        (run_mma, {}),
        (run_mma_fused, dict(chunk=2)),
    ):
        # Infeasible start + 2 iterations: terminates violated.
        x_final, history = driver(
            objective_and_grad,
            jnp.array([2.0, 2.0]),
            xmin=-5.0 * jnp.ones(2),
            xmax=5.0 * jnp.ones(2),
            n_iterations=2,
            constraints_and_jac=constraints_and_jac,
            move_limit=0.05,  # small steps: can't reach feasibility in 2
            feasibility_tol=tol,
            **kwargs,
        )
        record = history["restoration"]
        assert record["violation_before"] > tol
        assert record["iterations"] >= 1
        assert record["violation_after"] <= tol
        fi, _ = constraints_and_jac(jnp.asarray(x_final))
        assert float(jnp.max(fi)) <= tol
        # The restored design was re-evaluated and appended.
        assert len(history["objective_values"]) == 3
        assert np.allclose(
            np.asarray(history["design_values"][-1]), np.asarray(x_final)
        )
        # Already-feasible runs are untouched (no extra entry).
        x2, h2 = driver(
            objective_and_grad,
            jnp.zeros(2),
            xmin=-5.0 * jnp.ones(2),
            xmax=5.0 * jnp.ones(2),
            n_iterations=3,
            constraints_and_jac=constraints_and_jac,
            feasibility_tol=1e-3,
            **kwargs,
        )
        assert h2["restoration"]["iterations"] == 0
        assert len(h2["objective_values"]) == 3
