"""Fixed-step time integrators inside ``lax.scan`` with checkpointed adjoint.

TPU-first design
----------------
The reference integrates with ``jax.experimental.ode.odeint`` (adaptive
Dormand-Prince with a continuous adjoint; reference difflexmm/dynamics.py:166).
On TPU we want the whole trajectory inside one XLA program with static
shapes, so the primary path here is a fixed-step Runge-Kutta stepping inside
a nested ``lax.scan``:

- outer scan over output intervals (the requested ``timepoints``),
- inner scan over ``n_substeps`` integration steps per interval,
- the inner segment wrapped in ``jax.checkpoint``: reverse-mode AD stores
  only the per-interval states and recomputes inside each segment — a
  discrete checkpointed adjoint with O(T + n_substeps) memory instead of
  O(T * n_substeps).

``method="odeint"`` delegates to ``jax.experimental.ode.odeint`` for parity
runs against the reference numerics.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def rk4_step(rhs: Callable, y, t, dt, args):
    """Classic fourth-order Runge-Kutta step."""

    half = dt / 2
    k1 = rhs(y, t, *args)
    k2 = rhs(jax.tree.map(lambda a, b: a + half * b, y, k1), t + half, *args)
    k3 = rhs(jax.tree.map(lambda a, b: a + half * b, y, k2), t + half, *args)
    k4 = rhs(jax.tree.map(lambda a, b: a + dt * b, y, k3), t + dt, *args)
    return jax.tree.map(
        lambda a, b1, b2, b3, b4: a + dt / 6 * (b1 + 2 * b2 + 2 * b3 + b4),
        y, k1, k2, k3, k4,
    )


def semi_implicit_euler_step(rhs: Callable, y, t, dt, args):
    """Symplectic (semi-implicit) Euler for second-order systems.

    Expects states shaped (2, ...) = (position, velocity) and an rhs whose
    first component is the velocity. Velocity updates first, then position
    uses the new velocity. First order but exactly symplectic for
    Hamiltonian systems; robust for long weakly-damped runs.
    """

    dy = rhs(y, t, *args)
    v_new = y[1] + dt * dy[1]
    u_new = y[0] + dt * v_new
    return jnp.stack([u_new, v_new])


_FIXED_STEPPERS = {
    "rk4": rk4_step,
    "semi_implicit": semi_implicit_euler_step,
}


def integrate(
    rhs: Callable,
    y0,
    timepoints: jnp.ndarray,
    args=(),
    method: str = "rk4",
    n_substeps: int = 64,
    checkpoint: bool = True,
    rtol: float = 1e-8,
    atol: float = 1e-8,
):
    """Integrate ``dy/dt = rhs(y, t, *args)``, returning states at timepoints.

    Args:
        rhs: odeint-style right-hand side.
        y0: initial state (array or pytree for fixed-step methods).
        timepoints: (T,) evaluation times (first entry is the initial time).
        method: "rk4", "semi_implicit", or "odeint".
        n_substeps: fixed integration steps per output interval.
        checkpoint: rematerialize each interval on the backward pass.
        rtol/atol: tolerances for the odeint backend only.

    Returns:
        Pytree of stacked states with leading axis T (including y0).
    """

    if method == "odeint":
        from jax.experimental.ode import odeint

        return odeint(rhs, y0, timepoints, *args, rtol=rtol, atol=atol)

    step = _FIXED_STEPPERS[method]

    def interval(y, bounds):
        t0, t1 = bounds
        dt = (t1 - t0) / n_substeps

        def substep(y, i):
            return step(rhs, y, t0 + i * dt, dt, args), None

        y, _ = lax.scan(substep, y, jnp.arange(n_substeps))
        return y, y

    seg = jax.checkpoint(interval) if checkpoint else interval
    _, ys = lax.scan(seg, y0, (timepoints[:-1], timepoints[1:]))
    return jax.tree.map(
        lambda first, rest: jnp.concatenate([first[None], rest]), y0, ys
    )


def estimate_stable_dt(k_max, m_min, safety: float = 0.2) -> jnp.ndarray:
    """Conservative stable step for explicit RK on a stiffness-k, mass-m mode.

    RK4's stability interval on the imaginary axis is ~2.8/omega; ``safety``
    keeps a wide margin for nonlinearity and contact stiffening.
    """

    omega = jnp.sqrt(k_max / m_min)
    return safety * 2.8 / omega


def substeps_for(timepoints, k_max, m_min, safety: float = 0.2) -> int:
    """Number of substeps per output interval for a stable explicit run."""

    dt_out = (timepoints[-1] - timepoints[0]) / (len(timepoints) - 1)
    dt = estimate_stable_dt(k_max, m_min, safety)
    return max(1, int(jnp.ceil(dt_out / dt)))


integrate_rk4 = partial(integrate, method="rk4")
