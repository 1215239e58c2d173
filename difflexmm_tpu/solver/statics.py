"""Static equilibrium solver with implicit-function-theorem gradients.

Finds block displacements where internal elastic forces balance external
loads and driven-boundary constraints: ``r(u) = -dE/du + f_ext(u) = 0`` on
the free DOFs, via damped Newton iterations with a backtracking line
search. Differentiation does NOT unroll the Newton loop: a ``custom_vjp``
solves one adjoint linear system ``J^T lambda = u_bar`` at the equilibrium
(the implicit function theorem), so gradients cost one extra dense solve
regardless of how many Newton steps the forward took.

The reference repository has no static solver — quasi-static paths there
integrate heavily damped *dynamics* to steady state (e.g. the
displacement-controlled ramps of reference problems/
hinge_characterization.py:39-132 and the static precompression stage of
problems/quads_kinetic_energy_static_tuning.py:188-196). A Newton solve
reaches the same equilibrium in a handful of dense linear solves — MXU
work, not thousands of sequential integrator substeps — and its adjoint is
a single transpose solve instead of a reverse time integration.

TPU-first notes
---------------
- State stays dense masked (n_blocks, 3) like the dynamic solver; the
  Newton system keeps static shape by filling constrained rows/columns of
  the Jacobian with identity (their residual entries are identically zero,
  so the step is exactly zero there) — no free-DOF index reduction.
- Everything (Newton loop, line search, adjoint solve) is jit-compatible
  ``lax.while_loop`` control flow; the only sequential axis is the Newton
  iteration count, typically < 20.
"""

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.ops.assembly import constrain_energy
from difflexmm_tpu.ops.kinematics import build_constrained_kinematics
from difflexmm_tpu.ops.loading import build_loading
from difflexmm_tpu.utils.types import ControlParams

_EMPTY_PAIRS = np.zeros((0, 2), dtype=np.int64)


def setup_static_solver(
    geometry,
    energy_fn: Callable,
    loaded_block_DOF_pairs=None,
    loading_fn: Optional[Callable] = None,
    constrained_block_DOF_pairs=_EMPTY_PAIRS,
    constrained_DOFs_fn: Callable = lambda t, **kwargs: 0.0,
    n_newton_steps: int = 40,
    tol: Optional[float] = None,
    n_backtrack: int = 30,
    nan_on_failure: bool = True,
):
    """Set up the static solver.

    Args mirror :func:`difflexmm_tpu.solver.dynamics.setup_dynamic_solver`
    (loads scatter onto [block, DOF] pairs; driven constraints come from
    ``constrained_DOFs_fn(t, **constraint_params)`` — ``t`` here is just the
    load-path parameter, e.g. a ramp amplitude).

    Returns:
        ``solve_static(u_guess, t, control_params) -> (n_blocks, 3)``
        equilibrium displacement (driven DOFs hold their constraint values),
        differentiable w.r.t. ``t`` and everything in ``control_params``
        through the implicit adjoint. The function exposes:

        - ``solve_static.residual(u, t, control_params)`` — the free-DOF
          force residual field (diagnostic; its inf-norm at the solution is
          the convergence certificate);
        - ``solve_static.reactions(u_eq, t, control_params)`` —
          (n_constrained,) reaction forces conjugate to the driven DOFs
          (internal minus external force on each constrained [block, DOF]),
          the quantity force–displacement experiments measure.

        With ``nan_on_failure`` (default), a solve whose residual does not
        reach 10x the tolerance returns NaN displacements instead of a
        silent non-equilibrium — e.g. when a large driven displacement
        collapses a bond to zero length at the initial guess. Ramp ``t``
        in warm-started increments for such load paths (see
        models/hinge_characterization.py ``method="static"``).
    """

    n_blocks = geometry if isinstance(geometry, int) else geometry.n_blocks
    kinematics = build_constrained_kinematics(
        n_blocks,
        constrained_block_DOF_pairs=constrained_block_DOF_pairs,
        constrained_DOFs_fn=constrained_DOFs_fn,
    )
    dof_set = kinematics.dof_set
    constrained_energy = constrain_energy(energy_fn, kinematics)
    free_mask = dof_set.free_mask

    if loaded_block_DOF_pairs is not None and loading_fn is not None:
        _loading = build_loading(n_blocks, loaded_block_DOF_pairs, loading_fn)
    else:
        def _loading(state, t, loading_params):
            return jnp.zeros(3)

    potential_force = jax.grad(
        lambda u, t, cp: -constrained_energy(u, t, cp), argnums=0
    )

    def residual(free_DOFs, t, control_params: ControlParams) -> jnp.ndarray:
        """Out-of-balance force on the free DOFs, (n_blocks, 3)."""

        u_full = kinematics(free_DOFs, t, control_params.constraint_params)
        state = jnp.stack([u_full, jnp.zeros_like(u_full)])
        f_ext = _loading(state, t, control_params.loading_params)
        return (potential_force(free_DOFs, t, control_params) + f_ext) * free_mask

    n_dofs = 3 * n_blocks
    flat_mask = free_mask.reshape(-1)

    def newton_matrix(free_DOFs, t, control_params):
        """Dense residual Jacobian with identity fill on constrained DOFs."""

        J = jax.jacfwd(
            lambda f: residual(f.reshape(n_blocks, 3), t, control_params)
        )(free_DOFs.reshape(-1)).reshape(n_dofs, n_dofs)
        # Constrained rows/cols of J vanish (the mask kills them); the fill
        # makes the system nonsingular while forcing a zero step there.
        return J - jnp.diag(1.0 - flat_mask)

    def _newton(free0, t, control_params):
        u0 = (jnp.asarray(free0).reshape(n_blocks, 3) * free_mask).reshape(-1)
        # Default tolerance tracks the working precision: 1e-10 is
        # unreachable in float32, where Newton bottoms out near ~1e-6.
        eff_tol = tol if tol is not None else (
            1e-10 if u0.dtype == jnp.float64 else 1e-6
        )

        def norm(r):
            return jnp.max(jnp.abs(r))

        def cond(carry):
            u, rnorm, it, stalled = carry
            return (rnorm > eff_tol) & (it < n_newton_steps) & (~stalled)

        def body(carry):
            u, rnorm, it, _ = carry
            r = residual(u.reshape(n_blocks, 3), t, control_params).reshape(-1)
            A = newton_matrix(u, t, control_params)
            step = jnp.linalg.solve(A, -r)

            # Backtracking on the residual norm: accept the first halved
            # step that decreases it (NaN residuals — e.g. a trial step
            # across a contact barrier — compare false and are rejected).
            def bt_cond(c):
                alpha, accepted, k = c
                return (~accepted) & (k < n_backtrack)

            def bt_body(c):
                alpha, _, k = c
                trial = residual(
                    (u + alpha * step).reshape(n_blocks, 3), t, control_params
                )
                ok = norm(trial.reshape(-1)) < rnorm
                return jnp.where(ok, alpha, alpha * 0.5), ok, k + 1

            alpha, accepted, _ = jax.lax.while_loop(
                bt_cond,
                bt_body,
                (jnp.asarray(1.0, u.dtype), jnp.asarray(False), jnp.asarray(0)),
            )
            u_new = jnp.where(accepted, u + alpha * step, u)
            r_new = residual(
                u_new.reshape(n_blocks, 3), t, control_params
            ).reshape(-1)
            return u_new, norm(r_new), it + 1, ~accepted

        r0 = residual(u0.reshape(n_blocks, 3), t, control_params).reshape(-1)
        u_star, rnorm, n_it, _ = jax.lax.while_loop(
            cond, body, (u0, norm(r0), jnp.asarray(0), jnp.asarray(False))
        )
        return u_star.reshape(n_blocks, 3)

    @jax.custom_vjp
    def _solve_free(free0, t, control_params):
        return _newton(free0, t, control_params)

    def _solve_free_fwd(free0, t, control_params):
        free_star = _newton(free0, t, control_params)
        return free_star, (free0, free_star, t, control_params)

    def _solve_free_bwd(res, cotangent):
        free0, free_star, t, control_params = res
        A = newton_matrix(free_star.reshape(-1), t, control_params)
        cot = (cotangent * free_mask).reshape(-1)
        lam = jnp.linalg.solve(A.T, cot)
        # r(u*, t, theta) = 0  =>  du*/dtheta = -J^{-1} dr/dtheta, so the
        # parameter cotangent is the residual vjp at -lambda.
        _, vjp_fn = jax.vjp(
            lambda tt, cp: residual(free_star, tt, cp), t, control_params
        )
        t_bar, cp_bar = vjp_fn(-lam.reshape(n_blocks, 3))
        # Equilibrium does not depend on the initial guess; the cotangent
        # must match the GUESS's aval (callers may pass a flat vector).
        return jnp.zeros_like(free0), t_bar, cp_bar

    _solve_free.defvjp(_solve_free_fwd, _solve_free_bwd)

    def solve_static(u_guess, t, control_params: ControlParams) -> jnp.ndarray:
        free_star = _solve_free(jnp.asarray(u_guess), t, control_params)
        if nan_on_failure:
            # A stalled Newton (e.g. a NaN residual at the initial guess —
            # driven DOFs collapsing a bond to zero length — or a descent
            # failure) would otherwise silently return a non-equilibrium:
            # poison the output instead so the failure is loud downstream.
            # One extra residual evaluation; grads flow through the
            # converged branch only.
            rnorm = jnp.max(jnp.abs(
                residual(free_star.reshape(n_blocks, 3), t, control_params)
            ))
            eff_tol = tol if tol is not None else (
                1e-10 if free_star.dtype == jnp.float64 else 1e-6
            )
            ok = (rnorm < 10 * eff_tol) & jnp.all(jnp.isfinite(free_star))
            free_star = jnp.where(ok, free_star, jnp.nan)
        return kinematics(free_star, t, control_params.constraint_params)

    raw_force = jax.grad(lambda u, cp: energy_fn(u, cp), argnums=0)

    def reactions(u_eq, t, control_params: ControlParams) -> jnp.ndarray:
        state = jnp.stack([u_eq, jnp.zeros_like(u_eq)])
        f_ext = _loading(state, t, control_params.loading_params)
        f_int = raw_force(u_eq, control_params)
        return dof_set.gather_constrained(f_int - f_ext)

    solve_static.residual = residual
    solve_static.reactions = reactions
    solve_static.dof_set = dof_set
    return solve_static
