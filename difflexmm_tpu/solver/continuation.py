"""Differentiable arc-length (Riks) continuation for snap-through paths.

Traces full equilibrium branches ``(u(s), lambda(s))`` of
``r(u, lambda) = -dE/du + f_ext(u, lambda) = 0`` — *through* limit points —
where ``lambda`` is a scalar load factor parametrizing both the external
loads and the driven boundary constraints. Snap-through and snap-back
instabilities of bistable/multistable units are the canonical flexible-
metamaterial phenomena; neither plain Newton statics (diverges at the fold)
nor the reference's quasi-static damped dynamics (jumps dynamically across
the fold, losing the unstable branch entirely — reference
problems/hinge_characterization.py:39-132 ramps are its only quasi-static
mechanism) can recover the full path, including the unstable segment that
sets the energy barrier between stable wells.

Method: predictor-corrector with Riks' normal-plane corrector. At each
accepted point the path tangent comes from one bordered linear solve (the
border row is the previous tangent, so the system stays nonsingular at
folds and the orientation is continuous); the predictor steps ``ds`` along
it; the corrector runs Newton on the augmented residual
``[r(u, lambda); t . (x - x_pred)]`` with a backtracking line search
(NaN-safe across contact barriers, like solver/statics.py).

Differentiability: the corrector is a ``jax.custom_vjp`` whose backward pass
solves ONE transposed augmented system (the implicit function theorem on the
bordered equations) — gradients of an entire traced path w.r.t. design,
stiffness, or load pattern cost one extra linear solve per continuation
step, never an unrolled Newton iteration. The step loop is a ``lax.scan``,
so whole-path objectives (limit loads, energy barriers, branch shapes) are
reverse-differentiable and jit/vmap-compatible for batched design studies.

TPU-first notes mirror solver/statics.py: dense masked state, static-shape
bordered solves (MXU work), ``lax.while_loop`` correctors.
"""

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.ops.assembly import constrain_energy
from difflexmm_tpu.ops.kinematics import build_constrained_kinematics
from difflexmm_tpu.ops.loading import build_loading
from difflexmm_tpu.utils.types import ControlParams

_EMPTY_PAIRS = np.zeros((0, 2), dtype=np.int64)


class ContinuationPath(NamedTuple):
    """An equilibrium branch traced by arc-length continuation.

    Leading axis = continuation step (element 0 is the converged starting
    point). ``stability_eig`` is the smallest eigenvalue of the symmetrized
    free-DOF tangent stiffness (negative on unstable segments); filled with
    ``nan`` when stability was not requested.
    """

    displacement: jnp.ndarray  # (n_steps + 1, n_blocks, 3)
    load_factor: jnp.ndarray  # (n_steps + 1,)
    converged: jnp.ndarray  # (n_steps + 1,) bool
    residual_norm: jnp.ndarray  # (n_steps + 1,)
    stability_eig: jnp.ndarray  # (n_steps + 1,)


def fold_points(path: ContinuationPath):
    """Indices i where the load factor direction reverses between steps
    i-1 -> i -> i+1 (limit points). Host-side convenience."""

    lam = np.asarray(path.load_factor)
    d = np.sign(np.diff(lam))
    return np.nonzero(d[1:] * d[:-1] < 0)[0] + 1


def setup_arclength_solver(
    geometry,
    energy_fn: Callable,
    loaded_block_DOF_pairs=None,
    loading_fn: Optional[Callable] = None,
    constrained_block_DOF_pairs=_EMPTY_PAIRS,
    constrained_DOFs_fn: Callable = lambda t, **kwargs: 0.0,
    n_corrector_steps: int = 25,
    tol: Optional[float] = None,
    n_backtrack: int = 25,
    lambda_scale: float = 1.0,
):
    """Set up the arc-length path tracer.

    Args mirror :func:`difflexmm_tpu.solver.statics.setup_static_solver`,
    with the static solver's load-path parameter ``t`` promoted to the
    continuation variable ``lambda``: ``loading_fn(state, lambda, **params)``
    and ``constrained_DOFs_fn(lambda, **params)`` both see the CURRENT load
    factor, so force control, displacement control, and mixed control all
    trace through the same machinery (a snap-BACK under displacement control
    is a fold in exactly the same sense as a snap-THROUGH under force
    control).

    ``lambda_scale`` weights the load factor in the arc-length metric
    ``||du||^2 + lambda_scale^2 * dlambda^2`` (match it to the DOF scale
    when loads and displacements live on very different scales).

    Returns:
        ``trace_path(u0, lambda0, ds, n_steps, control_params,
        compute_stability=False) -> ContinuationPath``. ``ds > 0`` starts in
        the direction of increasing ``lambda``; steps whose corrector fails
        to converge keep the previous point and flag ``converged=False``
        (shrink ``ds`` and re-trace). The function exposes
        ``trace_path.residual(u, lam, control_params)`` on the full
        (n_blocks, 3) state as a diagnostic.
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
    flat_mask = free_mask.reshape(-1)
    n_dofs = 3 * n_blocks
    psi2 = float(lambda_scale) ** 2

    if loaded_block_DOF_pairs is not None and loading_fn is not None:
        _loading = build_loading(n_blocks, loaded_block_DOF_pairs, loading_fn)
    else:
        def _loading(state, lam, loading_params):
            return jnp.zeros(3)

    potential_force = jax.grad(
        lambda u, lam, cp: -constrained_energy(u, lam, cp), argnums=0
    )

    def residual_field(u, lam, control_params: ControlParams) -> jnp.ndarray:
        """Out-of-balance force on the free DOFs, (n_blocks, 3)."""

        u_full = kinematics(u, lam, control_params.constraint_params)
        state = jnp.stack([u_full, jnp.zeros_like(u_full)])
        f_ext = _loading(state, lam, control_params.loading_params)
        return (potential_force(u, lam, control_params) + f_ext) * free_mask

    def residual_flat(u_flat, lam, control_params):
        return residual_field(
            u_flat.reshape(n_blocks, 3), lam, control_params
        ).reshape(-1)

    def jac_u(u_flat, lam, control_params):
        """Filled residual Jacobian: identity(-1) on constrained DOFs keeps
        the bordered system nonsingular with an exactly-zero step there."""

        J = jax.jacfwd(residual_flat)(u_flat, lam, control_params)
        return J - jnp.diag(1.0 - flat_mask)

    def jac_lam(u_flat, lam, control_params):
        return jax.jacfwd(residual_flat, argnums=1)(u_flat, lam, control_params)

    def bordered_matrix(u_flat, lam, border_u, border_lam, control_params):
        """[[J, r_lam], [border_u^T, border_lam]] — (n_dofs+1, n_dofs+1)."""

        J = jac_u(u_flat, lam, control_params)
        r_l = jac_lam(u_flat, lam, control_params)
        top = jnp.concatenate([J, r_l[:, None]], axis=1)
        bottom = jnp.concatenate([border_u, border_lam[None]])[None, :]
        return jnp.concatenate([top, bottom], axis=0)

    def tangent(x, t_prev, control_params):
        """Unit path tangent at x = (u_flat, lam), oriented along t_prev.

        One bordered solve: J du + r_lam dlam = 0 with the previous tangent
        as the normalization row (nonsingular at folds, continuous
        orientation)."""

        u_flat, lam = x[:-1], x[-1]
        A = bordered_matrix(
            u_flat, lam, t_prev[:-1], psi2 * t_prev[-1], control_params
        )
        rhs = jnp.zeros(n_dofs + 1).at[-1].set(1.0)
        t = jnp.linalg.solve(A, rhs)
        norm = jnp.sqrt(jnp.sum(t[:-1] ** 2) + psi2 * t[-1] ** 2)
        return t / norm

    def _metric_normal(t):
        """Arc-metric-weighted tangent: the corrector's plane normal."""

        return jnp.concatenate([t[:-1], psi2 * t[-1:]])

    def augmented_residual(x, x_pred, normal, control_params):
        r = residual_flat(x[:-1], x[-1], control_params)
        plane = jnp.dot(normal, x - x_pred)
        return jnp.concatenate([r, plane[None]])

    def _eff_tol(dtype):
        # Default tolerance tracks the working precision: 1e-10 is
        # unreachable in float32, where Newton bottoms out near ~1e-6.
        if tol is not None:
            return tol
        return 1e-10 if dtype == jnp.float64 else 1e-6

    def _corrector_newton(x_pred, normal, control_params):
        eff_tol = _eff_tol(x_pred.dtype)

        def norm_inf(r):
            return jnp.max(jnp.abs(r))

        def cond(carry):
            x, rnorm, it, stalled = carry
            return (rnorm > eff_tol) & (it < n_corrector_steps) & (~stalled)

        def body(carry):
            x, rnorm, it, _ = carry
            R = augmented_residual(x, x_pred, normal, control_params)
            A = bordered_matrix(
                x[:-1], x[-1], normal[:-1], normal[-1], control_params
            )
            step = jnp.linalg.solve(A, -R)

            def bt_cond(c):
                alpha, accepted, k = c
                return (~accepted) & (k < n_backtrack)

            def bt_body(c):
                alpha, _, k = c
                trial = augmented_residual(
                    x + alpha * step, x_pred, normal, control_params
                )
                ok = norm_inf(trial) < rnorm
                return jnp.where(ok, alpha, alpha * 0.5), ok, k + 1

            alpha, accepted, _ = jax.lax.while_loop(
                bt_cond,
                bt_body,
                (jnp.asarray(1.0, x.dtype), jnp.asarray(False), jnp.asarray(0)),
            )
            x_new = jnp.where(accepted, x + alpha * step, x)
            rnorm_new = norm_inf(
                augmented_residual(x_new, x_pred, normal, control_params)
            )
            return x_new, rnorm_new, it + 1, ~accepted

        r0 = norm_inf(
            augmented_residual(x_pred, x_pred, normal, control_params)
        )
        x_star, rnorm, _, _ = jax.lax.while_loop(
            cond, body, (x_pred, r0, jnp.asarray(0), jnp.asarray(False))
        )
        return x_star, rnorm

    @jax.custom_vjp
    def _correct(x_pred, normal, control_params):
        return _corrector_newton(x_pred, normal, control_params)

    def _correct_fwd(x_pred, normal, control_params):
        x_star, rnorm = _corrector_newton(x_pred, normal, control_params)
        return (x_star, rnorm), (x_star, x_pred, normal, control_params)

    def _correct_bwd(res, cotangents):
        x_star, x_pred, normal, control_params = res
        x_bar, _ = cotangents  # rnorm is a diagnostic: no gradient flows
        A = bordered_matrix(
            x_star[:-1], x_star[-1], normal[:-1], normal[-1], control_params
        )
        # Constrained entries of x carry no information (their step is
        # pinned to zero by the fill); drop their cotangents.
        mask = jnp.concatenate([flat_mask, jnp.ones(1)])
        mu = jnp.linalg.solve(A.T, x_bar * mask)
        # R(x*, p) = 0  =>  dx*/dp = -A^{-1} dR/dp: pull -mu back through R's
        # dependence on (x_pred, normal, control_params).
        _, vjp_fn = jax.vjp(
            lambda xp, nrm, cp: augmented_residual(x_star, xp, nrm, cp),
            x_pred,
            normal,
            control_params,
        )
        return vjp_fn(-mu)

    _correct.defvjp(_correct_fwd, _correct_bwd)

    def _stability_eig(u_flat, lam, control_params):
        """Smallest eigenvalue of the symmetrized free tangent stiffness
        (constrained DOFs contribute +1, never the minimum of interest for
        a near-critical structure)."""

        J = jac_u(u_flat, lam, control_params)
        S = -(J + J.T) / 2.0
        # Diagnostic only: stop_gradient keeps eigvalsh off the reverse-AD
        # path of the traced scan (its eigh-based JVP divides by eigenvalue
        # gaps — a degenerate pair on a symmetric lattice would NaN the
        # design gradient of the WHOLE path through inf * 0) and saves the
        # O(n^3) eigendecomposition transpose per step.
        return jnp.linalg.eigvalsh(jax.lax.stop_gradient(S))[0]

    def trace_path(
        u0,
        lambda0,
        ds,
        n_steps: int,
        control_params: ControlParams,
        compute_stability: bool = False,
    ) -> ContinuationPath:
        u0_flat = (
            jnp.asarray(u0).reshape(n_blocks, 3) * free_mask
        ).reshape(-1)
        accept_tol = 10 * _eff_tol(u0_flat.dtype)
        lam0 = jnp.asarray(lambda0, u0_flat.dtype)

        # Land exactly on the curve at lambda = lambda0: a corrector with
        # the plane normal pinned to the lambda axis is a plain Newton
        # static solve at fixed load factor.
        e_lam = jnp.zeros(n_dofs + 1).at[-1].set(1.0)
        x0 = jnp.concatenate([u0_flat, lam0[None]])
        x0, rnorm0 = _correct(x0, e_lam, control_params)
        t0 = tangent(x0, e_lam, control_params)  # oriented: dlambda > 0

        def maybe_eig(x):
            if not compute_stability:
                return jnp.asarray(jnp.nan, x.dtype)
            return _stability_eig(x[:-1], x[-1], control_params)

        def full_displacement(x):
            """Scatter driven-DOF values back in (what the user measures)."""

            return kinematics(
                x[:-1].reshape(n_blocks, 3),
                x[-1],
                control_params.constraint_params,
            )

        def step(carry, _):
            x, t_prev = carry
            t = tangent(x, t_prev, control_params)
            x_new, rnorm = _correct(
                x + ds * t, _metric_normal(t), control_params
            )
            ok = (rnorm < accept_tol) & jnp.all(jnp.isfinite(x_new))
            x_keep = jnp.where(ok, x_new, x)
            out = (
                full_displacement(x_keep),
                x_keep[-1],
                ok,
                rnorm,
                maybe_eig(x_keep),
            )
            return (x_keep, jnp.where(ok, t, t_prev)), out

        (_, _), (us, lams, oks, rnorms, eigs) = jax.lax.scan(
            step, (x0, t0), None, length=n_steps
        )
        first = (
            full_displacement(x0)[None],
            x0[-1][None],
            (rnorm0 < accept_tol)[None],
            rnorm0[None],
            maybe_eig(x0)[None],
        )
        return ContinuationPath(
            displacement=jnp.concatenate([first[0], us]),
            load_factor=jnp.concatenate([first[1], lams]),
            converged=jnp.concatenate([first[2], oks]),
            residual_norm=jnp.concatenate([first[3], rnorms]),
            stability_eig=jnp.concatenate([first[4], eigs]),
        )

    trace_path.residual = residual_field
    trace_path.dof_set = dof_set
    return trace_path
