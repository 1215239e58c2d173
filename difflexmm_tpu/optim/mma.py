"""Method of Moving Asymptotes (MMA), JAX-native and fully on-device.

Replaces the reference's dependence on nlopt's C implementation of LD_MMA
(reference: problems/quads_focusing.py:582 drives ``nlopt.opt(nlopt.LD_MMA)``
through a JAX<->numpy<->C boundary every iteration). Here the whole
iteration — separable convex subproblem construction, dual solve, design
update — is jnp, jit-compiled, and runs on the accelerator next to the
simulation, so an optimization step never leaves the device.

Algorithm: Svanberg's MMA (Krister Svanberg, "The method of moving
asymptotes — a new method for structural optimization", IJNME 24:359-373,
1987), implemented from the published algorithm:

- separable approximations  f_i(x) ~= sum_j p_ij/(U_j - x_j) + q_ij/(x_j - L_j)
  around the current iterate with moving asymptotes L < x < U,
- asymptotes adapt per-variable based on oscillation of the last two steps,
- the convex subproblem is solved in the dual: for fixed multipliers the
  primal minimizer is closed-form, and the dual is maximized with projected
  Adam (the dual dimension = number of constraints; each dual iteration is
  two (m, n) matvecs — MXU-friendly).
"""

import time
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class MMAState(NamedTuple):
    """Per-iteration optimizer state (all (n,) arrays + an int counter)."""

    x: jnp.ndarray
    x_prev1: jnp.ndarray
    x_prev2: jnp.ndarray
    low: jnp.ndarray
    upp: jnp.ndarray
    iteration: jnp.ndarray


# Standard MMA constants.
_ASY_INIT = 0.5
_ASY_INCR = 1.2
_ASY_DECR = 0.7
# Svanberg's published clamp is 0.01; we let asymptotes shrink much further
# so oscillation damping alone drives terminal convergence (nlopt's MMA gets
# this from its globally-convergent inner loop instead).
_ASY_MIN_FACTOR = 1e-8
_ASY_MAX_FACTOR = 10.0
_MOVE = 0.5
_ALBEFA = 0.1
_RAAMIN = 1e-6


def mma_init(x0: jnp.ndarray, xmin: jnp.ndarray, xmax: jnp.ndarray) -> MMAState:
    span = xmax - xmin
    return MMAState(
        x=x0,
        x_prev1=x0,
        x_prev2=x0,
        low=x0 - _ASY_INIT * span,
        upp=x0 + _ASY_INIT * span,
        iteration=jnp.asarray(0),
    )


def _update_asymptotes(state: MMAState, xmin, xmax) -> Tuple[jnp.ndarray, jnp.ndarray]:
    span = jnp.maximum(xmax - xmin, _RAAMIN)
    x, x1, x2 = state.x, state.x_prev1, state.x_prev2

    osc = (x - x1) * (x1 - x2)
    factor = jnp.where(osc > 0, _ASY_INCR, jnp.where(osc < 0, _ASY_DECR, 1.0))
    low = x - factor * (x1 - state.low)
    upp = x + factor * (state.upp - x1)

    low = jnp.clip(low, x - _ASY_MAX_FACTOR * span, x - _ASY_MIN_FACTOR * span)
    upp = jnp.clip(upp, x + _ASY_MIN_FACTOR * span, x + _ASY_MAX_FACTOR * span)

    fresh = state.iteration < 2
    low = jnp.where(fresh, x - _ASY_INIT * span, low)
    upp = jnp.where(fresh, x + _ASY_INIT * span, upp)
    return low, upp


def _solve_dual(p0, q0, P, Q, b, low, upp, alpha, beta, n_dual_iters, lam_max):
    """Maximize the MMA dual with projected Adam; return the primal minimizer."""

    def x_of(lam):
        pl = p0 + lam @ P
        ql = q0 + lam @ Q
        sp, sq = jnp.sqrt(pl), jnp.sqrt(ql)
        xs = (low * sp + upp * sq) / (sp + sq)
        return jnp.clip(xs, alpha, beta)

    def dual_value(lam):
        xs = x_of(lam)
        pl = p0 + lam @ P
        ql = q0 + lam @ Q
        return jnp.sum(pl / (upp - xs) + ql / (xs - low)) - jnp.dot(lam, b)

    dual_grad = jax.grad(dual_value)

    m = P.shape[0]
    lam0 = jnp.full((m,), 1.0, dtype=p0.dtype)
    adam_b1, adam_b2, adam_eps, lr = 0.9, 0.999, 1e-8, 0.5

    def body(i, carry):
        lam, mom, vel = carry
        g = dual_grad(lam)
        mom = adam_b1 * mom + (1 - adam_b1) * g
        vel = adam_b2 * vel + (1 - adam_b2) * g**2
        mhat = mom / (1 - adam_b1 ** (i + 1.0))
        vhat = vel / (1 - adam_b2 ** (i + 1.0))
        lam = lam + lr * mhat / (jnp.sqrt(vhat) + adam_eps)  # ascent
        lam = jnp.clip(lam, 0.0, lam_max)
        return lam, mom, vel

    lam, _, _ = jax.lax.fori_loop(
        0, n_dual_iters, body, (lam0, jnp.zeros_like(lam0), jnp.zeros_like(lam0))
    )
    return x_of(lam), lam


def mma_update(
    state: MMAState,
    df0: jnp.ndarray,
    fi: Optional[jnp.ndarray],
    dfi: Optional[jnp.ndarray],
    xmin: jnp.ndarray,
    xmax: jnp.ndarray,
    n_dual_iters: int = 100,
    lam_max: float = 1e4,
    move_limit: float = _MOVE,
) -> MMAState:
    """One MMA design update (minimization form).

    Args:
        state: current MMAState.
        df0: (n,) objective gradient at ``state.x``.
        fi: (m,) constraint values (feasible iff <= 0), or None.
        dfi: (m, n) constraint jacobian, or None.
        xmin/xmax: (n,) bounds.
        move_limit: per-iteration step cap as a fraction of the bound span
            (Svanberg's 0.5 default). Lower it (0.05-0.2) when the objective
            is only valid near the current iterate — e.g. fixed-step
            dynamics whose stability region depends on the design.

    Returns:
        Updated state with the new iterate in ``.x``.
    """

    x = state.x
    low, upp = _update_asymptotes(state, xmin, xmax)

    u_x = upp - x
    x_l = x - low
    span = jnp.maximum(xmax - xmin, _RAAMIN)

    alpha = jnp.maximum(xmin, jnp.maximum(low + _ALBEFA * x_l, x - move_limit * span))
    beta = jnp.minimum(xmax, jnp.minimum(upp - _ALBEFA * u_x, x + move_limit * span))

    eps_term = 1e-5 / span
    p0 = u_x**2 * (jnp.maximum(df0, 0) + 1e-3 * jnp.maximum(-df0, 0) + eps_term)
    q0 = x_l**2 * (jnp.maximum(-df0, 0) + 1e-3 * jnp.maximum(df0, 0) + eps_term)

    if fi is None or dfi is None or dfi.shape[0] == 0:
        sp, sq = jnp.sqrt(p0), jnp.sqrt(q0)
        x_new = jnp.clip((low * sp + upp * sq) / (sp + sq), alpha, beta)
    else:
        # Row-normalize each constraint by its gradient norm: the feasible
        # set {fi <= 0} is unchanged, but the dual becomes well-conditioned
        # when constraint scales span orders of magnitude (mixed
        # void-angle/edge-length sets do) — without this the projected-Adam
        # dual stalls at ~1e-3 persistent violations
        # (tests/test_optim.py::test_mma_dual_kkt_residual...).
        row_scale = jnp.maximum(
            jnp.linalg.norm(dfi, axis=1, keepdims=True), 1e-30
        )
        fi = fi / row_scale[:, 0]
        dfi = dfi / row_scale
        P = u_x[None, :] ** 2 * jnp.maximum(dfi, 0)
        Q = x_l[None, :] ** 2 * jnp.maximum(-dfi, 0)
        b = P @ (1.0 / u_x) + Q @ (1.0 / x_l) - fi
        x_new, _ = _solve_dual(
            p0, q0, P, Q, b, low, upp, alpha, beta, n_dual_iters, lam_max
        )

    return MMAState(
        x=x_new,
        x_prev1=x,
        x_prev2=state.x_prev1,
        low=low,
        upp=upp,
        iteration=state.iteration + 1,
    )


def _restore_feasibility(
    x,
    constraints_and_jac,
    xmin,
    xmax,
    feasibility_tol: float,
    n_dual_iters: int,
    move_limit: float,
    max_restore_iterations: int = 10,
):
    """Constraint-only MMA iterations until ``max(fi) <= feasibility_tol``.

    nlopt's MMA (the reference's optimizer) returns feasible iterates from
    feasible starts; the projected-Adam dual here can terminate with small
    residual violations instead (r4 flagship: +4.6e-4 on the edge-length
    constraint, MMA_FLAGSHIP.json). This restoration phase re-solves the
    MMA subproblem with a ZERO objective gradient — the separable
    approximation then only prices constraint violation, so each step is
    a damped projection onto the linearized feasible set, clipped to the
    bounds and move limits like any MMA step.

    Returns ``(x_restored, record)`` where record documents the
    violations before/after and the iterations spent; ``x`` is returned
    unchanged when already feasible.
    """

    fi, dfi = constraints_and_jac(x)
    before = float(jnp.max(fi)) if fi.size else 0.0
    record = {
        "feasibility_tol": float(feasibility_tol),
        "violation_before": before,
        "iterations": 0,
    }
    if before <= feasibility_tol:
        record["violation_after"] = before
        return x, record

    state = mma_init(x, xmin, xmax)
    zero = jnp.zeros_like(x)
    update = jax.jit(
        lambda s, fi, dfi: mma_update(
            s, zero, fi, dfi, xmin, xmax,
            n_dual_iters=n_dual_iters, move_limit=move_limit,
        )
    )
    violation = before
    for it in range(max_restore_iterations):
        state = update(state, fi, dfi)
        fi, dfi = constraints_and_jac(state.x)
        violation = float(jnp.max(fi))
        record["iterations"] = it + 1
        if violation <= feasibility_tol:
            break
    record["violation_after"] = violation
    return (state.x if record["iterations"] else x), record


def run_mma(
    objective_and_grad: Callable,
    x0: jnp.ndarray,
    xmin: jnp.ndarray,
    xmax: jnp.ndarray,
    n_iterations: int,
    constraints_and_jac: Optional[Callable] = None,
    maximize: bool = False,
    callback: Optional[Callable] = None,
    n_dual_iters: int = 100,
    move_limit: float = _MOVE,
    max_backtracks: int = 8,
    max_seconds: Optional[float] = None,
    feasibility_tol: Optional[float] = None,
):
    """Run an MMA optimization loop on flat design vectors.

    Args:
        objective_and_grad: ``x -> (value, grad)`` (jit recommended).
        x0, xmin, xmax: (n,) initial design and bounds.
        n_iterations: outer MMA iterations.
        constraints_and_jac: optional ``x -> (fi (m,), dfi (m, n))`` with
            feasibility fi <= 0.
        maximize: maximize instead of minimize.
        callback: ``callback(iteration, x, value, max_violation, fi)``
            per iteration; ``fi`` is the full constraint vector evaluated
            at ``x`` (empty when unconstrained).
        move_limit: per-iteration step cap (fraction of bound span).
        max_backtracks: if the objective or gradient at a new iterate is
            non-finite (e.g. the design left the solver's stability region),
            bisect back toward the last finite iterate up to this many times
            before giving up.
        max_seconds: optional wall-clock cap (parity with nlopt's
            ``opt.set_maxtime``, reference problems/quads_focusing.py:645-646):
            the loop stops cleanly before starting an iteration once the
            budget is spent, returning the history so far with
            ``history["stopped_early"] = "max_seconds"``.
        feasibility_tol: declare feasibility at termination (parity with
            nlopt MMA's feasible iterates): if the final design violates
            ``max(fi) > feasibility_tol``, run constraint-only
            restoration iterations (:func:`_restore_feasibility`) and —
            when the design moved — append ONE extra history entry for
            the restored, re-evaluated design. The restoration record
            lands in ``history["restoration"]``. ``None`` (default at
            this level) skips; the model runner defaults it ON.

    Returns:
        (x_best_last, history dict with per-iteration objective values,
        designs, max constraint violations, and per-iteration ``rejected``
        flags — a rejected iteration re-logs the last accepted iterate, so
        convergence plots / resume logic should skip flagged entries).
    """

    sign = -1.0 if maximize else 1.0
    deadline = None if max_seconds is None else time.monotonic() + max_seconds
    state = mma_init(jnp.asarray(x0), jnp.asarray(xmin), jnp.asarray(xmax))
    history = {
        "objective_values": [],
        "design_values": [],
        "constraints_violation": [],
        "rejected": [],
    }

    update = jax.jit(
        lambda s, g, fi, dfi, scale: mma_update(
            s, g, fi, dfi, jnp.asarray(xmin), jnp.asarray(xmax),
            n_dual_iters=n_dual_iters, move_limit=move_limit * scale,
        )
    ) if constraints_and_jac is not None else jax.jit(
        lambda s, g, scale: mma_update(
            s, g, None, None, jnp.asarray(xmin), jnp.asarray(xmax),
            n_dual_iters=n_dual_iters, move_limit=move_limit * scale,
        )
    )

    # One fused device computation + ONE host readback per evaluation:
    # every synchronous device->host scalar transfer costs a full runtime
    # round-trip (~25 ms through a remote-attached TPU), so value and
    # finiteness come back together.
    finite_value = jax.jit(
        lambda v, g: jnp.stack(
            [v, (jnp.isfinite(v) & jnp.all(jnp.isfinite(g))).astype(v.dtype)]
        )
    )

    def evaluate(x):
        value, grad = objective_and_grad(x)
        summary = np.asarray(finite_value(value, grad))
        return float(summary[0]), grad, bool(summary[1])

    # Trust-region scale on the move limit: shrinks when a step lands
    # outside the region where the objective is computable (fixed-step
    # solver instability, contact-barrier tunneling), recovers on success.
    move_scale = 1.0
    accepted = None  # (value, grad) at x_prev1 - rejection retreat is free
    for it in range(n_iterations):
        if deadline is not None and time.monotonic() > deadline:
            history["stopped_early"] = "max_seconds"
            break
        rejected = False
        value, grad, finite = evaluate(state.x)
        backtracks = 0
        while not finite and backtracks < max_backtracks and it > 0:
            # Bisect toward the last finite iterate.
            state = state._replace(x=(state.x + state.x_prev1) / 2)
            value, grad, finite = evaluate(state.x)
            backtracks += 1
        if not finite and it > 0:
            # Reject the step entirely: retreat to the last finite iterate,
            # whose (value, grad) were computed last iteration, and crawl.
            state = state._replace(x=state.x_prev1)
            value, grad = accepted
            finite = True
            rejected = True
            move_scale = max(move_scale / 4, 1e-4)
        elif backtracks:
            move_scale = max(move_scale / 2, 1e-4)
        else:
            move_scale = min(move_scale * 1.25, 1.0)
        accepted = (value, grad)
        if not finite:
            raise FloatingPointError(
                f"MMA iteration {it}: objective/gradient non-finite at the "
                f"{'initial design' if it == 0 else 'last accepted iterate'}."
                f" Check solver stability (substeps) for designs within the "
                f"bounds, or lower move_limit."
            )

        if constraints_and_jac is not None:
            fi, dfi = constraints_and_jac(state.x)
            state = update(state, sign * grad, fi, dfi, move_scale)
            # Device scalar - converted in ONE batched readback at return
            # (synchronous per-iteration scalar readbacks cost a runtime
            # round-trip each).
            violation = jnp.max(fi) if fi.size else 0.0
        else:
            fi = jnp.zeros((0,))
            state = update(state, sign * grad, move_scale)
            violation = 0.0

        history["objective_values"].append(value)
        history["design_values"].append(state.x_prev1)
        history["constraints_violation"].append(violation)
        history["rejected"].append(rejected)
        if callback is not None:
            # fi was evaluated at the pre-update state.x == x_prev1 now,
            # so callbacks can log per-constraint data without recomputing.
            callback(it, state.x_prev1, value, violation, fi)

    history["constraints_violation"] = [
        float(v) for v in np.asarray(jnp.stack(
            [jnp.asarray(v, dtype=jnp.result_type(float))
             for v in history["constraints_violation"]]
        ))
    ] if history["constraints_violation"] else []

    # Return the last EVALUATED iterate (state.x is the final update's
    # un-evaluated proposal — it may sit outside the solver's stability
    # region, and returning it breaks restarts and best-forward solves).
    x_final = state.x_prev1 if n_iterations > 0 else state.x
    if (
        feasibility_tol is not None
        and constraints_and_jac is not None
        and history["objective_values"]
    ):
        x_restored, record = _restore_feasibility(
            x_final, constraints_and_jac, jnp.asarray(xmin),
            jnp.asarray(xmax), feasibility_tol, n_dual_iters, move_limit,
        )
        history["restoration"] = record
        if record["iterations"]:
            value, _, finite = evaluate(x_restored)
            if finite:
                x_final = x_restored
                fi, _ = constraints_and_jac(x_restored)
                history["objective_values"].append(value)
                history["design_values"].append(x_restored)
                history["constraints_violation"].append(
                    record["violation_after"]
                )
                history["rejected"].append(False)
                if callback is not None:
                    callback(
                        len(history["objective_values"]) - 1, x_restored,
                        value, record["violation_after"], fi,
                    )
            else:
                record["discarded"] = "objective non-finite at restored design"
    return x_final, history


def run_mma_fused(
    objective_and_grad: Callable,
    x0: jnp.ndarray,
    xmin: jnp.ndarray,
    xmax: jnp.ndarray,
    n_iterations: int,
    constraints_and_jac: Optional[Callable] = None,
    maximize: bool = False,
    callback: Optional[Callable] = None,
    n_dual_iters: int = 100,
    move_limit: float = _MOVE,
    max_seconds: Optional[float] = None,
    chunk: int = 10,
    feasibility_tol: Optional[float] = None,
):
    """``run_mma`` with the iteration loop ON DEVICE (lax.scan in chunks).

    The host-driven ``run_mma`` loop costs ~2.5 s/iteration at the
    flagship against 22-48 ms of device fwd+grad (MMA_FLAGSHIP.json r4):
    per-iteration synchronous readbacks over the remote-attach tunnel,
    separate constraint-jacobian dispatches, and host trust-region
    bookkeeping dominate. Here ``chunk`` iterations run as ONE fused
    device computation — objective+gradient, constraints+jacobian, the
    full reject/trust-region logic (jnp.where), and the MMA update all
    inside a ``lax.scan`` — with a single batched readback (and the
    per-iteration ``callback`` replay) between chunks.

    Semantics vs ``run_mma``: identical update math and reject/retreat
    trust-region scaling, EXCEPT the host bisection backtracks — a fixed
    device-side iteration cannot re-evaluate a variable number of times,
    so a non-finite iterate full-rejects immediately (retreat to the
    last accepted iterate, move_scale/4), the same recovery
    ``run_multistart_mma`` uses per candidate. With the substep guard on
    the forward solver (models default ``guard="auto"`` in the
    optimization drivers) non-finite iterates are rescued inside the
    simulation instead, and the reject branch is a rarely-taken safety
    net.

    Returns the same ``(x_final, history)`` contract as ``run_mma``.
    """

    sign = -1.0 if maximize else 1.0
    deadline = None if max_seconds is None else time.monotonic() + max_seconds
    x0 = jnp.asarray(x0)
    xmin = jnp.broadcast_to(jnp.asarray(xmin, x0.dtype), x0.shape)
    xmax = jnp.broadcast_to(jnp.asarray(xmax, x0.dtype), x0.shape)

    has_constraints = constraints_and_jac is not None

    def one_iter(carry, _):
        state, move_scale, acc_v, acc_g = carry
        value, grad = objective_and_grad(state.x)
        finite = jnp.isfinite(value) & jnp.all(jnp.isfinite(grad))
        fresh = state.iteration == 0
        # Full reject: retreat to the last accepted iterate and reuse its
        # (value, grad) from the carry — free. A non-finite FIRST iterate
        # has nothing to retreat to; it propagates NaN and the host check
        # below raises (run_mma's iteration-0 contract).
        reject = (~finite) & (~fresh)
        x_eval = jnp.where(reject, state.x_prev1, state.x)
        value = jnp.where(reject, acc_v, value)
        grad = jnp.where(reject, acc_g, grad)
        state = state._replace(x=x_eval)
        move_scale = jnp.where(
            reject,
            jnp.maximum(move_scale / 4, 1e-4),
            jnp.minimum(move_scale * 1.25, 1.0),
        )
        if has_constraints:
            fi, dfi = constraints_and_jac(x_eval)
            violation = jnp.max(fi) if fi.size else jnp.asarray(0.0, value.dtype)
        else:
            fi = jnp.zeros((0,), value.dtype)
            dfi = None
            violation = jnp.asarray(0.0, value.dtype)
        state = mma_update(
            state, sign * grad, fi if has_constraints else None, dfi,
            xmin, xmax, n_dual_iters=n_dual_iters,
            move_limit=move_limit * move_scale,
        )
        # state.x_prev1 == x_eval: the iterate this iteration evaluated.
        return (state, move_scale, value, grad), (
            value, x_eval, violation, reject, fi
        )

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def run_chunk(carry, length):
        return jax.lax.scan(one_iter, carry, None, length=length)

    state = mma_init(x0, xmin, xmax)
    carry = (
        state,
        jnp.ones((), x0.dtype),
        jnp.zeros((), x0.dtype),
        jnp.zeros_like(x0),
    )
    history = {
        "objective_values": [],
        "design_values": [],
        "constraints_violation": [],
        "rejected": [],
    }

    done = 0
    while done < n_iterations:
        if deadline is not None and time.monotonic() > deadline:
            history["stopped_early"] = "max_seconds"
            break
        length = min(chunk, n_iterations - done)
        # Static scan length: at most two compilations (chunk + remainder).
        carry, outs = run_chunk(carry, length)
        values, xs, violations, rejected, fis = jax.tree.map(np.asarray, outs)
        if done == 0 and not np.isfinite(values[0]):
            raise FloatingPointError(
                "MMA iteration 0: objective/gradient non-finite at the "
                "initial design. Check solver stability (substeps) for "
                "designs within the bounds, or lower move_limit."
            )
        for k in range(length):
            it = done + k
            history["objective_values"].append(float(values[k]))
            history["design_values"].append(jnp.asarray(xs[k]))
            history["constraints_violation"].append(float(violations[k]))
            history["rejected"].append(bool(rejected[k]))
            if callback is not None:
                callback(
                    it, jnp.asarray(xs[k]), float(values[k]),
                    float(violations[k]), jnp.asarray(fis[k]),
                )
        done += length

    if done == 0:
        return x0, history
    x_final = jnp.asarray(history["design_values"][-1])
    if feasibility_tol is not None and has_constraints:
        x_restored, record = _restore_feasibility(
            x_final, constraints_and_jac, xmin, xmax, feasibility_tol,
            n_dual_iters, move_limit,
        )
        history["restoration"] = record
        if record["iterations"]:
            value, grad = jax.jit(objective_and_grad)(x_restored)
            value = float(value)
            if np.isfinite(value) and bool(jnp.all(jnp.isfinite(grad))):
                x_final = x_restored
                fi, _ = constraints_and_jac(x_restored)
                history["objective_values"].append(value)
                history["design_values"].append(x_restored)
                history["constraints_violation"].append(
                    record["violation_after"]
                )
                history["rejected"].append(False)
                if callback is not None:
                    callback(
                        len(history["objective_values"]) - 1, x_restored,
                        value, record["violation_after"], jnp.asarray(fi),
                    )
            else:
                record["discarded"] = "objective non-finite at restored design"
    return x_final, history
