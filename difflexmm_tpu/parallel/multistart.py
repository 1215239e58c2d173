"""Batched multi-start inverse design: many candidates per update step.

The reference runs design restarts sequentially in notebooks
(random_initial_guess workflow); here a whole population of designs
advances concurrently — one ``vmap``-ed (optionally mesh-sharded) update
per iteration, which on TPU costs far less than per-candidate runs.

Backend choice for the objective (flagship 24x16/200tp on one v5e;
numbers in TILED_MULTISTART.json / BENCH):

- LARGE populations (B >~ 100): ``method="verlet_ckpt"`` — XLA lays the
  candidate batch across the VPU lanes and the stored-boundary-state
  adjoint avoids remat (323/345 designs/s fwd+grad at B=120/128; its
  forward-only rate, 1,624/s at B=240, also beats the tiled kernel's).
- SMALL-TO-MID populations (the reference's typical 5-50 random
  restarts): ``method="verlet_pallas"`` — a vmapped solve is intercepted
  by the design-TILING rule (ops/pallas/tiling.py: B2 designs side by
  side in the kernel's 128 lanes, B1 along a leading dim) and the whole
  population runs as a few fused-kernel trajectories: 267 designs/s
  fwd+grad at B=40 vs 108/s for ckpt at the same size (2.5x), extending
  the fused kernel's win regime from B=1 to B ~ 100.
- ``method="auto"`` applies these rules automatically: it resolves to the
  Pallas kernel on TPU and its batching rule re-routes populations past
  the measured crossover (96) to the verlet_ckpt forward at trace time
  (solver.resolve_method / solver/dynamics.py).

Both entry points here evaluate the population's value+gradient in the
vjp-of-vmap order (one vjp of the vmapped objective) — mathematically the
per-candidate gradients, and the only order the tiling rule's
``jax.custom_batching`` wrapper supports.
"""

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from difflexmm_tpu.parallel.mesh import SCENARIO_AXIS, make_mesh


class MultistartResult(NamedTuple):
    designs: any          # batched pytree: last EVALUATED iterate per candidate
    objective_values: any  # (n_iterations, n_candidates)
    best_index: any
    best_design: any


#: Measured backward-pass sweet spot (v5e, flagship 24x16/200tp): one vjp
#: over the whole population loses efficiency past B ~ 128 (347 -> 289
#: designs/s fwd+grad from B=128 to B=1024, BENCH multistart_roofline —
#: not HBM-bound, the reverse scan's working set outgrows what XLA
#: schedules well); lax.map-ing the vjp over 128-candidate chunks restores
#: and beats it (371 designs/s at B=1024).
_GRAD_CHUNK = 128


def population_value_and_grad(objective_fn, designs, grad_chunk="auto"):
    """Whole-population value+gradient in the vjp-of-vmap order.

    Mathematically identical to ``vmap(value_and_grad)`` — candidates are
    independent, so the pullback of the ones-vector is the per-candidate
    gradient stack — but this order also composes with custom-batched
    solvers (the design-tiled Pallas backend's ``jax.custom_batching``
    rule supports vmap-then-grad but not vmap-of-grad).

    ``grad_chunk``: "auto" (default) lax.maps the vjp over
    ``_GRAD_CHUNK``-candidate chunks for large divisible populations (the
    measured fix for the backward's large-batch inefficiency); an int
    forces that chunk size; None runs one whole-population vjp.
    """

    B = jax.tree.leaves(designs)[0].shape[0]
    if grad_chunk == "auto":
        grad_chunk = (
            _GRAD_CHUNK
            if B > _GRAD_CHUNK and B % _GRAD_CHUNK == 0
            else None
        )
    if grad_chunk and B > grad_chunk and B % grad_chunk == 0:
        chunked = jax.tree.map(
            lambda x: x.reshape((B // grad_chunk, grad_chunk) + x.shape[1:]),
            designs,
        )

        def one(chunk):
            vals, pullback = jax.vjp(jax.vmap(objective_fn), chunk)
            (g,) = pullback(jnp.ones_like(vals))
            return vals, g

        values, grads = jax.lax.map(one, chunked)
        return (
            values.reshape(B),
            jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), grads),
        )
    values, pullback = jax.vjp(jax.vmap(objective_fn), designs)
    (grads,) = pullback(jnp.ones_like(values))
    return values, grads


def run_multistart_optax(
    objective_fn: Callable,
    initial_designs,
    n_iterations: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    maximize: bool = True,
    lower_bound=None,
    upper_bound=None,
    mesh=None,
    axis_name: str = SCENARIO_AXIS,
    grad_chunk="auto",
) -> MultistartResult:
    """Advance a batch of design candidates with optax, all at once.

    Args:
        objective_fn: design -> scalar (single candidate).
        initial_designs: pytree whose leaves carry a leading candidate axis.
        mesh: optional device mesh; candidates shard over ``axis_name``
            (leading axis must divide the mesh size). Default: single-device
            vmap.
        grad_chunk: backward-pass chunking of the population vjp (see
            :func:`population_value_and_grad`; "auto" = measured default).
            Under ``mesh`` the chunk applies per shard.

    Returns:
        MultistartResult with per-iteration per-candidate objectives and the
        best final candidate.
    """

    if optimizer is None:
        optimizer = optax.adam(1e-2)
    sign = -1.0 if maximize else 1.0

    def batched_step(designs, opt_states):
        # Whole-population value+grad in the vjp-of-vmap order (see
        # population_value_and_grad: composes with the tiled backend AND
        # chunks the backward at large B — the measured sweet spot).
        values, grads = population_value_and_grad(
            objective_fn, designs, grad_chunk
        )

        def candidate_update(design, grad, opt_state):
            updates, opt_state = optimizer.update(
                jax.tree.map(lambda g: sign * g, grad), opt_state, design
            )
            design = optax.apply_updates(design, updates)
            if lower_bound is not None:
                design = jax.tree.map(
                    lambda d: jnp.maximum(d, lower_bound), design
                )
            if upper_bound is not None:
                design = jax.tree.map(
                    lambda d: jnp.minimum(d, upper_bound), design
                )
            return design, opt_state

        designs, opt_states = jax.vmap(candidate_update)(
            designs, grads, opt_states
        )
        return designs, opt_states, values
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        batched_step = jax.shard_map(
            batched_step,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name), P(axis_name)),
            check_vma=False,
        )

    @jax.jit
    def sweep(designs, opt_states):
        def iteration(carry, _):
            designs, opt_states, _ = carry
            new_designs, opt_states, values = batched_step(designs, opt_states)
            # Keep the iterate the values were EVALUATED at: the final
            # update's proposal was never evaluated, so returning it would
            # pair designs with another iterate's objectives (and a last
            # step outside the solver's stability region would go
            # unnoticed). Mirrors run_mma's convention.
            return (new_designs, opt_states, designs), values

        (_, _, evaluated), values = jax.lax.scan(
            iteration, (designs, opt_states, designs), None,
            length=n_iterations,
        )
        return evaluated, values

    opt_states = jax.vmap(optimizer.init)(initial_designs)
    designs, values = sweep(initial_designs, opt_states)

    final = values[-1]
    # A diverged (NaN) candidate must never rank best.
    ranked = jnp.where(
        jnp.isfinite(final), final, -jnp.inf if maximize else jnp.inf
    )
    best = jnp.argmax(ranked) if maximize else jnp.argmin(ranked)
    best_design = jax.tree.map(lambda d: d[best], designs)
    return MultistartResult(designs, values, best, best_design)


class MultistartMMAResult(NamedTuple):
    designs: any            # (B, n) final accepted iterates
    objective_values: any   # (n_iterations, B)
    constraints_violation: any  # (n_iterations, B) max violation (0 if none)
    rejected: any           # (n_iterations, B) full-rejection flags
    best_index: any
    best_design: any        # (n,)
    # Guarded finalist re-ranking evidence (FinalistResult) when the
    # driver re-evaluated the top-k with a guarded sibling objective
    # (models/runner.run_multistart_mma final_guard); None otherwise.
    finalists: any = None


def run_multistart_mma(
    objective_and_grad: Callable,
    initial_designs,
    xmin,
    xmax,
    n_iterations: int,
    constraints_and_jac: Optional[Callable] = None,
    maximize: bool = False,
    move_limit: float = 0.5,
    n_dual_iters: int = 100,
    mesh=None,
    axis_name: str = SCENARIO_AXIS,
    objective_fn: Optional[Callable] = None,
) -> MultistartMMAResult:
    """Constrained multi-start: a population of MMA runs, one update per
    step, entirely on-device.

    The reference's restart workflow runs full nlopt-MMA once per random
    initial guess, sequentially (problems/quads_focusing.py:546-649 driven
    by the random_initial_guess notebook). Here ``optim.mma.mma_update`` is
    pure jnp, so the whole population advances with one ``vmap``-ed update —
    including per-candidate constraint jacobians and per-candidate
    trust-region scales. Candidates that step outside the solver's stability
    region (non-finite value/grad) retreat to their last accepted iterate
    with a shrunken move limit, exactly like ``run_mma``'s full-reject
    branch (minus the host-side bisection backtracks, which a fixed
    device-side iteration cannot express).

    Memory: with m constraints and n design vars the vmapped jacobian is
    (B, m, n) — size the population (or shard it over ``mesh``) accordingly.

    Args:
        objective_and_grad: ``x (n,) -> (value, grad)`` for ONE candidate.
        initial_designs: (B, n) stacked flat candidates.
        xmin/xmax: (n,) or scalar bounds.
        constraints_and_jac: optional ``x -> (fi (m,), dfi (m, n))``,
            feasible iff fi <= 0, for ONE candidate.
        mesh: optional device mesh; candidates shard over ``axis_name``.
        objective_fn: optional raw ``x -> value``. When given, the
            population's values and gradients come from ONE vjp of the
            vmapped objective (grad-of-vmap order) instead of vmapping
            ``objective_and_grad`` — required for solvers whose batched
            fast path is a jax.custom_batching rule (the design-tiled
            Pallas backend), which composes with vmap-then-grad but not
            vmap-of-grad. ``objective_and_grad`` is ignored in that case
            (pass None).

    Returns:
        MultistartMMAResult; ``best_design`` is the best final accepted
        iterate among candidates whose final evaluation was finite.
    """

    from difflexmm_tpu.optim.mma import mma_init, mma_update

    initial_designs = jnp.asarray(initial_designs)
    B, n = initial_designs.shape
    xmin = jnp.broadcast_to(jnp.asarray(xmin, initial_designs.dtype), (n,))
    xmax = jnp.broadcast_to(jnp.asarray(xmax, initial_designs.dtype), (n,))
    sign = -1.0 if maximize else 1.0

    if objective_fn is not None:
        def batched_value_and_grad(xs):
            values, pullback = jax.vjp(jax.vmap(objective_fn), xs)
            (grads,) = pullback(jnp.ones_like(values))
            return values, grads
    else:
        batched_value_and_grad = jax.vmap(objective_and_grad)

    def candidate_iter(state, move_scale, acc_value, acc_grad, value, grad):
        finite = jnp.isfinite(value) & jnp.all(jnp.isfinite(grad))
        fresh = state.iteration == 0
        # Full reject: retreat to the last accepted iterate, reuse its
        # (value, grad) — free, they were computed last iteration.
        reject = (~finite) & (~fresh)
        x_eval = jnp.where(reject, state.x_prev1, state.x)
        value = jnp.where(reject, acc_value, value)
        grad = jnp.where(reject, acc_grad, grad)
        state = state._replace(x=x_eval)
        move_scale = jnp.where(
            reject,
            jnp.maximum(move_scale / 4, 1e-4),
            jnp.minimum(move_scale * 1.25, 1.0),
        )

        if constraints_and_jac is not None:
            fi, dfi = constraints_and_jac(x_eval)
            violation = jnp.max(fi) if fi.size else jnp.asarray(0.0)
        else:
            fi, dfi = None, None
            violation = jnp.asarray(0.0, value.dtype)
        state = mma_update(
            state, sign * grad, fi, dfi, xmin, xmax,
            n_dual_iters=n_dual_iters, move_limit=move_limit * move_scale,
        )
        return state, move_scale, value, grad, violation, reject

    def batched_iter(states, move_scale, acc_v, acc_g):
        # Objective for the whole population first (one batched evaluation,
        # grad-of-vmap ordering), then the pure per-candidate MMA update.
        values, grads = batched_value_and_grad(states.x)
        return jax.vmap(candidate_iter)(
            states, move_scale, acc_v, acc_g, values, grads
        )

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        batched_iter = jax.shard_map(
            batched_iter,
            mesh=mesh,
            in_specs=(P(axis_name),) * 4,
            out_specs=(P(axis_name),) * 6,
            check_vma=False,
        )

    @jax.jit
    def sweep(designs):
        states = jax.vmap(mma_init, in_axes=(0, None, None))(designs, xmin, xmax)
        carry0 = (
            states,
            jnp.ones((B,), designs.dtype),
            jnp.zeros((B,), designs.dtype),
            jnp.zeros((B, n), designs.dtype),
        )

        def iteration(carry, _):
            states, move_scale, acc_v, acc_g = carry
            states, move_scale, value, grad, violation, reject = batched_iter(
                states, move_scale, acc_v, acc_g
            )
            return (states, move_scale, value, grad), (value, violation, reject)

        (states, _, final_v, _), (values, violations, rejected) = jax.lax.scan(
            iteration, carry0, None, length=n_iterations
        )
        # states.x is the final un-evaluated proposal; x_prev1 is the last
        # EVALUATED iterate (same convention as run_mma's return).
        return states.x_prev1, values, violations, rejected, final_v

    designs, values, violations, rejected, final_v = sweep(initial_designs)
    # Parity with run_mma's iteration-0 guard: a candidate whose FIRST
    # evaluation is non-finite has no finite iterate to retreat to — its
    # whole run is NaN-poisoned. Fail loudly instead of silently returning
    # an unoptimized design.
    first_values = np.asarray(values[0])
    bad = np.nonzero(~np.isfinite(first_values))[0]
    if bad.size:
        raise FloatingPointError(
            f"run_multistart_mma: objective non-finite at the initial "
            f"design for candidate(s) {bad.tolist()}. Check solver "
            f"stability (substeps) for designs within the bounds."
        )
    ranked = jnp.where(jnp.isfinite(final_v), final_v,
                       -jnp.inf if maximize else jnp.inf)
    best = jnp.argmax(ranked) if maximize else jnp.argmin(ranked)
    return MultistartMMAResult(
        designs, values, violations, rejected, best, designs[best]
    )


#: Per-objective cache of the jitted finalist map (reevaluate_finalists):
#: weak keys so model objectives don't leak across rebuilt problems.
import weakref

_FINALIST_MAPS = weakref.WeakKeyDictionary()


class FinalistResult(NamedTuple):
    indices: any         # (k,) population indices of the finalists, ranked
    values: any          # (k,) re-evaluated objectives, same order
    screen_values: any   # (k,) the screening objectives of those candidates
    best_index: any      # scalar population index of the re-ranked winner
    best_design: any     # winner's design pytree (no leading axis)


def reevaluate_finalists(
    objective_fn: Callable,
    designs,
    screen_values,
    k: int,
    maximize: bool = True,
) -> FinalistResult:
    """Re-rank a screened population's top-k under a costlier objective.

    The production multi-start recipe for guarded solvers: screen the
    whole population UNGUARDED (vmap-friendly, fast), then re-evaluate
    only the k best candidates with the guarded (or f64 / higher-substep)
    objective and re-rank. A guarded objective must never be vmapped over
    a population — under ``vmap`` the guard's ``lax.cond`` becomes a
    select, so EVERY candidate pays both branches of every risky substep
    (~17x at the default refine/levels; see
    ops/pallas/core.make_guarded_stepper). This helper evaluates the
    finalists through ``lax.map`` instead: one compile, sequential
    execution, each candidate's conds stay real branches.

    Non-finite screening values (candidates whose unguarded solve blew
    up — the very designs the guard exists to rescue) are ranked LAST at
    screening, so they only enter the finalist set when fewer than ``k``
    candidates survived screening; their guarded re-evaluation is then
    what decides whether they are usable.

    Args:
        objective_fn: design -> scalar; the expensive truth (guarded
            solver, f64 cross-eval wrapper, higher n_substeps, ...).
        designs: pytree with a leading population axis (as returned by the
            multi-start drivers).
        screen_values: (B,) screening objectives (e.g.
            ``MultistartResult.objective_values[-1]``).
        k: finalist count (static; clipped to the population size).

    Returns:
        FinalistResult; ``best_index`` / ``best_design`` are re-ranked by
        the re-evaluated objective (non-finite re-evaluations never win).
    """

    screen_values = jnp.asarray(screen_values)
    B = screen_values.shape[0]
    k = int(min(k, B))
    if k < 1:
        raise ValueError("reevaluate_finalists needs k >= 1")
    ranked = jnp.where(
        jnp.isfinite(screen_values),
        screen_values,
        -jnp.inf if maximize else jnp.inf,
    )
    _, idx = jax.lax.top_k(ranked if maximize else -ranked, k)
    finalists = jax.tree.map(lambda d: d[idx], designs)
    # The map MUST run compiled: an eager lax.map dispatches the guarded
    # objective op-by-op (measured 866 ms/candidate through the tunnel vs
    # 27 ms compiled, RESCUE_RECIPE.json r5). The jitted map is cached per
    # objective function so repeated re-evaluations (screen/re-rank loops,
    # benchmarks) hit the jit cache instead of re-tracing.
    mapped = _FINALIST_MAPS.get(objective_fn)
    if mapped is None:
        mapped = jax.jit(lambda f: jax.lax.map(objective_fn, f))
        try:
            _FINALIST_MAPS[objective_fn] = mapped
        except TypeError:  # unhashable/weakref-less callables: no cache
            pass
    values = mapped(finalists)
    revalued = jnp.where(
        jnp.isfinite(values), values, -jnp.inf if maximize else jnp.inf
    )
    best = jnp.argmax(revalued) if maximize else jnp.argmin(revalued)
    return FinalistResult(
        indices=idx,
        values=values,
        screen_values=screen_values[idx],
        best_index=idx[best],
        best_design=jax.tree.map(lambda d: d[best], finalists),
    )


def random_initial_designs(key, base_design, n_candidates: int, scale: float):
    """Jittered candidates around a base design (leading candidate axis)."""

    leaves, treedef = jax.tree.flatten(base_design)
    keys = jax.random.split(key, len(leaves))
    jittered = [
        leaf[None] + scale * jax.random.normal(k, (n_candidates,) + leaf.shape)
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, jittered)
