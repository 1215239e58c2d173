"""Shared optimization-runner mixin for all model families.

Each model's ``OptimizationProblem`` supplies ``setup_objective`` (installing
``self.objective_fn``) and inherits the MMA / optax drivers, fabrication
constraint wiring, and iteration-history bookkeeping from here.
"""

from typing import Callable, List, Optional

import jax
import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.models import base
from difflexmm_tpu.optim.loops import ravel_pytree, run_optimization_optax
from difflexmm_tpu.optim.mma import run_mma, run_mma_fused


class OptimizationRunnerMixin:
    """Drives ``self.objective_fn`` (maximized) with MMA or optax.

    Requires on self: ``objective_fn``, ``objective_values``,
    ``design_values``, ``constraints_violation``, ``is_setup``, and either
    ``forward_problem`` or ``forward_problems``.
    """

    # -- helpers ------------------------------------------------------------

    def _primary_forward(self):
        if hasattr(self, "forward_problem"):
            return self.forward_problem
        return self.forward_problems[0]

    def _geometry(self):
        return self._primary_forward().geometry

    def _boundary_node_ids(self):
        geometry = self._geometry()
        return base.quad_boundary_node_ids(geometry.n1_blocks, geometry.n2_blocks)

    def _design_constraints(
        self,
        min_void_angle: Optional[float],
        min_block_angle: Optional[float],
        min_edge_length: Optional[float],
        boundary_angle_constraint: bool = False,
    ) -> List:
        geometry = self._geometry()
        constraints = []
        if min_void_angle is not None and min_block_angle is not None:
            boundary_ids = (
                self._boundary_node_ids() if boundary_angle_constraint else None
            )
            self.angle_constraints = base.build_angle_constraints(
                geometry.centroid_node_vectors,
                geometry.bond_connectivity(),
                min_void_angle,
                min_block_angle,
                boundary_ids,
            )
            constraints.append(("angles", self.angle_constraints))
        if min_edge_length is not None:
            self.edge_length_constraints = base.build_edge_length_constraints(
                geometry.centroid_node_vectors, min_edge_length
            )
            constraints.append(("edge_lengths", self.edge_length_constraints))
        return constraints

    # Solver methods whose fixed-step integrator supports the reactive
    # substep guard (setup_dynamic_solver's guard contract).
    _GUARDABLE_METHODS = ("verlet", "verlet_pallas", "verlet_ckpt", "auto")

    def _ensure_guarded(self, guard):
        """Trustworthy optimization by default (VERDICT r4 next #2).

        The r4 flagship MMA run proved the unguarded fixed-step default is
        exploitable under optimization pressure: the optimizer drove the
        design into integrator-error spikes and reported a 22%-inflated
        objective vs the f64 odeint oracle, with a 37-iteration reject
        stall (MMA_FLAGSHIP.json). The reference never exposes this —
        nlopt optimizes over its adaptive odeint. So the optimization
        drivers re-arm the guard: if a forward problem supports it and
        was built unguarded, it is rebuilt with ``guard=<guard>`` before
        the objective is set up. With the proximity-gated "auto" spec
        this is a bit-exact no-op on healthy trajectories (the travel
        term only fires near the contact barrier, the hard term only on
        force spikes), so honest physics costs ~nothing until the
        optimizer actually probes unstable designs.

        ``guard=None`` opts out (expert: keep the problems exactly as
        configured, e.g. for measured unguarded baselines).
        """

        if guard is None:
            return
        import dataclasses

        def up(fp):
            if (
                dataclasses.is_dataclass(fp)
                and hasattr(fp, "guard")
                and fp.guard is None
                and getattr(fp, "method", None) in self._GUARDABLE_METHODS
            ):
                self.is_setup = False
                return dataclasses.replace(fp, guard=guard, is_setup=False)
            return fp

        if hasattr(self, "forward_problem"):
            self.forward_problem = up(self.forward_problem)
        elif hasattr(self, "forward_problems"):
            self.forward_problems = [up(fp) for fp in self.forward_problems]

    def _guarded_objective_fn(self, guard):
        """A guarded-sibling ``objective_fn`` WITHOUT mutating self.

        Builds a shallow clone of this optimization problem whose forward
        problem(s) carry ``guard``, runs its ``setup_objective``, and
        returns the clone's objective. Returns None when the forward
        problems are already guarded (the existing objective IS the
        guarded truth) or cannot take a guard (method without fixed-step
        support) — callers skip the re-evaluation then.
        """

        import copy
        import dataclasses

        def guardable(fp):
            return (
                dataclasses.is_dataclass(fp)
                and hasattr(fp, "guard")
                and getattr(fp, "method", None) in self._GUARDABLE_METHODS
            )

        def up(fp):
            return dataclasses.replace(fp, guard=guard, is_setup=False)

        clone = copy.copy(self)
        if hasattr(self, "forward_problem"):
            fp = self.forward_problem
            if not guardable(fp):
                return None
            if fp.guard is not None:
                return self.objective_fn
            clone.forward_problem = up(fp)
        elif hasattr(self, "forward_problems"):
            fps = self.forward_problems
            if not all(guardable(fp) for fp in fps):
                return None
            if all(fp.guard is not None for fp in fps):
                return self.objective_fn
            clone.forward_problems = [
                fp if fp.guard is not None else up(fp) for fp in fps
            ]
        else:
            return None
        clone.is_setup = False
        clone.setup_objective()
        return clone.objective_fn

    # -- drivers ------------------------------------------------------------

    def run_optimization_mma(
        self,
        initial_guess,
        n_iterations: int,
        lower_bound: Optional[float] = None,
        upper_bound: Optional[float] = None,
        min_void_angle: Optional[float] = None,
        min_block_angle: Optional[float] = None,
        min_edge_length: Optional[float] = None,
        boundary_angle_constraint: bool = False,
        verbose: bool = True,
        metrics_logger=None,
        checkpoint=None,
        resume: bool = False,
        move_limit: float = 0.2,
        max_seconds: Optional[float] = None,
        guard="auto",
        device_loop: bool = True,
        chunk: int = 10,
        feasibility_tol: Optional[float] = 1e-6,
    ):
        """Constrained inverse design with the on-device MMA optimizer.

        Args beyond the optimization setup:
            guard: re-arm the forward solver's substep guard for the
                optimization (default "auto": proximity-gated — honest
                physics at ~no cost on healthy trajectories; see
                ``_ensure_guarded``). ``None`` keeps the problems exactly
                as configured (expert opt-out).
            device_loop: run the iteration loop on-device
                (``optim.mma.run_mma_fused``: ``chunk`` iterations per
                fused lax.scan dispatch, one host readback per chunk —
                the host-driven loop costs ~2.5 s/iter at the flagship
                against 22-48 ms of device compute). ``False`` falls back
                to the host loop (``run_mma``) with its bisection
                backtracks.
            chunk: iterations per device dispatch when ``device_loop``.
            feasibility_tol: feasibility at termination (parity with
                nlopt MMA's feasible iterates): when the final design
                violates any constraint beyond this, constraint-only
                restoration iterations project it back
                (optim.mma._restore_feasibility) and the restored,
                re-evaluated design is appended as one extra history
                entry. ``None`` disables.
            metrics_logger: optional utils.observability.MetricsLogger for
                per-iteration JSONL metrics.
            checkpoint: optional utils.observability.OptimizationCheckpoint;
                snapshots the run periodically and on wall-clock expiry.
            resume: restore histories and the initial design from
                ``checkpoint`` if a snapshot exists.
            move_limit: MMA per-iteration step cap as a fraction of the
                bound span. The default is conservative (0.2 vs Svanberg's
                0.5) because fixed-step dynamics have a design-dependent
                stability region; run_mma additionally backtracks if an
                iterate produces a non-finite objective.
            max_seconds: wall-clock cap on the optimization loop (parity
                with nlopt ``opt.set_maxtime``, reference
                problems/quads_focusing.py:645-646). The loop stops cleanly
                between iterations; if a ``checkpoint`` is given, a final
                snapshot is forced so the run can resume.
        """

        self._ensure_guarded(guard)
        if not self.is_setup:
            self.setup_objective()

        if resume and checkpoint is not None and checkpoint.exists():
            snapshot = checkpoint.restore()
            initial_guess = snapshot["design"]
            self.objective_values = list(snapshot["objective_values"])
            self.design_values = list(snapshot["design_values"])
            # Restore the auxiliary histories too, so everything stays
            # index-aligned with objective_values after a resume.
            extras = snapshot.get("extras") or {}
            if getattr(self, "constraints_violation", None) is not None:
                for name, values in extras.get(
                    "constraints_violation", {}
                ).items():
                    self.constraints_violation[name] = list(values)
            if hasattr(self, "objective_values_individual"):
                self.objective_values_individual = list(
                    extras.get("objective_values_individual", [])
                )

        flat0, unflatten = ravel_pytree(initial_guess)
        objective_and_grad = jax.jit(
            jax.value_and_grad(lambda x: self.objective_fn(unflatten(x)))
        )

        constraint_fns = self._design_constraints(
            min_void_angle, min_block_angle, min_edge_length,
            boundary_angle_constraint,
        )
        if constraint_fns:
            names = [name for name, _ in constraint_fns]
            fns = [fn for _, fn in constraint_fns]

            def stacked(x):
                return jnp.concatenate([fn(unflatten(x)) for fn in fns])

            constraints_and_jac = jax.jit(
                lambda x: (stacked(x), jax.jacobian(stacked)(x))
            )
            sizes = [len(fn(initial_guess)) for fn in fns]
        else:
            constraints_and_jac = None
            names, sizes = [], []

        span = float(jnp.max(jnp.abs(flat0))) + 1.0
        xmin = jnp.full_like(
            flat0, lower_bound if lower_bound is not None else -10 * span
        )
        xmax = jnp.full_like(
            flat0, upper_bound if upper_bound is not None else 10 * span
        )

        objective_individual = (
            jax.jit(lambda x: self.objective_fn_individual(unflatten(x)))
            if hasattr(self, "objective_fn_individual")
            else None
        )

        if names:
            offsets = np.cumsum([0] + sizes)
            group_max = jax.jit(
                lambda fi: jnp.stack(
                    [
                        jnp.max(fi[offsets[k]:offsets[k + 1]])
                        for k in range(len(sizes))
                    ]
                )
            )

        def callback(it, x, value, violation, fi):
            self.objective_values.append(float(value))
            self.design_values.append(unflatten(x))
            if objective_individual is not None:
                self.objective_values_individual.append(
                    objective_individual(x)
                )
            if constraints_and_jac is not None:
                # fi comes from the optimizer's own constraint evaluation
                # at this x (no recomputation), and the per-group maxima
                # come back in ONE device->host transfer - synchronous
                # scalar readbacks cost a full runtime round-trip each.
                maxima = np.asarray(group_max(fi))
                for name, m in zip(names, maxima):
                    self.constraints_violation[name].append(float(m))
                violation = float(maxima.max())
            if metrics_logger is not None:
                metrics_logger.log(
                    len(self.objective_values),
                    objective=float(value),
                    constraint_violation=(
                        float(violation) if constraints_and_jac is not None
                        else 0.0
                    ),
                )
            if checkpoint is not None:
                checkpoint.save(
                    len(self.objective_values),
                    self.design_values[-1],
                    objective_values=self.objective_values,
                    design_values=self.design_values,
                    extras=self._history_extras(),
                )
            if verbose:
                print(f"Iteration: {len(self.objective_values)}\n"
                      f"Objective = {self.objective_values[-1]}")

        driver = run_mma_fused if device_loop else run_mma
        x_final, history = driver(
            objective_and_grad,
            flat0,
            xmin=xmin,
            xmax=xmax,
            n_iterations=n_iterations,
            constraints_and_jac=constraints_and_jac,
            maximize=True,
            callback=callback,
            move_limit=move_limit,
            max_seconds=max_seconds,
            feasibility_tol=feasibility_tol,
            **(dict(chunk=chunk) if device_loop else {}),
        )
        if history.get("stopped_early") and checkpoint is not None \
                and self.design_values:
            checkpoint.save(
                len(self.objective_values),
                self.design_values[-1],
                objective_values=self.objective_values,
                design_values=self.design_values,
                extras=self._history_extras(),
                force=True,
            )
        if self.design_values:
            self.compute_best_forward()
        return unflatten(x_final)

    def _history_extras(self):
        """Auxiliary per-iteration histories persisted with checkpoints."""

        extras = {}
        if getattr(self, "constraints_violation", None) is not None:
            extras["constraints_violation"] = {
                name: list(values)
                for name, values in self.constraints_violation.items()
            }
        if getattr(self, "objective_values_individual", None) is not None:
            extras["objective_values_individual"] = list(
                self.objective_values_individual
            )
        return extras

    def run_multistart_mma(
        self,
        initial_guesses,
        n_iterations: int,
        lower_bound: Optional[float] = None,
        upper_bound: Optional[float] = None,
        min_void_angle: Optional[float] = None,
        min_block_angle: Optional[float] = None,
        min_edge_length: Optional[float] = None,
        boundary_angle_constraint: bool = False,
        move_limit: float = 0.2,
        mesh=None,
        final_guard="auto",
        n_finalists: int = 8,
    ):
        """Batched constrained restarts: every candidate runs a full MMA
        optimization concurrently (one vmapped update per step).

        Replaces the reference's sequential random-restart workflow
        (problems/quads_focusing.py:546-649 re-run per initial guess in the
        random_initial_guess notebook). ``initial_guesses`` is a list of
        design pytrees; returns the ``MultistartMMAResult`` and records the
        best candidate in the iteration histories so
        ``compute_best_forward`` works as usual.

        Trustworthy ranking: candidates are optimized UNGUARDED (a guarded
        solver must never be vmapped — under vmap the guard's lax.cond
        becomes a select and every candidate pays both branches), then the
        top ``n_finalists`` are re-evaluated with the guarded sibling
        objective (``final_guard``, default "auto") through
        ``parallel.reevaluate_finalists`` and the winner is re-ranked by
        the guarded truth — integrator-error exploits screen well but
        cannot win. ``final_guard=None`` skips the re-ranking (expert:
        pure screening numbers). The re-evaluated values land on the
        result as ``.finalists`` (a ``FinalistResult``).
        """

        from difflexmm_tpu.parallel import (
            reevaluate_finalists,
            run_multistart_mma as _run,
        )

        if not self.is_setup:
            self.setup_objective()

        flats = []
        unflatten = None
        for guess in initial_guesses:
            flat, unflatten = ravel_pytree(guess)
            flats.append(flat)
        designs = jnp.stack(flats)

        def objective_and_grad(x):
            return jax.value_and_grad(
                lambda xx: self.objective_fn(unflatten(xx))
            )(x)

        constraint_fns = self._design_constraints(
            min_void_angle, min_block_angle, min_edge_length,
            boundary_angle_constraint,
        )
        if constraint_fns:
            fns = [fn for _, fn in constraint_fns]

            def stacked(x):
                return jnp.concatenate([fn(unflatten(x)) for fn in fns])

            def constraints_and_jac(x):
                return stacked(x), jax.jacobian(stacked)(x)
        else:
            constraints_and_jac = None

        span = float(jnp.max(jnp.abs(designs))) + 1.0
        xmin = jnp.full(designs.shape[1:],
                        lower_bound if lower_bound is not None else -10 * span)
        xmax = jnp.full(designs.shape[1:],
                        upper_bound if upper_bound is not None else 10 * span)

        result = _run(
            objective_and_grad,
            designs,
            xmin,
            xmax,
            n_iterations=n_iterations,
            constraints_and_jac=constraints_and_jac,
            maximize=True,
            move_limit=move_limit,
            mesh=mesh,
        )
        finalists = None
        if final_guard is not None:
            guarded_fn = self._guarded_objective_fn(final_guard)
            if guarded_fn is not None:
                finalists = reevaluate_finalists(
                    lambda x: guarded_fn(unflatten(x)),
                    result.designs,
                    result.objective_values[-1],
                    k=n_finalists,
                    maximize=True,
                )
                result = result._replace(
                    best_index=finalists.best_index,
                    best_design=finalists.best_design,
                    finalists=finalists,
                )
        # One (value, design) pair — histories stay index-aligned (the MMA
        # runner's checkpoint/resume zips them); the full per-candidate,
        # per-iteration curves live on the returned result.
        if finalists is not None:
            best_value = float(jnp.max(finalists.values))
        else:
            best_value = float(
                result.objective_values[-1, result.best_index]
            )
        self.objective_values.append(best_value)
        self.design_values.append(unflatten(result.best_design))
        return result

    def run_optimization_optax(
        self,
        initial_guess,
        n_iterations: int,
        optimizer=None,
        lower_bound=None,
        upper_bound=None,
        verbose: bool = True,
        guard="auto",
    ):
        """Unconstrained (box-projected) inverse design with optax.

        ``guard``: like ``run_optimization_mma`` — re-arms the forward
        solver's substep guard (default "auto", proximity-gated) so the
        optimizer tracks honest physics; ``None`` opts out.
        """

        self._ensure_guarded(guard)
        if not self.is_setup:
            self.setup_objective()

        def callback(it, design, value):
            self.objective_values.append(value)
            self.design_values.append(design)
            if verbose:
                print(f"Iteration: {len(self.objective_values)}\n"
                      f"Objective = {value}")

        result = run_optimization_optax(
            self.objective_fn,
            initial_guess,
            n_iterations=n_iterations,
            optimizer=optimizer,
            maximize=True,
            lower_bound=lower_bound,
            upper_bound=upper_bound,
            callback=callback,
        )
        if self.design_values:  # zero-iteration runs have no best design
            self.compute_best_forward()
        return result.design

    def compute_best_forward(self):
        if not self.design_values:
            raise ValueError("No design has been optimized yet.")
        best = self.design_values[-1]
        if hasattr(self, "forward_problem"):
            if not self.forward_problem.is_setup:
                self.forward_problem.setup()
            self.forward_problem.solution_data = self.forward_problem.solve(best)
            return self.forward_problem.solution_data
        solutions = []
        for problem in self.forward_problems:
            if not problem.is_setup:
                problem.setup()
            problem.solution_data = problem.solve(best)
            solutions.append(problem.solution_data)
        return solutions
