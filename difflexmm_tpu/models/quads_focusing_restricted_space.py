"""Focusing with a restricted design space: only hinges inside a patch
around the target move; the rest stay at the initial guess.

Behavioral parity: reference problems/quads_focusing_restricted_space.py
(masks at 439-456, reduced<->full maps at 459-471, reduced objective at
505-510). Reuses the quads_focusing ForwardProblem; the optimizer sees only
the reduced design vector.
"""

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.geometry.polygon import compute_inertia
from difflexmm_tpu.models import base
from difflexmm_tpu.models.quads_focusing import ForwardProblem
from difflexmm_tpu.models.runner import OptimizationRunnerMixin
from difflexmm_tpu.ops.observables import kinetic_energy


@dataclass
class OptimizationProblem(OptimizationRunnerMixin):
    """Target-KE focusing over a reduced (patch-masked) design space."""

    forward_problem: ForwardProblem
    target_size: Tuple[int, int]
    target_shift: Tuple[int, int]
    initial_guess_all: Tuple[Any, Any]
    design_patch_size: Optional[int] = None
    objective_values: Optional[List[Any]] = None
    design_values: Optional[List[Any]] = None
    constraints_violation: Optional[Dict[str, List[Any]]] = None
    name: str = "quads_focusing_restricted_space"
    is_setup: bool = False

    def __post_init__(self):
        self.objective_values = self.objective_values or []
        self.design_values = self.design_values or []
        self.constraints_violation = self.constraints_violation or {
            "angles": [], "edge_lengths": []
        }
        n1 = self.forward_problem.n1_blocks
        n2 = self.forward_problem.n2_blocks
        if self.design_patch_size is None:
            self.design_patch_size = max(n1, n2)
        ps = self.design_patch_size
        x0 = int(np.clip((n1 - ps) // 2 + self.target_shift[0], 0, n1))
        x1 = int(np.clip((n1 + ps) // 2 + self.target_shift[0], 0, n1))
        y0 = int(np.clip((n2 - ps) // 2 + self.target_shift[1], 0, n2))
        y1 = int(np.clip((n2 + ps) // 2 + self.target_shift[1], 0, n2))
        h_mask = np.zeros(np.shape(self.initial_guess_all[0]), dtype=bool)
        h_mask[x0:x1 + 1, y0:y1] = True
        v_mask = np.zeros(np.shape(self.initial_guess_all[1]), dtype=bool)
        v_mask[x0:x1, y0:y1 + 1] = True
        self.horizontal_shifts_mask = jnp.asarray(h_mask)
        self.vertical_shifts_mask = jnp.asarray(v_mask)

    # -- reduced <-> full design maps ----------------------------------------

    def all_to_reduced_shifts(self, all_shifts):
        h, v = all_shifts
        return h[self.horizontal_shifts_mask], v[self.vertical_shifts_mask]

    def reduced_to_all_shifts(self, reduced_shifts):
        rh, rv = reduced_shifts
        h0, v0 = self.initial_guess_all
        h = jnp.asarray(h0).at[self.horizontal_shifts_mask].set(rh)
        v = jnp.asarray(v0).at[self.vertical_shifts_mask].set(rv)
        return h, v

    def setup_objective(self) -> None:
        if not self.forward_problem.is_setup:
            self.forward_problem.setup()
        geometry = self.forward_problem.geometry
        target_blocks = base.target_patch_ids(
            geometry.n1_blocks, geometry.n2_blocks, self.target_size, self.target_shift
        )

        def target_kinetic_energy_reduced(reduced_design):
            design = self.reduced_to_all_shifts(reduced_design)
            solution = self.forward_problem.solve(design)
            inertia = compute_inertia(
                solution.centroid_node_vectors, self.forward_problem.density
            )
            return kinetic_energy(
                solution.fields[:, 1, target_blocks, :], inertia[target_blocks]
            )

        self.objective_fn = target_kinetic_energy_reduced
        self.target_blocks = target_blocks
        self.is_setup = True

    def _design_constraints(self, min_void_angle, min_block_angle,
                            min_edge_length, boundary_angle_constraint=False):
        """Constraints evaluated on the full design reconstructed from the
        reduced variables (so the masked-out region stays feasible by
        construction of the initial guess)."""

        constraints = super()._design_constraints(
            min_void_angle, min_block_angle, min_edge_length,
            boundary_angle_constraint,
        )
        return [
            (name, lambda rd, fn=fn: fn(self.reduced_to_all_shifts(rd)))
            for name, fn in constraints
        ]

    def compute_best_forward(self):
        if not self.design_values:
            raise ValueError("No design has been optimized yet.")
        if not self.forward_problem.is_setup:
            self.forward_problem.setup()
        full = self.reduced_to_all_shifts(self.design_values[-1])
        self.forward_problem.solution_data = self.forward_problem.solve(full)
        return self.forward_problem.solution_data

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict:
        out = dataclasses.asdict(self)
        out["forward_problem"] = self.forward_problem.to_dict()
        out.pop("horizontal_shifts_mask", None)
        out.pop("vertical_shifts_mask", None)
        return out

    @staticmethod
    def from_dict(dict_in: dict) -> "OptimizationProblem":
        data = dict(dict_in)
        data["forward_problem"] = ForwardProblem.from_dict(data["forward_problem"])
        problem = OptimizationProblem(**data)
        problem.is_setup = False
        return problem
