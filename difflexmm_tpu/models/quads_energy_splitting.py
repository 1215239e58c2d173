"""Energy splitting: one input, several weighted target patches.

Weights may be negative to *protect* a region while focusing energy
elsewhere. Behavioral parity: reference problems/quads_energy_splitting.py
(objective at 42-88); reuses the quads_focusing ForwardProblem.
"""

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp

from difflexmm_tpu.geometry.polygon import compute_inertia
from difflexmm_tpu.models import base
from difflexmm_tpu.models.quads_focusing import ForwardProblem
from difflexmm_tpu.models.runner import OptimizationRunnerMixin
from difflexmm_tpu.ops.observables import kinetic_energy


@dataclass
class OptimizationProblem(OptimizationRunnerMixin):
    """Maximize a weighted sum of kinetic energies over several targets."""

    forward_problem: ForwardProblem
    target_sizes: Tuple[Tuple[int, int], ...]
    target_shifts: Tuple[Tuple[int, int], ...]
    weights: Tuple[float, ...]
    objective_values: Optional[List[Any]] = None
    objective_values_individual: Optional[List[Any]] = None
    design_values: Optional[List[Any]] = None
    constraints_violation: Optional[Dict[str, List[Any]]] = None
    name: str = "quads_energy_splitting"
    is_setup: bool = False

    def __post_init__(self):
        self.objective_values = self.objective_values or []
        self.objective_values_individual = self.objective_values_individual or []
        self.design_values = self.design_values or []
        self.constraints_violation = self.constraints_violation or {
            "angles": [], "edge_lengths": []
        }

    def setup_objective(self) -> None:
        if not self.forward_problem.is_setup:
            self.forward_problem.setup()
        geometry = self.forward_problem.geometry
        # Stack equal-size targets on a leading axis so the per-target KE is
        # one batched reduction (no Python loop) when sizes match.
        target_blocks_list = [
            base.target_patch_ids(geometry.n1_blocks, geometry.n2_blocks, size, shift)
            for size, shift in zip(self.target_sizes, self.target_shifts)
        ]
        weights = jnp.asarray(self.weights)

        def target_kinetic_energies(design):
            solution = self.forward_problem.solve(design)
            inertia = compute_inertia(
                solution.centroid_node_vectors, self.forward_problem.density
            )
            return jnp.stack(
                [
                    kinetic_energy(
                        solution.fields[:, 1, blocks, :], inertia[blocks]
                    )
                    for blocks in target_blocks_list
                ]
            )

        def total_objective(design):
            return weights @ target_kinetic_energies(design)

        self.objective_fn = total_objective
        self.objective_fn_individual = target_kinetic_energies
        self.target_blocks_list = target_blocks_list
        self.is_setup = True

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict:
        out = dataclasses.asdict(self)
        out["forward_problem"] = self.forward_problem.to_dict()
        return out

    @staticmethod
    def from_dict(dict_in: dict) -> "OptimizationProblem":
        data = dict(dict_in)
        data["forward_problem"] = ForwardProblem.from_dict(data["forward_problem"])
        problem = OptimizationProblem(**data)
        problem.is_setup = False
        return problem
