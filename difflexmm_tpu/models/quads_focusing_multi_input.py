"""Multi-input focusing: several forward problems (one per driven side),
one shared design, one target patch.

Behavioral parity: reference problems/quads_focusing_multi_input.py
(objective at 43-86). TPU note: the per-problem solves are independent and
XLA overlaps them within one jitted objective; for device-mesh scenario
parallelism over many inputs use difflexmm_tpu.parallel.scenarios instead
of the reference's in-objective Python loop.
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
    """Maximize weighted target KE across several input scenarios."""

    forward_problems: List[ForwardProblem]
    target_size: Tuple[int, int]
    target_shift: Tuple[int, int]
    weights: Tuple[float, ...]
    objective_values: Optional[List[Any]] = None
    objective_values_individual: Optional[List[Any]] = None
    design_values: Optional[List[Any]] = None
    constraints_violation: Optional[Dict[str, List[Any]]] = None
    name: str = "quads_focusing_multi_input"
    is_setup: bool = False

    def __post_init__(self):
        self.objective_values = self.objective_values or []
        self.objective_values_individual = self.objective_values_individual or []
        self.design_values = self.design_values or []
        self.constraints_violation = self.constraints_violation or {
            "angles": [], "edge_lengths": []
        }

    def setup_objective(self) -> None:
        for problem in self.forward_problems:
            if not problem.is_setup:
                problem.setup()
        geometry = self.forward_problems[0].geometry
        target_blocks = base.target_patch_ids(
            geometry.n1_blocks, geometry.n2_blocks, self.target_size, self.target_shift
        )
        weights = jnp.asarray(self.weights)

        def target_kinetic_energies(design):
            inertia = compute_inertia(
                geometry.centroid_node_vectors(*design),
                self.forward_problems[0].density,
            )[target_blocks]
            return jnp.stack(
                [
                    kinetic_energy(
                        problem.solve(design).fields[:, 1, target_blocks, :],
                        inertia,
                    )
                    for problem in self.forward_problems
                ]
            )

        def total_objective(design):
            return weights @ target_kinetic_energies(design)

        self.objective_fn = total_objective
        self.objective_fn_individual = target_kinetic_energies
        self.target_blocks = target_blocks
        self.is_setup = True

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict:
        out = dataclasses.asdict(self)
        out["forward_problems"] = [p.to_dict() for p in self.forward_problems]
        return out

    @staticmethod
    def from_dict(dict_in: dict) -> "OptimizationProblem":
        data = dict(dict_in)
        data["forward_problems"] = [
            ForwardProblem.from_dict(p) for p in data["forward_problems"]
        ]
        problem = OptimizationProblem(**data)
        problem.is_setup = False
        return problem
