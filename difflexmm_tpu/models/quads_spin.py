"""Spin focusing: maximize time-integrated angular momentum of a target
patch about a spin center.

Behavioral parity: reference problems/quads_spin.py (ForwardInput at 16-40,
objective at 380-433; ``spin_center="center"`` auto-computes the center from
the target blocks of the initial design).
"""

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp

from difflexmm_tpu.geometry.polygon import compute_inertia
from difflexmm_tpu.models import base
from difflexmm_tpu.models.quads_focusing import ForwardProblem
from difflexmm_tpu.models.runner import OptimizationRunnerMixin
from difflexmm_tpu.ops.observables import angular_momentum


@dataclass
class ForwardInput:
    """Initial design used to anchor the spin center."""

    horizontal_shifts: Any
    vertical_shifts: Any


@dataclass
class OptimizationProblem(OptimizationRunnerMixin):
    """Maximize target angular momentum about the spin center."""

    forward_problem: ForwardProblem
    forward_input: ForwardInput
    target_size: Tuple[int, int]
    target_shift: Tuple[int, int]
    spin_center: Union[str, Any] = "center"
    objective_values: Optional[List[Any]] = None
    design_values: Optional[List[Any]] = None
    constraints_violation: Optional[Dict[str, List[Any]]] = None
    name: str = "quads_spin"
    is_setup: bool = False

    def __post_init__(self):
        self.objective_values = self.objective_values or []
        self.design_values = self.design_values or []
        self.constraints_violation = self.constraints_violation or {
            "angles": [], "edge_lengths": []
        }

    def setup_objective(self) -> None:
        if not self.forward_problem.is_setup:
            self.forward_problem.setup()
        geometry = self.forward_problem.geometry
        target_blocks = base.target_patch_ids(
            geometry.n1_blocks, geometry.n2_blocks, self.target_size, self.target_shift
        )
        if isinstance(self.spin_center, str) and self.spin_center == "center":
            spin_center = geometry.block_centroids(
                self.forward_input.horizontal_shifts,
                self.forward_input.vertical_shifts,
            )[target_blocks].mean(axis=0)
        else:
            spin_center = jnp.asarray(self.spin_center)

        density = self.forward_problem.density

        def target_angular_momentum(design):
            solution = self.forward_problem.solve(design)
            inertia = compute_inertia(
                solution.centroid_node_vectors[target_blocks], density
            )
            # Batched over time (leading axis broadcasting in observables).
            positions = (
                solution.block_centroids[target_blocks]
                + solution.fields[:, 0, target_blocks, :2]
            )
            L = angular_momentum(
                positions,
                solution.fields[:, 1, target_blocks, :],
                inertia,
                reference_point=spin_center,
            )
            return jnp.sum(L)

        self.objective_fn = target_angular_momentum
        self.target_blocks = target_blocks
        self._spin_center = spin_center
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
        if isinstance(data.get("forward_input"), dict):
            data["forward_input"] = ForwardInput(**data["forward_input"])
        problem = OptimizationProblem(**data)
        problem.is_setup = False
        return problem
