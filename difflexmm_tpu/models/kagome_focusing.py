"""Energy focusing on a free (non-periodic) kagome lattice.

Same solver path as quads focusing, different geometry parametrization
(design = three hinge-shift grids), proving the geometry-plugin contract.

Behavioral parity: reference problems/kagome_focusing.py (BCs at 97-165,
target cells at 404-408). Cell indexing: block ``2*cell`` is the "down"
triangle, ``2*cell + 1`` the "up" one; the left-edge drive acts on the down
triangles of the first column.
"""

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Literal, Optional, Tuple, Union

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.geometry.kagome import KagomeGeometry
from difflexmm_tpu.geometry.polygon import compute_inertia
from difflexmm_tpu.models import base
from difflexmm_tpu.models.runner import OptimizationRunnerMixin
from difflexmm_tpu.ops.assembly import build_strain_energy, combine_block_energies
from difflexmm_tpu.ops.bonds import ligament_energy, ligament_energy_linearized
from difflexmm_tpu.ops.contact import build_contact_energy
from difflexmm_tpu.ops.kagome_grid import build_kagome_grid_energy
from difflexmm_tpu.ops.observables import kinetic_energy
from difflexmm_tpu.solver.dynamics import FAST_METHODS, setup_dynamic_solver
from difflexmm_tpu.utils.types import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
    SolutionData,
    SolutionType,
)


def _kagome_corner_pairs(n1: int, n2: int, n_clamped: int) -> np.ndarray:
    """All-DOF pairs clamping the four corner fans of a kagome lattice.

    Corner block choices mirror the reference layout: down-triangles (2c)
    along the bottom-left row/column; at the bottom-right the row uses down
    triangles and the column up triangles; mirrored at the top.
    """

    n = n_clamped
    n_cells = n1 * n2
    bl = np.concatenate([np.arange(n) * 2, np.arange(1, n) * n1 * 2])
    br = np.concatenate(
        [np.arange(n1 - n, n1) * 2, (np.arange(0, n) + 1) * 2 * n1 - 1]
    )
    tr = np.concatenate(
        [np.arange(n_cells - n, n_cells) * 2 + 1,
         (n_cells - np.arange(1, n) * n1 - 1) * 2 + 1]
    )
    tl = np.concatenate(
        [np.arange(n_cells - n1, n_cells - n1 + n) * 2 + 1,
         (n_cells - n1 - np.arange(0, n) * n1) * 2]
    )
    return base.all_dofs_pairs(np.concatenate([bl, br, tr, tl]))


@dataclass
class ForwardProblem:
    """Pulse-driven kagome lattice with clamped corners."""

    # Geometry
    n1_cells: int
    n2_cells: int
    cell_size: Any
    cell_angle: Any
    bond_length: Any

    # Mechanical
    k_stretch: Any
    k_shear: Any
    k_rot: Any
    density: Any
    damping: Any

    # Dynamic loading
    amplitude: Any
    loading_rate: Any
    input_delay: Any
    n_excited_blocks: int
    loaded_side: Literal["left"] = "left"
    input_shift: int = 0

    # Analysis
    simulation_time: Any = 1.0
    n_timepoints: int = 100
    linearized_strains: bool = False

    # Contact
    use_contact: bool = True
    k_contact: Any = 1.0
    min_angle: Any = 0.0
    cutoff_angle: Any = 5.0 * jnp.pi / 180

    n_blocks_clamped_corner: int = 2

    # Gather-free (n2, n1) cell-grid energy assembly (ops/kagome_grid.py);
    # bit-identical to the general path, faster on TPU.
    grid_energy: bool = True

    solution_data: Optional[Union[SolutionType, List[SolutionType]]] = None

    method: str = "verlet"
    n_substeps: int = 20
    atol: float = 1e-8
    rtol: float = 1e-8
    # Interpreter-mode Pallas (CPU parity tests; no effect on other methods).
    pallas_interpret: bool = False
    # Reactive substep escalation at force spikes ("auto" derives the
    # threshold from the contact window, travel scaled by the cell size;
    # or a dict — see setup_dynamic_solver).
    guard: Any = None

    is_setup: bool = False
    name: str = "kagome_focusing"

    def setup(self, excited_blocks_fn: Optional[Callable] = None) -> None:
        geometry = KagomeGeometry(
            n1_cells=self.n1_cells,
            n2_cells=self.n2_cells,
            direct_basis=self.cell_size
            * jnp.array(
                [[1.0, 0.0],
                 [jnp.cos(self.cell_angle), jnp.sin(self.cell_angle)]]
            ),
            bond_length=self.bond_length,
        )
        (bc_fn, cnv_fn, bond_fn, rbv_fn) = geometry.get_parametrization()
        bonds = bond_fn()
        ref_bond_vectors = rbv_fn()

        if self.loaded_side != "left":
            raise ValueError(
                f"Unknown loaded_side: {self.loaded_side}. Only 'left' is implemented."
            )
        k = self.n_excited_blocks
        rows = np.arange((self.n2_cells - k) // 2 + self.input_shift,
                         (self.n2_cells + k) // 2 + self.input_shift)
        driven_blocks = rows * 2 * self.n1_cells  # down triangle, first column
        driven_pairs = base.all_dofs_pairs(driven_blocks)
        clamped_pairs = _kagome_corner_pairs(
            self.n1_cells, self.n2_cells, self.n_blocks_clamped_corner
        )
        base.check_disjoint_constrained_pairs(
            driven=driven_pairs, clamped_corners=clamped_pairs
        )
        constrained_pairs = np.concatenate([driven_pairs, clamped_pairs])
        drive_vector = jnp.asarray(
            np.concatenate(
                [np.concatenate([np.ones(k), np.zeros(2 * k)]),
                 np.zeros(len(clamped_pairs))]
            )
        )

        if excited_blocks_fn is None:
            def constrained_DOFs_fn(t, amplitude, loading_rate, input_delay):
                return base.pulse(t - input_delay, amplitude, loading_rate) * drive_vector
        else:
            def constrained_DOFs_fn(t, **kwargs):
                return excited_blocks_fn(t) * drive_vector

        bond_energy_fn = (
            ligament_energy_linearized if self.linearized_strains else ligament_energy
        )
        if self.grid_energy:
            energy = build_kagome_grid_energy(
                self.n1_cells, self.n2_cells, bond_energy_fn,
                use_contact=self.use_contact,
            )
        else:
            strain_energy = build_strain_energy(bonds, bond_energy_fn)
            energy = (
                combine_block_energies(strain_energy, build_contact_energy(bonds))
                if self.use_contact
                else strain_energy
            )

        kagome_grid = (
            dict(
                n1=self.n1_cells,
                n2=self.n2_cells,
                linearized=self.linearized_strains,
                use_contact=self.use_contact,
            )
            if self.method in FAST_METHODS
            else None
        )

        solve_dynamics = setup_dynamic_solver(
            geometry=geometry,
            energy_fn=energy,
            constrained_block_DOF_pairs=constrained_pairs,
            constrained_DOFs_fn=constrained_DOFs_fn,
            damped_blocks=np.arange(geometry.n_blocks),
            method=self.method,
            n_substeps=self.n_substeps,
            atol=self.atol,
            rtol=self.rtol,
            kagome_grid=kagome_grid,
            pallas_interpret=self.pallas_interpret,
            guard=base.resolve_model_guard(
                self.guard, self.min_angle, self.cutoff_angle, self.cell_size
            ),
        )

        timepoints = jnp.linspace(0.0, self.simulation_time, self.n_timepoints)
        state0 = jnp.zeros((2, geometry.n_blocks, 3))
        amplitude = self.amplitude

        def forward(shifts: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]) -> SolutionData:
            centroids = bc_fn(*shifts)
            node_vectors = cnv_fn(*shifts)
            control_params = ControlParams(
                geometrical_params=GeometricalParams(centroids, node_vectors),
                mechanical_params=MechanicalParams(
                    bond_params=LigamentParams(
                        k_stretch=self.k_stretch,
                        k_shear=self.k_shear,
                        k_rot=self.k_rot,
                        reference_vector=ref_bond_vectors,
                    ),
                    density=self.density,
                    damping=self.damping,
                    contact_params=ContactParams(
                        min_angle=self.min_angle,
                        cutoff_angle=self.cutoff_angle,
                        k_contact=self.k_contact,
                    ),
                ),
                constraint_params=dict(
                    amplitude=amplitude,
                    loading_rate=self.loading_rate,
                    input_delay=self.input_delay,
                ),
            )
            fields = solve_dynamics(state0, timepoints, control_params)
            return SolutionData(
                block_centroids=centroids,
                centroid_node_vectors=node_vectors,
                bond_connectivity=bonds,
                timepoints=timepoints,
                fields=fields,
            )

        self.solve = forward
        self.geometry = geometry
        self.clamped_blocks_ids = np.unique(clamped_pairs[:, 0])
        self.driven_blocks_ids = np.unique(driven_pairs[:, 0])
        self.is_setup = True

    def to_dict(self) -> dict:
        return base.problem_to_dict(self)

    @staticmethod
    def from_dict(dict_in: dict) -> "ForwardProblem":
        return base.forward_problem_from_dict(ForwardProblem, dict_in)


@dataclass
class OptimizationProblem(OptimizationRunnerMixin):
    """Maximize target-cell kinetic energy over the kagome hinge shifts."""

    forward_problem: ForwardProblem
    target_size: Tuple[int, int]
    target_shift: Tuple[int, int] = (0, 0)
    objective_values: Optional[List[Any]] = None
    design_values: Optional[List[Any]] = None
    constraints_violation: Optional[Dict[str, List[Any]]] = None
    name: str = "kagome_focusing"
    is_setup: bool = False

    def __post_init__(self):
        self.objective_values = self.objective_values or []
        self.design_values = self.design_values or []
        self.constraints_violation = self.constraints_violation or {
            "angles": [], "edge_lengths": []
        }

    def _boundary_node_ids(self):
        raise NotImplementedError(
            "Boundary angle constraints are quad-lattice specific."
        )

    def setup_objective(self) -> None:
        if not self.forward_problem.is_setup:
            self.forward_problem.setup()
        n1 = self.forward_problem.n1_cells
        n2 = self.forward_problem.n2_cells
        cells = base.target_patch_ids(n1, n2, self.target_size, self.target_shift)
        # Both triangles of each target cell.
        target_blocks = np.stack([2 * cells, 2 * cells + 1], axis=1).reshape(-1)

        def target_kinetic_energy(shifts):
            solution = self.forward_problem.solve(shifts)
            inertia = compute_inertia(
                solution.centroid_node_vectors, self.forward_problem.density
            )
            return kinetic_energy(
                solution.fields[:, 1, target_blocks, :], inertia[target_blocks]
            )

        self.objective_fn = target_kinetic_energy
        self.target_blocks = target_blocks
        self.is_setup = True

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
