"""Reference (non-optimized) rotated-square design: forward dynamics only.

A pulse is driven into a rotated-square lattice at a fixed initial angle —
the baseline configuration the optimized designs are compared against.

Behavioral parity: reference problems/reference_design.py (pulse and BC
variants at 90-215; same four driven sides and clamped corners as the quads
problems, but the design is the single rotated-square angle).
"""

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, List, Literal, Optional, Union

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.geometry.quad import RotatedSquareGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.assembly import build_strain_energy, combine_block_energies
from difflexmm_tpu.ops.bonds import ligament_energy, ligament_energy_linearized
from difflexmm_tpu.ops.contact import build_contact_energy
from difflexmm_tpu.ops.grid import build_quad_grid_energy
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


@dataclass
class ForwardProblem:
    """Pulse-driven rotated-square lattice with clamped corners."""

    # Geometry
    n1_cells: int
    n2_cells: int
    spacing: Any
    bond_length: Any
    initial_angle: Any

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
    loaded_side: Literal["left", "right", "bottom", "top"]
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

    solution_data: Optional[Union[SolutionType, List[SolutionType]]] = None

    method: str = "verlet"
    n_substeps: int = 20
    grid_energy: bool = True
    atol: float = 1e-8
    rtol: float = 1e-8
    # Interpreter-mode Pallas (CPU parity tests; no effect on other methods).
    pallas_interpret: bool = False
    # Reactive substep escalation at force spikes ("auto" derives the
    # threshold from the contact window; see setup_dynamic_solver).
    guard: Any = None

    is_setup: bool = False
    name: str = "reference_design"

    def setup(self, excited_blocks_fn: Optional[Callable] = None) -> None:
        geometry = RotatedSquareGeometry(
            n1_cells=self.n1_cells,
            n2_cells=self.n2_cells,
            spacing=self.spacing,
            bond_length=self.bond_length,
        )
        bc_fn, cnv_fn, bond_fn, rbv_fn = geometry.get_parametrization()
        bonds = bond_fn()
        ref_bond_vectors = rbv_fn()

        driven_pairs, drive_mask = base.driven_side_pairs(
            geometry.n1_blocks, geometry.n2_blocks, self.n_excited_blocks,
            self.loaded_side, self.input_shift,
        )
        clamped_pairs = base.clamped_corner_pairs(
            geometry.n1_blocks, geometry.n2_blocks, self.n_blocks_clamped_corner
        )
        base.check_disjoint_constrained_pairs(
            driven=driven_pairs, clamped_corners=clamped_pairs
        )
        constrained_pairs = np.concatenate([driven_pairs, clamped_pairs])
        drive_vector = jnp.asarray(
            np.concatenate([drive_mask, np.zeros(len(clamped_pairs))])
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
            energy = build_quad_grid_energy(
                geometry.n1_blocks, geometry.n2_blocks, bond_energy_fn,
                use_contact=self.use_contact,
            )
        else:
            strain_energy = build_strain_energy(bonds, bond_energy_fn)
            energy = (
                combine_block_energies(strain_energy, build_contact_energy(bonds))
                if self.use_contact
                else strain_energy
            )

        # The rotated-square lattice is an n1 x n2 grid of 4-gons, so the
        # gridded quad kernels apply unchanged.
        quad_grid = (
            dict(
                n1=geometry.n1_blocks,
                n2=geometry.n2_blocks,
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
            quad_grid=quad_grid,
            pallas_interpret=self.pallas_interpret,
            guard=base.resolve_model_guard(
                self.guard, self.min_angle, self.cutoff_angle, self.spacing
            ),
        )

        timepoints = jnp.linspace(0.0, self.simulation_time, self.n_timepoints)
        state0 = jnp.zeros((2, geometry.n_blocks, 3))
        amplitude = (
            self.amplitude
            if self.loaded_side in ("left", "bottom")
            else -self.amplitude
        )

        def forward(angle=None) -> SolutionData:
            angle = self.initial_angle if angle is None else angle
            centroids = bc_fn(angle)
            node_vectors = cnv_fn(angle)
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
        self.moving_blocks_ids = np.setdiff1d(
            np.arange(geometry.n_blocks), self.clamped_blocks_ids
        )
        self.is_setup = True

    def to_dict(self) -> dict:
        return base.problem_to_dict(self)

    @staticmethod
    def from_dict(dict_in: dict) -> "ForwardProblem":
        return base.forward_problem_from_dict(ForwardProblem, dict_in)
