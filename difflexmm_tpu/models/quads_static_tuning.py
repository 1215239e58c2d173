"""Multi-tasking via static pre-compression: a static ramp chained into
dynamics in a single differentiable simulation, swept over loading scenarios.

The lattice is compressed quasi-statically between its clamped bottom/top
edges, then a delayed pulse is driven from the left edge; the design is
optimized for a weighted combination of per-scenario target kinetic
energies (negative weights "protect" a region).

Behavioral parity: reference problems/quads_kinetic_energy_static_tuning.py
(chained constraint drive at 188-196, dynamic-phase-only optimization
timepoints at 275-281, pmap over scenarios at 473-478). TPU-native
differences: the chained loading integrates as two fixed-step phases
(static ramp grid, then dynamic grid, state handed off) so each phase has a
stable step size; scenarios run vmapped on one chip or scenario-sharded over
the device mesh (difflexmm_tpu.parallel) instead of pmap.
"""

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry.polygon import compute_inertia
from difflexmm_tpu.geometry.quad import QuadGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.models.runner import OptimizationRunnerMixin
from difflexmm_tpu.ops.assembly import build_strain_energy, combine_block_energies
from difflexmm_tpu.ops.bonds import ligament_energy, ligament_energy_linearized
from difflexmm_tpu.ops.contact import build_contact_energy
from difflexmm_tpu.ops.grid import build_quad_grid_energy
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


@dataclass
class ForwardInput:
    """Per-scenario loading inputs (tuples of equal length = n_scenarios)."""

    horizontal_shifts: Any
    vertical_shifts: Any
    amplitude: Tuple[Any, ...]
    loading_rate: Tuple[Any, ...]
    compressive_strain: Tuple[Any, ...]
    compressive_strain_rate: Tuple[Any, ...]


@dataclass
class ForwardProblem:
    """Compression-then-pulse quad lattice, clamped top/bottom edges."""

    # Geometry
    n1_blocks: int
    n2_blocks: int
    spacing: Any
    bond_length: Any

    # Mechanical
    k_stretch: Any
    k_shear: Any
    k_rot: Any
    density: Any
    damping: Any

    # Dynamic loading
    n_excited_blocks: int
    input_shift: int = 0

    # Analysis
    simulation_time_dynamic: Any = 1.0
    n_timepoints: int = 100
    n_timepoints_static: int = 17
    linearized_strains: bool = False

    # Contact
    use_contact: bool = True
    k_contact: Any = 1.0
    min_angle: Any = 0.0
    cutoff_angle: Any = 5.0 * jnp.pi / 180

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
    name: str = "quads_kinetic_energy_static_tuning"

    def setup(self, excited_blocks_fn=None) -> None:
        geometry = QuadGeometry(
            n1_blocks=self.n1_blocks,
            n2_blocks=self.n2_blocks,
            spacing=self.spacing,
            bond_length=self.bond_length,
        )
        bc_fn, cnv_fn, bond_fn, rbv_fn = geometry.get_parametrization()
        bonds = bond_fn()
        ref_bond_vectors = rbv_fn()
        n1, n2 = self.n1_blocks, self.n2_blocks

        driven_pairs, drive_mask = base.driven_side_pairs(
            n1, n2, self.n_excited_blocks, "left", self.input_shift
        )
        k = self.n_excited_blocks
        bottom_blocks = np.arange(n1)
        top_blocks = np.arange(n1 * (n2 - 1), n1 * n2)

        def edge_pairs(blocks):
            # y DOF first so the compression drive addresses it contiguously
            return np.stack(
                [np.tile(blocks, 3), np.repeat([1, 0, 2], len(blocks))], axis=1
            )

        bottom_pairs = edge_pairs(bottom_blocks)
        top_pairs = edge_pairs(top_blocks)
        base.check_disjoint_constrained_pairs(
            driven=driven_pairs, bottom_edge=bottom_pairs, top_edge=top_pairs
        )
        constrained_pairs = np.concatenate([driven_pairs, bottom_pairs, top_pairs])

        n_con = len(constrained_pairs)
        dynamic_vector = np.zeros(n_con)
        dynamic_vector[:k] = 1.0
        static_vector = np.zeros(n_con)
        static_vector[3 * k : 3 * k + n1] = 0.5      # bottom edge: +y
        static_vector[3 * k + 3 * n1 : 3 * k + 4 * n1] = -0.5  # top edge: -y
        dynamic_vector = jnp.asarray(dynamic_vector)
        static_vector = jnp.asarray(static_vector)
        gauge = (n2 - 1) * self.spacing

        if excited_blocks_fn is None:
            def drive_dynamic(t, amplitude, loading_rate):
                return base.pulse(t, amplitude, loading_rate) * dynamic_vector
        else:
            def drive_dynamic(t, *args, **kwargs):
                return excited_blocks_fn(t) * dynamic_vector

        def drive_static(t, compressive_strain, compressive_strain_rate):
            ramp = jnp.where(
                t < compressive_strain / compressive_strain_rate,
                t * compressive_strain_rate,
                compressive_strain,
            )
            return gauge * ramp * static_vector

        def constrained_DOFs_fn(t, amplitude, loading_rate, compressive_strain,
                                compressive_strain_rate, input_delay):
            t_dynamic = t - compressive_strain / compressive_strain_rate - input_delay
            return drive_static(
                t, compressive_strain, compressive_strain_rate
            ) + drive_dynamic(t_dynamic, amplitude, loading_rate)

        bond_energy_fn = (
            ligament_energy_linearized if self.linearized_strains else ligament_energy
        )
        if self.grid_energy:
            energy = build_quad_grid_energy(
                n1, n2, bond_energy_fn, use_contact=self.use_contact
            )
        else:
            strain_energy = build_strain_energy(bonds, bond_energy_fn)
            energy = (
                combine_block_energies(strain_energy, build_contact_energy(bonds))
                if self.use_contact
                else strain_energy
            )

        quad_grid = (
            dict(
                n1=n1,
                n2=n2,
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

        state0 = jnp.zeros((2, geometry.n_blocks, 3))

        def control_params(design, amplitude, loading_rate, compressive_strain,
                           compressive_strain_rate, input_delay):
            h, v = design
            return ControlParams(
                geometrical_params=GeometricalParams(bc_fn(h, v), cnv_fn(h, v)),
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
                    loading_rate=loading_rate,
                    compressive_strain=compressive_strain,
                    compressive_strain_rate=compressive_strain_rate,
                    input_delay=input_delay,
                ),
            )

        def _solution(design, timepoints, fields):
            h, v = design
            return SolutionData(
                block_centroids=bc_fn(h, v),
                centroid_node_vectors=cnv_fn(h, v),
                bond_connectivity=bonds,
                timepoints=timepoints,
                fields=fields,
            )

        def solve_dynamic(design, amplitude, loading_rate, compressive_strain,
                          compressive_strain_rate) -> SolutionData:
            """Dynamic-phase solution only (the optimization path).

            Phase A integrates the static ramp on its own grid; phase B
            restarts from the compressed state and records the dynamic
            response. Timepoints are reported relative to the pulse start.
            """

            input_delay = 0.1 / loading_rate
            t_start = compressive_strain / compressive_strain_rate + input_delay
            cp = control_params(design, amplitude, loading_rate,
                                compressive_strain, compressive_strain_rate,
                                input_delay)
            ts_static = jnp.linspace(0.0, t_start, self.n_timepoints_static)
            static_fields = solve_dynamics(state0, ts_static, cp)
            ts_dynamic = t_start + jnp.linspace(
                0.0, self.simulation_time_dynamic, self.n_timepoints
            )
            fields = solve_dynamics(static_fields[-1], ts_dynamic, cp)
            return _solution(design, ts_dynamic - t_start, fields)

        def solve_full(design, amplitude, loading_rate, compressive_strain,
                       compressive_strain_rate) -> SolutionData:
            """Full solution including the static phase (absolute times)."""

            input_delay = 0.1 / loading_rate
            t_start = compressive_strain / compressive_strain_rate + input_delay
            cp = control_params(design, amplitude, loading_rate,
                                compressive_strain, compressive_strain_rate,
                                input_delay)
            ts_static = jnp.linspace(0.0, t_start, self.n_timepoints_static)
            static_fields = solve_dynamics(state0, ts_static, cp)
            ts_dynamic = t_start + jnp.linspace(
                0.0, self.simulation_time_dynamic, self.n_timepoints
            )
            fields = solve_dynamics(static_fields[-1], ts_dynamic, cp)
            return _solution(
                design,
                jnp.concatenate([ts_static, ts_dynamic[1:]]),
                jnp.concatenate([static_fields, fields[1:]]),
            )

        self.solve_dynamic = solve_dynamic
        self.solve_full = solve_full
        self.solve = solve_full
        self.geometry = geometry
        self.clamped_blocks_ids = np.unique(
            np.concatenate([bottom_pairs, top_pairs])[:, 0]
        )
        self.driven_blocks_ids = np.unique(driven_pairs[:, 0])
        self.is_setup = True

    def to_dict(self) -> dict:
        return base.problem_to_dict(self)

    @staticmethod
    def from_dict(dict_in: dict) -> "ForwardProblem":
        return base.forward_problem_from_dict(ForwardProblem, dict_in)


@dataclass
class OptimizationProblem(OptimizationRunnerMixin):
    """Weighted multi-scenario target-KE objective over shared design."""

    forward_problem: ForwardProblem
    forward_input: ForwardInput
    target_sizes: Tuple[Tuple[int, int], ...]
    target_shifts: Tuple[Tuple[int, int], ...]
    weights: Tuple[float, ...]
    objective_values: Optional[List[Any]] = None
    objective_values_individual: Optional[List[Any]] = None
    design_values: Optional[List[Any]] = None
    constraints_violation: Optional[Dict[str, List[Any]]] = None
    name: str = "quads_kinetic_energy_static_tuning"
    is_setup: bool = False

    def __post_init__(self):
        self.objective_values = self.objective_values or []
        self.objective_values_individual = self.objective_values_individual or []
        self.design_values = self.design_values or []
        self.constraints_violation = self.constraints_violation or {
            "angles": [], "edge_lengths": []
        }

    def setup_objective(self, mesh=None) -> None:
        """Install the weighted multi-scenario objective.

        Args:
            mesh: optional device mesh; scenarios are scenario-sharded over
                it (the reference's pmap pattern). Default: vmap on one chip.
        """

        if not self.forward_problem.is_setup:
            self.forward_problem.setup()
        geometry = self.forward_problem.geometry
        density = self.forward_problem.density

        target_blocks_array = jnp.asarray(
            [
                base.target_patch_ids(
                    geometry.n1_blocks, geometry.n2_blocks, size, shift
                )
                for size, shift in zip(self.target_sizes, self.target_shifts)
            ]
        )
        forward_input_array = jnp.array(
            [
                self.forward_input.amplitude,
                self.forward_input.loading_rate,
                self.forward_input.compressive_strain,
                self.forward_input.compressive_strain_rate,
            ]
        ).T  # (n_scenarios, 4)
        weights = jnp.asarray(self.weights)

        def target_kinetic_energy(design, forward_input, target_blocks):
            solution = self.forward_problem.solve_dynamic(design, *forward_input)
            inertia = compute_inertia(solution.centroid_node_vectors, density)
            return kinetic_energy(
                solution.fields[:, 1, target_blocks, :], inertia[target_blocks]
            )

        if mesh is not None:
            from difflexmm_tpu.parallel import scenario_parallel_objective

            sharded = scenario_parallel_objective(
                lambda design, inp: target_kinetic_energy(
                    design, inp[:4], inp[4:].astype(jnp.int32)
                ),
                mesh,
            )
            packed = jnp.concatenate(
                [forward_input_array, target_blocks_array.astype(float)], axis=1
            )

            def total_objective(design):
                return sharded(design, packed, weights)

            def individual(design):
                return jax.vmap(
                    lambda inp, tb: target_kinetic_energy(design, inp, tb)
                )(forward_input_array, target_blocks_array)
        else:
            mapped = jax.vmap(target_kinetic_energy, in_axes=(None, 0, 0))

            def total_objective(design):
                return weights @ mapped(
                    design, forward_input_array, target_blocks_array
                )

            def individual(design):
                return mapped(design, forward_input_array, target_blocks_array)

        self.objective_fn = total_objective
        self.objective_fn_individual = individual
        self.target_blocks = target_blocks_array
        self.is_setup = True

    def compute_best_forward(self):
        if not self.design_values:
            raise ValueError("No design has been optimized yet.")
        if not self.forward_problem.is_setup:
            self.forward_problem.setup()
        best = self.design_values[-1]
        self.forward_problem.solution_data = [
            self.forward_problem.solve_full(best, a, lr, cs, csr)
            for a, lr, cs, csr in zip(
                self.forward_input.amplitude,
                self.forward_input.loading_rate,
                self.forward_input.compressive_strain,
                self.forward_input.compressive_strain_rate,
            )
        ]
        return self.forward_problem.solution_data

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
