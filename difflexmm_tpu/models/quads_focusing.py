"""Energy focusing on a quad lattice: the canonical inverse-design problem.

A pulse enters from one side of an aperiodic quad lattice; the design
(hinge shift grids) is optimized to maximize the kinetic energy delivered to
a target patch, subject to fabrication constraints (minimum void/block
angles and edge lengths).

Behavioral parity: reference problems/quads_focusing.py (ForwardProblem
26-405, OptimizationProblem 408-691). TPU-native differences: the solver is
the checkpointed-scan integrator; the constrained optimizer is the on-device
JAX MMA (optim.mma) instead of nlopt's C LD_MMA; an optax path is also
provided. Both keep the reference's iteration-history artifact model.
"""

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Literal, Optional, Tuple, Union

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
from difflexmm_tpu.ops.observables import (
    compute_ligament_strains_history,
    kinetic_energy,
)
from difflexmm_tpu.optim.loops import ravel_pytree, run_optimization_optax
from difflexmm_tpu.optim.mma import run_mma
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
    """Pulse-driven quad lattice with clamped corners.

    ``setup()`` installs ``self.solve(design) -> SolutionData`` where
    ``design = (horizontal_shifts, vertical_shifts)``.
    """

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

    # Solver configuration (TPU path: fixed-step checkpointed scan).
    method: str = "verlet"
    n_substeps: int = 20
    # Gather-free gridded energy assembly (ops/grid.py); bit-identical to
    # the general path, much lower per-step op count on TPU.
    grid_energy: bool = True
    atol: float = 1e-8
    rtol: float = 1e-8
    # Interpreter-mode Pallas (CPU parity tests; no effect on other methods).
    pallas_interpret: bool = False
    # Reactive substep escalation at contact force spikes ("auto" derives
    # the threshold from the contact window and counts translational travel
    # at the lattice spacing; or a dict — see setup_dynamic_solver).
    guard: Any = None

    is_setup: bool = False
    name: str = "quads_focusing"

    def setup(self, excited_blocks_fn: Optional[Callable] = None) -> None:
        geometry = QuadGeometry(
            n1_blocks=self.n1_blocks,
            n2_blocks=self.n2_blocks,
            spacing=self.spacing,
            bond_length=self.bond_length,
        )
        (
            block_centroids,
            centroid_node_vectors,
            bond_connectivity,
            reference_bond_vectors,
        ) = geometry.get_parametrization()
        bonds = bond_connectivity()
        ref_bond_vectors = reference_bond_vectors()

        driven_pairs, drive_mask = base.driven_side_pairs(
            self.n1_blocks, self.n2_blocks, self.n_excited_blocks,
            self.loaded_side, self.input_shift,
        )
        clamped_pairs = base.clamped_corner_pairs(
            self.n1_blocks, self.n2_blocks, self.n_blocks_clamped_corner
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
                self.n1_blocks, self.n2_blocks, bond_energy_fn,
                use_contact=self.use_contact,
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
                n1=self.n1_blocks,
                n2=self.n2_blocks,
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
        # Push inward from whichever side is loaded.
        sign = 1.0 if self.loaded_side in ("left", "bottom") else -1.0

        def forward_scenario(
            design: Tuple[jnp.ndarray, jnp.ndarray], amplitude, loading_rate
        ) -> SolutionData:
            """Forward solve with explicit pulse amplitude/rate (the
            robustness-sweep entry point; ``solve`` fixes them to the
            problem's values)."""

            horizontal_shifts, vertical_shifts = design
            centroids = block_centroids(horizontal_shifts, vertical_shifts)
            node_vectors = centroid_node_vectors(horizontal_shifts, vertical_shifts)
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
                    amplitude=sign * amplitude,
                    loading_rate=loading_rate,
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

        def forward(design: Tuple[jnp.ndarray, jnp.ndarray]) -> SolutionData:
            return forward_scenario(design, self.amplitude, self.loading_rate)

        self.solve = forward
        self.solve_scenario = forward_scenario
        self.geometry = geometry
        self.clamped_blocks_ids = np.unique(clamped_pairs[:, 0])
        self.driven_blocks_ids = np.unique(driven_pairs[:, 0])
        self.moving_blocks_ids = np.setdiff1d(
            np.arange(geometry.n_blocks), self.clamped_blocks_ids
        )
        self.is_setup = True

    def compute_response_data(
        self, solution_data: Optional[SolutionData] = None
    ) -> dict:
        """Solution fields plus per-bond strain-energy decomposition and
        per-block kinetic energy histories.

        Parity: reference quads_focusing.py:319-372.
        """

        if not self.is_setup:
            self.setup()
        if solution_data is None:
            solution_data = self.solution_data
        if not isinstance(solution_data, SolutionData):
            raise ValueError("Solution data is not of type SolutionData!")

        out = solution_data._asdict()
        axial, shear, bending = compute_ligament_strains_history(
            solution_data.fields[:, 0],
            solution_data.centroid_node_vectors,
            solution_data.bond_connectivity,
            self.geometry.reference_bond_vectors(),
        )
        out["strain_energy_stretch"] = 0.5 * self.k_stretch * (axial * self.bond_length) ** 2
        out["strain_energy_shear"] = 0.5 * self.k_shear * (shear * self.bond_length) ** 2
        out["strain_energy_bending"] = 0.5 * self.k_rot * bending**2
        inertia = compute_inertia(solution_data.centroid_node_vectors, self.density)
        out["kinetic_energy"] = jnp.sum(
            0.5 * solution_data.fields[:, 1] ** 2 * inertia, axis=-1
        )
        return out

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict:
        return base.problem_to_dict(self)

    @staticmethod
    def from_dict(dict_in: dict) -> "ForwardProblem":
        return base.forward_problem_from_dict(ForwardProblem, dict_in)

    def to_data(self) -> "ForwardProblem":
        return ForwardProblem(**dataclasses.asdict(self))

    @staticmethod
    def from_data(problem_data) -> "ForwardProblem":
        problem_data.is_setup = False
        return problem_data


@dataclass
class OptimizationProblem(OptimizationRunnerMixin):
    """Maximize target-patch kinetic energy over the hinge-shift design."""

    forward_problem: ForwardProblem
    target_size: Tuple[int, int]
    target_shift: Tuple[int, int] = (0, 0)
    objective_values: Optional[List[Any]] = None
    design_values: Optional[List[Any]] = None
    constraints_violation: Optional[Dict[str, List[Any]]] = None
    name: str = "quads_focusing"
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

        def target_kinetic_energy(design):
            solution = self.forward_problem.solve(design)
            inertia = compute_inertia(
                solution.centroid_node_vectors, self.forward_problem.density
            )
            return kinetic_energy(
                solution.fields[:, 1, target_blocks, :], inertia[target_blocks]
            )

        self.objective_fn = target_kinetic_energy
        self.target_blocks = target_blocks
        self.is_setup = True

    def compute_robustness_map(
        self, design, amplitudes, loading_rates, mesh=None
    ) -> jnp.ndarray:
        """Target-KE robustness grid over (amplitude, loading_rate).

        The paper's frequency x amplitude robustness sweep for an optimized
        design (reference notebooks/quads_focusing_3dp_pla_shims.ipynb cell
        33, notebook-only there). Scenarios run vmapped on one chip or
        sharded over ``mesh`` (grid size must then divide the mesh).

        Returns a (len(amplitudes), len(loading_rates)) array. Use
        ``method="verlet_ckpt"`` on the forward problem for large grids —
        scenarios batch exactly like multi-start candidates.
        """

        if not self.is_setup:
            self.setup_objective()
        fp = self.forward_problem
        target_blocks = self.target_blocks
        inertia = compute_inertia(
            fp.geometry.centroid_node_vectors(*design), fp.density
        )[target_blocks]

        def target_ke(amplitude, loading_rate):
            solution = fp.solve_scenario(design, amplitude, loading_rate)
            return kinetic_energy(
                solution.fields[:, 1, target_blocks, :], inertia
            )

        A, R = jnp.meshgrid(
            jnp.asarray(amplitudes), jnp.asarray(loading_rates), indexing="ij"
        )
        if mesh is not None:
            from difflexmm_tpu.parallel import multistart_map

            mapped = multistart_map(lambda ar: target_ke(ar[0], ar[1]), mesh)
            values = mapped(
                jnp.stack([A.reshape(-1), R.reshape(-1)], axis=1)
            )
        else:
            values = jax.vmap(target_ke)(A.reshape(-1), R.reshape(-1))
        return values.reshape(A.shape)

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

    def to_data(self) -> "OptimizationProblem":
        return OptimizationProblem(**dataclasses.asdict(self))

    @staticmethod
    def from_data(optimization_data) -> "OptimizationProblem":
        optimization_data.forward_problem = ForwardProblem.from_data(
            optimization_data.forward_problem
        )
        optimization_data.is_setup = False
        return optimization_data
