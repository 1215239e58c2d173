"""Hinge characterization: fit ligament stiffnesses to experimental
force-displacement curves from quasi-static tension/compression/shear tests.

The sample (rotated-square or quad lattice) is loaded in displacement
control: bottom row fully clamped, top row driven by a linear ramp; the
reaction force is the gradient of the potential energy summed over the
driven DOFs, and the objective is the mean squared error against resampled
experimental curves across all loading types.

Behavioral parity: reference problems/hinge_characterization.py
(ForwardProblem 39-278, quads variant 281-543, resample/naive_GD 546-585,
objective 621-648).
"""

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Literal, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry.quad import QuadGeometry, RotatedSquareGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.assembly import build_strain_energy, combine_block_energies
from difflexmm_tpu.ops.bonds import ligament_energy, ligament_energy_linearized
from difflexmm_tpu.ops.contact import build_contact_energy
from difflexmm_tpu.ops.grid import build_quad_grid_energy
from difflexmm_tpu.optim.loops import naive_gd
from difflexmm_tpu.optim.mma import run_mma
from difflexmm_tpu.utils.types import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
    SolutionData,
    SolutionType,
)
from difflexmm_tpu.solver.dynamics import FAST_METHODS, setup_dynamic_solver
from difflexmm_tpu.solver.statics import setup_static_solver


def resample(x: jnp.ndarray, y: jnp.ndarray, n_timepoints: int) -> jnp.ndarray:
    """Resample y(x) onto a uniform grid spanning [min(x), max(x)]."""

    return jnp.interp(jnp.linspace(jnp.min(x), jnp.max(x), n_timepoints), x, y)


def _characterization_setup(self, geometry, block_centroids, centroid_node_vectors):
    """Shared setup body for both sample geometries.

    ``block_centroids``/``centroid_node_vectors`` are the (constant)
    geometry arrays of the sample at its reference design.
    """

    bonds = geometry.bond_connectivity()
    ref_bond_vectors = geometry.reference_bond_vectors()
    n1 = geometry.n1_blocks
    nb = geometry.n_blocks

    # Top row first, then bottom row; all three DOFs per block with the
    # DOF-major layout of base.all_dofs_pairs.
    constrained_blocks = np.concatenate(
        [np.arange(nb - n1, nb), np.arange(n1)]
    )
    constrained_pairs = base.all_dofs_pairs(constrained_blocks)
    n_c = len(constrained_blocks)

    loading_vector = np.zeros(3 * n_c)
    if self.loading_type == "tension":
        loading_vector[n_c : n_c + n1] = 1.0  # top row, y
    elif self.loading_type == "compression":
        loading_vector[n_c : n_c + n1] = -1.0
    elif self.loading_type == "shear":
        loading_vector[:n1] = 1.0  # top row, x
    else:
        raise ValueError(
            "Loading type should be either tension, compression, or shear!"
        )
    reaction_rows = np.where(loading_vector != 0)[0]
    reaction_pairs = constrained_pairs[reaction_rows]
    loading_vector = jnp.asarray(loading_vector)

    def applied_displacement(t, amplitude, loading_rate):
        return amplitude * jnp.where(t < 1.0 / loading_rate, t * loading_rate, 1.0)

    def constrained_DOFs_fn(t, amplitude, loading_rate):
        return loading_vector * applied_displacement(t, amplitude, loading_rate)

    k_ref = self.k_stretch
    mass_ref = self.density * geometry.spacing**2
    damping_values = self.damping * jnp.array(
        [
            (k_ref * mass_ref) ** 0.5,
            (k_ref * mass_ref) ** 0.5,
            (k_ref * mass_ref) ** 0.5 * geometry.spacing**2,
        ]
    ) * jnp.ones((nb, 3))

    bond_energy_fn = (
        ligament_energy_linearized if self.linearized_strains else ligament_energy
    )
    if self.grid_energy:
        # Both sample geometries are n1 x n2 grids of 4-gons, so the
        # gather-free gridded assembly applies (bit-identical to the
        # general path; tests/test_grid_energy.py).
        potential_energy = build_quad_grid_energy(
            geometry.n1_blocks, geometry.n2_blocks, bond_energy_fn,
            use_contact=self.use_contact,
        )
    else:
        strain_energy = build_strain_energy(bonds, bond_energy_fn)
        potential_energy = (
            combine_block_energies(strain_energy, build_contact_energy(bonds))
            if self.use_contact
            else strain_energy
        )

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
    if self.method == "static":
        # True quasi-statics: one warm-started Newton equilibrium per output
        # time instead of integrating damped dynamics through the ramp (the
        # reference's only mechanism, problems/hinge_characterization.py:
        # 39-132). Inertia/damping drop out; the force-displacement curve is
        # the exact rate-independent limit, and gradients use the implicit
        # adjoint (solver/statics.py) rather than a reverse time integration.
        solve_equilibrium = setup_static_solver(
            geometry=geometry,
            energy_fn=potential_energy,
            constrained_block_DOF_pairs=constrained_pairs,
            constrained_DOFs_fn=constrained_DOFs_fn,
        )

        def solve_dynamics(state0, timepoints, control_params):
            def step(u_prev, t):
                u = solve_equilibrium(u_prev, t, control_params)
                return u, u

            _, trajectory = jax.lax.scan(step, state0[0], timepoints)
            return jnp.stack(
                [trajectory, jnp.zeros_like(trajectory)], axis=1
            )
    else:
        solve_dynamics = setup_dynamic_solver(
            geometry=geometry,
            energy_fn=potential_energy,
            constrained_block_DOF_pairs=constrained_pairs,
            constrained_DOFs_fn=constrained_DOFs_fn,
            damped_blocks=np.arange(nb),
            method=self.method,
            n_substeps=self.n_substeps,
            atol=self.atol,
            rtol=self.rtol,
            quad_grid=quad_grid,
            pallas_interpret=self.pallas_interpret,
            guard=base.resolve_model_guard(
                getattr(self, "guard", None), self.min_angle,
                self.cutoff_angle, self.spacing,
            ),
        )

    timepoints = jnp.linspace(0.0, 1.0 / self.loading_rate, self.n_timepoints)
    state0 = jnp.zeros((2, nb, 3))

    def forward(k_values: Tuple[float, float, float]):
        k_stretch, k_shear, k_rot = k_values
        control_params = ControlParams(
            geometrical_params=GeometricalParams(
                block_centroids, centroid_node_vectors
            ),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(
                    k_stretch=k_stretch,
                    k_shear=k_shear,
                    k_rot=k_rot,
                    reference_vector=ref_bond_vectors,
                ),
                density=self.density,
                damping=damping_values,
                contact_params=ContactParams(
                    min_angle=self.min_angle,
                    cutoff_angle=self.cutoff_angle,
                    k_contact=self.k_contact,
                ),
            ),
            constraint_params=dict(
                amplitude=self.amplitude, loading_rate=self.loading_rate
            ),
        )
        fields = solve_dynamics(state0, timepoints, control_params)
        return (
            SolutionData(
                block_centroids=block_centroids,
                centroid_node_vectors=centroid_node_vectors,
                bond_connectivity=bonds,
                timepoints=timepoints,
                fields=fields,
            ),
            control_params,
        )

    self.solve = forward
    self.geometry = geometry
    self.potential_energy = potential_energy
    self.elastic_forces = jax.grad(potential_energy)
    self.applied_displacement = applied_displacement
    self.reaction_block_DOF_pairs = reaction_pairs
    self.is_setup = True


class _CharacterizationForwardMixin:
    """Shared force-displacement extraction and serialization."""

    def force_displacement(self, solution_data: SolutionData,
                           control_params: ControlParams) -> jnp.ndarray:
        """[applied displacement, reaction force] histories, each (T,).

        The reaction is the potential-energy gradient summed over the driven
        top-row DOFs at every output time (batched, no per-time vmap).
        """

        pairs = self.reaction_block_DOF_pairs
        forces = jax.vmap(
            lambda u: jnp.sum(
                self.elastic_forces(u, control_params)[pairs[:, 0], pairs[:, 1]]
            )
        )(solution_data.fields[:, 0])
        applied = self.applied_displacement(
            solution_data.timepoints, **control_params.constraint_params
        )
        return jnp.stack([applied, forces * self.force_multiplier])

    def to_dict(self) -> dict:
        return base.problem_to_dict(self)

    @classmethod
    def from_dict(cls, dict_in: dict):
        return base.forward_problem_from_dict(cls, dict_in)


@dataclass
class ForwardProblem(_CharacterizationForwardMixin):
    """Displacement-controlled test on a rotated-square sample."""

    # Geometry
    n1_cells: int
    n2_cells: int
    spacing: Any
    bond_length: Any
    initial_angle: Any

    # Mechanical (design variables are the k's passed to solve)
    k_stretch: Any
    k_shear: Any
    k_rot: Any
    density: Any
    damping: Any

    # Loading
    loading_type: Literal["tension", "compression", "shear"] = "tension"
    amplitude: Any = 0.1
    loading_rate: Any = 0.01

    # Analysis
    n_timepoints: int = 100
    linearized_strains: bool = False
    force_multiplier: float = 1.0

    # Contact
    use_contact: bool = True
    k_contact: Any = 1.0
    min_angle: Any = 0.0
    cutoff_angle: Any = 5.0 * jnp.pi / 180

    solution_data: Optional[Union[SolutionType, List[SolutionType]]] = None

    # "static": warm-started Newton equilibria (rate-independent limit,
    # implicit-adjoint gradients) instead of damped dynamics.
    method: str = "verlet"
    n_substeps: int = 32
    grid_energy: bool = True
    atol: float = 1e-8
    rtol: float = 1e-8
    # Interpreter-mode Pallas (CPU parity tests; no effect on other methods).
    pallas_interpret: bool = False
    # Reactive substep escalation at force spikes ("auto" derives the
    # threshold from the contact window; see setup_dynamic_solver).
    guard: Any = None

    name: str = "hinge_characterization"
    is_setup: bool = False

    def setup(self) -> None:
        geometry = RotatedSquareGeometry(
            n1_cells=self.n1_cells,
            n2_cells=self.n2_cells,
            spacing=self.spacing,
            bond_length=self.bond_length,
        )
        geometry.compute_geometry()
        _characterization_setup(
            self,
            geometry,
            geometry.block_centroids(self.initial_angle),
            geometry.centroid_node_vectors(self.initial_angle),
        )


@dataclass
class ForwardProblemQuads(_CharacterizationForwardMixin):
    """Displacement-controlled test on a quad (shift-designed) sample."""

    # Geometry
    n1_blocks: int
    n2_blocks: int
    spacing: Any
    bond_length: Any
    horizontal_shifts: Any
    vertical_shifts: Any

    # Mechanical
    k_stretch: Any
    k_shear: Any
    k_rot: Any
    density: Any
    damping: Any

    # Loading
    loading_type: Literal["tension", "compression", "shear"] = "tension"
    amplitude: Any = 0.1
    loading_rate: Any = 0.01

    # Analysis
    n_timepoints: int = 100
    linearized_strains: bool = False
    force_multiplier: float = 1.0

    # Contact
    use_contact: bool = True
    k_contact: Any = 1.0
    min_angle: Any = 0.0
    cutoff_angle: Any = 5.0 * jnp.pi / 180

    solution_data: Optional[Union[SolutionType, List[SolutionType]]] = None

    # "static": warm-started Newton equilibria (rate-independent limit,
    # implicit-adjoint gradients) instead of damped dynamics.
    method: str = "verlet"
    n_substeps: int = 32
    grid_energy: bool = True
    atol: float = 1e-8
    rtol: float = 1e-8
    # Interpreter-mode Pallas (CPU parity tests; no effect on other methods).
    pallas_interpret: bool = False
    # Reactive substep escalation at force spikes ("auto" derives the
    # threshold from the contact window; see setup_dynamic_solver).
    guard: Any = None

    name: str = "hinge_characterization_quads"
    is_setup: bool = False

    def setup(self) -> None:
        geometry = QuadGeometry(
            n1_blocks=self.n1_blocks,
            n2_blocks=self.n2_blocks,
            spacing=self.spacing,
            bond_length=self.bond_length,
        )
        geometry.compute_geometry()
        _characterization_setup(
            self,
            geometry,
            geometry.block_centroids(self.horizontal_shifts, self.vertical_shifts),
            geometry.centroid_node_vectors(
                self.horizontal_shifts, self.vertical_shifts
            ),
        )


@dataclass
class OptimizationProblem:
    """Least-squares stiffness identification against experimental curves."""

    forward_problems: List[Any]
    # Each response: array [displacement_history, force_history, force_std].
    target_responses: Dict[str, Any]
    fitted_responses: Optional[Dict[str, Any]] = None
    objective_values: Optional[List[Any]] = None
    design_values: Optional[List[Any]] = None
    name: str = "hinge_characterization"
    is_setup: bool = False

    def __post_init__(self):
        self.objective_values = self.objective_values or []
        self.design_values = self.design_values or []

    def compute_fitted_responses(self, k_values):
        for problem in self.forward_problems:
            if not problem.is_setup:
                problem.setup()
        return {
            problem.loading_type: problem.force_displacement(*problem.solve(k_values))
            for problem in self.forward_problems
        }

    def setup_objective(self) -> None:
        for problem in self.forward_problems:
            if not problem.is_setup:
                problem.setup()
        n_timepoints = self.forward_problems[0].n_timepoints
        # The simulated displacement history is a linear ramp, so resampling
        # the experimental curves onto a uniform grid aligns the two.
        target_forces = jnp.stack(
            [
                resample(target_u, target_f, n_timepoints)
                for target_u, target_f, *_ in self.target_responses.values()
            ]
        )

        def response_squared_error(k_values):
            fitted = self.compute_fitted_responses(k_values)
            reaction_forces = jnp.stack([f for _, f in fitted.values()])
            return jnp.mean((reaction_forces - target_forces) ** 2)

        self.objective_fn = response_squared_error
        self.is_setup = True

    def run_optimization_GD(self, initial_guess, n_iterations: int,
                            step_size: float, lower_bound=None, upper_bound=None):
        if not self.is_setup:
            self.setup_objective()
        objective_and_grad = jax.jit(jax.value_and_grad(self.objective_fn))
        design, values, designs = naive_gd(
            objective_and_grad,
            initial_guess,
            n_iterations=n_iterations,
            learning_rate=step_size,
            lower_bound=lower_bound,
            upper_bound=upper_bound,
        )
        self.objective_values = values
        self.design_values = designs
        self.fitted_responses = self.compute_fitted_responses(design)
        return design

    def run_optimization_mma(self, initial_guess, n_iterations: int,
                             lower_bound=None, upper_bound=None):
        """Bound-constrained fit with the on-device MMA optimizer."""

        if not self.is_setup:
            self.setup_objective()
        from difflexmm_tpu.optim.loops import ravel_pytree

        flat0, unflatten = ravel_pytree(tuple(jnp.asarray(k) for k in initial_guess))
        objective_and_grad = jax.jit(
            jax.value_and_grad(lambda x: self.objective_fn(unflatten(x)))
        )
        span = float(jnp.max(jnp.abs(flat0))) + 1.0
        xmin = jnp.full_like(flat0, lower_bound if lower_bound is not None else 0.0)
        xmax = jnp.full_like(
            flat0, upper_bound if upper_bound is not None else 100 * span
        )

        def callback(it, x, value, violation, fi):
            self.objective_values.append(float(value))
            self.design_values.append(unflatten(x))

        x_final, _ = run_mma(
            objective_and_grad, flat0, xmin, xmax,
            n_iterations=n_iterations, maximize=False, callback=callback,
        )
        design = unflatten(x_final)
        self.fitted_responses = self.compute_fitted_responses(design)
        return design

    def to_dict(self) -> dict:
        out = dataclasses.asdict(self)
        out["forward_problems"] = [p.to_dict() for p in self.forward_problems]
        return out
