"""Dynamic solver tests: the tensile-chain physics oracle, constraints,
velocity reconstruction, and gradient flow.

Oracle parity: reference tests/test_difflexmm.py:35-146 — a 1-row
rotated-square chain under a force-controlled ramp with damping must settle
to the applied strain within 1e-4 relative error.
"""

import jax
import jax.numpy as jnp
import pytest

from difflexmm_tpu.geometry import RotatedSquareGeometry
from difflexmm_tpu.ops import (
    build_strain_energy,
    ligament_energy,
    ligament_energy_linearized,
)
from difflexmm_tpu.solver import setup_dynamic_solver
from difflexmm_tpu.utils import (
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _tensile_chain_setup(n1_cells: int, bond_energy_fn, method="rk4", n_substeps=128):
    geometry = RotatedSquareGeometry(n1_cells=n1_cells, n2_cells=1, spacing=1.0)
    block_centroids, centroid_node_vectors, bond_connectivity, reference_bond_vectors = (
        geometry.get_parametrization()
    )

    k_stretch = 1.0
    k_shear = 1.851e-2 * k_stretch
    k_rot = 1.534e-4 / 4 * k_stretch * geometry.spacing**2
    mass = 1.0
    Jrot = 1.815**-2 / 4 * mass * geometry.spacing**2
    inertia = jnp.full((geometry.n_blocks, 3), jnp.array([mass, mass, Jrot]))
    damped_blocks = jnp.arange(geometry.n_blocks)
    damping = 0.05 * jnp.full(
        (geometry.n_blocks, 3),
        jnp.array(
            [
                (k_stretch * mass) ** 0.5,
                (k_stretch * mass) ** 0.5,
                (k_stretch * mass) ** 0.5 * geometry.spacing**2 / 4,
            ]
        ),
    )

    constrained_block_DOF_pairs = jnp.array([[0, 0], [geometry.n1_blocks, 0]])
    loaded_block_DOF_pairs = jnp.array(
        [[geometry.n1_blocks - 1, 0], [geometry.n_blocks - 1, 0]]
    )

    loading_rate = 0.001 * (k_stretch / mass) ** 0.5

    def loading(state, t, final_load):
        return final_load * jnp.where(t < loading_rate**-1, t * loading_rate, 1.0)

    potential_energy = build_strain_energy(
        bond_connectivity=bond_connectivity(), bond_energy_fn=bond_energy_fn
    )

    solve = setup_dynamic_solver(
        geometry=geometry,
        energy_fn=potential_energy,
        loaded_block_DOF_pairs=loaded_block_DOF_pairs,
        loading_fn=loading,
        constrained_block_DOF_pairs=constrained_block_DOF_pairs,
        damped_blocks=damped_blocks,
        method=method,
        n_substeps=n_substeps,
    )

    simulation_time = 3 / loading_rate
    timepoints = jnp.linspace(0, simulation_time, 100)
    state0 = jnp.zeros((2, geometry.n_blocks, 3))

    def control_params(final_strain):
        final_load = final_strain * geometry.spacing * k_stretch
        return ControlParams(
            geometrical_params=GeometricalParams(
                block_centroids=block_centroids(0.0),
                centroid_node_vectors=centroid_node_vectors(0.0),
            ),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(
                    k_stretch=k_stretch,
                    k_shear=k_shear,
                    k_rot=k_rot,
                    reference_vector=reference_bond_vectors(),
                ),
                density=None,
                damping=damping,
                inertia=inertia,
            ),
            loading_params=dict(final_load=final_load),
        )

    return geometry, solve, state0, timepoints, control_params


@pytest.mark.parametrize("bond_energy_fn", [ligament_energy_linearized, ligament_energy])
@pytest.mark.parametrize("n1_cells", [5, 10, 20])
def test_tensile_test(n1_cells, bond_energy_fn):
    geometry, solve, state0, timepoints, make_cp = _tensile_chain_setup(
        n1_cells, bond_energy_fn
    )
    solve_jit = jax.jit(solve)
    for strain in (0.2, 0.4, 0.6):
        solution = solve_jit(state0, timepoints, make_cp(strain))
        simulated = solution[-1, 0, geometry.n1_blocks - 1, 0] / (
            geometry.spacing * (geometry.n1_blocks - 1)
        )
        assert jnp.abs((simulated - strain) / strain) < 1e-4


def test_matches_odeint_reference_backend():
    """Fixed-step scan path agrees with the adaptive odeint parity backend."""

    _, solve_rk4, state0, timepoints, make_cp = _tensile_chain_setup(
        5, ligament_energy, method="rk4", n_substeps=128
    )
    _, solve_ode, *_ = _tensile_chain_setup(5, ligament_energy, method="odeint")
    cp = make_cp(0.3)
    sol_rk4 = solve_rk4(state0, timepoints, cp)
    sol_ode = solve_ode(state0, timepoints, cp)
    assert jnp.allclose(sol_rk4[-1, 0], sol_ode[-1, 0], atol=1e-6)


def test_driven_constraints_and_velocity_reconstruction():
    """Driven DOFs follow the drive exactly; their output velocity is the
    drive's time derivative (jvp reconstruction)."""

    geometry = RotatedSquareGeometry(n1_cells=3, n2_cells=1, spacing=1.0)
    bc, cnv, bonds, rbv = geometry.get_parametrization()
    potential_energy = build_strain_energy(bonds(), ligament_energy)

    constrained = jnp.array([[0, 0], [0, 1], [geometry.n1_blocks, 0], [geometry.n1_blocks, 1]])

    def drive(t, amplitude, rate):
        ramp = amplitude * jnp.sin(rate * t)
        return jnp.array([ramp, 0.0, ramp, 0.0])

    solve = setup_dynamic_solver(
        geometry=geometry,
        energy_fn=potential_energy,
        constrained_block_DOF_pairs=constrained,
        constrained_DOFs_fn=drive,
        damped_blocks=jnp.arange(geometry.n_blocks),
        n_substeps=64,
    )

    amplitude, rate = 0.05, 0.5
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(0.0), cnv(0.0)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.02, 1e-4, rbv()),
            density=1.0,
            damping=0.1,
        ),
        constraint_params=dict(amplitude=amplitude, rate=rate),
    )
    timepoints = jnp.linspace(0.0, 20.0, 21)
    sol = solve(jnp.zeros((2, geometry.n_blocks, 3)), timepoints, cp)

    expected_u = amplitude * jnp.sin(rate * timepoints)
    expected_v = amplitude * rate * jnp.cos(rate * timepoints)
    assert jnp.allclose(sol[:, 0, 0, 0], expected_u, atol=1e-12)
    assert jnp.allclose(sol[:, 1, 0, 0], expected_v, atol=1e-12)
    # Undriven DOFs respond (the chain is pulled)
    assert jnp.max(jnp.abs(sol[:, 0, 1, 0])) > 1e-3


def test_gradient_through_solver():
    """Reverse-mode gradient of a trajectory functional w.r.t. stiffness and
    design matches finite differences."""

    geometry, solve, state0, timepoints, make_cp = _tensile_chain_setup(
        5, ligament_energy, n_substeps=64
    )

    def objective(k_stretch_scale):
        cp = make_cp(0.3)
        bp = cp.mechanical_params.bond_params._replace(
            k_stretch=cp.mechanical_params.bond_params.k_stretch * k_stretch_scale
        )
        cp = cp._replace(
            mechanical_params=cp.mechanical_params._replace(bond_params=bp)
        )
        sol = solve(state0, timepoints, cp)
        return jnp.sum(sol[-1, 0, :, 0] ** 2)

    g = jax.grad(objective)(1.0)
    eps = 1e-5
    fd = (objective(1.0 + eps) - objective(1.0 - eps)) / (2 * eps)
    assert jnp.isfinite(g)
    assert jnp.abs(g - fd) / jnp.abs(fd) < 1e-5
