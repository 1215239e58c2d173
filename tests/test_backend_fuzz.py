"""Property-style cross-backend parity over randomized configurations.

Every solver backend must integrate the same physics: for random lattice
sizes, stiffnesses, damping, drive parameters, and initial conditions, the
fast custom-vjp backend (verlet_ckpt) must reproduce the plain Verlet scan
to float64 round-off, and trajectories must stay finite. Randomization is
seeded (deterministic CI) and configurations are kept inside the
fixed-step stability region by construction (dt scaled from the stiffest
spring's period).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difflexmm_tpu.geometry import QuadGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.bonds import ligament_energy, ligament_energy_linearized
from difflexmm_tpu.ops.grid import build_quad_grid_energy
from difflexmm_tpu.solver import setup_dynamic_solver
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _random_case(rng):
    n1 = int(rng.integers(3, 7))
    n2 = int(rng.integers(2, 6))
    k_stretch = float(10.0 ** rng.uniform(-1, 1))
    # Stability: dt ~ 0.3 / omega_max with omega ~ sqrt(k/m), m = 1.
    omega = np.sqrt(k_stretch) * 2.5
    dt = 0.3 / omega
    n_substeps = int(rng.integers(6, 14))
    T = int(rng.integers(4, 7))
    sim_time = dt * n_substeps * (T - 1)
    return dict(
        n1=n1,
        n2=n2,
        k_stretch=k_stretch,
        k_shear=k_stretch * float(10.0 ** rng.uniform(-2.5, -1)),
        k_rot=k_stretch * float(10.0 ** rng.uniform(-4, -2.5)),
        damping=float(10.0 ** rng.uniform(-2, -0.5)),
        amplitude=float(rng.uniform(0.02, 0.12)),
        rate=float(rng.uniform(0.5, 2.0)) / sim_time,
        linearized=bool(rng.integers(0, 2)),
        use_contact=bool(rng.integers(0, 2)),
        n_substeps=n_substeps,
        T=T,
        sim_time=sim_time,
        angle=float(rng.uniform(0.1, 0.35)),
        v0_scale=float(rng.uniform(0.0, 0.05)),
    )


def _solve(case, method, rng_state):
    n1, n2 = case["n1"], case["n2"]
    geo = QuadGeometry(n1, n2, 1.0, 0.1)
    bc, cnv, bonds_fn, rbv = geo.get_parametrization()
    design = geo.get_design_from_rotated_square(case["angle"])

    driven_pairs, drive_mask = base.driven_side_pairs(n1, n2, 2, "left")
    drive_vector = jnp.asarray(drive_mask)

    def drive(t, amplitude, rate):
        return base.pulse(t, amplitude, rate) * drive_vector

    bond_fn = (
        ligament_energy_linearized if case["linearized"] else ligament_energy
    )
    solve = setup_dynamic_solver(
        geometry=geo,
        energy_fn=build_quad_grid_energy(
            n1, n2, bond_fn, use_contact=case["use_contact"]
        ),
        constrained_block_DOF_pairs=driven_pairs,
        constrained_DOFs_fn=drive,
        damped_blocks=np.arange(geo.n_blocks),
        method=method,
        n_substeps=case["n_substeps"],
        quad_grid=dict(
            n1=n1, n2=n2, linearized=case["linearized"],
            use_contact=case["use_contact"],
        ),
    )
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(*design), cnv(*design)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(
                case["k_stretch"], case["k_shear"], case["k_rot"], rbv()
            ),
            density=1.0,
            damping=case["damping"],
            contact_params=(
                ContactParams(0.0, jnp.deg2rad(5.0), case["k_rot"])
                if case["use_contact"]
                else None
            ),
        ),
        constraint_params=dict(amplitude=case["amplitude"], rate=case["rate"]),
    )
    timepoints = jnp.linspace(0.0, case["sim_time"], case["T"])
    state0 = jnp.zeros((2, geo.n_blocks, 3))
    state0 = state0.at[1].set(
        case["v0_scale"] * jnp.asarray(rng_state.normal(size=(geo.n_blocks, 3)))
    )
    return solve(state0, timepoints, cp)


@pytest.mark.parametrize("seed", range(6))
def test_verlet_ckpt_matches_verlet_random_configs(seed):
    rng = np.random.default_rng(seed)
    case = _random_case(rng)
    ic_rng = np.random.default_rng(1000 + seed)
    sol_ref = _solve(case, "verlet", np.random.default_rng(1000 + seed))
    sol_ckpt = _solve(case, "verlet_ckpt", ic_rng)
    assert jnp.all(jnp.isfinite(sol_ref)), case
    assert float(jnp.max(jnp.abs(sol_ref))) > 1e-6, case
    scale = float(jnp.max(jnp.abs(sol_ref)))
    assert jnp.allclose(sol_ckpt, sol_ref, atol=1e-11 * max(scale, 1.0)), case
