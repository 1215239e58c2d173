"""Magnetic dipole energy tests (physics sanity + solver composition)."""

import jax
import jax.numpy as jnp

from difflexmm_tpu.ops.magnetic import build_magnetic_energy, magnetic_dipole_energy
from difflexmm_tpu.utils import (
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MagneticParams,
    MechanicalParams,
)


def _pair_energy(separation, angles, strengths=(1.0, 1.0)):
    positions = jnp.array([[0.0, 0.0], [separation, 0.0]])
    rotations = jnp.zeros(2)
    dipole_angles = jnp.array([[angles[0], 0.0], [angles[1], 0.0]])
    return magnetic_dipole_energy(
        positions, rotations, dipole_angles, jnp.asarray(strengths)
    )


def test_head_to_tail_attracts_side_by_side_repels():
    # Two x-aligned dipoles along the x axis (head-to-tail): E = -2 C m^2/r^3
    e_ht = _pair_energy(2.0, (0.0, 0.0))
    assert jnp.allclose(e_ht, -2.0 / 8.0, rtol=1e-12)
    # Side-by-side (both +y, separation along x): E = +C m^2/r^3
    e_ss = _pair_energy(2.0, (jnp.pi / 2, jnp.pi / 2))
    assert jnp.allclose(e_ss, 1.0 / 8.0, rtol=1e-12)
    assert e_ht < e_ss


def test_energy_decays_as_r_cubed():
    e1 = _pair_energy(1.0, (0.0, 0.0))
    e2 = _pair_energy(2.0, (0.0, 0.0))
    assert jnp.allclose(e1 / e2, 8.0, rtol=1e-12)


def test_out_of_plane_pitch():
    # Both dipoles fully out of plane: E = +C m^2 / r^3 (no r_hat projection)
    positions = jnp.array([[0.0, 0.0], [2.0, 0.0]])
    angles = jnp.array([[0.0, jnp.pi / 2], [0.0, jnp.pi / 2]])
    e = magnetic_dipole_energy(positions, jnp.zeros(2), angles, 1.0)
    assert jnp.allclose(e, 1.0 / 8.0, rtol=1e-10)


def test_block_rotation_rotates_moment():
    # Rotating block 2 by pi flips its moment: head-to-tail -> head-to-head
    positions = jnp.array([[0.0, 0.0], [2.0, 0.0]])
    angles = jnp.zeros((2, 2))
    e_aligned = magnetic_dipole_energy(positions, jnp.zeros(2), angles, 1.0)
    e_flipped = magnetic_dipole_energy(
        positions, jnp.array([0.0, jnp.pi]), angles, 1.0
    )
    assert jnp.allclose(e_flipped, -e_aligned, atol=1e-12)


def test_composes_with_solver_energy():
    from difflexmm_tpu.geometry import RotatedSquareGeometry
    from difflexmm_tpu.ops import build_strain_energy, combine_block_energies, ligament_energy

    geo = RotatedSquareGeometry(2, 1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    energy = combine_block_energies(
        build_strain_energy(bonds(), ligament_energy),
        build_magnetic_energy(prefactor=1e-3),
    )
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(0.2), cnv(0.2)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.02, 1e-3, rbv()), density=1.0
        ),
        magnetic_params=MagneticParams(
            dipole_angles=jnp.zeros((geo.n_blocks, 2)),
            dipole_strengths=1.0,
        ),
    )
    u = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (geo.n_blocks, 3))
    e = energy(u, cp)
    g = jax.grad(energy)(u, cp)
    assert jnp.isfinite(e)
    assert jnp.all(jnp.isfinite(g))
    # The magnetic term actually contributes (gradient differs without it)
    strain_only = build_strain_energy(bonds(), ligament_energy)
    g0 = jax.grad(strain_only)(u, cp)
    assert not jnp.allclose(g, g0)
