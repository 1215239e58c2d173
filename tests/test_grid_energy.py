"""Gridded quad-lattice energy must match the general gather path exactly."""

import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry import QuadGeometry, RotatedSquareGeometry
from difflexmm_tpu.ops import (
    build_contact_energy,
    build_strain_energy,
    combine_block_energies,
    ligament_energy,
    ligament_energy_linearized,
)
from difflexmm_tpu.ops.grid import build_quad_grid_energy
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _params(geo, design, k_arrays=False):
    bc, cnv, bonds, rbv = geo.get_parametrization()
    n_bonds = len(bonds())
    if k_arrays:
        key = jax.random.PRNGKey(3)
        ks = 1.0 + 0.3 * jax.random.uniform(key, (n_bonds,))
        ksh = 0.02 * (1 + 0.5 * jax.random.uniform(jax.random.PRNGKey(4), (n_bonds,)))
        kr = 1e-3 * jnp.ones(n_bonds)
    else:
        ks, ksh, kr = 1.0, 0.02, 1e-3
    return ControlParams(
        geometrical_params=GeometricalParams(bc(*design), cnv(*design)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(ks, ksh, kr, rbv()),
            density=1.0,
            contact_params=ContactParams(
                min_angle=0.0, cutoff_angle=60 * jnp.pi / 180, k_contact=2.0
            ),
        ),
    )


def test_grid_energy_matches_general_quads():
    geo = QuadGeometry(5, 4, 1.0, 0.1)
    geo.compute_geometry()
    design = geo.get_design_from_rotated_square(0.2)
    bonds = geo.bond_connectivity()

    general = combine_block_energies(
        build_strain_energy(bonds, ligament_energy),
        build_contact_energy(bonds),
    )
    grid = build_quad_grid_energy(5, 4, ligament_energy)

    cp = _params(geo, design, k_arrays=True)
    u = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (geo.n_blocks, 3))

    e_general = general(u, cp)
    e_grid = grid(u, cp)
    # Large cutoff angle makes contact active: both terms exercised.
    assert e_general > 0
    assert jnp.allclose(e_grid, e_general, rtol=1e-12)

    g1 = jax.grad(general)(u, cp)
    g2 = jax.grad(grid)(u, cp)
    assert jnp.allclose(g1, g2, rtol=1e-10, atol=1e-12)


def test_grid_energy_matches_general_rotated_square_linearized():
    geo = RotatedSquareGeometry(3, 2, 1.0, 0.1)
    geo.compute_geometry()
    bonds = geo.bond_connectivity()

    general = combine_block_energies(
        build_strain_energy(bonds, ligament_energy_linearized),
        build_contact_energy(bonds),
    )
    grid = build_quad_grid_energy(
        geo.n1_blocks, geo.n2_blocks, ligament_energy_linearized
    )

    cp = _params(geo, (0.25,))
    u = 0.03 * jax.random.normal(jax.random.PRNGKey(1), (geo.n_blocks, 3))
    assert jnp.allclose(grid(u, cp), general(u, cp), rtol=1e-12)


def test_grid_energy_distance_contact_matches():
    geo = QuadGeometry(4, 3, 1.0, 0.1)
    geo.compute_geometry()
    design = geo.get_design_from_rotated_square(0.15)
    bonds = geo.bond_connectivity()

    general = combine_block_energies(
        build_strain_energy(bonds, ligament_energy),
        build_contact_energy(bonds, angle_based=False),
    )
    grid = build_quad_grid_energy(4, 3, ligament_energy, angle_based=False)

    cp = _params(geo, design)
    # Interpret min/cutoff as distances for the distance-based barrier
    cp = cp._replace(
        mechanical_params=cp.mechanical_params._replace(
            contact_params=ContactParams(0.0, 0.5, 2.0)
        )
    )
    u = 0.04 * jax.random.normal(jax.random.PRNGKey(2), (geo.n_blocks, 3))
    assert jnp.allclose(grid(u, cp), general(u, cp), rtol=1e-12)
