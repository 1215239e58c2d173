"""Kagome gridded energy must match the general gather path exactly."""

import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry import KagomeGeometry, KagomePeriodicGeometry
from difflexmm_tpu.ops import (
    build_contact_energy,
    build_strain_energy,
    combine_block_energies,
    ligament_energy,
)
from difflexmm_tpu.ops.kagome_grid import build_kagome_grid_energy
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _params(geo, design, k_arrays=False):
    bonds = geo.bond_connectivity()
    n_bonds = len(bonds)
    if k_arrays:
        ks = 1.0 + 0.3 * jax.random.uniform(jax.random.PRNGKey(3), (n_bonds,))
        ksh = 0.02 * (1 + 0.5 * jax.random.uniform(jax.random.PRNGKey(4), (n_bonds,)))
        kr = 1e-3 * (1 + jax.random.uniform(jax.random.PRNGKey(5), (n_bonds,)))
    else:
        ks, ksh, kr = 1.0, 0.02, 1e-3
    return ControlParams(
        geometrical_params=GeometricalParams(
            geo.block_centroids(*design), geo.centroid_node_vectors(*design)
        ),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(ks, ksh, kr, geo.reference_bond_vectors()),
            density=1.0,
            contact_params=ContactParams(
                min_angle=0.0, cutoff_angle=60 * jnp.pi / 180, k_contact=2.0
            ),
        ),
    )


def test_kagome_grid_matches_general():
    geo = KagomeGeometry(n1_cells=4, n2_cells=3, bond_length=0.05)
    geo.compute_geometry()
    s1, s2, s3 = geo.zero_design()
    s3 = s3 + 0.03 * jax.random.normal(jax.random.PRNGKey(0), s3.shape)
    design = (s1, s2, s3)

    general = combine_block_energies(
        build_strain_energy(geo.bond_connectivity(), ligament_energy),
        build_contact_energy(geo.bond_connectivity()),
    )
    grid = build_kagome_grid_energy(4, 3, ligament_energy)

    cp = _params(geo, design, k_arrays=True)
    u = 0.04 * jax.random.normal(jax.random.PRNGKey(1), (geo.n_blocks, 3))

    e_general = general(u, cp)
    e_grid = grid(u, cp)
    assert e_general > 0
    assert jnp.allclose(e_grid, e_general, rtol=1e-12)

    g1 = jax.grad(general)(u, cp)
    g2 = jax.grad(grid)(u, cp)
    assert jnp.allclose(g1, g2, rtol=1e-10, atol=1e-12)


def test_kagome_focusing_model_grid_parity():
    """The model's grid path must reproduce the general-path trajectory."""

    from difflexmm_tpu.models.kagome_focusing import ForwardProblem

    kwargs = dict(
        n1_cells=4, n2_cells=4, cell_size=1.0, cell_angle=jnp.pi / 3,
        bond_length=0.05, k_stretch=1.0, k_shear=0.02, k_rot=1e-3,
        density=1.0, damping=0.02, amplitude=0.1, loading_rate=50.0,
        input_delay=0.0, n_excited_blocks=2, simulation_time=0.2,
        n_timepoints=5, n_substeps=8,
        n_blocks_clamped_corner=1,  # clamps clear of driven rows on 4x4
    )
    design = KagomeGeometry(4, 4, bond_length=0.05).zero_design()

    sols = []
    for grid in (True, False):
        fp = ForwardProblem(grid_energy=grid, **kwargs)
        fp.setup()
        sols.append(fp.solve(design).fields)
    assert jnp.allclose(sols[0], sols[1], rtol=1e-10, atol=1e-12)


def test_kagome_periodic_grid_matches_general():
    geo = KagomePeriodicGeometry(n1_cells=3, n2_cells=3, bond_length=0.05)
    geo.compute_geometry()
    design = (0.02 * jax.random.normal(jax.random.PRNGKey(2), (3, 2)),)

    general = combine_block_energies(
        build_strain_energy(geo.bond_connectivity(), ligament_energy),
        build_contact_energy(geo.bond_connectivity()),
    )
    grid = build_kagome_grid_energy(3, 3, ligament_energy)

    cp = _params(geo, design)
    u = 0.03 * jax.random.normal(jax.random.PRNGKey(6), (geo.n_blocks, 3))
    assert jnp.allclose(grid(u, cp), general(u, cp), rtol=1e-12)
