"""Spatial domain decomposition: sharded lattice solve must equal unsharded.

The `"domain"` mesh axis shards block rows of a single simulation (the other
parallel axes shard whole simulations). GSPMD inserts the one-row halo
exchanges for the grid energy's shifted slices; these tests pin that the
sharded trajectory and design gradients match the single-device result to
float64 round-off, and that the output really is distributed (not silently
replicated).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difflexmm_tpu.geometry import QuadGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.bonds import ligament_energy
from difflexmm_tpu.ops.grid import build_quad_grid_energy
from difflexmm_tpu.parallel.domain import (
    domain_mesh,
    domain_shard_solver,
    domain_state_sharding,
)
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)

N1, N2 = 5, 8  # 8 rows over 8 virtual devices: every shard boundary has a halo


def _setup(method="verlet"):
    geo = QuadGeometry(N1, N2, 1.0, 0.1)
    bc, cnv, bonds_fn, rbv = geo.get_parametrization()
    design = geo.get_design_from_rotated_square(0.25)

    driven_pairs, drive_mask = base.driven_side_pairs(N1, N2, 2, "left")
    drive_vector = jnp.asarray(drive_mask)

    def drive(t, amplitude, rate):
        return base.pulse(t, amplitude, rate) * drive_vector

    from difflexmm_tpu.solver import setup_dynamic_solver

    solve = setup_dynamic_solver(
        geometry=geo,
        energy_fn=build_quad_grid_energy(N1, N2, ligament_energy),
        constrained_block_DOF_pairs=driven_pairs,
        constrained_DOFs_fn=drive,
        damped_blocks=np.arange(geo.n_blocks),
        method=method,
        n_substeps=8,
        quad_grid=dict(n1=N1, n2=N2),
    )

    def control_params(k_stretch):
        return ControlParams(
            geometrical_params=GeometricalParams(bc(*design), cnv(*design)),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(k_stretch, 0.02, 1e-3, rbv()),
                density=1.0,
                damping=0.1,
                contact_params=ContactParams(
                    0.0, 60 * jnp.pi / 180, 2.0
                ),
            ),
            constraint_params=dict(amplitude=0.1, rate=2.0),
        )

    state0 = jnp.zeros((2, geo.n_blocks, 3))
    timepoints = jnp.linspace(0.0, 1.2, 5)
    return solve, control_params, state0, timepoints


def test_domain_sharded_trajectory_matches_single_device():
    solve, control_params, state0, timepoints = _setup()
    mesh = domain_mesh(8)
    sharded = domain_shard_solver(solve, mesh, n1=N1, n2=N2)

    ref = jax.jit(solve)(state0, timepoints, control_params(1.0))
    out = sharded(state0, timepoints, control_params(1.0))

    # Really distributed: each device holds 1/8 of the block axis.
    shard_shape = out.sharding.shard_shape(out.shape)
    assert shard_shape[2] == state0.shape[1] // 8
    assert not out.sharding.is_fully_replicated

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_domain_sharded_gradient_matches_single_device():
    solve, control_params, state0, timepoints = _setup(method="verlet_ckpt")
    mesh = domain_mesh(8)
    state_sh = domain_state_sharding(mesh)
    sharded_solve = domain_shard_solver(solve, mesh, n1=N1, n2=N2, jit=False)

    def objective(k, solve_fn):
        traj = solve_fn(state0, timepoints, control_params(k))
        v = traj[-1, 1]
        return 0.5 * jnp.sum(v**2)

    ref_val, ref_grad = jax.jit(
        jax.value_and_grad(lambda k: objective(k, solve))
    )(1.0)
    val, grad = jax.jit(
        jax.value_and_grad(lambda k: objective(k, sharded_solve)),
        in_shardings=None,
    )(1.0)

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-13)
    np.testing.assert_allclose(float(grad), float(ref_grad), rtol=1e-10)


def test_domain_sharding_inserts_halo_exchange_not_allgather():
    """The compiled module must move one-row halos (collective-permute),
    not replicate the state (all-gather of the full block axis) — this is
    the memory-scaling claim: per-device state stays at n_blocks/n_dev."""

    solve, control_params, state0, timepoints = _setup()
    mesh = domain_mesh(8)
    sharded = domain_shard_solver(solve, mesh, n1=N1, n2=N2)
    text = sharded.lower(state0, timepoints, control_params(1.0)).compile().as_text()
    assert "collective-permute" in text


def test_domain_sharded_kagome_matches_single_device():
    """Kagome blocks are cell-major with rows slowest (2 triangles per
    cell), so the same row sharding applies: chunk = (n2/n_dev) rows of
    2*n1 blocks."""

    from difflexmm_tpu.geometry import KagomeGeometry
    from difflexmm_tpu.ops.kagome_grid import build_kagome_grid_energy
    from difflexmm_tpu.solver import setup_dynamic_solver

    n1, n2 = 3, 8
    geo = KagomeGeometry(n1_cells=n1, n2_cells=n2, bond_length=0.05)
    geo.compute_geometry()
    bc, cnv, bond_fn, rbv = geo.get_parametrization()
    design = geo.zero_design()

    rows = np.array([n2 // 2 - 1, n2 // 2])
    driven_blocks = rows * 2 * n1
    driven_pairs = base.all_dofs_pairs(driven_blocks)
    k = len(driven_blocks)
    drive_vector = jnp.asarray(np.concatenate([np.ones(k), np.zeros(2 * k)]))

    def drive(t, amplitude, rate):
        return base.pulse(t, amplitude, rate) * drive_vector

    solve = setup_dynamic_solver(
        geometry=geo,
        energy_fn=build_kagome_grid_energy(n1, n2, ligament_energy),
        constrained_block_DOF_pairs=driven_pairs,
        constrained_DOFs_fn=drive,
        damped_blocks=np.arange(geo.n_blocks),
        method="verlet",
        n_substeps=8,
    )
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(*design), cnv(*design)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.02, 1e-3, rbv()),
            density=1.0,
            damping=0.05,
            contact_params=ContactParams(0.0, jnp.deg2rad(30.0), 1.0),
        ),
        constraint_params=dict(amplitude=0.02, rate=4.0),
    )
    state0 = jnp.zeros((2, geo.n_blocks, 3))
    timepoints = jnp.linspace(0.0, 1.0, 5)

    mesh = domain_mesh(8)
    sharded = domain_shard_solver(solve, mesh, n1=n1, n2=n2)
    ref = jax.jit(solve)(state0, timepoints, cp)
    out = sharded(state0, timepoints, cp)

    assert out.sharding.shard_shape(out.shape)[2] == geo.n_blocks // 8
    assert float(jnp.max(jnp.abs(ref))) > 1e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_domain_sharding_rejects_misaligned_rows():
    solve, control_params, state0, timepoints = _setup()
    mesh = domain_mesh(8)
    with pytest.raises(ValueError, match="divide evenly"):
        domain_shard_solver(solve, mesh, n1=N1, n2=6)
