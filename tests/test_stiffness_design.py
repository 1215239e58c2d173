"""Per-bond stiffness as a DESIGN variable (examples/stiffness_field_design.py).

The library contract is gradients w.r.t. everything in ControlParams —
including (n_bonds,) stiffness arrays, which the gridded energy splits
into bond planes (ops/grid.py:_grid_bond_params) and the fused Pallas
kernel takes as VMEM plane inputs. These tests pin that the non-geometric
design axis works through every backend: value+grad parity XLA-vs-Pallas
(interpret) and an optimization step that actually improves the target."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples.stiffness_field_design import build


@pytest.fixture(scope="module")
def tiny():
    objective_fn, n_bonds, info = build(n1=5, n2=4, method="verlet")
    return objective_fn, n_bonds


def test_per_bond_stiffness_gradient_finite_nonzero(tiny):
    objective_fn, n_bonds = tiny
    log_k = jnp.zeros(n_bonds)
    value, grad = jax.value_and_grad(objective_fn)(log_k)
    assert np.isfinite(float(value)) and float(value) > 0
    g = np.asarray(grad)
    assert g.shape == (n_bonds,)
    assert np.all(np.isfinite(g))
    # The objective must actually depend on (most of) the stiffness field.
    assert np.count_nonzero(g) > n_bonds // 2


def test_per_bond_stiffness_pallas_interpret_parity():
    """(n_bonds,) stiffness through the fused kernel (interpret mode on
    CPU) against the XLA scan — plane splitting and the custom-vjp arrays
    cotangent must agree for PER-BOND (not scalar) stiffness leaves."""

    import numpy as onp

    from difflexmm_tpu.geometry import QuadGeometry
    from difflexmm_tpu.geometry.polygon import compute_inertia
    from difflexmm_tpu.models import base
    from difflexmm_tpu.ops.grid import build_quad_grid_energy
    from difflexmm_tpu.ops.observables import kinetic_energy
    from difflexmm_tpu.solver import setup_dynamic_solver
    from difflexmm_tpu.utils import (
        ContactParams,
        ControlParams,
        GeometricalParams,
        LigamentParams,
        MechanicalParams,
    )

    n1, n2 = 5, 4
    geometry = QuadGeometry(n1_blocks=n1, n2_blocks=n2, spacing=1.0, bond_length=0.1)
    bc_fn, cnv_fn, bond_fn, rbv_fn = geometry.get_parametrization()
    shifts = geometry.get_design_from_rotated_square(0.25)
    centroids, node_vectors = bc_fn(*shifts), cnv_fn(*shifts)
    ref_vectors = rbv_fn()
    n_bonds = len(bond_fn())

    driven_pairs, drive_mask = base.driven_side_pairs(n1, n2, 2, "left")
    clamped_pairs = base.clamped_corner_pairs(n1, n2, 1)
    pairs = onp.concatenate([driven_pairs, clamped_pairs])
    drive_vec = jnp.asarray(
        onp.concatenate([drive_mask, onp.zeros(len(clamped_pairs))])
    )

    def drive_fn(t, amplitude, loading_rate):
        return base.pulse(t, amplitude, loading_rate) * drive_vec

    energy = build_quad_grid_energy(n1, n2, use_contact=True)
    target = base.target_patch_ids(n1, n2, (2, 2), (0, 0))
    timepoints = jnp.linspace(0.0, 3.0, 6)
    state0 = jnp.zeros((2, geometry.n_blocks, 3))
    inertia = compute_inertia(node_vectors, 1.0)

    def make_objective(method, interpret):
        solve = setup_dynamic_solver(
            geometry=geometry,
            energy_fn=energy,
            constrained_block_DOF_pairs=pairs,
            constrained_DOFs_fn=drive_fn,
            damped_blocks=onp.arange(geometry.n_blocks),
            method=method,
            n_substeps=6,
            quad_grid=dict(n1=n1, n2=n2, linearized=False, use_contact=True)
            if method == "verlet_pallas"
            else None,
            pallas_interpret=interpret,
        )

        def objective(log_k):
            cp = ControlParams(
                geometrical_params=GeometricalParams(centroids, node_vectors),
                mechanical_params=MechanicalParams(
                    bond_params=LigamentParams(
                        k_stretch=1.0,
                        k_shear=0.02 * jnp.exp(log_k),
                        k_rot=1e-3,
                        reference_vector=ref_vectors,
                    ),
                    density=1.0,
                    damping=0.02,
                    contact_params=ContactParams(
                        k_contact=1e-3,
                        min_angle=-15 * jnp.pi / 180,
                        cutoff_angle=-10 * jnp.pi / 180,
                    ),
                ),
                constraint_params=dict(amplitude=0.2, loading_rate=1.0),
            )
            sol = solve(state0, timepoints, cp)
            return kinetic_energy(sol[:, 1, target, :], inertia[target])

        return objective

    rng = np.random.default_rng(0)
    log_k = jnp.asarray(rng.normal(0.0, 0.3, n_bonds))
    v_x, g_x = jax.value_and_grad(make_objective("verlet", False))(log_k)
    v_p, g_p = jax.value_and_grad(make_objective("verlet_pallas", True))(log_k)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=2e-5, atol=1e-12
    )


@pytest.mark.slow
def test_stiffness_optimization_improves(tiny):
    objective_fn, n_bonds = tiny
    value_and_grad = jax.jit(jax.value_and_grad(objective_fn))
    log_k = jnp.zeros(n_bonds)
    optimizer = optax.adam(0.1)
    opt_state = optimizer.init(log_k)
    v0 = float(value_and_grad(log_k)[0])
    for _ in range(8):
        value, grad = value_and_grad(log_k)
        updates, opt_state = optimizer.update(
            jax.tree.map(jnp.negative, grad), opt_state
        )
        log_k = optax.apply_updates(log_k, updates)
    vT = float(value_and_grad(log_k)[0])
    assert vT > v0, (v0, vT)
