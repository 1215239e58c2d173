"""Linear modal analysis: generalized-eig parity with the reference method.

The reference solves K q = w^2 M q with ``scipy.linalg.eigh(K, diag(M))``
(reference difflexmm/dynamics.py:229-234). Our on-device path symmetrizes
with M^{-1/2} instead; these tests pin both to each other and to physics
invariants (rigid-body modes, analytic spring-mass frequency).
"""

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry import RotatedSquareGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.assembly import build_strain_energy, constrain_energy
from difflexmm_tpu.ops.bonds import ligament_energy_linearized
from difflexmm_tpu.ops.kinematics import build_constrained_kinematics
from difflexmm_tpu.solver import eigenmode_analysis, linear_mode_analysis
from difflexmm_tpu.utils import (
    ControlParams,
    EigenmodeData,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _lattice(n1=4, n2=3, angle=0.25):
    geo = RotatedSquareGeometry(n1, n2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
            density=1.0,
            damping=0.0,
        ),
        constraint_params=dict(),
    )
    energy = build_strain_energy(bonds(), ligament_energy_linearized)
    return geo, energy, cp


def _scipy_reference_modes(geo, energy, cp, pairs):
    """The reference's own algorithm: LAPACK generalized eigh on the
    free-DOF-reduced stiffness and diagonal mass."""

    kinematics = build_constrained_kinematics(
        geo.n_blocks, constrained_block_DOF_pairs=pairs
    )
    dof_set = kinematics.dof_set
    energy_c = constrain_energy(energy, kinematics)
    u0 = jnp.zeros((geo.n_blocks, 3))
    K = jax.hessian(energy_c)(u0, 0.0, cp).reshape(3 * geo.n_blocks, -1)
    from difflexmm_tpu.geometry.polygon import compute_inertia

    inertia = compute_inertia(
        cp.geometrical_params.centroid_node_vectors,
        cp.mechanical_params.density,
    ).reshape(-1)
    free = np.where(np.asarray(dof_set.free_mask).reshape(-1) > 0)[0]
    K = np.asarray(K)[np.ix_(free, free)]
    vals, vecs = scipy.linalg.eigh(K, np.diag(np.asarray(inertia)[free]))
    return vals


def test_modes_match_scipy_generalized_eigh():
    geo, energy, cp = _lattice()
    pairs = base.clamped_corner_pairs(4, 3, 1)

    vals, modes = linear_mode_analysis(
        jnp.zeros((geo.n_blocks, 3)), geo, energy, cp,
        constrained_block_DOF_pairs=pairs,
    )
    vals_ref = _scipy_reference_modes(geo, energy, cp, pairs)
    assert np.allclose(np.asarray(vals), vals_ref, rtol=1e-8, atol=1e-10)
    # Modes: unit norm, zero on constrained DOFs, K-orthogonal under M.
    assert np.allclose(np.linalg.norm(np.asarray(modes).reshape(len(vals), -1),
                                      axis=1), 1.0)
    constrained = np.asarray(pairs)
    assert np.allclose(
        np.asarray(modes)[:, constrained[:, 0], constrained[:, 1]], 0.0
    )


def test_rigid_body_modes_unconstrained():
    geo, energy, cp = _lattice()
    vals, modes = linear_mode_analysis(
        jnp.zeros((geo.n_blocks, 3)), geo, energy, cp
    )
    # Free-floating lattice: exactly 3 zero modes (2 translations + rotation).
    assert np.sum(np.asarray(vals) < 1e-8) == 3
    assert np.all(np.asarray(vals[3:]) > 1e-8)


def test_eigenmode_data_artifact():
    geo, energy, cp = _lattice()
    pairs = base.clamped_corner_pairs(4, 3, 1)
    data = eigenmode_analysis(
        jnp.zeros((geo.n_blocks, 3)), geo, energy, cp,
        constrained_block_DOF_pairs=pairs,
    )
    assert isinstance(data, EigenmodeData)
    assert data.fields.shape[1:] == (geo.n_blocks, 3)
    assert data.eigenvalues.shape == (data.fields.shape[0],)

    # plot_mode consumes it without touching a display.
    import matplotlib

    matplotlib.use("Agg")
    from difflexmm_tpu.plotting import plot_mode

    ax = plot_mode(data, mode_index=1)
    assert ax is not None


def test_tangent_modes_about_precompressed_equilibrium():
    """Statics -> modal composition: tangent modes about a statically
    compressed rotated-square lattice. The drive and load-path parameter
    flow into the tangent stiffness (``constrained_DOFs_fn``/``t``), the
    frequencies shift under precompression, and the whole pipeline
    (implicit-adjoint Newton -> hessian -> eigh) is reverse-differentiable
    w.r.t. the compression amplitude, matching finite differences."""

    from difflexmm_tpu.ops.bonds import ligament_energy
    from difflexmm_tpu.solver import setup_static_solver

    geo = RotatedSquareGeometry(3, 2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    cp0 = ControlParams(
        geometrical_params=GeometricalParams(bc(0.25), cnv(0.25)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
            density=1.0,
            damping=0.0,
        ),
        constraint_params=dict(),
    )
    energy = build_strain_energy(bonds(), ligament_energy)

    left = np.arange(0, geo.n_blocks, geo.n1_blocks)
    right = np.arange(geo.n1_blocks - 1, geo.n_blocks, geo.n1_blocks)
    pairs = np.concatenate(
        [
            np.array([[b, d] for b in left for d in range(3)]),
            np.stack([right, np.zeros_like(right)], 1),
        ]
    )

    def drive(t, amplitude):
        values = jnp.zeros(len(pairs))
        return values.at[-len(right):].set(-amplitude * t)

    solve = setup_static_solver(
        geo, energy,
        constrained_block_DOF_pairs=pairs,
        constrained_DOFs_fn=drive,
    )

    def equilibrium(amplitude):
        cp = cp0._replace(constraint_params=dict(amplitude=amplitude))
        return solve(jnp.zeros((geo.n_blocks, 3)), 1.0, cp), cp

    def min_eig(amplitude):
        u_eq, cp = equilibrium(amplitude)
        vals, _ = linear_mode_analysis(
            u_eq, geo, energy, cp,
            constrained_block_DOF_pairs=pairs,
            constrained_DOFs_fn=drive,
            t=1.0,
        )
        return vals[0]

    # Guard against a silently stalled Newton (the amplitude must keep the
    # initial guess clear of the bond-collapse singularity).
    u_eq, cp = equilibrium(0.04)
    assert float(jnp.max(jnp.abs(solve.residual(u_eq, 1.0, cp)))) < 1e-9

    eig_rest = float(min_eig(0.0))
    eig_comp = float(min_eig(0.04))
    # Precompression retunes the lattice's fundamental frequency.
    assert np.isfinite(eig_rest) and np.isfinite(eig_comp)
    assert abs(eig_comp - eig_rest) > 1e-4 * abs(eig_rest)

    a0 = 0.03
    grad = float(jax.grad(min_eig)(a0))
    h = 1e-5
    fd = (float(min_eig(a0 + h)) - float(min_eig(a0 - h))) / (2 * h)
    np.testing.assert_allclose(grad, fd, rtol=1e-5)
