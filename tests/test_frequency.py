"""Harmonic (frequency-domain) response oracles.

Gold checks: analytic single-DOF amplitude/phase, exact equality with modal
superposition over the full mode basis, reciprocity of the transfer
function, resonance alignment with modal eigenfrequencies, and a finite
differentiable transmission curve.
"""

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry import RotatedSquareGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.assembly import build_strain_energy
from difflexmm_tpu.ops.bonds import ligament_energy_linearized
from difflexmm_tpu.solver import linear_mode_analysis
from difflexmm_tpu.solver.frequency import harmonic_response, transmission
from difflexmm_tpu.utils import (
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _lattice(n1=4, n2=3, angle=0.25, damping=0.0):
    geo = RotatedSquareGeometry(n1, n2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
            density=1.0,
            damping=damping,
        ),
        constraint_params=dict(),
    )
    energy = build_strain_energy(bonds(), ligament_energy_linearized)
    return geo, energy, cp


def test_single_dof_analytic_response():
    """Clamp everything but one translational DOF: the response must be the
    textbook |H| = f0 / sqrt((k - m w^2)^2 + (c w)^2) with k, m, c measured
    from the model itself."""

    geo, energy, cp = _lattice(2, 1, angle=0.0, damping=0.4)
    # Constrain every DOF except the x translation of block 1.
    nb = geo.n_blocks
    pairs = np.array(
        [[b, d] for b in range(nb) for d in range(3) if (b, d) != (1, 0)]
    )
    damped = np.array([1])

    from difflexmm_tpu.geometry.polygon import compute_inertia
    from difflexmm_tpu.ops.kinematics import build_constrained_kinematics
    from difflexmm_tpu.ops.assembly import constrain_energy

    kin = build_constrained_kinematics(nb, constrained_block_DOF_pairs=pairs)
    k_eff = jax.hessian(constrain_energy(energy, kin))(
        jnp.zeros((nb, 3)), 0.0, cp
    ).reshape(3 * nb, 3 * nb)[3, 3]
    m_eff = compute_inertia(
        cp.geometrical_params.centroid_node_vectors, cp.mechanical_params.density
    )[1, 0]
    c_eff = cp.mechanical_params.damping

    f0 = 0.7
    forcing = jnp.zeros((nb, 3)).at[1, 0].set(f0)
    omega_n = float(jnp.sqrt(k_eff / m_eff))
    omegas = jnp.array([0.25, 0.9, 1.0, 1.4]) * omega_n
    u = harmonic_response(
        jnp.zeros((nb, 3)), geo, energy, cp, forcing, omegas,
        constrained_block_DOF_pairs=pairs, damped_blocks=damped,
    )
    analytic = f0 / (
        k_eff - m_eff * omegas**2 + 1j * c_eff * omegas
    )
    np.testing.assert_allclose(np.asarray(u[:, 1, 0]), np.asarray(analytic),
                               rtol=1e-10)
    # Every constrained DOF is exactly zero.
    u_rest = np.asarray(u).reshape(len(omegas), -1)[:, np.arange(3 * nb) != 3]
    np.testing.assert_allclose(np.abs(u_rest), 0.0, atol=1e-12)


def test_matches_modal_superposition():
    """Undamped response == sum over ALL modes of phi (phi^T f) / (w_n^2 -
    w^2), with mass-normalized modes from linear_mode_analysis."""

    geo, energy, cp = _lattice()
    pairs = base.clamped_corner_pairs(4, 3, 1)
    vals, modes = linear_mode_analysis(
        jnp.zeros((geo.n_blocks, 3)), geo, energy, cp,
        constrained_block_DOF_pairs=pairs,
    )
    from difflexmm_tpu.geometry.polygon import compute_inertia

    M = np.asarray(
        compute_inertia(
            cp.geometrical_params.centroid_node_vectors,
            cp.mechanical_params.density,
        )
    ).reshape(-1)
    phi = np.asarray(modes).reshape(len(vals), -1)  # rows are modes
    phi = phi / np.sqrt((phi**2 * M[None]).sum(axis=1, keepdims=True))

    rng = np.random.default_rng(3)
    forcing = rng.standard_normal((geo.n_blocks, 3))
    omegas = jnp.array([0.11, 0.83, 2.97])  # off-resonance drive points

    u = harmonic_response(
        jnp.zeros((geo.n_blocks, 3)), geo, energy, cp,
        jnp.asarray(forcing), omegas,
        constrained_block_DOF_pairs=pairs,
    )

    # Forcing on constrained DOFs is ignored by the solver: mask it here too.
    f = forcing.reshape(-1).copy()
    f[np.abs(phi).sum(axis=0) == 0] = 0.0
    coeffs = phi @ f  # (n_modes,)
    for i, w in enumerate(np.asarray(omegas)):
        u_modal = (phi.T @ (coeffs / (np.asarray(vals) - w**2))).reshape(
            geo.n_blocks, 3
        )
        np.testing.assert_allclose(
            np.asarray(u[i].real), u_modal, rtol=1e-8, atol=1e-9
        )
        np.testing.assert_allclose(np.asarray(u[i].imag), 0.0, atol=1e-12)


def test_reciprocity():
    """The damped transfer function is symmetric: response at DOF b to a
    unit force at DOF a equals response at a to a unit force at b."""

    geo, energy, cp = _lattice(3, 2, damping=0.15)
    pairs = base.clamped_corner_pairs(3, 2, 1)
    damped = np.arange(geo.n_blocks)
    omegas = jnp.array([0.6, 1.9])

    def resp(block, dof):
        forcing = jnp.zeros((geo.n_blocks, 3)).at[block, dof].set(1.0)
        return harmonic_response(
            jnp.zeros((geo.n_blocks, 3)), geo, energy, cp, forcing, omegas,
            constrained_block_DOF_pairs=pairs, damped_blocks=damped,
        )

    u_from_a = resp(1, 0)
    u_from_b = resp(4, 1)
    np.testing.assert_allclose(
        np.asarray(u_from_a[:, 4, 1]), np.asarray(u_from_b[:, 1, 0]),
        rtol=1e-9,
    )


def test_resonance_peaks_at_eigenfrequencies():
    # omega_1 ~ 0.1 here, so keep damping light (zeta ~ 0.025) or the damped
    # peak shifts visibly below omega_1 (at damping=0.02, zeta ~ 0.25).
    geo, energy, cp = _lattice(damping=0.002)
    pairs = base.clamped_corner_pairs(4, 3, 1)
    vals, modes = linear_mode_analysis(
        jnp.zeros((geo.n_blocks, 3)), geo, energy, cp,
        constrained_block_DOF_pairs=pairs,
    )
    omega_1 = float(np.sqrt(np.asarray(vals)[0]))
    omegas = jnp.array([0.5, 0.9, 1.0, 1.1, 2.0]) * omega_1
    # Mass-weighted fundamental shape: modal orthogonality makes this forcing
    # excite only mode 1, so the sweep must peak exactly at omega_1.
    from difflexmm_tpu.geometry.polygon import compute_inertia

    M = np.asarray(
        compute_inertia(
            cp.geometrical_params.centroid_node_vectors,
            cp.mechanical_params.density,
        )
    )
    forcing = jnp.asarray(M * np.asarray(modes[0]).reshape(geo.n_blocks, 3))
    u = harmonic_response(
        jnp.zeros((geo.n_blocks, 3)), geo, energy, cp, forcing, omegas,
        constrained_block_DOF_pairs=pairs,
        damped_blocks=np.arange(geo.n_blocks),
    )
    amp = np.abs(np.asarray(u)).max(axis=(1, 2))
    assert np.argmax(amp) == 2  # peak at the fundamental


def test_bloch_gap_blocks_transmission():
    """Consistency across the two linear-analysis modules: the infinite-
    lattice Bloch gap (solver.bloch) must appear as a transmission collapse
    in the finite-strip harmonic response (solver.frequency) — both are
    assembled from the same autodiff energy Hessians."""

    from difflexmm_tpu.solver.bloch import (
        band_structure, frequencies, reciprocal_basis, rotated_square_cell,
    )

    angle = 0.35
    cell = rotated_square_cell(angle, k_stretch=1.0, k_shear=1.0, k_rot=1.0)
    b = reciprocal_basis(cell.direct_basis)
    frac = jnp.linspace(-0.5, 0.5, 13)
    ks = jnp.stack(jnp.meshgrid(frac, frac), -1).reshape(-1, 2) @ b
    omega = np.asarray(frequencies(band_structure(cell, ks)))
    gaps = [
        (float(omega[:, j].max()), float(omega[:, j + 1].min()))
        for j in range(omega.shape[1] - 1)
        if omega[:, j + 1].min() > omega[:, j].max()
    ]
    gap_lo, gap_hi = max(gaps, key=lambda g: g[1] - g[0])
    assert gap_hi - gap_lo > 1.0  # the angle-0.35 gap is wide

    geo = RotatedSquareGeometry(6, 2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 1.0, 1.0, rbv()),
            density=1.0,
            damping=0.05,
        ),
        constraint_params=dict(),
    )
    energy = build_strain_energy(bonds(), ligament_energy_linearized)
    xs = np.asarray(bc(angle))[:, 0]
    left = np.where(xs < xs.min() + 0.6)[0]
    right = np.where(xs > xs.max() - 0.6)[0]
    forcing = jnp.zeros((geo.n_blocks, 3)).at[jnp.asarray(left), 0].set(1.0)
    omegas = jnp.array([0.8, 1.6, 0.5 * (gap_lo + gap_hi)])
    u = harmonic_response(
        jnp.zeros((geo.n_blocks, 3)), geo, energy, cp, forcing, omegas,
        damped_blocks=np.arange(geo.n_blocks),
    )
    t = np.asarray(transmission(u, input_blocks=left, output_blocks=right))
    assert t[0] > 0.05 and t[1] > 0.05  # passband carries the wave
    assert t[2] < 1e-4 * min(t[0], t[1])  # mid-gap: evanescent collapse


def test_transmission_differentiable_wrt_design():
    def curve(angle):
        geo = RotatedSquareGeometry(4, 2, spacing=1.0, bond_length=0.1)
        bc, cnv, bonds, rbv = geo.get_parametrization()
        cp = ControlParams(
            geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
                density=1.0,
                damping=0.1,
            ),
            constraint_params=dict(),
        )
        energy = build_strain_energy(bonds(), ligament_energy_linearized)
        forcing = jnp.zeros((geo.n_blocks, 3)).at[0, 0].set(1.0)
        u = harmonic_response(
            jnp.zeros((geo.n_blocks, 3)), geo, energy, cp, forcing,
            jnp.array([0.8, 1.6]),
            damped_blocks=np.arange(geo.n_blocks),
        )
        t = transmission(u, input_blocks=[0], output_blocks=[geo.n_blocks - 1])
        return jnp.sum(t)

    value, grad = jax.value_and_grad(curve)(0.25)
    assert np.isfinite(float(value)) and float(value) > 0
    assert np.isfinite(float(grad)) and abs(float(grad)) > 0


def test_transmission_collapses_inside_bloch_band_gap():
    """Cross-subsystem oracle: the FINITE strip's frequency-domain
    transmission must collapse exactly where the INFINITE lattice's Bloch
    band structure has its gap — two independent code paths (harmonic
    complex solve on a finite RotatedSquareGeometry vs periodic-cell
    dynamical-matrix dispersion in solver/bloch.py) agreeing on the
    stop band. The cell (angle=0.25, k=1.0/0.3/0.05) has its bulk gap at
    [3.456, 4.051] (pinned by tests/test_bloch.py's gap machinery)."""

    from difflexmm_tpu.solver.bloch import (
        band_structure,
        bz_grid,
        frequencies,
        rotated_square_cell,
    )

    cell = rotated_square_cell(
        angle=0.25, k_stretch=1.0, k_shear=0.3, k_rot=0.05
    )
    om = frequencies(band_structure(cell, bz_grid(cell, 10, 10)))
    gap_lo = float(np.asarray(om.max(axis=0))[:4].max())
    gap_hi = float(np.asarray(om.min(axis=0))[4:].min())
    assert gap_hi - gap_lo > 0.4

    n1, n2, angle = 14, 5, 0.25
    geo = RotatedSquareGeometry(n1, n2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
            density=1.0,
            damping=0.05,
        ),
        constraint_params=dict(),
    )
    energy = build_strain_energy(bonds(), ligament_energy_linearized)
    nb = geo.n_blocks
    centroids = np.asarray(bc(angle))
    left = np.where(centroids[:, 0] < centroids[:, 0].min() + 0.5)[0]
    right = np.where(centroids[:, 0] > centroids[:, 0].max() - 0.5)[0]
    forcing = jnp.zeros((nb, 3))
    for b in left:
        forcing = forcing.at[b, 0].set(1.0)

    passband = jnp.array([2.0, 3.0])
    midgap = jnp.array([0.5 * (gap_lo + gap_hi)])
    omegas = jnp.concatenate([passband, midgap])
    u = harmonic_response(
        jnp.zeros((nb, 3)), geo, energy, cp, forcing, omegas,
        damped_blocks=np.arange(nb),
    )
    T = np.asarray(transmission(u, left, right))
    # Passband carries; mid-gap transmission collapses by many orders.
    assert T[0] > 1e-2
    assert T[2] < 1e-8
    assert T[2] < 1e-6 * T[1]
