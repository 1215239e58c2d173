"""Bloch band-structure oracles.

Gold checks: the analytic monatomic-chain dispersion, Hermiticity and
time-reversal symmetry of the dynamical matrix, exact zero acoustic modes at
Gamma, band folding under the supercell construction, agreement between two
independent cell constructions of the same rotated-square lattice
(primitive oblique 2-block cell vs periodic-quad 4-block cell), equality of
linearized and nonlinear ligament Hessians at the undeformed state, and
differentiability of band frequencies w.r.t. the design angle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difflexmm_tpu.ops.bonds import (
    ligament_energy,
    ligament_energy_linearized,
    simple_spring_energy,
)
from difflexmm_tpu.solver.bloch import (
    band_structure,
    bond_hessians,
    bz_grid,
    density_of_states,
    dynamical_matrix,
    frequencies,
    group_velocity,
    high_symmetry_path,
    kagome_periodic_cell,
    quad_periodic_cell,
    reciprocal_basis,
    rotated_square_cell,
    spring_chain_cell,
    supercell,
)


def test_spring_chain_analytic_dispersion():
    k_s, a, m = 2.3, 1.7, 0.6
    cell = spring_chain_cell(k_stretch=k_s, spacing=a, mass=m)
    kx = jnp.linspace(-jnp.pi / a, jnp.pi / a, 17)
    ks = jnp.stack([kx, jnp.zeros_like(kx)], axis=1)
    omega_sq = band_structure(cell, ks, bond_energy_fn=simple_spring_energy)
    # Two flat zero branches (transverse + rotation are zero-stiffness at
    # rest for a centroid-attached simple spring), one acoustic branch.
    analytic = 4.0 * k_s / m * jnp.sin(kx * a / 2) ** 2
    np.testing.assert_allclose(omega_sq[:, 2], analytic, atol=1e-12)
    np.testing.assert_allclose(omega_sq[:, :2], 0.0, atol=1e-12)


def test_dynamical_matrix_hermitian_and_time_reversal():
    cell = kagome_periodic_cell(shifts=jnp.array([[0.02, -0.01], [0.0, 0.03], [-0.02, 0.01]]))
    H = bond_hessians(cell, ligament_energy)
    k = jnp.array([0.7, -1.3])
    D = dynamical_matrix(cell, H, k)
    np.testing.assert_allclose(D, D.conj().T, atol=1e-12)
    D_neg = dynamical_matrix(cell, H, -k)
    np.testing.assert_allclose(D_neg, D.conj(), atol=1e-12)


def test_gamma_acoustic_zero_modes_and_positivity():
    cell = kagome_periodic_cell()
    b = reciprocal_basis(cell.direct_basis)
    ks = jnp.concatenate(
        [jnp.zeros((1, 2)), 0.31 * b[:1], jnp.array([[0.4, 0.9]])]
    )
    omega_sq = band_structure(cell, ks)
    # Two exact translational zero modes at Gamma; all bands non-negative.
    np.testing.assert_allclose(omega_sq[0, :2], 0.0, atol=1e-10)
    assert float(omega_sq[0, 2]) > 1e-6
    assert float(jnp.min(omega_sq)) > -1e-10


def test_linearized_and_nonlinear_hessians_match_at_rest():
    cell = rotated_square_cell(0.23, spacing=1.0, bond_length=0.08)
    H_nl = bond_hessians(cell, ligament_energy)
    H_lin = bond_hessians(cell, ligament_energy_linearized)
    np.testing.assert_allclose(H_nl, H_lin, atol=1e-10)


def test_supercell_band_folding():
    """Bands of a (2 x 1) kagome supercell at K equal the union of the
    primitive bands at the two wave vectors folding onto K."""

    cell = kagome_periodic_cell(
        shifts=jnp.array([[0.03, 0.01], [-0.02, 0.02], [0.01, -0.03]])
    )
    sc = supercell(cell, 2, 1)
    b = reciprocal_basis(cell.direct_basis)

    K = jnp.array([0.37, 0.18])
    folded = band_structure(sc, K[None])[0]
    prim = band_structure(cell, jnp.stack([K, K + b[0] / 2]))
    together = jnp.sort(prim.reshape(-1))
    np.testing.assert_allclose(folded, together, atol=1e-9)


def test_rotated_square_cross_construction_parity():
    """The primitive oblique 2-block cell and the periodic-quad 4-block cell
    describe the same lattice: quad-cell bands at K = union of primitive
    bands at K and K + (pi/s, 0)."""

    from difflexmm_tpu.geometry.quad import QuadGeometry

    angle, s, l = 0.21, 1.0, 0.1
    prim = rotated_square_cell(angle, spacing=s, bond_length=l)

    geometry = QuadGeometry(2, 2, spacing=s, bond_length=l)
    geometry.compute_geometry()
    h, v = geometry.get_design_from_rotated_square(jnp.asarray(angle))
    quad = quad_periodic_cell(h[:2, :2], v[:2, :2], spacing=s, bond_length=l)

    K = jnp.array([0.53, -0.29])
    quad_bands = band_structure(quad, K[None])[0]
    prim_bands = band_structure(
        prim, jnp.stack([K, K + jnp.array([jnp.pi / s, 0.0])])
    )
    together = jnp.sort(prim_bands.reshape(-1))
    np.testing.assert_allclose(quad_bands, together, atol=1e-9)


def test_band_gradient_matches_finite_difference():
    def top_gap(angle):
        cell = rotated_square_cell(angle, spacing=1.0, bond_length=0.1)
        omega_sq = band_structure(cell, jnp.array([[0.9, 0.4]]))[0]
        return omega_sq[5] - omega_sq[4]

    angle0 = 0.3
    g = jax.grad(top_gap)(angle0)
    eps = 1e-6
    fd = (top_gap(angle0 + eps) - top_gap(angle0 - eps)) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_prestrain_shifts_bands():
    """An affine precompression must change (here: soften) the rotated
    square's bands, and the affine path must stay differentiable."""

    cell = rotated_square_cell(0.25, spacing=1.0, bond_length=0.1)
    K = jnp.array([[0.8, 0.0]])
    base = band_structure(cell, K, ligament_energy)[0]
    squeezed = band_structure(
        cell,
        K,
        ligament_energy,
        displacement=jnp.zeros((2, 3)),
        affine=jnp.array([[0.98, 0.0], [0.0, 1.0]]),
    )[0]
    assert not np.allclose(base, squeezed, atol=1e-10)


def test_high_symmetry_path_and_frequencies():
    ks, dist, ticks = high_symmetry_path(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]], n_per_segment=8
    )
    assert ks.shape == (17, 2)
    assert float(dist[0]) == 0.0 and ticks.shape == (3,)
    np.testing.assert_allclose(np.diff(np.asarray(dist)) >= 0, True)
    omega = frequencies(jnp.array([[-1e-18, 4.0]]))
    np.testing.assert_allclose(omega, [[0.0, 2.0]])


def test_modes_satisfy_eigenproblem():
    cell = kagome_periodic_cell()
    k = jnp.array([[0.33, 0.71]])
    omega_sq, modes = band_structure(cell, k, with_modes=True)
    H = bond_hessians(cell, ligament_energy)
    D = dynamical_matrix(cell, H, k[0])
    M = jnp.diag(jnp.asarray(cell.inertia).reshape(-1).astype(D.dtype))
    lhs = D @ modes[0]
    rhs = M @ modes[0] * omega_sq[0][None, :]
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


@pytest.mark.parametrize("p", [(1, 2), (3, 1)])
def test_quad_periodic_cell_wraps(p):
    """Degenerate periods (single row/column) assemble and stay Hermitian."""

    p1, p2 = p
    rng = np.random.default_rng(0)
    h = 0.02 * rng.standard_normal((p1, p2, 2))
    v = 0.02 * rng.standard_normal((p1, p2, 2))
    cell = quad_periodic_cell(h, v)
    H = bond_hessians(cell, ligament_energy)
    D = dynamical_matrix(cell, H, jnp.array([0.3, 0.5]))
    np.testing.assert_allclose(D, D.conj().T, atol=1e-12)
    omega_sq = band_structure(cell, jnp.zeros((1, 2)))[0]
    np.testing.assert_allclose(omega_sq[:2], 0.0, atol=1e-9)


def test_relax_cell_rest_state_is_zero():
    from difflexmm_tpu.solver.bloch import relax_cell

    cell = rotated_square_cell(0.25, spacing=1.0, bond_length=0.1)
    u = relax_cell(cell)
    np.testing.assert_allclose(np.asarray(u), 0.0, atol=1e-12)


def test_relax_cell_compression_activates_rotation_mechanism():
    from difflexmm_tpu.solver.bloch import cell_strain_energy, relax_cell

    cell = rotated_square_cell(0.25, spacing=1.0, bond_length=0.1,
                               k_shear=0.3, k_rot=0.05)
    F = jnp.array([[0.97, 0.0], [0.0, 0.97]])
    u = relax_cell(cell, affine=F)
    assert bool(jnp.all(jnp.isfinite(u)))

    # Relaxation drops the energy below the naive affine map...
    e_affine = float(cell_strain_energy(cell, jnp.zeros((2, 3)), F))
    e_relaxed = float(cell_strain_energy(cell, u, F))
    assert e_relaxed < e_affine * 0.99

    # ...via the auxetic mechanism: the two blocks counter-rotate.
    th = np.asarray(u[:, 2])
    assert abs(th[0]) > 1e-3 and abs(th[1]) > 1e-3
    assert th[0] * th[1] < 0

    # Equilibrium certificate: free-DOF residual at the solution.
    g = jax.grad(
        lambda uu: cell_strain_energy(cell, uu, F)
    )(u).reshape(-1)
    g = g.at[0].set(0.0).at[1].set(0.0)  # pinned translations
    assert float(jnp.max(jnp.abs(g))) < 1e-9


def test_relaxed_band_structure_differs_and_grad_matches_fd():
    """Strain-tuned dispersion about the RELAXED state: the relaxation
    changes the bands relative to the naive affine state, and the whole
    pipeline (Newton cell relaxation -> bond Hessians -> Bloch eigh) is
    reverse-differentiable w.r.t. the applied strain."""

    from difflexmm_tpu.solver.bloch import relax_cell

    cell = rotated_square_cell(0.25, spacing=1.0, bond_length=0.1,
                               k_shear=0.3, k_rot=0.05)
    K = jnp.array([[0.8, 0.3]])

    def band(e, relaxed=True):
        F = (1.0 - e) * jnp.eye(2)
        u = relax_cell(cell, affine=F) if relaxed else jnp.zeros((2, 3))
        return band_structure(
            cell, K, ligament_energy, displacement=u, affine=F
        )[0][3]

    e0 = 0.03
    assert not np.allclose(float(band(e0)), float(band(e0, relaxed=False)),
                           rtol=1e-6)

    g = float(jax.grad(band)(e0))
    h = 1e-6
    fd = (float(band(e0 + h)) - float(band(e0 - h))) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_group_velocity_spring_chain_analytic():
    # d omega / d k of the monatomic chain: a sqrt(k/m) cos(k a / 2),
    # negative past the zone midpoint (omega = 2 sqrt(k/m) |sin(ka/2)|).
    k_s, a, m = 2.3, 1.7, 0.6
    cell = spring_chain_cell(k_stretch=k_s, spacing=a, mass=m)
    kx = jnp.array([0.3, 0.9, 1.4]) * (jnp.pi / a)
    ks = jnp.stack([kx, jnp.zeros_like(kx)], axis=1)
    omega, vg = group_velocity(cell, ks, bond_energy_fn=simple_spring_energy)
    analytic = a * jnp.sqrt(k_s / m) * jnp.cos(kx * a / 2)
    np.testing.assert_allclose(vg[:, 2, 0], analytic, atol=1e-10)
    np.testing.assert_allclose(vg[:, 2, 1], 0.0, atol=1e-10)
    np.testing.assert_allclose(
        omega[:, 2], 2 * jnp.sqrt(k_s / m) * jnp.abs(jnp.sin(kx * a / 2)),
        atol=1e-12,
    )


def test_group_velocity_matches_finite_differences():
    cell = rotated_square_cell(angle=0.25, k_stretch=1.0, k_shear=1.0, k_rot=1e-3)
    k0 = jnp.array([0.4, 0.7])
    omega, vg = group_velocity(cell, k0[None])
    eps = 1e-6
    for alpha, e in ((0, jnp.array([eps, 0.0])), (1, jnp.array([0.0, eps]))):
        omp = frequencies(band_structure(cell, (k0 + e)[None]))[0]
        omm = frequencies(band_structure(cell, (k0 - e)[None]))[0]
        np.testing.assert_allclose(
            vg[0, :, alpha], (omp - omm) / (2 * eps), atol=1e-7
        )


def test_group_velocity_acoustic_limit_matches_christoffel():
    # THIRD independent path to the sound speeds: Hellmann-Feynman band
    # slopes at small k vs Christoffel speeds from the condensed moduli.
    from difflexmm_tpu.solver.homogenize import (
        areal_density,
        christoffel_speeds,
        effective_moduli,
    )

    cell = rotated_square_cell(angle=0.25, k_stretch=1.0, k_shear=1.0, k_rot=1e-3)
    n = jnp.array([0.6, 0.8])
    n = n / jnp.linalg.norm(n)
    _, vg = group_velocity(cell, (1e-3 * n)[None, :])
    v_hf = np.sort(np.asarray(vg[0, :2] @ n))
    C = effective_moduli(cell)
    v_chr = np.sort(np.asarray(christoffel_speeds(C, areal_density(cell), n)))
    np.testing.assert_allclose(v_hf, v_chr, rtol=1e-4)


def test_density_of_states_normalization_and_zone_boundary_pileup():
    cell = rotated_square_cell(angle=0.25, k_stretch=1.0, k_shear=1.0, k_rot=1e-3)
    grid_k = bz_grid(cell, 10, 10)
    assert grid_k.shape == (100, 2)
    oms = frequencies(band_structure(cell, grid_k))
    og = jnp.linspace(-0.5, float(oms.max()) + 0.5, 400)
    g = density_of_states(oms, og, sigma=0.02)
    # Each k carries weight 1/n_k: the DOS integrates to n_bands.
    np.testing.assert_allclose(
        float(jnp.trapezoid(g, og)), oms.shape[1], rtol=1e-3
    )
    assert np.all(np.asarray(g) >= 0.0)


def test_line_defect_waveguide_band_in_bulk_gap():
    """A soft-hinge line defect pulls guided branches into the pristine
    lattice's band gap, localized on the defect row; the pristine
    supercell's gap interior stays empty (the folded bands cannot enter a
    true bulk gap)."""

    from difflexmm_tpu.solver.bloch import line_defect_cell, mode_localization

    base = rotated_square_cell(
        angle=0.25, k_stretch=1.0, k_shear=0.3, k_rot=0.05
    )
    P = 7
    pristine = supercell(base, 1, P)
    guide = line_defect_cell(base, P, k_rot=0.005)

    b = reciprocal_basis(base.direct_basis)
    kx = jnp.linspace(0.0, 0.5, 11)
    ks = jnp.stack([kx * b[0, 0], jnp.zeros_like(kx)], axis=1)
    om_p = np.asarray(frequencies(band_structure(pristine, ks)))
    om_sq, modes = band_structure(guide, ks, with_modes=True)
    om_g = np.asarray(frequencies(om_sq))

    # Pristine gap (around the known band-3/4 gap of this cell).
    below = om_p[om_p <= 3.75].max()
    above = om_p[om_p >= 3.75].min()
    assert above - below > 0.4

    # Defect: guided states in the gap interior at several k.
    interior = (om_g > below + 0.1) & (om_g < above - 0.1)
    assert interior.sum() >= 3
    # ...localized on (or next to) the defect row.
    loc = np.asarray(mode_localization(guide, modes, P))
    mid = P // 2
    kk, bands = np.where(interior)
    frac_mid3 = (
        loc[kk, mid, bands]
        + loc[kk, mid - 1, bands]
        + loc[kk, (mid + 1) % P, bands]
    )
    assert frac_mid3.mean() > 0.75
    # Pristine gap interior is empty.
    assert not np.any((om_p > below + 0.1) & (om_p < above - 0.1))


def test_line_defect_cell_param_handling():
    from difflexmm_tpu.solver.bloch import line_defect_cell

    base = rotated_square_cell(angle=0.2)
    nb = base.bond_blocks.shape[0]
    P = 5
    guide = line_defect_cell(base, P, k_rot=0.01, defect_index=1)
    kr = np.asarray(guide.bond_params["k_rot"])
    assert kr.shape == (P * nb,)
    np.testing.assert_allclose(kr[nb : 2 * nb], 0.01)
    host = np.asarray(
        jnp.broadcast_to(jnp.asarray(base.bond_params["k_rot"]), (nb,))
    )
    np.testing.assert_allclose(kr[:nb], host)
    np.testing.assert_allclose(kr[2 * nb :], np.tile(host, P - 2))
    # Unknown parameter fails loudly.
    with pytest.raises(KeyError):
        line_defect_cell(base, P, not_a_param=1.0)
    # axis=0 variant transposes the supercell.
    g0 = line_defect_cell(base, P, axis=0, k_rot=0.01)
    assert g0.centroid_node_vectors.shape[0] == P * base.centroid_node_vectors.shape[0]


def test_wavepacket_speed_matches_bloch_group_velocity():
    """Cross-subsystem oracle: a narrowband wavepacket launched in the
    TIME-DOMAIN solver must travel at the INFINITE lattice's Bloch group
    velocity — two fully independent code paths (velocity-Verlet scan on a
    finite chain vs Hellmann-Feynman band slopes) agreeing on transport.
    Chain: the textbook monatomic spring chain, carrier omega0 = 1.2
    (vg = cos(k0/2) = 0.8 analytically for k = m = a = 1)."""

    from typing import Any, NamedTuple

    from difflexmm_tpu.ops.assembly import build_strain_energy
    from difflexmm_tpu.solver import setup_dynamic_solver
    from difflexmm_tpu.utils import (
        ControlParams,
        GeometricalParams,
        MechanicalParams,
    )

    class SpringParams(NamedTuple):
        reference_vector: Any
        k_stretch: Any

    N = 64
    centroids = jnp.stack([jnp.arange(N, dtype=float), jnp.zeros(N)], axis=1)
    bonds = jnp.stack([jnp.arange(N - 1), jnp.arange(1, N)], axis=1)
    ref_vecs = jnp.tile(jnp.array([[1.0, 0.0]]), (N - 1, 1))
    energy = build_strain_energy(bonds, simple_spring_energy)

    omega0, t0, tau = 1.2, 30.0, 12.0

    def drive(t, amplitude=0.1):
        return (
            amplitude
            * jnp.sin(omega0 * t)
            * jnp.exp(-(((t - t0) / tau) ** 2))
        )

    solve = setup_dynamic_solver(
        geometry=N,
        energy_fn=energy,
        constrained_block_DOF_pairs=jnp.array([[0, 0]]),
        constrained_DOFs_fn=drive,
        method="verlet",
        n_substeps=50,
    )
    cp = ControlParams(
        geometrical_params=GeometricalParams(
            centroids, jnp.zeros((N, 1, 2))
        ),
        mechanical_params=MechanicalParams(
            bond_params=SpringParams(ref_vecs, 1.0),
            density=1.0,
            damping=0.0,
            inertia=jnp.full((N, 3), 1.0),
        ),
        constraint_params=dict(amplitude=0.1),
    )
    timepoints = jnp.linspace(0.0, 110.0, 221)
    sol = jax.jit(solve)(jnp.zeros((2, N, 3)), timepoints, cp)

    # Arrival: energy-centroid time at two distant probes (robust against
    # the carrier phase, unlike raw cross-correlation).
    ts = np.asarray(timepoints)
    e25 = np.asarray(sol[:, 0, 25, 0]) ** 2
    e45 = np.asarray(sol[:, 0, 45, 0]) ** 2
    delay = (ts * e45).sum() / e45.sum() - (ts * e25).sum() / e25.sum()
    vg_measured = 20.0 / delay

    cell = spring_chain_cell(k_stretch=1.0, spacing=1.0, mass=1.0)
    k0 = 2.0 * np.arcsin(omega0 / 2.0)
    _, vg = group_velocity(
        cell, jnp.array([[k0, 0.0]]), bond_energy_fn=simple_spring_energy
    )
    np.testing.assert_allclose(vg_measured, float(vg[0, 2, 0]), rtol=0.02)


def test_point_defect_cavity_modes():
    """A single soft subcell in a P x P supercell creates cavity modes in
    the bulk gap: absent from the pristine supercell, localized on the
    defect subcell, and nearly k-independent (flat bands — the resonators
    are isolated by the gap)."""

    from difflexmm_tpu.solver.bloch import defect_supercell, mode_localization

    base = rotated_square_cell(
        angle=0.25, k_stretch=1.0, k_shear=0.3, k_rot=0.05
    )
    P = 5
    mid = P // 2
    cavity = defect_supercell(base, P, P, [(mid, mid)], k_rot=0.005)
    pristine = supercell(base, P, P)
    gl, gh = 3.456 + 0.08, 4.051 - 0.08

    K = jnp.array([[0.0, 0.0], [0.13, 0.07]])
    om_sq, modes = band_structure(cavity, K, with_modes=True)
    om_c = np.asarray(frequencies(om_sq))
    om_p = np.asarray(frequencies(band_structure(pristine, K)))
    in_gap_c = (om_c > gl) & (om_c < gh)
    assert int(in_gap_c.sum()) >= 4
    assert not np.any((om_p > gl) & (om_p < gh))

    # Localization: defect-subcell weight far above the uniform 1/P^2.
    loc = np.asarray(mode_localization(cavity, modes, P * P))
    r = mid * P + mid
    kk, bands = np.where(in_gap_c)
    assert loc[kk, r, bands].min() > 10.0 / P**2

    # Flat bands: cavity frequencies shift by < 1e-2 between the two k's.
    f0 = np.sort(om_c[0][in_gap_c[0]])
    f1 = np.sort(om_c[1][in_gap_c[1]])
    assert f0.shape == f1.shape
    np.testing.assert_allclose(f0, f1, atol=1e-2)


def test_odd_bz_grid_contains_gamma_but_gradients_stay_finite():
    """An odd-sized Monkhorst-Pack grid puts its center point exactly on
    Gamma; the acoustic omega^2 there are identically zero and sqrt's
    infinite slope would NaN the WHOLE design gradient via 0 * inf.
    frequencies() must return zero gradient for those modes instead."""

    cell = spring_chain_cell()
    ks = bz_grid(cell, 3, 3)
    assert float(jnp.min(jnp.linalg.norm(ks, axis=1))) < 1e-12  # Gamma included

    def total_frequency(k_stretch):
        c = cell._replace(bond_params=dict(cell.bond_params, k_stretch=k_stretch))
        return jnp.sum(frequencies(band_structure(c, ks)))

    grad = jax.grad(total_frequency)(1.0)
    assert np.isfinite(float(grad))
    assert float(grad) > 0.0  # stiffer chain -> higher bands
