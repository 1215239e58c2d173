"""Homogenized effective-moduli oracles.

Gold checks: full minor+major symmetry of C at a stress-free state, isotropy
of the square lattice's in-plane response (E_x == E_y, nu_xy == nu_yx), the
Grima & Evans rotating-squares mechanism limit (Poisson's ratio -> -1 as the
hinge rotational stiffness vanishes), consistency of Christoffel plane-wave
speeds with the slopes of the acoustic Bloch branches at Gamma (two fully
independent code paths: static condensation vs dynamical-matrix dispersion),
softening of the tangent moduli about a relaxed precompressed state, and
differentiability of engineering constants w.r.t. cell design parameters.

No counterpart exists in the reference repository (finite-lattice tooling
only); the physics oracles above play the role of its missing tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from difflexmm_tpu.solver.bloch import (
    band_structure,
    frequencies,
    relax_cell,
    rotated_square_cell,
)
from difflexmm_tpu.solver.homogenize import (
    areal_density,
    christoffel_speeds,
    effective_moduli,
    effective_stress,
    engineering_constants,
    voigt,
)


def _cell(angle=0.25, k_rot=1e-3):
    return rotated_square_cell(
        angle=angle, k_stretch=1.0, k_shear=1.0, k_rot=k_rot
    )


def test_stress_free_symmetries_and_square_isotropy():
    C = effective_moduli(_cell())
    # Major symmetry C_ijkl = C_klij (always, from the Hessian structure).
    np.testing.assert_allclose(
        C, jnp.transpose(C, (2, 3, 0, 1)), atol=1e-12
    )
    # Minor symmetries at the stress-free state.
    np.testing.assert_allclose(C, jnp.transpose(C, (1, 0, 2, 3)), atol=1e-10)
    np.testing.assert_allclose(C, jnp.transpose(C, (0, 1, 3, 2)), atol=1e-10)
    ec = engineering_constants(C)
    assert abs(ec["E_x"] - ec["E_y"]) < 1e-10
    assert abs(ec["nu_xy"] - ec["nu_yx"]) < 1e-10
    # Voigt matrix symmetric positive definite.
    Cv = voigt(C)
    np.testing.assert_allclose(Cv, Cv.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(np.asarray(Cv)) > 0)


def test_rotating_squares_mechanism_poisson_limit():
    # Grima & Evans: the rotating-square mechanism has nu = -1; with soft
    # hinges the effective Poisson ratio must approach it monotonically.
    nus = [
        float(engineering_constants(effective_moduli(_cell(k_rot=kr)))["nu_xy"])
        for kr in (1e-2, 1e-4, 1e-6)
    ]
    assert nus[0] > nus[1] > nus[2]
    assert abs(nus[2] + 1.0) < 1e-3


def test_condensation_is_essential_for_auxeticity():
    # Cauchy-Born (condense=False: every block deforms affinely, no
    # micro-relaxation) misses the counter-rotation mechanism entirely:
    # it is stiffer and NOT auxetic. The condensation term is what makes
    # the rotated-square lattice's nu -> -1.
    cell = _cell(k_rot=1e-4)
    C_relaxed = effective_moduli(cell)
    C_cb = effective_moduli(cell, condense=False)
    nu_relaxed = float(engineering_constants(C_relaxed)["nu_xy"])
    nu_cb = float(engineering_constants(C_cb)["nu_xy"])
    assert nu_relaxed < -0.9
    assert nu_cb > -0.5
    assert float(engineering_constants(C_cb)["E_x"]) > float(
        engineering_constants(C_relaxed)["E_x"]
    )
    # Cauchy-Born bounds the condensed moduli from above (the condensation
    # term -E_Fu K^+ E_uF is negative semi-definite on the Voigt space).
    gap = np.linalg.eigvalsh(np.asarray(voigt(C_cb) - voigt(C_relaxed)))
    assert np.all(gap > -1e-10)


def test_christoffel_speeds_match_bloch_acoustic_slopes():
    cell = _cell()
    C = effective_moduli(cell)
    rho = areal_density(cell)
    for direction in (jnp.array([1.0, 0.0]), jnp.array([0.6, 0.8])):
        v_chr = np.sort(np.asarray(christoffel_speeds(C, rho, direction)))
        kmag = 1e-3
        om = frequencies(
            band_structure(cell, (kmag * direction / jnp.linalg.norm(direction))[None, :])
        )[0]
        v_bloch = np.sort(np.asarray(om[:2])) / kmag
        np.testing.assert_allclose(v_chr, v_bloch, rtol=1e-4)


def test_tangent_moduli_about_relaxed_prestrain():
    # Compress biaxially: the mechanism engages and the tangent stiffness
    # along x drops relative to the stress-free state.
    cell = _cell(k_rot=1e-3)
    F = jnp.eye(2) * (1.0 - 0.03)
    u_star = relax_cell(cell, affine=F)
    assert np.all(np.isfinite(np.asarray(u_star)))
    C0 = effective_moduli(cell)
    Ct = effective_moduli(cell, affine=F, displacement=u_star)
    # Major symmetry still holds for the tangent moduli.
    np.testing.assert_allclose(Ct, jnp.transpose(Ct, (2, 3, 0, 1)), atol=1e-10)
    assert float(Ct[0, 0, 0, 0]) < float(C0[0, 0, 0, 0])


def test_effective_stress_zero_at_rest_and_consistent_with_moduli():
    cell = _cell(k_rot=1e-2)
    # Stress-free reference state.
    P0 = effective_stress(cell, jnp.eye(2))
    np.testing.assert_allclose(P0, 0.0, atol=1e-10)
    # dP/dF across RELAXED states must equal the condensed tangent moduli
    # (the condensation term is exactly the relaxation response the
    # envelope-theorem stress picks up at first order) — two independent
    # code paths: FD of grad-at-equilibrium vs static condensation.
    C = effective_moduli(cell)
    eps = 1e-5
    for (i, j) in ((0, 0), (1, 1), (0, 1)):
        dF = jnp.zeros((2, 2)).at[i, j].set(eps)
        Pp = effective_stress(cell, jnp.eye(2) + dF)
        Pm = effective_stress(cell, jnp.eye(2) - dF)
        np.testing.assert_allclose(
            (Pp - Pm) / (2 * eps), C[:, :, i, j], rtol=2e-4, atol=1e-8
        )


def test_effective_constants_differentiable_in_design():
    def Ex(k_rot):
        C = effective_moduli(_cell(k_rot=k_rot))
        return engineering_constants(C)["E_x"]

    k0 = 1e-3
    g = jax.grad(Ex)(k0)
    eps = 1e-6
    fd = (Ex(k0 + eps) - Ex(k0 - eps)) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-4)
    assert float(g) > 0.0  # stiffer hinges -> stiffer lattice
