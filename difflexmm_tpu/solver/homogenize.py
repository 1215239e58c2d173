"""Homogenized effective elasticity of periodic block-spring metamaterials.

Long-wavelength effective continuum of a :class:`~difflexmm_tpu.solver.bloch.
BlochCell`: the 2D elasticity tensor by static condensation of the cell's
micro-DOFs,

    C_ijkl = (1/V) * ( E_FF  -  E_Fu K^+ E_uF )_ijkl

where ``E(u, F)`` is :func:`~difflexmm_tpu.solver.bloch.cell_strain_energy`
(cell-periodic block DOFs ``u`` under a homogeneous deformation gradient
``F``), all second derivatives are autodiff at the (relaxed) state, and the
condensation term lets the micro-structure relax against the imposed strain —
exactly what makes rotating-square lattices auxetic. No counterpart exists in
the reference repository (its tooling is finite-lattice only).

Physics checks built into the tests: the rotated-square mechanism limit gives
Poisson's ratio -> -1 (Grima & Evans rotating-squares result), and the
Christoffel sound speeds ``rho v^2 = eig(n . C . n)`` must match the slopes of
the acoustic Bloch branches at Gamma from :func:`band_structure` — a
cross-consistency oracle between two independent code paths.

TPU-first notes: everything is a handful of tiny dense autodiff Hessians and
one (3B, 3B) solve — jit/vmap-compatible, so design sweeps batch on-device;
differentiable w.r.t. the cell (inverse design of effective properties).
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from difflexmm_tpu.ops.bonds import ligament_energy
from difflexmm_tpu.solver.bloch import (
    BlochCell,
    cell_strain_energy,
    relax_cell,
)


def effective_moduli(
    cell: BlochCell,
    affine: Optional[jnp.ndarray] = None,
    bond_energy_fn: Callable = ligament_energy,
    displacement: Optional[jnp.ndarray] = None,
    relax: bool = True,
    condense: bool = True,
) -> jnp.ndarray:
    """(2, 2, 2, 2) homogenized tangent elasticity tensor ``C_ijkl``.

    About the state ``(displacement, affine)``; with ``relax=True`` and no
    explicit ``displacement`` the cell-periodic equilibrium under ``affine``
    is solved first (:func:`relax_cell`). At a stress-free state C has the
    full major+minor symmetries; about a prestressed state it is the tangent
    (first-Piola) moduli, major-symmetric only.

    ``condense=False`` skips the micro-relaxation term and returns the bare
    Cauchy-Born estimate ``E_FF / V`` (every block deforms affinely) — an
    upper bound; the gap to the condensed C quantifies how much the
    micro-structure's internal mechanism (e.g. the counter-rotation of
    rotated squares) softens the lattice.
    """

    B = int(cell.centroid_node_vectors.shape[0])
    F0 = jnp.eye(2) if affine is None else jnp.asarray(affine)
    if displacement is None:
        u0 = (
            relax_cell(cell, affine=F0, bond_energy_fn=bond_energy_fn)
            if relax
            else jnp.zeros((B, 3))
        )
    else:
        u0 = jnp.asarray(displacement)
    u0_flat = u0.reshape(-1)
    V = jnp.abs(jnp.linalg.det(jnp.asarray(cell.direct_basis)))

    def E(u_flat, F_flat):
        return cell_strain_energy(
            cell, u_flat.reshape(B, 3), F_flat.reshape(2, 2), bond_energy_fn
        )

    F0_flat = F0.reshape(-1)
    E_FF = jax.hessian(E, argnums=1)(u0_flat, F0_flat)
    if not condense:
        return (E_FF / V).reshape(2, 2, 2, 2)
    E_uu = jax.hessian(E, argnums=0)(u0_flat, F0_flat)
    E_uF = jax.jacfwd(jax.grad(E, argnums=0), argnums=1)(u0_flat, F0_flat)

    # Static condensation on the free micro-DOFs. The periodic energy's
    # null space is the two global translations; pin block 0's (like
    # relax_cell) via an identity fill so the solve is nonsingular while
    # the pinned rows contribute nothing.
    n = 3 * B
    mask = jnp.ones(n).at[0].set(0.0).at[1].set(0.0)
    K = E_uu * mask[:, None] * mask[None, :] - jnp.diag(1.0 - mask)
    rhs = E_uF * mask[:, None]
    du_dF = -jnp.linalg.solve(K, rhs)  # (n, 4)

    C = (E_FF + rhs.T @ du_dF) / V
    return C.reshape(2, 2, 2, 2)


def effective_stress(
    cell: BlochCell,
    affine: jnp.ndarray,
    bond_energy_fn: Callable = ligament_energy,
    displacement: Optional[jnp.ndarray] = None,
    relax: bool = True,
) -> jnp.ndarray:
    """(2, 2) homogenized first-Piola stress ``P_ij = (1/V) dE/dF_ij`` at
    the (relaxed) state under the deformation gradient ``affine``.

    By the envelope theorem the micro-relaxation contributes nothing to the
    first derivative at equilibrium, so the partial derivative at ``u*``
    IS the total one; sweeping ``affine`` yields the homogenized
    stress-strain curve, and the whole map stays differentiable w.r.t. the
    cell design through :func:`relax_cell`'s implicit adjoint."""

    B = int(cell.centroid_node_vectors.shape[0])
    F = jnp.asarray(affine)
    if displacement is None:
        u0 = (
            relax_cell(cell, affine=F, bond_energy_fn=bond_energy_fn)
            if relax
            else jnp.zeros((B, 3))
        )
    else:
        u0 = jnp.asarray(displacement)
    V = jnp.abs(jnp.linalg.det(jnp.asarray(cell.direct_basis)))

    def E_of_F(F_):
        return cell_strain_energy(cell, u0, F_, bond_energy_fn)

    return jax.grad(E_of_F)(F) / V


def voigt(C: jnp.ndarray) -> jnp.ndarray:
    """(3, 3) stiffness Voigt matrix mapping strains ``(exx, eyy, 2exy)``
    to stresses ``(sxx, syy, sxy)`` from the minor-symmetrized
    (2, 2, 2, 2) tensor (engineering-shear convention: no extra factors
    are needed in the stiffness matrix)."""

    Cs = 0.25 * (
        C
        + jnp.swapaxes(C, 0, 1)
        + jnp.swapaxes(C, 2, 3)
        + jnp.swapaxes(jnp.swapaxes(C, 0, 1), 2, 3)
    )
    idx = ((0, 0), (1, 1), (0, 1))
    return jnp.asarray([[Cs[a + b] for b in idx] for a in idx])


def engineering_constants(C: jnp.ndarray) -> dict:
    """Effective in-plane engineering constants from ``C_ijkl``:
    ``E_x, E_y`` (Young), ``nu_xy, nu_yx`` (Poisson), ``G_xy`` (shear)."""

    Cv = voigt(C)
    S = jnp.linalg.inv(Cv)
    return dict(
        E_x=1.0 / S[0, 0],
        E_y=1.0 / S[1, 1],
        nu_xy=-S[1, 0] / S[0, 0],
        nu_yx=-S[0, 1] / S[1, 1],
        G_xy=1.0 / S[2, 2],
    )


def christoffel_speeds(
    C: jnp.ndarray, density: jnp.ndarray, direction: jnp.ndarray
) -> jnp.ndarray:
    """Ascending plane-wave speeds along a unit ``direction`` from the
    acoustic (Christoffel) tensor ``Gamma_jk = n_i C_ijkl n_l / rho`` —
    the long-wavelength limit the Bloch acoustic branches must reproduce.

    ``density`` is the areal mass density (cell translational mass / cell
    area)."""

    n = jnp.asarray(direction)
    n = n / jnp.linalg.norm(n)
    Gamma = jnp.einsum("i,ijkl,l->jk", n, jnp.asarray(C), n) / density
    return jnp.sqrt(jnp.maximum(jnp.linalg.eigvalsh(Gamma), 0.0))


def areal_density(cell: BlochCell) -> jnp.ndarray:
    """Cell translational mass per unit area."""

    V = jnp.abs(jnp.linalg.det(jnp.asarray(cell.direct_basis)))
    return jnp.sum(jnp.asarray(cell.inertia)[:, 0]) / V
