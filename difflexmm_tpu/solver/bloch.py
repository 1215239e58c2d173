"""Bloch band-structure analysis for periodic block-spring metamaterials.

Dispersion relations omega(k) of the infinite lattice, assembled from the
*same* autodiff bond Hessians as the dynamics and solved as one batched
Hermitian eigenproblem over k-points on the accelerator.

This subsystem has no counterpart in the reference repository
(/root/reference has no dispersion tooling; its modal analysis,
difflexmm/dynamics.py:189-245, is finite-lattice only) — it extends the
framework with the standard analysis tool for periodic metamaterials while
reusing the exact energy definitions of :mod:`difflexmm_tpu.ops.bonds`, so
the bands are consistent with the time-domain solver to machine precision.

Physics
-------
For a periodic lattice with a unit cell of ``B`` rigid blocks (3 DOFs each)
and bonds that may cross cell boundaries, the Bloch ansatz
``q(R) = q_hat exp(i k . R)`` reduces the infinite quadratic form to the
Hermitian cell dynamical matrix

    D(k) = sum_bonds  P_i^T H_11 P_i + P_j^T H_22 P_j
           + P_i^T H_12 P_j e^{i k . R_m} + P_j^T H_21 P_i e^{-i k . R_m}

with ``H`` the 6x6 bond Hessian (autodiff of the bond energy through the
rigid-block node kinematics) and ``R_m`` the Cartesian offset of the second
block's cell. Frequencies solve ``D(k) q = omega^2 M q``, symmetrized with
the diagonal inertia to a standard Hermitian eigh.

TPU-first notes: per-bond Hessians are a vmapped 6x6 ``jax.hessian`` (tiny,
static); the k-sweep is a single ``vmap`` over ``jnp.linalg.eigh`` — one
batched device eigendecomposition, no host loop. Everything is
differentiable end-to-end, so band frequencies (and gaps between
non-degenerate bands) can be *designed* by gradient descent on the cell
geometry — see ``examples/dispersion_design.py``.
"""

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry.polygon import compute_inertia
from difflexmm_tpu.ops.bonds import ligament_energy


class BlochCell(NamedTuple):
    """A periodic unit cell: blocks, bonds (with cell offsets), and inertia.

    Attrs:
        direct_basis: (2, 2) lattice translation vectors (rows).
        centroid_node_vectors: (B, V, 2) node vectors of the cell blocks.
        inertia: (B, 3) translational+rotational block inertia.
        bond_blocks: (n_bonds, 2) local block ids of each bond's ends.
        bond_nodes: (n_bonds, 2) node index *within each block* of the ends.
        bond_offsets: (n_bonds, 2) integer cell offset of the second end's
            cell relative to the first end's cell.
        bond_params: dict of per-bond (or scalar) energy kwargs, e.g.
            ``reference_vector (n_bonds, 2)``, ``k_stretch``, ...
    """

    direct_basis: jnp.ndarray
    centroid_node_vectors: jnp.ndarray
    inertia: jnp.ndarray
    bond_blocks: jnp.ndarray
    bond_nodes: jnp.ndarray
    bond_offsets: jnp.ndarray
    bond_params: Dict[str, Any]


def reciprocal_basis(direct_basis: jnp.ndarray) -> jnp.ndarray:
    """Rows b_i with b_i . a_j = 2 pi delta_ij."""

    return 2.0 * jnp.pi * jnp.linalg.inv(jnp.asarray(direct_basis)).T


def _node_dof(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Node DOFs (ux, uy, theta) of one node of a rigid block.

    Same map as ops/kinematics.block_to_node_kinematics, scalarized for a
    single (block DOF, node vector) pair so it can sit under jax.hessian.
    """

    c, s = jnp.cos(q[2]), jnp.sin(q[2])
    dx = q[0] + (c - 1.0) * r[0] - s * r[1]
    dy = q[1] + s * r[0] + (c - 1.0) * r[1]
    return jnp.stack([dx, dy, q[2]])


def _per_bond_params(bond_params: Dict[str, Any], n_bonds: int):
    """Split kwargs into per-bond arrays (leading axis n_bonds) vs shared.

    Convention (same as the reference's jax-md smap.bond broadcast): an
    array whose LEADING axis equals ``n_bonds`` is per-bond; anything else
    is shared by all bonds. A genuinely shared array-valued kwarg whose
    leading dim coincidentally equals n_bonds (e.g. a (2,)-vector on a
    2-bond cell) would be mis-split — broadcast it to an explicit
    ``(n_bonds, ...)`` per-bond array to disambiguate."""

    per_bond, shared = {}, {}
    for name, value in bond_params.items():
        arr = jnp.asarray(value)
        if arr.ndim >= 1 and arr.shape[0] == n_bonds:
            per_bond[name] = arr
        else:
            shared[name] = value
    return per_bond, shared


def bond_hessians(
    cell: BlochCell,
    bond_energy_fn: Callable = ligament_energy,
    displacement: Optional[jnp.ndarray] = None,
    affine: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(n_bonds, 6, 6) Hessians of each bond energy w.r.t. its two blocks'
    DOFs, linearized about a cell-periodic state.

    Args:
        displacement: optional (B, 3) cell-periodic block DOFs of the
            linearization state (default: undeformed).
        affine: optional (2, 2) deformation gradient F of a superimposed
            homogeneous deformation; blocks in cell m are translated by
            ``(F - I) @ R_m`` before linearizing (dispersion under
            prestrain). Bloch phases keep using the reference lattice.
    """

    n_bonds = int(cell.bond_blocks.shape[0])
    u0 = (
        jnp.zeros((cell.centroid_node_vectors.shape[0], 3))
        if displacement is None
        else jnp.asarray(displacement)
    )
    F = jnp.eye(2) if affine is None else jnp.asarray(affine)

    R_m = jnp.asarray(cell.bond_offsets, dtype=u0.dtype) @ jnp.asarray(
        cell.direct_basis
    )  # (n_bonds, 2) Cartesian cell offsets of the second end
    affine_shift = R_m @ (F - jnp.eye(2)).T  # (n_bonds, 2)

    per_bond, shared = _per_bond_params(cell.bond_params, n_bonds)

    cnv = cell.centroid_node_vectors
    r1 = cnv[cell.bond_blocks[:, 0], cell.bond_nodes[:, 0]]  # (n_bonds, 2)
    r2 = cnv[cell.bond_blocks[:, 1], cell.bond_nodes[:, 1]]
    q1_0 = u0[cell.bond_blocks[:, 0]]  # (n_bonds, 3)
    q2_0 = u0[cell.bond_blocks[:, 1]].at[:, :2].add(affine_shift)

    def energy(dq, q1_b, q2_b, r1_b, r2_b, pb):
        d1 = _node_dof(q1_b + dq[:3], r1_b)
        d2 = _node_dof(q2_b + dq[3:], r2_b)
        return bond_energy_fn((d1, d2), **pb, **shared)

    hess = jax.hessian(energy)

    def one(q1_b, q2_b, r1_b, r2_b, pb):
        return hess(jnp.zeros(6, dtype=u0.dtype), q1_b, q2_b, r1_b, r2_b, pb)

    return jax.vmap(one)(q1_0, q2_0, r1, r2, per_bond)


def cell_strain_energy(
    cell: BlochCell,
    displacement: jnp.ndarray,
    affine: Optional[jnp.ndarray] = None,
    bond_energy_fn: Callable = ligament_energy,
):
    """Total bond energy of one cell for cell-periodic block DOFs
    ``displacement (B, 3)`` under a superimposed homogeneous deformation
    gradient ``affine`` (bonds crossing the cell boundary see the affine
    shift of their far end, exactly as in :func:`bond_hessians`)."""

    u = jnp.asarray(displacement)
    n_bonds = int(cell.bond_blocks.shape[0])
    F = jnp.eye(2, dtype=u.dtype) if affine is None else jnp.asarray(affine)
    R_m = jnp.asarray(cell.bond_offsets, dtype=u.dtype) @ jnp.asarray(
        cell.direct_basis
    )
    affine_shift = R_m @ (F - jnp.eye(2, dtype=u.dtype)).T

    per_bond, shared = _per_bond_params(cell.bond_params, n_bonds)
    cnv = cell.centroid_node_vectors
    r1 = cnv[cell.bond_blocks[:, 0], cell.bond_nodes[:, 0]]
    r2 = cnv[cell.bond_blocks[:, 1], cell.bond_nodes[:, 1]]
    q1 = u[cell.bond_blocks[:, 0]]
    q2 = u[cell.bond_blocks[:, 1]].at[:, :2].add(affine_shift)

    def one(q1_b, q2_b, r1_b, r2_b, pb):
        return bond_energy_fn(
            (_node_dof(q1_b, r1_b), _node_dof(q2_b, r2_b)), **pb, **shared
        )

    return jnp.sum(jax.vmap(one)(q1, q2, r1, r2, per_bond))


def relax_cell(
    cell: BlochCell,
    affine: Optional[jnp.ndarray] = None,
    bond_energy_fn: Callable = ligament_energy,
    u0: Optional[jnp.ndarray] = None,
    n_newton_steps: int = 40,
    tol: Optional[float] = None,
    n_load_steps: int = 4,
) -> jnp.ndarray:
    """Cell-periodic static equilibrium under a prescribed affine prestrain.

    Solves for the (B, 3) micro-displacement that relaxes
    :func:`cell_strain_energy` at fixed ``affine`` — e.g. the alternating
    block rotations an auxetic rotated-square lattice develops under
    compression. Feed the result to :func:`bond_hessians` /
    :func:`band_structure` (same ``displacement``/``affine``) for
    strain-tuned dispersion about the true relaxed state rather than the
    naive affinely-mapped one.

    The two global translation DOFs of block 0 are pinned (the periodic
    energy's only null space). Differentiable w.r.t. ``affine`` and the
    cell's parameters through an implicit-function-theorem adjoint (one
    transposed solve, like solver/statics.py). ``n_load_steps`` ramps the
    affine deformation in warm-started increments (cold Newton stalls past
    a few percent strain); only the final solve carries gradients (the
    equilibrium does not depend on its warm start). A stalled Newton
    returns NaN (fail-loud; raise ``n_load_steps`` or pass a closer
    ``u0``).
    """

    B = int(cell.centroid_node_vectors.shape[0])
    n = 3 * B
    mask = jnp.ones(n).at[0].set(0.0).at[1].set(0.0)

    def residual(u_flat, cell_, F):
        grad_u = jax.grad(
            lambda uu: cell_strain_energy(
                cell_, uu.reshape(B, 3), F, bond_energy_fn
            )
        )(u_flat)
        return grad_u * mask

    def jac(u_flat, cell_, F):
        J = jax.jacfwd(residual)(u_flat, cell_, F)
        return J - jnp.diag(1.0 - mask)

    start = (
        jnp.zeros(n)
        if u0 is None
        else (jnp.asarray(u0).reshape(-1) * mask)
    )
    eff_tol = tol if tol is not None else (
        1e-10 if start.dtype == jnp.float64 else 1e-6
    )

    def _newton(cell_, F, u_init):
        def cond(carry):
            u, rnorm, it, stalled = carry
            return (rnorm > eff_tol) & (it < n_newton_steps) & (~stalled)

        def body(carry):
            u, rnorm, it, _ = carry
            step = jnp.linalg.solve(jac(u, cell_, F), -residual(u, cell_, F))

            def bt_cond(c):
                return (~c[1]) & (c[2] < 30)

            def bt_body(c):
                alpha, _, k = c
                ok = (
                    jnp.max(jnp.abs(residual(u + alpha * step, cell_, F)))
                    < rnorm
                )
                return jnp.where(ok, alpha, alpha * 0.5), ok, k + 1

            alpha, accepted, _ = jax.lax.while_loop(
                bt_cond, bt_body,
                (jnp.asarray(1.0, u.dtype), jnp.asarray(False),
                 jnp.asarray(0)),
            )
            u_new = jnp.where(accepted, u + alpha * step, u)
            return (
                u_new,
                jnp.max(jnp.abs(residual(u_new, cell_, F))),
                it + 1,
                ~accepted,
            )

        r0 = jnp.max(jnp.abs(residual(u_init, cell_, F)))
        u_star, rnorm, _, _ = jax.lax.while_loop(
            cond, body, (u_init, r0, jnp.asarray(0), jnp.asarray(False))
        )
        ok = (rnorm < 10 * eff_tol) & jnp.all(jnp.isfinite(u_star))
        return jnp.where(ok, u_star, jnp.nan)

    @jax.custom_vjp
    def _solve(cell_, F, u_init):
        return _newton(cell_, F, u_init)

    def _solve_fwd(cell_, F, u_init):
        u_star = _newton(cell_, F, u_init)
        return u_star, (u_star, cell_, F)

    def _solve_bwd(res, cotangent):
        u_star, cell_, F = res
        lam = jnp.linalg.solve(
            jac(u_star, cell_, F).T, cotangent.reshape(-1) * mask
        )
        _, vjp_fn = jax.vjp(
            lambda c, f: residual(u_star, c, f), cell_, F
        )
        cell_bar, F_bar = vjp_fn(-lam)
        # The equilibrium does not depend on its warm start.
        return cell_bar, F_bar, jnp.zeros_like(u_star)

    _solve.defvjp(_solve_fwd, _solve_bwd)

    F = (
        jnp.eye(2, dtype=start.dtype)
        if affine is None
        else jnp.asarray(affine)
    )
    eye = jnp.eye(2, dtype=start.dtype)
    u = start
    # Warm-started ramp to the target deformation; only the final solve
    # carries gradients (earlier increments use lax.stop_gradient on F so
    # no spurious adjoint paths accumulate).
    for s in np.linspace(0.0, 1.0, max(1, int(n_load_steps)) + 1)[1:-1]:
        F_s = eye + s * (jax.lax.stop_gradient(F) - eye)
        u = jax.lax.stop_gradient(_solve(cell, F_s, u))
    return _solve(cell, F, u).reshape(B, 3)


def dynamical_matrix(
    cell: BlochCell, hessians: jnp.ndarray, k: jnp.ndarray
) -> jnp.ndarray:
    """Hermitian (3B, 3B) Bloch dynamical matrix at wave vector ``k``."""

    B = cell.centroid_node_vectors.shape[0]
    R_m = jnp.asarray(cell.bond_offsets, dtype=hessians.dtype) @ jnp.asarray(
        cell.direct_basis
    )
    phase = jnp.exp(1j * (R_m @ jnp.asarray(k, dtype=hessians.dtype)))

    cplx = jnp.result_type(phase, hessians)
    i, j = cell.bond_blocks[:, 0], cell.bond_blocks[:, 1]
    H = hessians.astype(cplx)
    D = jnp.zeros((B, 3, B, 3), dtype=cplx)
    D = D.at[i, :, i, :].add(H[:, :3, :3])
    D = D.at[j, :, j, :].add(H[:, 3:, 3:])
    D = D.at[i, :, j, :].add(H[:, :3, 3:] * phase[:, None, None])
    D = D.at[j, :, i, :].add(H[:, 3:, :3] * jnp.conj(phase)[:, None, None])
    return D.reshape(3 * B, 3 * B)


def band_structure(
    cell: BlochCell,
    ks: jnp.ndarray,
    bond_energy_fn: Callable = ligament_energy,
    displacement: Optional[jnp.ndarray] = None,
    affine: Optional[jnp.ndarray] = None,
    with_modes: bool = False,
):
    """Eigenvalues omega^2 (and optionally Bloch modes) over k-points.

    Args:
        ks: (n_k, 2) Cartesian wave vectors.
        with_modes: also return mass-orthonormal mode columns.

    Returns:
        omega_sq (n_k, 3B) ascending per k; if ``with_modes``, additionally
        modes (n_k, 3B, 3B) complex with ``modes[..., :, n]`` the n-th
        eigenvector in block-DOF coordinates.
    """

    H = bond_hessians(
        cell, bond_energy_fn, displacement=displacement, affine=affine
    )
    inv_sqrt_m = 1.0 / jnp.sqrt(jnp.asarray(cell.inertia).reshape(-1))

    def at_k(k):
        D = dynamical_matrix(cell, H, k)
        A = D * inv_sqrt_m[:, None] * inv_sqrt_m[None, :]
        if with_modes:
            w, Y = jnp.linalg.eigh(A)
            return w, Y * inv_sqrt_m[:, None]
        return jnp.linalg.eigvalsh(A)

    return jax.vmap(at_k)(jnp.atleast_2d(jnp.asarray(ks, dtype=float)))


def group_velocity(
    cell: BlochCell,
    ks: jnp.ndarray,
    bond_energy_fn: Callable = ligament_energy,
    displacement: Optional[jnp.ndarray] = None,
    affine: Optional[jnp.ndarray] = None,
    omega_floor: float = 1e-9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Band group velocities ``v_g = d omega / d k`` by Hellmann-Feynman.

    For the mass-reduced Hermitian pencil ``A(k) = M^-1/2 D(k) M^-1/2``
    with eigenpairs ``(omega^2_n, y_n)``, ``d omega^2_n / d k_a =
    y_n^H (dA/dk_a) y_n`` — no eigenvector derivatives needed, and
    ``dD/dk_a`` is assembled analytically (the boundary-crossing bond
    blocks pick up ``i R_m,a`` phase factors; intra-cell blocks drop out).

    Returns:
        (omega (n_k, 3B) ascending, v_g (n_k, 3B, 2)).

    Caveats: per-band velocities are ill-defined at degeneracies (the eigh
    basis is arbitrary there) and at ``omega = 0`` (Gamma acoustic limit is
    0/0 — evaluate at small finite k instead; bands with
    ``omega < omega_floor`` report zero velocity).
    """

    H = bond_hessians(
        cell, bond_energy_fn, displacement=displacement, affine=affine
    )
    B = cell.centroid_node_vectors.shape[0]
    inv_sqrt_m = 1.0 / jnp.sqrt(jnp.asarray(cell.inertia).reshape(-1))
    R_m = jnp.asarray(cell.bond_offsets, dtype=H.dtype) @ jnp.asarray(
        cell.direct_basis
    )
    i, j = cell.bond_blocks[:, 0], cell.bond_blocks[:, 1]

    def dD_dk(k, alpha):
        phase = jnp.exp(1j * (R_m @ jnp.asarray(k, dtype=H.dtype)))
        w = 1j * R_m[:, alpha] * phase  # d(phase)/dk_alpha
        cplx = jnp.result_type(phase, H)
        Hc = H.astype(cplx)
        dD = jnp.zeros((B, 3, B, 3), dtype=cplx)
        dD = dD.at[i, :, j, :].add(Hc[:, :3, 3:] * w[:, None, None])
        dD = dD.at[j, :, i, :].add(
            Hc[:, 3:, :3] * jnp.conj(w)[:, None, None]
        )
        return dD.reshape(3 * B, 3 * B)

    def at_k(k):
        A = (
            dynamical_matrix(cell, H, k)
            * inv_sqrt_m[:, None]
            * inv_sqrt_m[None, :]
        )
        w, Y = jnp.linalg.eigh(A)
        omega = jnp.sqrt(jnp.clip(w, 0.0))
        vg = []
        for alpha in (0, 1):
            dA = dD_dk(k, alpha) * inv_sqrt_m[:, None] * inv_sqrt_m[None, :]
            dw = jnp.real(jnp.einsum("in,ij,jn->n", jnp.conj(Y), dA, Y))
            vg.append(
                jnp.where(
                    omega > omega_floor, dw / (2.0 * jnp.maximum(omega, omega_floor)), 0.0
                )
            )
        return omega, jnp.stack(vg, axis=-1)

    return jax.vmap(at_k)(jnp.atleast_2d(jnp.asarray(ks, dtype=float)))


def bz_grid(cell: BlochCell, n1: int, n2: int) -> jnp.ndarray:
    """Uniform Monkhorst-Pack-style sampling of the first Brillouin zone:
    ``(n1 * n2, 2)`` Cartesian wave vectors at fractional coordinates
    ``((p + 1/2)/n1 - 1/2, (q + 1/2)/n2 - 1/2)`` of the reciprocal basis.
    For EVEN n the half-step offset keeps points off Gamma and the zone
    boundary; for odd n the center point lands exactly on Gamma, where the
    acoustic ``omega^2`` are identically zero — :func:`frequencies`
    handles those with zero (not NaN) design gradients, so DOS/band
    objectives are safe on either parity."""

    b = reciprocal_basis(cell.direct_basis)
    f1 = (jnp.arange(n1) + 0.5) / n1 - 0.5
    f2 = (jnp.arange(n2) + 0.5) / n2 - 0.5
    F1, F2 = jnp.meshgrid(f1, f2, indexing="ij")
    frac = jnp.stack([F1.reshape(-1), F2.reshape(-1)], axis=1)
    return frac @ b


def density_of_states(
    omega_samples: jnp.ndarray,
    omega_grid: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Gaussian-smeared phonon density of states from band frequencies
    sampled over the Brillouin zone (e.g. ``frequencies(band_structure(
    cell, bz_grid(cell, n, n)))``).

    Normalized per cell: ``integral g(omega) d omega = n_bands`` (each
    k-point carries weight ``1/n_k``), so a flat band of multiplicity m
    integrates to m.
    """

    om = jnp.asarray(omega_samples).reshape(-1)
    n_k = jnp.asarray(omega_samples).shape[0] if jnp.asarray(
        omega_samples
    ).ndim > 1 else 1
    grid = jnp.asarray(omega_grid)
    z = (grid[:, None] - om[None, :]) / sigma
    g = jnp.exp(-0.5 * z * z) / (sigma * jnp.sqrt(2.0 * jnp.pi))
    return jnp.sum(g, axis=1) / n_k


def frequencies(omega_sq: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """omega from omega^2, clipping the numerically-negative zero modes.

    Gradient-safe at zero: ``sqrt`` has an infinite derivative at 0, so a
    rigid-body mode (acoustic band at Gamma — identically zero for every
    design) would turn the WHOLE objective gradient into NaN via 0 * inf.
    Eigenvalues at or below ``eps`` return omega = 0 with exactly zero
    gradient, which is the correct derivative of the acoustic branch
    there."""

    x = jnp.clip(omega_sq, 0.0)
    safe = jnp.where(x > eps, x, 1.0)
    return jnp.where(x > eps, jnp.sqrt(safe), 0.0)


def high_symmetry_path(
    corners, n_per_segment: int = 32
) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
    """Piecewise-linear k-path through ``corners``.

    Returns (ks (n, 2), cumulative arclength (n,), corner arclengths) for
    band-diagram plotting.
    """

    corners = np.asarray(corners, dtype=float)
    ks, dist = [], []
    s0 = 0.0
    ticks = [0.0]
    for a, b in zip(corners[:-1], corners[1:]):
        seg = np.linalg.norm(b - a)
        frac = np.linspace(0.0, 1.0, n_per_segment, endpoint=False)
        ks.append(a[None] + frac[:, None] * (b - a)[None])
        dist.append(s0 + frac * seg)
        s0 += seg
        ticks.append(s0)
    ks.append(corners[-1:])
    dist.append(np.array([s0]))
    return (
        jnp.asarray(np.concatenate(ks)),
        jnp.asarray(np.concatenate(dist)),
        np.asarray(ticks),
    )


def supercell(cell: BlochCell, p1: int, p2: int) -> BlochCell:
    """A (p1 x p2) supercell of ``cell`` (band folding, defect baselines).

    Bands of the supercell at ``K`` equal the union of the primitive bands
    over the ``p1 * p2`` wave vectors that fold onto ``K`` (tested in
    tests/test_bloch.py).
    """

    B = int(cell.centroid_node_vectors.shape[0])
    blocks = np.asarray(cell.bond_blocks)
    nodes = np.asarray(cell.bond_nodes)
    offsets = np.asarray(cell.bond_offsets, dtype=np.int64)
    n_bonds = blocks.shape[0]

    # Subcell (s1, s2) -> block-id base, s1 fastest (lattice convention).
    def base(s1, s2):
        return (s2 * p1 + s1) * B

    new_blocks, new_nodes, new_offsets, tile_ids = [], [], [], []
    for s2 in range(p2):
        for s1 in range(p1):
            t1, t2 = s1 + offsets[:, 0], s2 + offsets[:, 1]
            w1, w2 = t1 % p1, t2 % p2
            carry = np.stack([t1 // p1, t2 // p2], axis=1)
            first = base(s1, s2) + blocks[:, 0]
            second = (w2 * p1 + w1) * B + blocks[:, 1]
            new_blocks.append(np.stack([first, second], axis=1))
            new_nodes.append(nodes)
            new_offsets.append(carry)
            tile_ids.append(np.arange(n_bonds))

    tile_ids = np.concatenate(tile_ids)
    per_bond, shared = _per_bond_params(cell.bond_params, n_bonds)
    new_params = dict(shared)
    for name, arr in per_bond.items():
        new_params[name] = arr[tile_ids]

    reps = p1 * p2
    return BlochCell(
        direct_basis=jnp.asarray(cell.direct_basis)
        * jnp.array([[p1], [p2]], dtype=float),
        centroid_node_vectors=jnp.tile(
            jnp.asarray(cell.centroid_node_vectors), (reps, 1, 1)
        ),
        inertia=jnp.tile(jnp.asarray(cell.inertia), (reps, 1)),
        bond_blocks=jnp.asarray(np.concatenate(new_blocks), dtype=jnp.int32),
        bond_nodes=jnp.asarray(np.concatenate(new_nodes), dtype=jnp.int32),
        bond_offsets=jnp.asarray(np.concatenate(new_offsets)),
        bond_params=new_params,
    )


# ---------------------------------------------------------------------------
# Cell builders for the built-in lattice families
# ---------------------------------------------------------------------------


def _ligament_params(refs: jnp.ndarray, k_stretch, k_shear, k_rot):
    return {
        "reference_vector": jnp.asarray(refs, dtype=float),
        "k_stretch": k_stretch,
        "k_shear": k_shear,
        "k_rot": k_rot,
    }


def kagome_periodic_cell(
    shifts: Optional[jnp.ndarray] = None,
    direct_basis: Optional[jnp.ndarray] = None,
    bond_length: float = 0.1,
    density: float = 1.0,
    k_stretch=1.0,
    k_shear=1.0,
    k_rot=1.0,
) -> BlochCell:
    """Unit cell of :class:`KagomePeriodicGeometry` (2 triangular blocks,
    3 bonds/cell; node conventions of geometry/kagome.py).

    ``shifts`` (3, 2) is the design triple shared by all cells.
    """

    from difflexmm_tpu.geometry.kagome import (
        KagomePeriodicGeometry,
        _kagome_bond_data,
    )

    kwargs = {} if direct_basis is None else {"direct_basis": direct_basis}
    geometry = KagomePeriodicGeometry(1, 1, bond_length=bond_length, **kwargs)
    geometry.compute_geometry()
    if shifts is None:
        shifts = jnp.zeros((3, 2))
    cnv = geometry.centroid_node_vectors(shifts)  # (2, 3, 2)
    (_, _, ref_int, ref_b1, ref_b2) = _kagome_bond_data(1, 1, bond_length)

    # Bonds normalized so the first end sits in cell (0, 0); offsets follow
    # from the finite-lattice connectivity (geometry/kagome.py:36-46):
    # internal [b0 n1 -> b1 n0], boundary1 [b0 n0 @ (0,1) -> b1 n2] and
    # boundary2 [b0 n2 @ (1,0) -> b1 n1], shifted to first-end cell (0, 0).
    return BlochCell(
        direct_basis=jnp.asarray(geometry.direct_basis),
        centroid_node_vectors=cnv,
        inertia=compute_inertia(cnv, density),
        bond_blocks=jnp.array([[0, 1], [0, 1], [0, 1]], dtype=jnp.int32),
        bond_nodes=jnp.array([[1, 0], [0, 2], [2, 1]], dtype=jnp.int32),
        bond_offsets=jnp.array([[0, 0], [0, -1], [-1, 0]]),
        bond_params=_ligament_params(
            jnp.stack([ref_int, ref_b1, ref_b2]), k_stretch, k_shear, k_rot
        ),
    )


def rotated_square_cell(
    angle,
    spacing: float = 1.0,
    bond_length: float = 0.1,
    density: float = 1.0,
    k_stretch=1.0,
    k_shear=1.0,
    k_rot=1.0,
) -> BlochCell:
    """Primitive cell of the rotated-square lattice: 2 blocks on the oblique
    basis a1 = s(1, 1), a2 = s(1, -1) (the checkerboard's true periodicity),
    4 bonds/cell. Node conventions of geometry/quad.py (0 right, 1 top,
    2 left, 3 bottom).
    """

    angle = jnp.asarray(angle, dtype=float)
    half = (spacing - bond_length) / 2
    quarter_turns = jnp.array([0.0, 0.5, 1.0, 1.5]) * jnp.pi

    def cnv_for(parity):
        a = parity * angle
        v0 = (half / jnp.cos(a)) * jnp.stack([jnp.cos(a), jnp.sin(a)])
        c, s = jnp.cos(quarter_turns), jnp.sin(quarter_turns)
        return jnp.stack(
            [c * v0[0] - s * v0[1], s * v0[0] + c * v0[1]], axis=-1
        )  # (4, 2)

    cnv = jnp.stack([cnv_for(1.0), cnv_for(-1.0)])  # blocks at (0,0), (s,0)
    ref_h = jnp.array([bond_length, 0.0])
    ref_v = jnp.array([0.0, bond_length])

    # Right/up neighbors of both blocks on the square grid, re-indexed to
    # the oblique cell: grid (i+1, j) and (i, j+1) alternate parity.
    return BlochCell(
        direct_basis=spacing * jnp.array([[1.0, 1.0], [1.0, -1.0]]),
        centroid_node_vectors=cnv,
        inertia=compute_inertia(cnv, density),
        bond_blocks=jnp.array(
            [[0, 1], [1, 0], [0, 1], [1, 0]], dtype=jnp.int32
        ),
        bond_nodes=jnp.array(
            [[0, 2], [0, 2], [1, 3], [1, 3]], dtype=jnp.int32
        ),
        bond_offsets=jnp.array([[0, 0], [1, 1], [0, -1], [1, 0]]),
        bond_params=_ligament_params(
            jnp.stack([ref_h, ref_h, ref_v, ref_v]), k_stretch, k_shear, k_rot
        ),
    )


def quad_periodic_cell(
    horizontal_shift: jnp.ndarray,
    vertical_shift: jnp.ndarray,
    spacing: float = 1.0,
    bond_length: float = 0.1,
    density: float = 1.0,
    k_stretch=1.0,
    k_shear=1.0,
    k_rot=1.0,
) -> BlochCell:
    """Cell of a periodic quad design: (p1, p2, 2) hinge-shift grids
    understood as one period of an infinite periodic design (the finite
    QuadGeometry's hinge conventions, geometry/quad.py:98-108; rest bond
    vectors stay (l, 0)/(0, l) because both bond ends share each hinge
    shift). ``p1 * p2`` blocks, 2 bonds per block.
    """

    h = jnp.asarray(horizontal_shift, dtype=float)
    v = jnp.asarray(vertical_shift, dtype=float)
    p1, p2 = h.shape[0], h.shape[1]
    if v.shape[:2] != (p1, p2):
        raise ValueError(
            "horizontal_shift and vertical_shift must share the same "
            f"(p1, p2) period, got {h.shape[:2]} vs {v.shape[:2]}"
        )

    half = (spacing - bond_length) / 2
    v0s = half * jnp.array(
        [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]
    )
    b = np.arange(p1 * p2)
    I, J = b % p1, b // p1  # block id = j * p1 + i

    offsets = jnp.stack(
        [
            h[(I + 1) % p1, J],
            v[I, (J + 1) % p2],
            h[I, J],
            v[I, J],
        ],
        axis=1,
    )  # (B, 4, 2)
    ref = v0s[None] + offsets
    from difflexmm_tpu.geometry.polygon import polygon_centroid

    cnv = ref - polygon_centroid(ref)[:, None, :]

    right = ((J * p1) + (I + 1) % p1).astype(np.int64)
    up = ((((J + 1) % p2) * p1) + I).astype(np.int64)
    bond_blocks = np.concatenate(
        [np.stack([b, right], axis=1), np.stack([b, up], axis=1)]
    )
    bond_nodes = np.concatenate(
        [
            np.tile(np.array([[0, 2]]), (p1 * p2, 1)),
            np.tile(np.array([[1, 3]]), (p1 * p2, 1)),
        ]
    )
    bond_offsets = np.concatenate(
        [
            np.stack([(I + 1) // p1, np.zeros_like(I)], axis=1),
            np.stack([np.zeros_like(J), (J + 1) // p2], axis=1),
        ]
    )
    refs = np.concatenate(
        [
            np.tile(np.array([[bond_length, 0.0]]), (p1 * p2, 1)),
            np.tile(np.array([[0.0, bond_length]]), (p1 * p2, 1)),
        ]
    )

    return BlochCell(
        direct_basis=spacing * jnp.array([[float(p1), 0.0], [0.0, float(p2)]]),
        centroid_node_vectors=cnv,
        inertia=compute_inertia(cnv, density),
        bond_blocks=jnp.asarray(bond_blocks, dtype=jnp.int32),
        bond_nodes=jnp.asarray(bond_nodes, dtype=jnp.int32),
        bond_offsets=jnp.asarray(bond_offsets),
        bond_params=_ligament_params(refs, k_stretch, k_shear, k_rot),
    )


def defect_supercell(
    cell: BlochCell,
    p1: int,
    p2: int,
    defect_cells,
    **param_overrides,
) -> BlochCell:
    """``(p1, p2)`` supercell with the bond parameters of chosen subcells
    overridden — point defects (cavity resonators), defect clusters, or
    arbitrary patterned supercells inside a bulk band gap.

    Args:
        defect_cells: iterable of ``(s1, s2)`` subcell indices to modify.
        param_overrides: bond-parameter overrides applied to every bond of
            those subcells; scalars or per-base-bond arrays. All other
            subcells keep the host cell's values.

    The sub-block ordering of :func:`supercell` makes this index
    arithmetic: bond ``r * n_bonds + b`` belongs to subcell
    ``r = s2 * p1 + s1``.
    """

    n_bonds = int(cell.bond_blocks.shape[0])
    n_sub = p1 * p2
    sc = supercell(cell, p1, p2)
    rows = [(int(s2) % p2) * p1 + (int(s1) % p1) for s1, s2 in defect_cells]
    params = dict(sc.bond_params)
    per_bond_base, shared = _per_bond_params(cell.bond_params, n_bonds)
    for name, value in param_overrides.items():
        if name in params and jnp.asarray(params[name]).ndim >= 1 and (
            jnp.asarray(params[name]).shape[0] == n_sub * n_bonds
        ):
            host = jnp.asarray(params[name])
        elif name in shared:
            host = jnp.broadcast_to(
                jnp.asarray(shared[name], dtype=float), (n_sub * n_bonds,)
            )
        elif name in per_bond_base:
            host = jnp.tile(jnp.asarray(per_bond_base[name]), (n_sub,))
        else:
            raise KeyError(
                f"unknown bond parameter {name!r}; cell has "
                f"{sorted(cell.bond_params)}"
            )
        override = jnp.broadcast_to(
            jnp.asarray(value, dtype=host.dtype), (n_bonds,) + host.shape[1:]
        )
        for r in rows:
            host = host.at[r * n_bonds : (r + 1) * n_bonds].set(override)
        params[name] = host
    return sc._replace(bond_params=params)


def line_defect_cell(
    cell: BlochCell,
    period: int,
    axis: int = 1,
    defect_index: Optional[int] = None,
    **param_overrides,
) -> BlochCell:
    """Supercell with one subcell row's bond parameters overridden — a
    line defect periodic along the other lattice direction (waveguide /
    domain-wall studies inside a bulk band gap).

    Builds ``supercell(cell, 1, period)`` (``axis=1``; rows of subcells
    stacked along a2) or ``supercell(cell, period, 1)`` (``axis=0``) and
    replaces the given per-bond parameters on the bonds of subcell
    ``defect_index`` (default: the middle row). Overrides may be scalars
    or per-base-bond arrays; all other rows keep the host cell's values.
    Thin wrapper over :func:`defect_supercell`.
    """

    if axis not in (0, 1):
        raise ValueError(f"axis must be 0 or 1, got {axis}")
    mid = period // 2 if defect_index is None else defect_index % period
    if axis == 1:
        return defect_supercell(cell, 1, period, [(0, mid)], **param_overrides)
    return defect_supercell(cell, period, 1, [(mid, 0)], **param_overrides)


def mode_localization(
    cell: BlochCell, modes: jnp.ndarray, period: int
) -> jnp.ndarray:
    """Per-mode weight fraction on each subcell row of a supercell built
    with :func:`supercell`/:func:`line_defect_cell`: ``(..., period,
    n_modes)`` from mode columns ``(..., 3B*period, n_modes)``. A guided
    mode concentrates its fraction on the defect row."""

    m = jnp.asarray(modes)
    B3 = m.shape[-2] // period
    w = jnp.abs(m) ** 2
    w = w / jnp.sum(w, axis=-2, keepdims=True)
    shape = w.shape[:-2] + (period, B3) + w.shape[-1:]
    return jnp.sum(w.reshape(shape), axis=-2)


def spring_chain_cell(
    k_stretch: float = 1.0,
    spacing: float = 1.0,
    mass: float = 1.0,
    rot_inertia: float = 1.0,
) -> BlochCell:
    """1D monatomic chain of point blocks joined by simple springs — the
    textbook oracle omega^2 = 4 k/m sin^2(k a / 2) (tests/test_bloch.py).
    Use with ``bond_energy_fn=ops.bonds.simple_spring_energy``."""

    return BlochCell(
        direct_basis=spacing * jnp.eye(2),
        centroid_node_vectors=jnp.zeros((1, 1, 2)),
        inertia=jnp.array([[mass, mass, rot_inertia]]),
        bond_blocks=jnp.array([[0, 0]], dtype=jnp.int32),
        bond_nodes=jnp.array([[0, 0]], dtype=jnp.int32),
        bond_offsets=jnp.array([[1, 0]]),
        bond_params={
            "reference_vector": jnp.array([[spacing, 0.0]]),
            "k_stretch": k_stretch,
        },
    )
