"""Magnetic dipole-dipole interaction energy between blocks.

The reference declares ``MagneticParams`` (difflexmm/utils.py:114-125) but
implements no magnetic energy anywhere — a dangling extension point. This
module completes it: each block carries one dipole at its centroid whose
in-plane direction co-rotates with the block; the pairwise dipole-dipole
energy over all block pairs is

    E_ij = C [ m_i . m_j - 3 (m_i . r_hat)(m_j . r_hat) ] / r^3

with C = mu0 / (4 pi) (set via ``prefactor``), r the current center-to-
center vector. ``dipole_angles = (in_plane_angle, pitch)``: the in-plane
moment is ``strength * cos(pitch)`` at angle ``in_plane_angle + theta_block``
and the out-of-plane component ``strength * sin(pitch)`` contributes the
``m_z_i m_z_j / r^3`` term (its projection on the in-plane r_hat is zero).

All pairs are evaluated densely — an (n_blocks, n_blocks) computation that
maps perfectly onto the VPU; no neighbor lists.
"""

from typing import Callable

import jax.numpy as jnp

from difflexmm_tpu.utils.types import ControlParams


def magnetic_dipole_energy(
    positions: jnp.ndarray,
    rotations: jnp.ndarray,
    dipole_angles: jnp.ndarray,
    dipole_strengths,
    prefactor: float = 1.0,
    min_distance: float = 0.1,
) -> jnp.ndarray:
    """Total dipole-dipole energy of blocks at ``positions``.

    Args:
        positions: (n, 2) current dipole positions.
        rotations: (n,) current block rotations.
        dipole_angles: (n, 2) [in_plane_angle, pitch] per dipole.
        dipole_strengths: scalar or (n,) moment magnitudes.
        prefactor: mu0 / (4 pi) in the problem's unit system.
        min_distance: saturation core radius. The 1/r^3 attraction diverges
            faster than any linear bond restores, so magnet-dominated
            configurations snap together (physical!); the core radius keeps
            energies/gradients finite through a collapse. Combine with the
            contact energy to model actual block impenetrability.
    """

    n = positions.shape[0]
    strengths = jnp.broadcast_to(jnp.asarray(dipole_strengths, float), (n,))
    phi = dipole_angles[:, 0] + rotations
    pitch = dipole_angles[:, 1]
    m_inplane = strengths * jnp.cos(pitch)
    mx = m_inplane * jnp.cos(phi)
    my = m_inplane * jnp.sin(phi)
    mz = strengths * jnp.sin(pitch)

    dx = positions[:, None, 0] - positions[None, :, 0]
    dy = positions[:, None, 1] - positions[None, :, 1]
    r2 = dx * dx + dy * dy
    r = jnp.sqrt(jnp.maximum(r2, min_distance**2))
    rx, ry = dx / r, dy / r

    mm = mx[:, None] * mx[None, :] + my[:, None] * my[None, :] + mz[:, None] * mz[None, :]
    mr_i = mx[:, None] * rx + my[:, None] * ry
    mr_j = mx[None, :] * rx + my[None, :] * ry

    pair_energy = prefactor * (mm - 3.0 * mr_i * mr_j) / r**3
    off_diagonal = 1.0 - jnp.eye(n, dtype=pair_energy.dtype)
    return 0.5 * jnp.sum(pair_energy * off_diagonal)


def build_magnetic_energy(prefactor: float = 1.0,
                          min_distance: float = 0.1) -> Callable:
    """Magnetic energy as a (block_displacement, control_params) functional.

    Composable with ``combine_block_energies``; reads
    ``control_params.magnetic_params`` (MagneticParams) and the current
    block centroids from the geometry + displacement.
    """

    def magnetic_energy_fn(block_displacement: jnp.ndarray,
                           control_params: ControlParams):
        mp = control_params.magnetic_params
        if mp is None:
            return jnp.asarray(0.0)
        centroids = control_params.geometrical_params.block_centroids
        positions = centroids + block_displacement[:, :2]
        rotations = block_displacement[:, 2]
        return magnetic_dipole_energy(
            positions,
            rotations,
            jnp.asarray(mp.dipole_angles),
            mp.dipole_strengths,
            prefactor=prefactor,
            min_distance=min_distance,
        )

    return magnetic_energy_fn
