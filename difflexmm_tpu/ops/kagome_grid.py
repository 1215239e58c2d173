"""Gather-free gridded energy assembly for kagome lattices.

Kagome cells tile an (n2, n1) grid with two triangular blocks per cell
(block ``2*cell`` "down", ``2*cell+1`` "up"; local nodes 0-2 per block,
per-cell numbering 0-5). The three bond families are shifted slices over
the cell grid (see geometry/kagome.py):

- internal: node 1 of the down triangle <-> node 0 of the up triangle of
  the same cell;
- boundary-1: node 0 of the down triangle of cell (j+1, i) <-> node 2 of
  the up triangle of cell (j, i);
- boundary-2: node 2 of the down triangle of cell (j, i+1) <-> node 1 of
  the up triangle of cell (j, i).

Contact neighbors are static corner indices within each triangle. As with
ops/grid.py, this removes every gather/scatter from the hot loop; it is
bit-identical to the general path (tested).
"""

from typing import Callable

import jax.numpy as jnp

from difflexmm_tpu.geometry.polygon import signed_angle
from difflexmm_tpu.ops.bonds import ligament_energy
from difflexmm_tpu.ops.contact import contact_energy
from difflexmm_tpu.ops.kinematics import block_to_node_kinematics
from difflexmm_tpu.utils.types import ControlParams


def _unit(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _split(value, n1: int, n2: int):
    """Scalar-or-(n_bonds,) stiffness -> (internal, boundary1, boundary2)."""

    value = jnp.asarray(value)
    if value.ndim == 0:
        return value, value, value
    n_int = n1 * n2
    n_b1 = n1 * (n2 - 1)
    internal = value[:n_int].reshape(n2, n1)
    boundary1 = value[n_int:n_int + n_b1].reshape(n2 - 1, n1)
    boundary2 = value[n_int + n_b1:].reshape(n2, n1 - 1)
    return internal, boundary1, boundary2


def _split_ref(ref, n1: int, n2: int):
    ref = jnp.asarray(ref)
    n_int = n1 * n2
    n_b1 = n1 * (n2 - 1)
    internal = ref[:n_int].reshape(n2, n1, 2)
    boundary1 = ref[n_int:n_int + n_b1].reshape(n2 - 1, n1, 2)
    boundary2 = ref[n_int + n_b1:].reshape(n2, n1 - 1, 2)
    return internal, boundary1, boundary2


def build_kagome_grid_energy(
    n1_cells: int,
    n2_cells: int,
    bond_energy_fn: Callable = ligament_energy,
    use_contact: bool = True,
) -> Callable:
    """Strain (+ angle contact) energy of a kagome lattice, gather-free.

    Drop-in replacement for the general assembly on KagomeGeometry /
    KagomePeriodicGeometry lattices; same
    ``energy_fn(block_displacement, control_params)`` contract.
    """

    n1, n2 = n1_cells, n2_cells

    def energy_fn(block_displacement: jnp.ndarray, control_params: ControlParams):
        gp = control_params.geometrical_params
        bp = control_params.mechanical_params.bond_params
        cnv = gp.centroid_node_vectors  # (2*n_cells, 3, 2)

        # (n2, n1, bpc=2, npb=3, 3)
        node_DOFs = block_to_node_kinematics(block_displacement, cnv).reshape(
            n2, n1, 2, 3, 3
        )
        down = node_DOFs[:, :, 0]  # (n2, n1, 3, 3)
        up = node_DOFs[:, :, 1]

        ref_i, ref_b1, ref_b2 = _split_ref(bp.reference_vector, n1, n2) \
            if jnp.asarray(bp.reference_vector).ndim > 1 else (
                bp.reference_vector,) * 3
        ks_i, ks_b1, ks_b2 = _split(bp.k_stretch, n1, n2)
        ksh_i, ksh_b1, ksh_b2 = _split(bp.k_shear, n1, n2)
        kr_i, kr_b1, kr_b2 = _split(bp.k_rot, n1, n2)

        # Bond families as shifted slices (ends ordered as in connectivity).
        strain = (
            jnp.sum(bond_energy_fn(
                (down[:, :, 1], up[:, :, 0]), reference_vector=ref_i,
                k_stretch=ks_i, k_shear=ksh_i, k_rot=kr_i,
            ))
            + jnp.sum(bond_energy_fn(
                (down[1:, :, 0], up[:-1, :, 2]), reference_vector=ref_b1,
                k_stretch=ks_b1, k_shear=ksh_b1, k_rot=kr_b1,
            ))
            + jnp.sum(bond_energy_fn(
                (down[:, 1:, 2], up[:, :-1, 1]), reference_vector=ref_b2,
                k_stretch=ks_b2, k_shear=ksh_b2, k_rot=kr_b2,
            ))
        )

        if not use_contact or control_params.mechanical_params.contact_params is None:
            return strain

        cp = control_params.mechanical_params.contact_params
        positions = (
            gp.block_centroids[:, None] + cnv
        ).reshape(n2, n1, 2, 3, 2) + node_DOFs[..., :2]
        p_down = positions[:, :, 0]  # (n2, n1, 3, 2)
        p_up = positions[:, :, 1]

        def corner_edges(p_block, corner):
            node = p_block[..., corner, :]
            e_next = p_block[..., (corner + 1) % 3, :] - node
            e_prev = p_block[..., (corner - 1) % 3, :] - node
            return _unit(e_next), _unit(e_prev)

        def voids(p1, c1, p2, c2):
            u1_next, u1_prev = corner_edges(p1, c1)
            u2_next, u2_prev = corner_edges(p2, c2)
            return (
                signed_angle(u2_prev, u1_next),
                signed_angle(u1_prev, u2_next),
            )

        gaps = []
        gaps += voids(p_down, 1, p_up, 0)                     # internal
        gaps += voids(p_down[1:, :], 0, p_up[:-1, :], 2)      # boundary 1
        gaps += voids(p_down[:, 1:], 2, p_up[:, :-1], 1)      # boundary 2

        contact = sum(
            jnp.sum(contact_energy(
                g, min_angle=cp.min_angle, cutoff_angle=cp.cutoff_angle,
                k_contact=cp.k_contact,
            ))
            for g in gaps
        )
        return strain + contact

    return energy_fn
