"""Kagome lattice geometries (periodic and fully-free designs).

Each unit cell holds two triangular blocks (up/down). Per-cell local node
numbering is 0-2 for block 1 and 3-5 for block 2; cells are ordered n2-major
with n1 fastest (``cell = n2 * n1_cells + n1``), blocks
``block = 2 * cell + {0, 1}``. Bonds per cell: internal [1, 3], and two
boundary bonds [0 of cell (n1, n2+1), 5 of cell (n1, n2)] and
[2 of cell (n1+1, n2), 4 of cell (n1, n2)].

Data contract parity with the reference (difflexmm/geometry.py:446-801),
implemented with dense broadcasting.
"""

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.geometry.base import LatticeGeometry
from difflexmm_tpu.geometry.polygon import polygon_centroid


# numpy, not jnp: a module-level device array would commit the JAX
# backend at import time, before callers can pin a platform.
_DEFAULT_BASIS = np.array([[1.0, 0.0], [np.cos(np.pi / 3), np.sin(np.pi / 3)]])


def _kagome_bond_data(n1: int, n2: int, bond_length: float):
    """Static connectivity + reference bond vectors for a kagome grid."""

    npc = 6  # nodes per cell

    def cell_ids(i, j):
        return (j * n1 + i) * npc

    I, J = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    c = cell_ids(I.T, J.T).ravel()  # n2-major order
    internal = np.stack([c + 1, c + 3], axis=1)

    I, J = np.meshgrid(np.arange(n1), np.arange(n2 - 1), indexing="ij")
    c0 = cell_ids(I.T, J.T).ravel()
    c_up = cell_ids(I.T, J.T + 1).ravel()
    boundary1 = np.stack([c_up + 0, c0 + 5], axis=1)

    I, J = np.meshgrid(np.arange(n1 - 1), np.arange(n2), indexing="ij")
    c0 = cell_ids(I.T, J.T).ravel()
    c_right = cell_ids(I.T + 1, J.T).ravel()
    boundary2 = np.stack([c_right + 2, c0 + 4], axis=1)

    bonds = np.concatenate([internal, boundary1, boundary2]).astype(np.int32)

    ref_internal = bond_length * np.array([np.cos(np.pi / 6), np.sin(np.pi / 6)])
    ref_boundary1 = bond_length * np.array([0.0, -1.0])
    ref_boundary2 = bond_length * np.array([-np.cos(np.pi / 6), np.sin(np.pi / 6)])
    ref_vectors = np.concatenate(
        [
            np.tile(ref_internal, (len(internal), 1)),
            np.tile(ref_boundary1, (len(boundary1), 1)),
            np.tile(ref_boundary2, (len(boundary2), 1)),
        ]
    )
    return (
        bonds,
        ref_vectors,
        jnp.asarray(ref_internal),
        jnp.asarray(ref_boundary1),
        jnp.asarray(ref_boundary2),
    )


class KagomeGeometry(LatticeGeometry):
    """Non-periodic kagome: every hinge node moves independently.

    Design variables are three shift grids placing the three families of
    hinge points (reference: geometry.py:646-700):
    ``shifts_1`` (n1+1, n2, 2): nodes 2 (of cell i, j) and 4 (of cell i-1, j);
    ``shifts_2`` (n1, n2+1, 2): nodes 0 (of cell i, j) and 5 (of cell i, j-1);
    ``shifts_3`` (n1, n2, 2): the internal hinge, nodes 1 and 3.
    """

    def __init__(
        self,
        n1_cells: int,
        n2_cells: int,
        direct_basis: jnp.ndarray = _DEFAULT_BASIS,
        bond_length: float = 0.1,
    ):
        super().__init__(
            n1_cells=n1_cells, n2_cells=n2_cells, n_bpc=2, direct_basis=direct_basis
        )
        self.bond_length = bond_length
        self.n_npb = 3
        self.n_nodes = self.n_npb * self.n_blocks

    def _base_blocks(self):
        """Unshifted node positions of the two cell triangles, with bond gaps."""

        a1, a2 = self.direct_basis
        (_, _, ref_int, ref_b1, ref_b2) = _kagome_bond_data(1, 1, self.bond_length)
        block_1 = jnp.stack([a1 / 2, a1 / 2 + a2 / 2, a2 / 2]) - 0.5 * jnp.stack(
            [ref_b1, ref_int, ref_b2]
        )
        block_2 = jnp.stack([a1 / 2 + a2 / 2, a1 + a2 / 2, a1 / 2 + a2]) + 0.5 * jnp.stack(
            [ref_int, ref_b2, ref_b1]
        )
        return block_1, block_2

    def compute_geometry(self) -> None:
        n1, n2 = self.n1_cells, self.n2_cells
        a1, a2 = self.direct_basis
        block_1_base, block_2_base = self._base_blocks()

        # Cell grid coordinates in cell-id order (n2-major, n1 fastest).
        cell = np.arange(self.n_cells)
        I, J = cell % n1, cell // n1

        cell_origins = I[:, None] * a1 + J[:, None] * a2  # (n_cells, 2)

        def reference_node_vectors(shifts_1, shifts_2, shifts_3):
            """Node positions relative to each cell origin, (n_blocks, 3, 2)."""

            b1 = block_1_base[None] + jnp.stack(
                [shifts_2[I, J], shifts_3[I, J], shifts_1[I, J]], axis=1
            )
            b2 = block_2_base[None] + jnp.stack(
                [shifts_3[I, J], shifts_1[I + 1, J], shifts_2[I, J + 1]], axis=1
            )
            # Interleave per cell: (n_cells, 2, 3, 2) -> (n_blocks, 3, 2)
            return jnp.stack([b1, b2], axis=1).reshape(self.n_blocks, 3, 2)

        def centroid_node_vectors(shifts_1, shifts_2, shifts_3):
            ref = reference_node_vectors(shifts_1, shifts_2, shifts_3)
            return ref - polygon_centroid(ref)[:, None, :]

        def block_centroids(shifts_1, shifts_2, shifts_3):
            ref = reference_node_vectors(shifts_1, shifts_2, shifts_3)
            origins = jnp.repeat(cell_origins, 2, axis=0)
            return origins + polygon_centroid(ref)

        bonds, ref_vectors, *_ = _kagome_bond_data(n1, n2, self.bond_length)
        bonds_j = jnp.asarray(bonds)
        ref_vectors_j = jnp.asarray(ref_vectors)

        self.centroid_node_vectors = centroid_node_vectors
        self.block_centroids = block_centroids
        self.bond_connectivity = lambda: bonds_j
        self.reference_bond_vectors = lambda: ref_vectors_j

    def zero_design(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Zero shifts (the regular kagome) with the right shapes."""

        n1, n2 = self.n1_cells, self.n2_cells
        return (
            jnp.zeros((n1 + 1, n2, 2)),
            jnp.zeros((n1, n2 + 1, 2)),
            jnp.zeros((n1, n2, 2)),
        )


class KagomePeriodicGeometry(LatticeGeometry):
    """Periodic kagome: one (3, 2) shift triple shared by all cells.

    Block 2 of each cell is block 1 rotated by -60 degrees; the shifts act on
    block 1 nodes in order (0, 1, 2) and on block 2 nodes in order (1, 2, 0)
    (reference: geometry.py:485-531).
    """

    def __init__(
        self,
        n1_cells: int,
        n2_cells: int,
        direct_basis: jnp.ndarray = _DEFAULT_BASIS,
        bond_length: float = 0.1,
    ):
        super().__init__(
            n1_cells=n1_cells, n2_cells=n2_cells, n_bpc=2, direct_basis=direct_basis
        )
        self.bond_length = bond_length
        self.n_npb = 3
        self.n_nodes = self.n_npb * self.n_blocks

    def compute_geometry(self) -> None:
        n1, n2 = self.n1_cells, self.n2_cells
        a1, a2 = self.direct_basis

        (_, _, ref_int, ref_b1, ref_b2) = _kagome_bond_data(1, 1, self.bond_length)
        block_1_base = jnp.stack([a1 / 2, a1 / 2 + a2 / 2, a2 / 2]) - 0.5 * jnp.stack(
            [ref_b1, ref_int, ref_b2]
        )
        block_1_centered = block_1_base - polygon_centroid(block_1_base)
        c, s = jnp.cos(-jnp.pi / 3), jnp.sin(-jnp.pi / 3)
        R = jnp.array([[c, -s], [s, c]])
        block_2_centered = block_1_centered @ R.T

        centroid_1 = polygon_centroid(jnp.stack([a1 / 2, a1 / 2 + a2 / 2, a2 / 2]))
        centroid_2 = polygon_centroid(
            jnp.stack([a1 / 2 + a2 / 2, a1 + a2 / 2, a1 / 2 + a2])
        )
        base_centroids = jnp.stack([centroid_1, centroid_2])  # (2, 2)

        cell = np.arange(self.n_cells)
        I, J = cell % n1, cell // n1
        cell_origins = I[:, None] * a1 + J[:, None] * a2  # (n_cells, 2)

        def cell_node_vectors(shifts):
            """Shifted cell triangles, (2, 3, 2)."""

            b1 = block_1_centered + shifts
            b2 = block_2_centered + shifts[jnp.array([1, 2, 0])]
            return jnp.stack([b1, b2])

        def centroid_node_vectors(shifts=jnp.zeros((3, 2))):
            cell_blocks = cell_node_vectors(shifts)
            cnv = cell_blocks - polygon_centroid(cell_blocks)[:, None, :]
            return jnp.tile(cnv, (self.n_cells, 1, 1))

        def block_centroids(shifts=jnp.zeros((3, 2))):
            cell_blocks = cell_node_vectors(shifts)
            shifted = base_centroids + polygon_centroid(cell_blocks)  # (2, 2)
            return (cell_origins[:, None, :] + shifted[None]).reshape(
                self.n_blocks, 2
            )

        bonds, ref_vectors, *_ = _kagome_bond_data(n1, n2, self.bond_length)
        bonds_j = jnp.asarray(bonds)
        ref_vectors_j = jnp.asarray(ref_vectors)

        self.centroid_node_vectors = centroid_node_vectors
        self.block_centroids = block_centroids
        self.bond_connectivity = lambda: bonds_j
        self.reference_bond_vectors = lambda: ref_vectors_j
