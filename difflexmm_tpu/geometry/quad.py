"""Quadrilateral lattice geometries: QuadGeometry and RotatedSquareGeometry.

Both tile an n1 x n2 grid of 4-node blocks. Block numbering is row-major with
n1 fastest (``block = n2 * n1_blocks + n1``); local nodes are ordered
(0: right, 1: top, 2: left, 3: bottom). Horizontal bonds join node 0 of
block (n1, n2) to node 2 of block (n1+1, n2); vertical bonds join node 1 of
block (n1, n2) to node 3 of block (n1, n2+1) — the same data contract as the
reference (difflexmm/geometry.py:354-443, 804-952), rebuilt here with dense
index arithmetic instead of Python list comprehensions.
"""

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.geometry.base import LatticeGeometry
from difflexmm_tpu.geometry.polygon import polygon_centroid


def _rot(angle: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 2) by angles (broadcastable to v[..., 0])."""

    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [c * v[..., 0] - s * v[..., 1], s * v[..., 0] + c * v[..., 1]], axis=-1
    )


def _grid_indices(n1: int, n2: int) -> Tuple[np.ndarray, np.ndarray]:
    """(I, J) block grid coordinates in block-id order (n1 fastest)."""

    b = np.arange(n1 * n2)
    return b % n1, b // n1


def _grid_bonds(n1: int, n2: int) -> np.ndarray:
    """Connectivity of a quad grid: horizontal bonds then vertical bonds."""

    I, J = np.meshgrid(np.arange(n1 - 1), np.arange(n2), indexing="ij")
    # n2-major ordering (J outer) to match the reference bond order
    bh = (J.T * n1 + I.T).ravel()
    horizontal = np.stack([bh * 4 + 0, (bh + 1) * 4 + 2], axis=1)
    I, J = np.meshgrid(np.arange(n1), np.arange(n2 - 1), indexing="ij")
    bv = (J.T * n1 + I.T).ravel()
    vertical = np.stack([bv * 4 + 1, (bv + n1) * 4 + 3], axis=1)
    return np.concatenate([horizontal, vertical]).astype(np.int32)


def _grid_reference_bond_vectors(n1: int, n2: int, bond_length: float) -> np.ndarray:
    n_h = (n1 - 1) * n2
    n_v = n1 * (n2 - 1)
    out = np.zeros((n_h + n_v, 2))
    out[:n_h, 0] = bond_length
    out[n_h:, 1] = bond_length
    return out


class QuadGeometry(LatticeGeometry):
    """Aperiodic lattice of quadrangles with finite-length bonds.

    Design variables move every hinge node independently:
    ``horizontal_shift`` (n1+1, n2, 2) displaces the horizontally-aligned
    hinges, ``vertical_shift`` (n1, n2+1, 2) the vertically-aligned ones.
    Node offsets per block (n1, n2): node 0 takes horizontal_shift[n1+1, n2],
    node 1 vertical_shift[n1, n2+1], node 2 horizontal_shift[n1, n2],
    node 3 vertical_shift[n1, n2]. (reference: geometry.py:832-854)
    """

    def __init__(
        self,
        n1_blocks: int,
        n2_blocks: int,
        spacing: float = 1.0,
        bond_length: float = 0.1,
    ):
        super().__init__(
            n1_cells=n1_blocks,
            n2_cells=n2_blocks,
            n_bpc=1,
            direct_basis=spacing * jnp.eye(2),
        )
        self.spacing = spacing
        self.bond_length = bond_length
        self.n1_blocks = n1_blocks
        self.n2_blocks = n2_blocks
        self.n_npb = 4
        self.n_nodes = self.n_npb * self.n_blocks

    def compute_geometry(self) -> None:
        n1, n2 = self.n1_blocks, self.n2_blocks
        I, J = _grid_indices(n1, n2)
        half = (self.spacing - self.bond_length) / 2
        # Base node vectors: right, top, left, bottom.
        v0s = half * jnp.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
        ref_points = I[:, None] * self.direct_basis[0] + J[:, None] * self.direct_basis[1]

        def reference_node_vectors(horizontal_shift, vertical_shift):
            offsets = jnp.stack(
                [
                    horizontal_shift[I + 1, J],
                    vertical_shift[I, J + 1],
                    horizontal_shift[I, J],
                    vertical_shift[I, J],
                ],
                axis=1,
            )  # (n_blocks, 4, 2)
            return v0s[None] + offsets

        def centroid_node_vectors(horizontal_shift, vertical_shift):
            ref = reference_node_vectors(horizontal_shift, vertical_shift)
            return ref - polygon_centroid(ref)[:, None, :]

        def block_centroids(horizontal_shift, vertical_shift):
            ref = reference_node_vectors(horizontal_shift, vertical_shift)
            return ref_points + polygon_centroid(ref)

        bonds = jnp.asarray(_grid_bonds(n1, n2))
        ref_bond_vecs = jnp.asarray(
            _grid_reference_bond_vectors(n1, n2, self.bond_length)
        )

        self.centroid_node_vectors = centroid_node_vectors
        self.block_centroids = block_centroids
        self.bond_connectivity = lambda: bonds
        self.reference_bond_vectors = lambda: ref_bond_vecs

    def get_design_from_rotated_square(self, angle) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Shifts reproducing a rotated-square lattice at the given angle.

        Standard initial guess for inverse design
        (reference: geometry.py:928-952).
        """

        n1, n2 = self.n1_blocks, self.n2_blocks
        half = (self.spacing - self.bond_length) / 2

        def hinge_vector(sign):
            # v0 of the rotated-square parametrization at parity `sign`
            a = sign * angle
            return (half / jnp.cos(a))[..., None] * jnp.stack(
                [jnp.cos(a), jnp.sin(a)], axis=-1
            )

        Ih, Jh = jnp.meshgrid(jnp.arange(n1 + 1), jnp.arange(n2), indexing="ij")
        sign_h = (-1.0) ** (Ih + Jh)
        horizontal = hinge_vector(sign_h * jnp.ones_like(sign_h)) - jnp.array(
            [half, 0.0]
        )

        Iv, Jv = jnp.meshgrid(jnp.arange(n1), jnp.arange(n2 + 1), indexing="ij")
        sign_v = (-1.0) ** (Iv + Jv)
        vertical = _rot(
            jnp.pi / 2,
            hinge_vector(sign_v * jnp.ones_like(sign_v)) - jnp.array([half, 0.0]),
        )

        return horizontal, vertical


class RotatedSquareGeometry(LatticeGeometry):
    """Rotated-square lattice: one global design angle, checkerboard parity.

    Blocks at grid parity (n1+n2) even/odd rotate by +/-angle. The block at
    (n1, n2) sits exactly at ``n1*a1 + n2*a2`` (no centroid shift); its node
    vectors are the four 90-degree rotations of
    ``(s-l)/(2 cos(p*angle)) * [cos(p*angle), sin(p*angle)]`` with parity
    ``p = (-1)^(n1+n2)``. (reference: geometry.py:354-437)
    """

    def __init__(
        self,
        n1_cells: int,
        n2_cells: int,
        spacing: float = 1.0,
        bond_length: float = 0.1,
    ):
        super().__init__(
            n1_cells=n1_cells,
            n2_cells=n2_cells,
            n_bpc=4,
            direct_basis=spacing * jnp.eye(2),
        )
        self.spacing = spacing
        self.bond_length = bond_length
        self.n1_blocks = 2 * n1_cells
        self.n2_blocks = 2 * n2_cells
        self.n_npb = 4
        self.n_nodes = self.n_npb * self.n_blocks

    def compute_geometry(self) -> None:
        n1, n2 = self.n1_blocks, self.n2_blocks
        I, J = _grid_indices(n1, n2)
        parity = jnp.asarray((-1.0) ** (I + J))
        half = (self.spacing - self.bond_length) / 2
        quarter_turns = jnp.array([0.0, 0.5, 1.0, 1.5]) * jnp.pi

        def centroid_node_vectors(angle):
            a = parity * angle  # (n_blocks,)
            v0 = (half / jnp.cos(a))[:, None] * jnp.stack(
                [jnp.cos(a), jnp.sin(a)], axis=-1
            )  # (n_blocks, 2)
            return _rot(quarter_turns[None, :], v0[:, None, :])

        def block_centroids(angle):
            del angle  # centroids sit on the square grid for any angle
            return (
                I[:, None] * self.direct_basis[0] + J[:, None] * self.direct_basis[1]
            )

        bonds = jnp.asarray(_grid_bonds(n1, n2))
        ref_bond_vecs = jnp.asarray(
            _grid_reference_bond_vectors(n1, n2, self.bond_length)
        )

        self.centroid_node_vectors = centroid_node_vectors
        self.block_centroids = block_centroids
        self.bond_connectivity = lambda: bonds
        self.reference_bond_vectors = lambda: ref_bond_vecs
