"""Geometry plugin contract and spatial query helpers.

A geometry maps a low-dimensional *design* to four pieces of data consumed by
the physics layers (reference contract: difflexmm/geometry.py:272-328):

- ``block_centroids(design) -> (n_blocks, 2)``
- ``centroid_node_vectors(design) -> (n_blocks, n_npb, 2)``
- ``bond_connectivity() -> (n_bonds, 2)`` static global-node index pairs
- ``reference_bond_vectors() -> (n_bonds, 2)``

Global node numbering is ``node_id = block_id * n_npb + local_node_id``.
All design maps are pure jnp functions of the design variables (static
shapes, jit/vmap/grad-friendly); connectivity is static host data.
"""

from typing import Callable, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.geometry.polygon import compute_xy_limits


def get_point_ids_in_bounding_box(
    points: jnp.ndarray, bounding_box: jnp.ndarray
) -> jnp.ndarray:
    """Indices of points inside an axis-aligned box [[x0,y0],[x1,y1]].

    Host-side helper (returns dynamically-sized output; do not jit).
    """

    lo, hi = bounding_box[0], bounding_box[1]
    inside = jnp.all((points >= lo) & (points <= hi), axis=-1)
    return jnp.where(inside)[0]


def get_point_ids_in_circle(
    points: jnp.ndarray, center: jnp.ndarray, radius: float
) -> jnp.ndarray:
    """Indices of points inside a circle. Host-side helper (do not jit)."""

    return jnp.where(jnp.linalg.norm(points - center, axis=-1) <= radius)[0]


class Geometry:
    """Template class for geometric design parametrizations."""

    n_blocks: int
    n_npb: int
    n_nodes: int
    block_centroids: Callable
    centroid_node_vectors: Callable
    bond_connectivity: Callable
    reference_bond_vectors: Callable

    def compute_geometry(self) -> None:
        """Install the four parametrization callables on ``self``."""

        raise NotImplementedError("Geometry subclasses must implement this.")

    def _ensure_geometry(self) -> None:
        if not hasattr(self, "centroid_node_vectors") or not callable(
            getattr(self, "centroid_node_vectors", None)
        ):
            self.compute_geometry()

    def get_parametrization(
        self,
    ) -> Tuple[Callable, Callable, Callable, Callable]:
        """Return (block_centroids, centroid_node_vectors, bond_connectivity,
        reference_bond_vectors)."""

        self.compute_geometry()
        return (
            self.block_centroids,
            self.centroid_node_vectors,
            self.bond_connectivity,
            self.reference_bond_vectors,
        )

    def get_reference_geometry(self, *design) -> jnp.ndarray:
        """Absolute node positions (n_blocks, n_npb, 2) for a design."""

        self._ensure_geometry()
        return (
            self.centroid_node_vectors(*design)
            + self.block_centroids(*design)[:, None, :]
        )

    def get_xy_limits(self, *design) -> jnp.ndarray:
        """Bounding box of the reference configuration."""

        nodes = self.get_reference_geometry(*design).reshape((self.n_nodes, 2))
        return compute_xy_limits(nodes)


class LatticeGeometry(Geometry):
    """A geometry tiled from unit cells on a 2D Bravais grid."""

    def __init__(
        self,
        n1_cells: int,
        n2_cells: int,
        n_bpc: int,
        # Optional-with-numpy-fallback: a jnp.eye default would create a
        # device array at import time, committing the backend before
        # callers can pin a platform.
        direct_basis: Optional[jnp.ndarray] = None,
    ):
        self.n1_cells = n1_cells
        self.n2_cells = n2_cells
        self.n_bpc = n_bpc
        self.n_cells = n1_cells * n2_cells
        self.n_blocks = self.n_cells * n_bpc
        self.direct_basis = (
            direct_basis if direct_basis is not None else np.eye(2)
        )
