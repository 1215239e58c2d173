"""Rigid-block kinematics: block DOFs -> node DOFs, and driven constraints.

TPU-first design notes
----------------------
- ``block_to_node_kinematics`` is written as broadcast elementwise math on
  (n_blocks, V) arrays (no per-node 2x2 matmuls, no nested vmap) so XLA fuses
  it into the surrounding energy computation.
- Constraints use a dense free-DOF mask over the full (n_blocks, 3) state
  plus a static-index scatter of the driven values; there is no gather-based
  free-DOF reduction anywhere (contrast with reference
  difflexmm/kinematics.py:40-81 which scatters into a flat DOF vector).

Behavioral parity: reference difflexmm/kinematics.py:13-81.
"""

from typing import Callable, Dict

import numpy as np
import jax.numpy as jnp


def block_to_node_kinematics(
    block_displacement: jnp.ndarray, centroid_node_vectors: jnp.ndarray
) -> jnp.ndarray:
    """Node displacements+rotations from block DOFs.

    node_disp = block_disp + (R(theta) - I) @ r, with r the centroid-to-node
    vector; the third component carries the block rotation.

    Args:
        block_displacement: (..., n_blocks, 3).
        centroid_node_vectors: (n_blocks, V, 2).

    Returns:
        (..., n_blocks, V, 3).
    """

    # Slice then expand_dims (not fused fancy indexing, which lowers to a
    # gather op that Pallas/Mosaic cannot compile).
    u = jnp.expand_dims(block_displacement[..., :2], -2)  # (..., nb, 1, 2)
    theta = block_displacement[..., 2:3]  # (..., nb, 1)
    cm1 = jnp.cos(theta) - 1.0
    s = jnp.sin(theta)
    vx = centroid_node_vectors[..., 0]  # (nb, V)
    vy = centroid_node_vectors[..., 1]
    dx = u[..., 0] + cm1 * vx - s * vy
    dy = u[..., 1] + s * vx + cm1 * vy
    rot = jnp.broadcast_to(theta, dx.shape)
    return jnp.stack([dx, dy, rot], axis=-1)


def current_node_positions(
    block_displacement: jnp.ndarray,
    block_centroids: jnp.ndarray,
    centroid_node_vectors: jnp.ndarray,
) -> jnp.ndarray:
    """Absolute current node positions (..., n_blocks, V, 2)."""

    disp = block_to_node_kinematics(block_displacement, centroid_node_vectors)
    return block_centroids[:, None] + centroid_node_vectors + disp[..., :2]


class DOFSet:
    """Static free/constrained DOF bookkeeping as dense masks.

    Built once on the host with numpy; all members are device-friendly
    constant arrays closed over by jitted functions.

    Attrs:
        free_mask: (n_blocks, 3) float, 1 on free DOFs, 0 on constrained.
        constrained_blocks / constrained_dofs: (k,) int scatter indices.
        n_constrained: number of constrained [block, DOF] pairs.
    """

    def __init__(self, n_blocks: int, constrained_block_DOF_pairs):
        pairs = np.asarray(constrained_block_DOF_pairs, dtype=np.int64).reshape(-1, 2)
        mask = np.ones((n_blocks, 3))
        mask[pairs[:, 0], pairs[:, 1]] = 0.0
        self.n_blocks = int(n_blocks)
        self.n_constrained = len(pairs)
        self.free_mask = jnp.asarray(mask)
        self.constrained_blocks = jnp.asarray(pairs[:, 0], dtype=jnp.int32)
        self.constrained_dofs = jnp.asarray(pairs[:, 1], dtype=jnp.int32)

    def scatter_constrained(self, values) -> jnp.ndarray:
        """Dense (n_blocks, 3) array with ``values`` on the constrained DOFs.

        ``values`` is scalar or (n_constrained,).
        """

        dense = jnp.zeros((self.n_blocks, 3), dtype=jnp.result_type(float))
        if self.n_constrained == 0:
            return dense
        vals = jnp.broadcast_to(jnp.asarray(values, dtype=dense.dtype),
                                (self.n_constrained,))
        return dense.at[self.constrained_blocks, self.constrained_dofs].set(vals)

    def gather_constrained(self, dense: jnp.ndarray) -> jnp.ndarray:
        """(n_constrained,) values of a dense (n_blocks, 3) field."""

        return dense[self.constrained_blocks, self.constrained_dofs]


def build_constrained_kinematics(
    geometry,
    constrained_block_DOF_pairs=np.zeros((0, 2)),
    constrained_DOFs_fn: Callable = lambda t, **kwargs: 0.0,
):
    """Map (free-DOF state, t) -> full (n_blocks, 3) block displacements.

    The free state is carried densely as (n_blocks, 3) with constrained
    entries ignored; driven DOFs take ``constrained_DOFs_fn(t, **params)``.

    Returns:
        ``constrained_kinematics(free_DOFs, t, constraint_params)`` plus the
        underlying :class:`DOFSet` (as attribute ``dof_set``).
    """

    n_blocks = geometry if isinstance(geometry, int) else geometry.n_blocks
    dof_set = DOFSet(n_blocks, constrained_block_DOF_pairs)

    def constrained_kinematics(
        free_DOFs: jnp.ndarray, t, constraint_params: Dict = {}
    ) -> jnp.ndarray:
        u = free_DOFs.reshape(n_blocks, 3) * dof_set.free_mask
        if dof_set.n_constrained:
            u = u + dof_set.scatter_constrained(
                constrained_DOFs_fn(t, **constraint_params)
            )
        return u

    constrained_kinematics.dof_set = dof_set
    return constrained_kinematics
