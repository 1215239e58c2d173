"""Batched block-edge utilities used by contact and design constraints.

Everything here is vectorized over bonds/nodes with plain gathers and
broadcasting (no per-bond vmap), matching the behavior of the reference
edge-angle utilities (difflexmm/geometry.py:181-253).
"""

from typing import Tuple

import jax.numpy as jnp

from difflexmm_tpu.geometry.polygon import signed_angle


def edge_unit_vectors(
    current_block_nodes: jnp.ndarray, node_ids: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unit vectors from each node to its next/previous neighbor on the block.

    Args:
        current_block_nodes: (n_blocks, V, 2) current node positions.
        node_ids: (...,) global node indices (block_id * V + local_id).

    Returns:
        (u_next, u_prev): each (..., 2) unit vectors along the two block
        edges emanating from the node.
    """

    V = current_block_nodes.shape[-2]
    b, k = node_ids // V, node_ids % V
    node = current_block_nodes[b, k]
    e_next = current_block_nodes[b, (k + 1) % V] - node
    e_prev = current_block_nodes[b, (k - 1) % V] - node
    u_next = e_next / jnp.linalg.norm(e_next, axis=-1, keepdims=True)
    u_prev = e_prev / jnp.linalg.norm(e_prev, axis=-1, keepdims=True)
    return u_next, u_prev


def compute_edge_angles(
    current_block_nodes: jnp.ndarray, bonds: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Void and block angles at each bond hinge.

    For each bond [n1, n2] the hinge is flanked by two void wedges (between
    the facing block edges) and two block wedges (between the edges of each
    block at its bond node).

    Args:
        current_block_nodes: (n_blocks, V, 2).
        bonds: (n_bonds, 2) or (2,) global node index pairs.

    Returns:
        (void_1, void_2, block_1, block_2): each (n_bonds,) (or scalars for a
        single bond), signed angles in [-pi, pi].
    """

    n1, n2 = bonds[..., 0], bonds[..., 1]
    u1_next, u1_prev = edge_unit_vectors(current_block_nodes, n1)
    u2_next, u2_prev = edge_unit_vectors(current_block_nodes, n2)

    void_1 = signed_angle(u2_prev, u1_next)
    void_2 = signed_angle(u1_prev, u2_next)
    block_1 = signed_angle(u1_next, u1_prev)
    block_2 = signed_angle(u2_next, u2_prev)
    return void_1, void_2, block_1, block_2


def compute_block_angles(
    current_block_nodes: jnp.ndarray, node_ids: jnp.ndarray
) -> jnp.ndarray:
    """Interior wedge angle of each block at the given nodes, (...,)."""

    u_next, u_prev = edge_unit_vectors(current_block_nodes, node_ids)
    return signed_angle(u_next, u_prev)
