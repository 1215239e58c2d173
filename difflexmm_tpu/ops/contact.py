"""Energy-based contact between blocks sharing a bond.

Two models, both batched densely over bonds:

- Angle-based (default): a C^1 barrier on the two void angles flanking each
  bond hinge. Cheap; the default in practice.
- Distance-based: a C^1 barrier on the minimum distance between the facing
  block edges adjacent to each bond.

Behavioral parity: reference difflexmm/energy.py:200-407 (barrier form at
333-361). The barrier is ~1/x with an asymptote at ``min_angle`` and a C^1
cutoff at ``cutoff_angle``; outside (min_angle, cutoff_angle) it is zero.
"""

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.geometry.edges import compute_edge_angles
from difflexmm_tpu.ops.kinematics import current_node_positions


def void_angles(
    current_block_nodes: jnp.ndarray, bond_connectivity: jnp.ndarray
) -> jnp.ndarray:
    """The two void angles per bond, concatenated: (2 * n_bonds,).

    Layout matches the reference: all first void angles, then all second.
    """

    v1, v2, _, _ = compute_edge_angles(current_block_nodes, bond_connectivity)
    return jnp.concatenate([v1, v2])


def point_to_edge_distance(point: jnp.ndarray, edge: jnp.ndarray) -> jnp.ndarray:
    """Distance from point(s) to segment(s); broadcast over leading axes.

    Args:
        point: (..., 2).
        edge: (..., 2, 2) segment endpoints.
    """

    x0, x1 = edge[..., 0, :], edge[..., 1, :]
    d = x1 - x0
    p = point - x0
    t = jnp.sum(p * d, axis=-1) / jnp.sum(d * d, axis=-1)
    on_segment = (t >= 0) & (t <= 1)
    d_perp_sq = jnp.sum(p * p, axis=-1) - t**2 * jnp.sum(d * d, axis=-1)
    d_end_sq = jnp.where(
        t < 0,
        jnp.sum(p * p, axis=-1),
        jnp.sum((point - x1) ** 2, axis=-1),
    )
    return jnp.sqrt(jnp.where(on_segment, jnp.maximum(d_perp_sq, 0.0), d_end_sq))


def edges_distance(edge_1: jnp.ndarray, edge_2: jnp.ndarray) -> jnp.ndarray:
    """Minimum distance between two segments, batched (..., 2, 2) -> (...)."""

    d = jnp.stack(
        [
            point_to_edge_distance(edge_2[..., 0, :], edge_1),
            point_to_edge_distance(edge_2[..., 1, :], edge_1),
            point_to_edge_distance(edge_1[..., 0, :], edge_2),
            point_to_edge_distance(edge_1[..., 1, :], edge_2),
        ],
        axis=-1,
    )
    return jnp.min(d, axis=-1)


def build_void_edge_distance(bond_connectivity: jnp.ndarray):
    """Distances between the two facing edge pairs adjacent to each bond.

    Returns a function (n_blocks, V, 2) -> (2 * n_bonds,).
    """

    def void_edge_distance(current_block_nodes: jnp.ndarray) -> jnp.ndarray:
        V = current_block_nodes.shape[-2]
        n1, n2 = bond_connectivity[:, 0], bond_connectivity[:, 1]
        b1, k1 = n1 // V, n1 % V
        b2, k2 = n2 // V, n2 % V

        p1 = current_block_nodes[b1, k1]
        p1_prev = current_block_nodes[b1, (k1 - 1) % V]
        p1_next = current_block_nodes[b1, (k1 + 1) % V]
        p2 = current_block_nodes[b2, k2]
        p2_prev = current_block_nodes[b2, (k2 - 1) % V]
        p2_next = current_block_nodes[b2, (k2 + 1) % V]

        side1 = edges_distance(
            jnp.stack([p1, p1_next], axis=-2), jnp.stack([p2, p2_prev], axis=-2)
        )
        side2 = edges_distance(
            jnp.stack([p1, p1_prev], axis=-2), jnp.stack([p2, p2_next], axis=-2)
        )
        return jnp.concatenate([side1, side2])

    return void_edge_distance


def contact_energy(
    current_void_angles: jnp.ndarray,
    # Plain-float defaults: jnp defaults would create device arrays AT
    # IMPORT TIME, committing the backend before callers can pin a
    # platform (jax.config platform updates only work before first use).
    min_angle=0.0,
    cutoff_angle=2.0 * np.pi / 180,
    k_contact=1.0,
) -> jnp.ndarray:
    """C^1 ~1/x barrier with asymptote at min_angle, zero beyond cutoff.

    With x = (phi - cutoff)/(cutoff - min): E = k/4 (cutoff-min)^2
    (1/(x+1) - 1/(x-1) - 2) on (min, cutoff), else 0.
    """

    span = cutoff_angle - min_angle
    x = (current_void_angles - cutoff_angle) / span
    # Clamp x to the active window before the reciprocals so the inactive
    # branch never produces inf/nan (which would poison gradients through
    # jnp.where). The clamp margin MUST be resolvable in the compute dtype:
    # in f32, -1.0 + 1e-12 rounds to exactly -1.0, so any void angle at or
    # below min_angle divided by zero -> inf in the primal and 0 * inf ->
    # NaN in the where-gradient chain — the root cause of the historical
    # "f32 contact-tunneling NaN" (f64 resolved 1e-12 and crossed the
    # asymptote harmlessly, reference semantics: zero energy below
    # min_angle, /root/reference/difflexmm/energy.py:349-360).
    eps = jnp.finfo(jnp.result_type(x)).eps
    x_safe = jnp.clip(x, -1.0 + 64.0 * eps, 0.0)
    barrier = k_contact / 4 * span**2 * (
        1.0 / (x_safe + 1.0) - 1.0 / (x_safe - 1.0) - 2.0
    )
    active = (current_void_angles >= min_angle) & (current_void_angles < cutoff_angle)
    return jnp.where(active, barrier, 0.0)


def build_contact_energy(bond_connectivity: jnp.ndarray, angle_based: bool = True):
    """Total contact energy as a function of block DOFs and control params.

    Returns ``contact_energy_fn(block_displacement, control_params)``.
    """

    void_edge_distance_fn = build_void_edge_distance(bond_connectivity)

    def gap_fn(current_block_nodes):
        if angle_based:
            return void_angles(current_block_nodes, bond_connectivity)
        return void_edge_distance_fn(current_block_nodes)

    def contact_energy_fn(block_displacement: jnp.ndarray, control_params):
        gp = control_params.geometrical_params
        cp = control_params.mechanical_params.contact_params
        nodes = current_node_positions(
            block_displacement, gp.block_centroids, gp.centroid_node_vectors
        )
        return jnp.sum(
            contact_energy(
                gap_fn(nodes),
                min_angle=cp.min_angle,
                cutoff_angle=cp.cutoff_angle,
                k_contact=cp.k_contact,
            )
        )

    return contact_energy_fn
