"""Batched polygon utilities.

All functions operate on arbitrarily-batched vertex arrays ``(..., V, 2)``
with vertices ordered counter-clockwise, using broadcasting only — no vmap,
no per-polygon Python — so they fuse into surrounding XLA programs on TPU.

Behavioral parity with the reference polygon ops
(reference: difflexmm/geometry.py:71-160).
"""

from typing import Tuple, Union

import jax.numpy as jnp


def _shoelace_cross(vertices: jnp.ndarray) -> jnp.ndarray:
    """Per-edge cross products v_{i-1} x v_i, shape (..., V)."""

    prev_v = jnp.roll(vertices, shift=1, axis=-2)
    return prev_v[..., 0] * vertices[..., 1] - prev_v[..., 1] * vertices[..., 0]


def polygon_area(vertices: jnp.ndarray) -> jnp.ndarray:
    """Area of each polygon. Input (..., V, 2) -> output (...)."""

    return jnp.abs(jnp.sum(_shoelace_cross(vertices), axis=-1) / 2)


def polygon_centroid(vertices: jnp.ndarray) -> jnp.ndarray:
    """Centroid of each polygon. Input (..., V, 2) -> output (..., 2)."""

    cross = _shoelace_cross(vertices)  # (..., V)
    area = jnp.sum(cross, axis=-1) / 2  # signed
    prev_v = jnp.roll(vertices, shift=1, axis=-2)
    sums = jnp.sum((prev_v + vertices) * cross[..., None], axis=-2)  # (..., 2)
    return sums / (6 * area[..., None])


def polygon_polar_moment(vertices: jnp.ndarray) -> jnp.ndarray:
    """Polar second moment of area about the centroid. (..., V, 2) -> (...)."""

    centroid = polygon_centroid(vertices)
    v2 = vertices - centroid[..., None, :]
    v1 = jnp.roll(v2, shift=1, axis=-2)
    cross = v1[..., 0] * v2[..., 1] - v1[..., 1] * v2[..., 0]
    quad = (
        v1[..., 0] ** 2 + v1[..., 0] * v2[..., 0] + v2[..., 0] ** 2
        + v1[..., 1] ** 2 + v1[..., 1] * v2[..., 1] + v2[..., 1] ** 2
    )
    return jnp.abs(jnp.sum(cross * quad, axis=-1) / 12)


def polygons_geometric_properties(
    vertices: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Centroids, areas, and polar moments for a batch of polygons."""

    return (
        polygon_centroid(vertices),
        polygon_area(vertices),
        polygon_polar_moment(vertices),
    )


def compute_inertia(
    vertices: jnp.ndarray, density: Union[jnp.ndarray, float]
) -> jnp.ndarray:
    """Translational + rotational inertia of each block from its polygon.

    Args:
        vertices: (n_blocks, V, 2) centroid-to-node vectors (or any polygon
            representation — only shape matters, moments are centroidal).
        density: scalar or (n_blocks,) mass density.

    Returns:
        (n_blocks, 3): [m, m, J] per block.
    """

    areas = polygon_area(vertices)
    moments = polygon_polar_moment(vertices)
    m = density * areas
    J = density * moments
    return jnp.stack([m, m, J], axis=-1)


def compute_edge_lengths(centroid_node_vectors: jnp.ndarray) -> jnp.ndarray:
    """Edge lengths of each block polygon. (n_blocks, V, 2) -> (n_blocks, V)."""

    edges = jnp.roll(centroid_node_vectors, 1, axis=-2) - centroid_node_vectors
    return jnp.linalg.norm(edges, axis=-1)


def signed_angle(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Signed angle from u1 to u2 (ccw positive), batched over leading axes.

    Inputs (..., 2); output (...) in [-pi, pi].
    """

    from difflexmm_tpu.ops.mathx import arctan2

    cross = u1[..., 0] * u2[..., 1] - u1[..., 1] * u2[..., 0]
    dot = u1[..., 0] * u2[..., 0] + u1[..., 1] * u2[..., 1]
    return arctan2(cross, dot)


def compute_xy_limits(points: jnp.ndarray) -> jnp.ndarray:
    """[[xmin, xmax], [ymin, ymax]] for a point set (n, 2)."""

    return jnp.stack([points.min(axis=0), points.max(axis=0)]).T
