"""Geometry layer tests: polygon ops, parametrizations, connectivity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difflexmm_tpu.geometry import (
    KagomeGeometry,
    KagomePeriodicGeometry,
    QuadGeometry,
    RotatedSquareGeometry,
    compute_edge_lengths,
    compute_inertia,
    polygon_area,
    polygon_centroid,
    polygon_polar_moment,
)


def test_polygon_ops_unit_square():
    # Unit square centered at (0.5, 0.5), ccw
    square = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    assert jnp.allclose(polygon_area(square), 1.0)
    assert jnp.allclose(polygon_centroid(square), jnp.array([0.5, 0.5]))
    # Polar moment of a unit square about its centroid: (a^4)/6 = 1/6... for
    # a square side a: Ix + Iy = a^4/12 + a^4/12 = a^4/6
    assert jnp.allclose(polygon_polar_moment(square), 1.0 / 6.0)


def test_polygon_ops_batched():
    key = jax.random.PRNGKey(0)
    # Random convex quads: base square + small jitter
    base = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    jitter = 0.1 * jax.random.normal(key, (7, 4, 2))
    polys = base[None] + jitter
    batched = polygon_centroid(polys)
    looped = jnp.stack([polygon_centroid(p) for p in polys])
    assert jnp.allclose(batched, looped)
    assert jnp.allclose(polygon_area(polys), jnp.stack([polygon_area(p) for p in polys]))


def test_inertia_square_block():
    square = jnp.array([[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]])[::-1]
    inertia = compute_inertia(square[None], density=2.0)
    assert jnp.allclose(inertia[0, 0], 2.0)  # m = rho * area
    assert jnp.allclose(inertia[0, 2], 2.0 / 6.0)  # J = rho * a^4/6


def test_rotated_square_geometry():
    geo = RotatedSquareGeometry(n1_cells=3, n2_cells=2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    angle = 0.3
    centroids = bc(angle)
    vecs = cnv(angle)
    assert centroids.shape == (geo.n_blocks, 2)
    assert vecs.shape == (geo.n_blocks, 4, 2)
    assert geo.n_blocks == 6 * 4 * 1  # (2*3)*(2*2) blocks
    # At angle 0 all node vectors have length (s-l)/2
    vecs0 = cnv(0.0)
    assert jnp.allclose(jnp.linalg.norm(vecs0, axis=-1), 0.45)
    # Bonds connect nodes that coincide up to the bond vector at any angle
    nodes = geo.get_reference_geometry(angle).reshape(geo.n_nodes, 2)
    b = bonds()
    gaps = nodes[b[:, 1]] - nodes[b[:, 0]]
    assert jnp.allclose(gaps, rbv(), atol=1e-12)


def test_quad_geometry_matches_rotated_square():
    """Quad geometry at the rotated-square design reproduces that lattice."""

    angle = 0.25
    n1, n2 = 5, 4
    quad = QuadGeometry(n1_blocks=n1, n2_blocks=n2, spacing=1.0, bond_length=0.1)
    quad.compute_geometry()
    h, v = quad.get_design_from_rotated_square(angle)
    nodes_quad = quad.get_reference_geometry(h, v).reshape(quad.n_nodes, 2)

    # The shift parametrization indexes hinge parity, which mirrors the
    # block parity of RotatedSquareGeometry: the same lattice appears at
    # the opposite angle sign (the two are congruent lattices).
    rs = RotatedSquareGeometry(n1_cells=3, n2_cells=2, spacing=1.0, bond_length=0.1)
    rs.compute_geometry()
    nodes_rs = rs.get_reference_geometry(-angle).reshape(rs.n_nodes, 2)

    # Compare the overlapping 5x4 block window of the 6x4 rotated-square grid
    rs_nodes_grid = nodes_rs.reshape(rs.n2_blocks, rs.n1_blocks, 4, 2)
    window = rs_nodes_grid[:n2, :n1].reshape(-1, 2)
    assert jnp.allclose(nodes_quad, window, atol=1e-10)


def test_quad_geometry_bond_closure():
    quad = QuadGeometry(n1_blocks=4, n2_blocks=3, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = quad.get_parametrization()
    key = jax.random.PRNGKey(1)
    h = 0.05 * jax.random.normal(key, (5, 3, 2))
    v = 0.05 * jax.random.normal(jax.random.PRNGKey(2), (4, 4, 2))
    nodes = quad.get_reference_geometry(h, v).reshape(quad.n_nodes, 2)
    b = bonds()
    gaps = nodes[b[:, 1]] - nodes[b[:, 0]]
    assert jnp.allclose(gaps, rbv(), atol=1e-10)


@pytest.mark.parametrize("cls", [KagomeGeometry, KagomePeriodicGeometry])
def test_kagome_bond_closure(cls):
    geo = cls(n1_cells=3, n2_cells=2, bond_length=0.05)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    if cls is KagomeGeometry:
        design = geo.zero_design()
    else:
        design = (jnp.zeros((3, 2)),)
    nodes = geo.get_reference_geometry(*design).reshape(geo.n_nodes, 2)
    b = bonds()
    gaps = nodes[b[:, 1]] - nodes[b[:, 0]]
    assert jnp.allclose(gaps, rbv(), atol=1e-10)


def test_kagome_free_shift_moves_shared_hinges_together():
    geo = KagomeGeometry(n1_cells=2, n2_cells=2, bond_length=0.05)
    geo.compute_geometry()
    s1, s2, s3 = geo.zero_design()
    s3 = s3.at[0, 0].set(jnp.array([0.07, -0.03]))
    nodes = geo.get_reference_geometry(s1, s2, s3).reshape(geo.n_nodes, 2)
    nodes0 = geo.get_reference_geometry(*geo.zero_design()).reshape(geo.n_nodes, 2)
    moved = jnp.linalg.norm(nodes - nodes0, axis=-1) > 1e-12
    # The internal hinge of cell (0,0) is nodes 1 and 3 of that cell.
    assert bool(moved[1]) and bool(moved[3])
    assert jnp.allclose(nodes[1] - nodes0[1], jnp.array([0.07, -0.03]))
    assert jnp.allclose(nodes[3] - nodes0[3], jnp.array([0.07, -0.03]))


def test_edge_lengths():
    cnv = jnp.array([[[0.5, 0.0], [0.0, 0.5], [-0.5, 0.0], [0.0, -0.5]]])
    lengths = compute_edge_lengths(cnv)
    assert jnp.allclose(lengths, np.sqrt(0.5))


def test_geometry_design_gradients():
    """Design maps must be differentiable (inverse-design prerequisite)."""

    quad = QuadGeometry(n1_blocks=3, n2_blocks=3)
    bc, cnv, _, _ = quad.get_parametrization()

    def f(h):
        v = jnp.zeros((3, 4, 2))
        return jnp.sum(cnv(h, v) ** 2) + jnp.sum(bc(h, v) ** 2)

    g = jax.grad(f)(jnp.ones((4, 3, 2)) * 0.01)
    assert g.shape == (4, 3, 2)
    assert jnp.all(jnp.isfinite(g))
