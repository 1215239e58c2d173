"""Laser-cut drawing generation for metamaterial samples (SVG output).

Two complementary tool sets:

1. *Void/perimeter cutting* (original design, quad lattices): interior void
   outlines and outer perimeter for finite-width-ligament samples
   (``void_outlines_quad`` / ``outer_boundary_quad``).
2. *Layered cut drawings* (full parity with the reference's fabrication
   tooling, /root/reference/scripts/fabrication.py:28-1253): block
   outlines, hinge slot lines (straight / centroid / bisectrix), chamfers,
   central marker holes, continuous 3d-print bond paths, shim sheets,
   tensile grips, and breadboard-clamped samples with corner attachments.
   The reference renders matplotlib collections to files; here every
   generator returns plain numpy primitives collected into a layered
   :class:`Drawing` that serializes to SVG directly (no matplotlib,
   no shapely — the clamp attachment union is an exact convex-polygon
   arrangement union implemented below).

Generators are geometry-agnostic wherever the reference's are: anything
taking ``(block_centroids, centroid_node_vectors, bond_connectivity, ...)``
works for quad, rotated-square, and kagome parametrizations alike (kagome
lattice drawings come for free, unlike the reference where they lived in
notebooks).

Coordinates are in lattice units; SVG writers scale to mm.
"""

from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

#: Layer palette, mirroring the reference's cut-color conventions
#: (scripts/fabrication.py:19-25).
LAYER_COLORS = {
    "block": "black",
    "grip": "blue",
    "slot": "red",
    "chamfer": "blue",
    "shim": "black",
    "hole": "green",
}


def _perp(v: np.ndarray) -> np.ndarray:
    """90-degree ccw rotation, unit length."""

    p = np.stack([-v[..., 1], v[..., 0]], axis=-1)
    return p / (np.linalg.norm(p, axis=-1, keepdims=True) + 1e-30)


def _grid_nodes(geometry, design) -> np.ndarray:
    """Absolute node positions as (n2, n1, 4, 2)."""

    nodes = np.asarray(geometry.get_reference_geometry(*design))
    return nodes.reshape(geometry.n2_blocks, geometry.n1_blocks, 4, 2)


def ligament_flank(node_a: np.ndarray, node_b: np.ndarray, width: float,
                   side: int) -> np.ndarray:
    """The two endpoints of one flank of the ligament a->b.

    ``side=+1`` offsets along the ccw perpendicular of (b - a).
    """

    direction = node_b - node_a
    offset = side * 0.5 * width * _perp(direction)
    return np.stack([node_a + offset, node_b + offset])


def void_outlines_quad(geometry, design, ligament_width: float) -> List[np.ndarray]:
    """Closed polygons of all interior voids of a designed quad lattice.

    Each void at grid position (i+1/2, j+1/2) is bounded ccw by: the upper
    flank of the bottom horizontal ligament, the bond-side edge of the right
    block, the left flank of the right vertical ligament (traversed toward
    the top), the bond-side edge of the top-right block, etc. Consecutive
    flank endpoints are joined by straight block-edge segments, which is
    exact for straight-edged blocks.
    """

    nodes = _grid_nodes(geometry, design)
    n2, n1 = nodes.shape[:2]
    w = ligament_width
    voids = []
    for j in range(n2 - 1):
        for i in range(n1 - 1):
            b00 = nodes[j, i]
            b10 = nodes[j, i + 1]
            b11 = nodes[j + 1, i + 1]
            b01 = nodes[j + 1, i]
            # Bonds around the void (corner conventions: 0 right, 1 top,
            # 2 left, 3 bottom).
            bottom = ligament_flank(b00[0], b10[2], w, +1)   # upper flank
            right = ligament_flank(b10[1], b11[3], w, +1)    # left flank
            top = ligament_flank(b11[2], b01[0], w, +1)      # lower flank
            left = ligament_flank(b01[3], b00[1], w, +1)     # right flank
            voids.append(np.concatenate([bottom, right, top, left]))
    return voids


def outer_boundary_quad(geometry, design, ligament_width: float) -> np.ndarray:
    """Closed ccw polygon of the sample's outer perimeter."""

    nodes = _grid_nodes(geometry, design)
    n2, n1 = nodes.shape[:2]
    w = ligament_width
    path = []

    # Bottom edge, left to right.
    for i in range(n1):
        block = nodes[0, i]
        path.extend([block[2], block[3], block[0]])
        if i < n1 - 1:
            path.extend(ligament_flank(block[0], nodes[0, i + 1][2], w, -1))
    # Right edge, bottom to top.
    for j in range(n2):
        block = nodes[j, n1 - 1]
        path.extend([block[3], block[0], block[1]])
        if j < n2 - 1:
            path.extend(ligament_flank(block[1], nodes[j + 1, n1 - 1][3], w, -1))
    # Top edge, right to left.
    for i in range(n1 - 1, -1, -1):
        block = nodes[n2 - 1, i]
        path.extend([block[0], block[1], block[2]])
        if i > 0:
            path.extend(
                ligament_flank(block[2], nodes[n2 - 1, i - 1][0], w, -1)
            )
    # Left edge, top to bottom.
    for j in range(n2 - 1, -1, -1):
        block = nodes[j, 0]
        path.extend([block[1], block[2], block[3]])
        if j > 0:
            path.extend(ligament_flank(block[3], nodes[j - 1, 0][1], w, -1))

    return np.asarray(path)


def chamfer_polygon(vertices: np.ndarray, chamfer: float) -> np.ndarray:
    """Cut each corner of a polygon at distance ``chamfer`` along both edges.

    Mirrors the reference's corner chamfering for stress relief at the cut
    corners (scripts/fabrication.py:28-74's purpose).
    """

    vertices = np.asarray(vertices)
    n = len(vertices)
    out = []
    for k in range(n):
        prev_v = vertices[(k - 1) % n]
        cur = vertices[k]
        next_v = vertices[(k + 1) % n]
        d_prev = prev_v - cur
        d_next = next_v - cur
        lp = np.linalg.norm(d_prev)
        ln = np.linalg.norm(d_next)
        c = min(chamfer, 0.49 * lp, 0.49 * ln)
        out.append(cur + d_prev / lp * c)
        out.append(cur + d_next / ln * c)
    return np.asarray(out)


def write_svg(
    paths: Sequence[np.ndarray],
    filename: Union[str, Path],
    units_to_mm: float = 10.0,
    stroke_mm: float = 0.1,
) -> Path:
    """Write closed cut paths to an SVG file (one path element each)."""

    paths = [np.asarray(p) * units_to_mm for p in paths]
    all_points = np.concatenate(paths)
    lo = all_points.min(axis=0) - 5
    hi = all_points.max(axis=0) + 5
    size = hi - lo

    def path_d(p):
        # SVG y axis points down; flip for a natural drawing orientation.
        coords = [(x - lo[0], hi[1] - y) for x, y in p]
        body = " L ".join(f"{x:.4f},{y:.4f}" for x, y in coords)
        return f"M {body} Z"

    elements = "\n".join(
        f'  <path d="{path_d(p)}" fill="none" stroke="black" '
        f'stroke-width="{stroke_mm}"/>'
        for p in paths
    )
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{size[0]:.2f}mm" height="{size[1]:.2f}mm" '
        f'viewBox="0 0 {size[0]:.4f} {size[1]:.4f}">\n'
        f"{elements}\n</svg>\n"
    )
    filename = Path(filename)
    filename.parent.mkdir(parents=True, exist_ok=True)
    filename.write_text(svg)
    return filename


def fabrication_drawing_quad(
    geometry,
    design,
    ligament_width: float = 0.05,
    chamfer: float = 0.0,
    filename: Union[str, Path] = "sample.svg",
    units_to_mm: float = 10.0,
) -> Path:
    """Full laser-cut drawing of a designed quad lattice: outer perimeter +
    all interior void cutouts, optionally chamfered."""

    voids = void_outlines_quad(geometry, design, ligament_width)
    outer = outer_boundary_quad(geometry, design, ligament_width)
    if chamfer > 0:
        voids = [chamfer_polygon(v, chamfer) for v in voids]
        outer = chamfer_polygon(outer, chamfer)
    return write_svg([outer, *voids], filename, units_to_mm=units_to_mm)


# ===========================================================================
# Layered cut drawings (reference scripts/fabrication.py parity)
# ===========================================================================


@dataclass
class Drawing:
    """A layered 2D cut drawing: polygons, polylines and circles tagged with
    a layer name that maps to a cut color (LAYER_COLORS)."""

    polygons: List[Tuple[np.ndarray, str]] = field(default_factory=list)
    polylines: List[Tuple[np.ndarray, str]] = field(default_factory=list)
    circles: List[Tuple[np.ndarray, float, str]] = field(default_factory=list)

    def add_polygons(self, polys: Sequence[np.ndarray], layer: str) -> None:
        for p in polys:
            self.polygons.append((np.asarray(p, dtype=float), layer))

    def add_polylines(self, lines: Sequence[np.ndarray], layer: str) -> None:
        for l in lines:
            self.polylines.append((np.asarray(l, dtype=float), layer))

    def add_circles(
        self, centers: np.ndarray, radius: float, layer: str
    ) -> None:
        for c in np.atleast_2d(np.asarray(centers, dtype=float)):
            self.circles.append((c, float(radius), layer))

    def bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        pts = [p for p, _ in self.polygons] + [l for l, _ in self.polylines]
        pts = [np.asarray(p).reshape(-1, 2) for p in pts]
        pts += [
            np.asarray([c - r, c + r]) for c, r, _ in self.circles
        ]
        allp = np.concatenate(pts) if pts else np.zeros((1, 2))
        return allp.min(axis=0), allp.max(axis=0)

    def save_svg(
        self,
        filename: Union[str, Path],
        units_to_mm: float = 1.0,
        stroke_mm: float = 0.1,
        margin_mm: float = 5.0,
    ) -> Path:
        s = units_to_mm
        lo, hi = self.bounds()
        lo, hi = lo * s - margin_mm, hi * s + margin_mm
        size = hi - lo

        def xy(p):
            return p[0] * s - lo[0], hi[1] - p[1] * s

        def path_d(pts, closed):
            body = " L ".join("%.4f,%.4f" % xy(p) for p in pts)
            return f"M {body}" + (" Z" if closed else "")

        el = []
        for pts, layer in self.polygons:
            el.append(
                f'  <path d="{path_d(pts, True)}" fill="none" '
                f'stroke="{LAYER_COLORS.get(layer, "black")}" '
                f'stroke-width="{stroke_mm}"/>'
            )
        for pts, layer in self.polylines:
            el.append(
                f'  <path d="{path_d(pts, False)}" fill="none" '
                f'stroke="{LAYER_COLORS.get(layer, "black")}" '
                f'stroke-width="{stroke_mm}"/>'
            )
        for c, r, layer in self.circles:
            cx, cy = xy(c)
            el.append(
                f'  <circle cx="{cx:.4f}" cy="{cy:.4f}" r="{r * s:.4f}" '
                f'fill="none" stroke="{LAYER_COLORS.get(layer, "black")}" '
                f'stroke-width="{stroke_mm}"/>'
            )
        svg = (
            f'<svg xmlns="http://www.w3.org/2000/svg" '
            f'width="{size[0]:.2f}mm" height="{size[1]:.2f}mm" '
            f'viewBox="0 0 {size[0]:.4f} {size[1]:.4f}">\n'
            + "\n".join(el)
            + "\n</svg>\n"
        )
        filename = Path(filename)
        filename.parent.mkdir(parents=True, exist_ok=True)
        filename.write_text(svg)
        return filename


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=float)


def block_polygons(block_centroids, centroid_node_vectors) -> np.ndarray:
    """Absolute block outlines, (n_blocks, n_npb, 2). Any geometry family."""

    return _np(centroid_node_vectors) + _np(block_centroids)[:, None, :]


def slot_lines(
    block_centroids,
    centroid_node_vectors,
    bond_connectivity,
    reference_bond_vectors,
    slot_size: float,
    slot_type: str = "straight",
) -> np.ndarray:
    """Hinge slot cut lines, one polyline per bond.

    ``straight``: the bond segment extended by ``slot_size`` along the
    reference bond direction at both ends. ``centroid``: 4-point polyline
    whose outer points step ``slot_size`` from each node toward its block
    centroid. ``bisectrix``: outer points step along the corner-angle
    bisector of each node's block polygon. Parity:
    /root/reference/scripts/fabrication.py:75-204.
    """

    bc = _np(block_centroids)
    cnv = _np(centroid_node_vectors)
    bonds = np.asarray(bond_connectivity)
    n_blocks, n_npb, _ = cnv.shape
    nodes = block_polygons(bc, cnv).reshape(n_blocks * n_npb, 2)
    ends = nodes[bonds]  # (n_bonds, 2, 2)

    if slot_type == "straight":
        rbv = _np(reference_bond_vectors)
        u = rbv / np.linalg.norm(rbv, axis=-1, keepdims=True)
        return np.stack(
            [ends[:, 0] - slot_size * u, ends[:, 1] + slot_size * u], axis=1
        )

    if slot_type == "centroid":
        cnv_flat = cnv.reshape(n_blocks * n_npb, 2)[bonds]
        u = cnv_flat / np.linalg.norm(cnv_flat, axis=-1, keepdims=True)
        outer = ends - slot_size * u
        return np.stack(
            [outer[:, 0], ends[:, 0], ends[:, 1], outer[:, 1]], axis=1
        )

    if slot_type == "bisectrix":
        # Outward bisector of the block corner at each bonded node.
        edge = np.roll(cnv, 1, axis=1) - cnv  # corner -> previous corner
        edge_u = edge / np.linalg.norm(edge, axis=-1, keepdims=True)

        def bisector(node_ids):
            b_ids, c_ids = node_ids // n_npb, node_ids % n_npb
            u1 = -edge_u[b_ids, c_ids]
            u2 = edge_u[b_ids, (c_ids + 1) % n_npb]
            cross = u1[:, 0] * u2[:, 1] - u1[:, 1] * u2[:, 0]
            s = u1 + u2
            s_norm = np.linalg.norm(s, axis=-1, keepdims=True)
            with np.errstate(invalid="ignore", divide="ignore"):
                bis = s / s_norm * np.sign(cross)[:, None]
            flat = np.stack([-u2[:, 1], u2[:, 0]], axis=-1)
            return np.where((cross == 0)[:, None], flat, bis)

        u0 = bisector(bonds[:, 0])
        u1 = bisector(bonds[:, 1])
        outer0 = ends[:, 0] + slot_size * u0
        outer1 = ends[:, 1] + slot_size * u1
        return np.stack([outer0, ends[:, 0], ends[:, 1], outer1], axis=1)

    raise ValueError(f"Unknown slot_type: {slot_type!r}")


def chamfer_lines(
    block_centroids,
    centroid_node_vectors,
    bond_connectivity,
    reference_bond_vectors,
    chamfer_depth: float,
) -> np.ndarray:
    """Stress-relief chamfer cut lines orthogonal to the bond direction at
    every bonded block corner (reference scripts/fabrication.py:28-74)."""

    bc = _np(block_centroids)
    cnv = _np(centroid_node_vectors)
    bonds = np.asarray(bond_connectivity)
    rbv = _np(reference_bond_vectors)
    n_blocks, n_npb, _ = cnv.shape
    blocks = block_polygons(bc, cnv)

    # First bond touching each node defines its chamfer director.
    director = {}
    for bond_id, (a, b) in enumerate(bonds):
        for node_id in (int(a), int(b)):
            if node_id not in director:
                v = rbv[bond_id]
                director[node_id] = v / np.linalg.norm(v)

    lines = []
    for node_id in sorted(director):
        d = director[node_id]
        block_id, corner = node_id // n_npb, node_id % n_npb
        node = blocks[block_id, corner]
        prev_v = blocks[block_id, corner - 1] - node
        next_v = blocks[block_id, (corner + 1) % n_npb] - node
        pts = []
        for edge in (prev_v, next_v):
            ln = np.linalg.norm(edge)
            cos = abs(np.dot(edge, d)) / ln
            pts.append(node + edge / ln * chamfer_depth / max(cos, 1e-12))
        lines.append(np.stack(pts))
    return np.asarray(lines)


def central_holes(
    block_centroids,
    hole_size: float,
    hole_type: str = "circle",
    orientation=0.0,
):
    """Marker/registration holes at block centroids: ``circle`` -> (centers,
    radius); ``square`` -> (n_blocks, 4, 2) polygons, rotated by
    ``orientation`` (scalar or per-block, radians)."""

    bc = _np(block_centroids)
    if hole_type == "circle":
        return bc, hole_size / 2
    if hole_type == "square":
        ang = np.broadcast_to(_np(orientation), (len(bc),))
        c, s = np.cos(ang), np.sin(ang)
        corners = hole_size / 2 * np.array(
            [[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=float
        )
        rot = np.stack(
            [np.stack([c, -s], -1), np.stack([s, c], -1)], axis=-2
        )  # (n, 2, 2)
        return bc[:, None, :] + np.einsum("nij,kj->nki", rot, corners)
    raise ValueError(f"Unknown hole_type: {hole_type!r}")


def shim_outlines(
    n_shims: int,
    length: float,
    width: float,
    hole_size: float,
    n_rows: int = 1,
):
    """Hinge-shim sheet: ``n_shims`` rectangles in ``n_rows`` rows, each with
    4 bolt holes at 10%/90% height and 25%/75% width (reference
    scripts/fabrication.py:458-515). Returns (rect polygons, hole centers,
    hole radius)."""

    rects, holes = [], []
    cols = [n_shims // n_rows] * (n_rows - 1) + [
        n_shims // n_rows + n_shims % n_rows
    ]
    for i in range(n_rows):
        for j in range(cols[i]):
            x0, y0 = j * 1.1 * width, i * 1.1 * length
            rects.append(
                np.array(
                    [
                        [x0, y0],
                        [x0 + width, y0],
                        [x0 + width, y0 + length],
                        [x0, y0 + length],
                    ]
                )
            )
            for fx in (0.25, 0.75):
                for fy in (0.1, 0.9):
                    holes.append([x0 + fx * width, y0 + fy * length])
    return np.asarray(rects), np.asarray(holes), hole_size / 2


def grip_outlines(
    xlim,
    ylim,
    hinge_length: float,
    grip_width: float,
    grip_lateral_spacing: float,
    hole_size: Optional[float] = None,
):
    """Top and bottom tensile-grip outlines around a sample bounding box,
    plus optional bolt holes (reference scripts/fabrication.py:517-604:
    two interlocking L-shaped grips offset by ``hinge_length`` vertically
    and ``grip_lateral_spacing`` laterally)."""

    xlim, ylim = _np(xlim), _np(ylim)
    e1, e2 = np.eye(2)
    t_tr = np.array([xlim[1], ylim[1]]) + hinge_length * e2
    t_tl = (
        np.array([xlim[0], ylim[1]])
        + hinge_length * e2
        - grip_lateral_spacing * e1
    )
    t_bl = np.array([xlim[0], ylim[0]]) - grip_lateral_spacing * e1
    grip_top = np.array(
        [
            t_tr,
            t_tr + grip_width * e2,
            t_tl - grip_width * e1 + grip_width * e2,
            t_bl - grip_width * e1,
            t_bl,
            t_tl,
        ]
    )
    b_tr = np.array([xlim[1], ylim[1]]) + grip_lateral_spacing * e1
    b_br = (
        np.array([xlim[1], ylim[0]])
        - hinge_length * e2
        + grip_lateral_spacing * e1
    )
    b_bl = np.array([xlim[0], ylim[0]]) - hinge_length * e2
    grip_bottom = np.array(
        [
            b_tr,
            b_br,
            b_bl,
            b_bl - grip_width * e2,
            b_br + grip_width * e1 - grip_width * e2,
            b_tr + grip_width * e1,
        ]
    )
    grips = np.stack([grip_top, grip_bottom])
    if hole_size is None:
        return grips, None, None
    xm, ym = xlim.mean(), ylim.mean()
    holes = np.array(
        [
            [xm + 20.0, ylim[1] + hinge_length + 0.6 * grip_width],
            [xm - 20.0, ylim[1] + hinge_length + 0.6 * grip_width],
            [xm + 20.0, ylim[0] - hinge_length - 0.6 * grip_width],
            [xm - 20.0, ylim[0] - hinge_length - 0.6 * grip_width],
            [xlim[0] - grip_lateral_spacing - 0.5 * grip_width, ym + 20.0],
            [xlim[0] - grip_lateral_spacing - 0.5 * grip_width, ym - 20.0],
            [xlim[1] + grip_lateral_spacing + 0.5 * grip_width, ym + 20.0],
            [xlim[1] + grip_lateral_spacing + 0.5 * grip_width, ym - 20.0],
        ]
    )
    return grips, holes, hole_size / 2


# ---------------------------------------------------------------------------
# Exact polygon union (replaces the reference's shapely.unary_union for the
# clamp corner attachments; shapely is not a dependency here)
# ---------------------------------------------------------------------------


def _ensure_ccw(poly: np.ndarray) -> np.ndarray:
    x, y = poly[:, 0], poly[:, 1]
    area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return poly if area2 >= 0 else poly[::-1]


def _points_in_polygon(points: np.ndarray, poly: np.ndarray, eps: float):
    """Strict interior test (boundary counts as outside within eps)."""

    a = poly
    b = np.roll(poly, -1, axis=0)
    # Winding via crossing number on each edge.
    px = points[:, None, 0]
    py = points[:, None, 1]
    cond = (a[None, :, 1] <= py) != (b[None, :, 1] <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = a[None, :, 0] + (py - a[None, :, 1]) / (
            b[None, :, 1] - a[None, :, 1]
        ) * (b[None, :, 0] - a[None, :, 0])
    inside = np.sum(cond & (px < xint), axis=1) % 2 == 1
    # Distance to boundary: points within eps of any edge are "not inside".
    ab = b - a
    ap = points[:, None, :] - a[None, :, :]
    t = np.clip(
        np.einsum("pek,ek->pe", ap, ab)
        / np.maximum(np.einsum("ek,ek->e", ab, ab), 1e-30),
        0.0,
        1.0,
    )
    close = points[:, None, :] - (a[None, :, :] + t[..., None] * ab[None, :, :])
    dist = np.sqrt(np.einsum("pek,pek->pe", close, close)).min(axis=1)
    return inside & (dist > eps)


def _inflate_convex(poly: np.ndarray, delta: float) -> np.ndarray:
    """Offset a convex ccw polygon outward by ``delta`` (miter joins):
    shift every edge along its outward normal and intersect consecutive
    edge lines."""

    a = poly
    b = np.roll(poly, -1, axis=0)
    d = b - a
    n = np.stack([d[:, 1], -d[:, 0]], axis=-1)  # outward normal of ccw edge
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    a_off = a + delta * n
    d_prev = np.roll(d, 1, axis=0)
    a_prev = np.roll(a_off, 1, axis=0)
    # Vertex k = intersection of edge line k-1 and edge line k.
    denom = d_prev[:, 0] * d[:, 1] - d_prev[:, 1] * d[:, 0]
    diff = a_off - a_prev
    t = (diff[:, 0] * d[:, 1] - diff[:, 1] * d[:, 0]) / np.where(
        np.abs(denom) < 1e-30, 1.0, denom
    )
    verts = a_prev + t[:, None] * d_prev
    # Collinear consecutive edges: fall back to the offset vertex itself.
    return np.where(
        (np.abs(denom) < 1e-30)[:, None], a_off, verts
    )


def polygon_union_outline(
    polys: Sequence[np.ndarray], eps: float = 1e-9
) -> np.ndarray:
    """Exterior outline of the union of overlapping convex polygons.

    Segment-arrangement union: every polygon edge is split at its
    intersections with all other polygons' edges; sub-segments whose
    midpoint lies strictly inside another polygon are discarded; the
    survivors are chained into closed loops and the loop with the largest
    area is the exterior. Inputs are first inflated by a per-polygon
    sub-kerf amount (~1e-7 of the drawing scale, staggered so no two
    polygons grow identically) — a simulation-of-simplicity step that turns
    point contacts, shared edges, and coincident geometry into generic
    crossings, exactly the cases shapely's unary_union resolves for the
    reference (scripts/fabrication.py:806-815).
    """

    polys = [_ensure_ccw(_np(p)) for p in polys]
    scale = max(
        float(np.abs(np.concatenate(polys)).max()), 1.0
    )
    tol = eps * scale
    polys = [
        _inflate_convex(p, scale * 1e-7 * (1.0 + 0.37 * i))
        for i, p in enumerate(polys)
    ]

    pieces = []  # (segment start, segment end, owner polygon index)
    for pi, poly in enumerate(polys):
        a_all, b_all = poly, np.roll(poly, -1, axis=0)
        others = [
            (a2, np.roll(p2, -1, axis=0))
            for qi, p2 in enumerate(polys)
            if qi != pi
            for a2 in [p2]
        ]
        for a, b in zip(a_all, b_all):
            ts = [0.0, 1.0]
            d = b - a
            for a2, b2 in others:
                d2 = b2 - a2
                denom = d[0] * d2[:, 1] - d[1] * d2[:, 0]
                diff = a2 - a
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = (diff[:, 0] * d2[:, 1] - diff[:, 1] * d2[:, 0]) / denom
                    s = (diff[:, 0] * d[1] - diff[:, 1] * d[0]) / denom
                ok = (
                    np.isfinite(t)
                    & np.isfinite(s)
                    & (t > 0)
                    & (t < 1)
                    & (s >= 0)
                    & (s <= 1)
                )
                ts.extend(t[ok].tolist())
            ts = np.unique(np.asarray(ts))
            mids = a + (ts[:-1] + ts[1:])[:, None] / 2 * d
            keep = np.ones(len(mids), dtype=bool)
            for qi, p2 in enumerate(polys):
                if qi == pi:
                    continue
                keep &= ~_points_in_polygon(mids, p2, tol)
            for k in np.nonzero(keep)[0]:
                pieces.append((a + ts[k] * d, a + ts[k + 1] * d))

    # Chain surviving segments into loops by endpoint proximity.
    starts = np.array([p[0] for p in pieces])
    ends = np.array([p[1] for p in pieces])
    used = np.zeros(len(pieces), dtype=bool)
    loops = []
    for seed in range(len(pieces)):
        if used[seed]:
            continue
        loop = [starts[seed], ends[seed]]
        used[seed] = True
        while True:
            d2 = np.einsum(
                "nk,nk->n", starts - loop[-1], starts - loop[-1]
            )
            d2[used] = np.inf
            nxt = int(np.argmin(d2))
            if not np.isfinite(d2[nxt]) or d2[nxt] > (10 * tol + 1e-12) ** 2:
                break
            used[nxt] = True
            loop.append(ends[nxt])
            if np.linalg.norm(loop[-1] - loop[0]) <= 10 * tol + 1e-12:
                loop.pop()
                loops.append(np.asarray(loop))
                break
        else:  # pragma: no cover
            pass

    if not loops:
        raise ValueError("polygon union produced no closed outline")

    def loop_area(lp):
        x, y = lp[:, 0], lp[:, 1]
        return abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2

    outline = max(loops, key=loop_area)
    # Drop collinear interior vertices introduced by the splitting.
    prev_v = np.roll(outline, 1, axis=0)
    next_v = np.roll(outline, -1, axis=0)
    cross = np.abs(
        (outline[:, 0] - prev_v[:, 0]) * (next_v[:, 1] - outline[:, 1])
        - (outline[:, 1] - prev_v[:, 1]) * (next_v[:, 0] - outline[:, 0])
    )
    return _ensure_ccw(outline[cross > tol * 10])


# ---------------------------------------------------------------------------
# Continuous bond paths (3d-printed samples)
# ---------------------------------------------------------------------------


def continuous_bond_lines(
    block_centroids,
    centroid_node_vectors,
    bond_connectivity,
    reference_bond_vectors,
    n1_blocks: int,
    n2_blocks: int,
    offset_type: str = "constant",
    offset_size: float = 0.0,
    path_orientation: str = "column",
) -> List[np.ndarray]:
    """Continuous hinge/bond cutting path for quad-family lattices.

    Behavioral parity with the reference's continuous-bond generator
    (scripts/fabrication.py:207-293): each bond becomes a 4-point polyline
    extended toward the block centroids by ``offset_size`` (a fixed length,
    or a fraction of the centroid-node distance with
    ``offset_type='ratio'``); within each block the four shifted corner
    points are joined pairwise, alternating orientation by lattice column
    (or row) so consecutive cuts form one continuous serpentine; boundary
    nodes get outward stubs whose tips are chained into a closed outer
    path. Corner conventions: 0 right, 1 top, 2 left, 3 bottom.

    Intentional divergence: the reference builds its parity list with an
    ``for n1 ... for n2`` loop (scripts/fabrication.py:248-252) but zips it
    against the row-major (column-fastest) block ordering, so on non-square
    lattices its 'column' orientation alternates by ``block_id //
    n2_blocks`` — neither pure column nor row parity. Here the parity is
    computed from the block's actual lattice column ``block_id % n1_blocks``
    (or row, for ``path_orientation='row'``), which is the intended
    serpentine; tests pin this pairing
    (tests/test_fabrication_tracking.py::test_continuous_bond_serpentine_pairing).
    """

    bc = _np(block_centroids)
    cnv = _np(centroid_node_vectors)
    bonds = np.asarray(bond_connectivity)
    rbv = _np(reference_bond_vectors)
    n_blocks, n_npb, _ = cnv.shape
    if n_npb != 4:
        raise ValueError("continuous bond paths require 4-node blocks")
    nodes = block_polygons(bc, cnv)
    flat_nodes = nodes.reshape(n_blocks * n_npb, 2)
    cnv_flat = cnv.reshape(n_blocks * n_npb, 2)

    if offset_type == "ratio":
        shift = offset_size * cnv_flat
    elif offset_type == "constant":
        shift = offset_size * (
            cnv_flat / np.linalg.norm(cnv_flat, axis=-1, keepdims=True)
        )
    else:
        raise ValueError(f"Unknown offset_type: {offset_type!r}")
    shifted = flat_nodes - shift  # corner points stepped toward centroids

    lines: List[np.ndarray] = []
    # Bond lines: shifted0 -> node0 -> node1 -> shifted1.
    ends = flat_nodes[bonds]
    outer = shifted[bonds]
    for k in range(len(bonds)):
        lines.append(
            np.stack([outer[k, 0], ends[k, 0], ends[k, 1], outer[k, 1]])
        )

    # Internal serpentine segments on the shifted corners of each block.
    shifted_blocks = shifted.reshape(n_blocks, n_npb, 2)
    for block_id in range(n_blocks):
        i, j = block_id % n1_blocks, block_id // n1_blocks
        parity = (i if path_orientation == "column" else j) % 2
        pairs = ((0, 1), (2, 3)) if parity == 0 else ((0, 3), (1, 2))
        for a, b in pairs:
            lines.append(shifted_blocks[block_id][np.array([a, b])])

    # Boundary stubs + closed outer chain of their tips.
    horiz = rbv[np.abs(rbv[:, 0]) >= np.abs(rbv[:, 1])]
    vert = rbv[np.abs(rbv[:, 1]) > np.abs(rbv[:, 0])]
    out_h = 3 * (horiz.mean(axis=0) if len(horiz) else np.array([1.0, 0.0]))
    out_v = 3 * (vert.mean(axis=0) if len(vert) else np.array([0.0, 1.0]))

    sides = {
        "bottom": (np.arange(n1_blocks), 3, -out_v),
        "top": ((n2_blocks - 1) * n1_blocks + np.arange(n1_blocks), 1, out_v),
        "left": (np.arange(n2_blocks) * n1_blocks, 2, -out_h),
        "right": (n1_blocks - 1 + np.arange(n2_blocks) * n1_blocks, 0, out_h),
    }
    tips = {}
    for name, (block_ids, corner, stub) in sides.items():
        side_tips = []
        for block_id in block_ids:
            node = nodes[block_id, corner]
            tip = node + stub
            lines.append(
                np.stack([shifted_blocks[block_id, corner], node, tip])
            )
            side_tips.append(tip)
        tips[name] = side_tips

    def pair_up(side_tips):
        """Join alternating consecutive tip pairs: (0,1), (2,3), ... Each
        tip then has degree <= 2 (its stub + at most one closure), keeping
        the whole drawing traceable as ONE continuous cut path — the
        reference's closure scheme (scripts/fabrication.py:281-293)."""

        return [
            np.stack([side_tips[k], side_tips[k + 1]])
            for k in range(0, len(side_tips) - 1, 2)
        ]

    # Bottom/right skip their first and last tips; top/left pair them all;
    # one two-segment corner piece joins the bottom-right corner's two
    # dangling tips around the corner.
    lines.extend(pair_up(tips["bottom"][1:-1]))
    lines.extend(pair_up(tips["right"][1:-1]))
    lines.extend(pair_up(tips["top"]))
    lines.extend(pair_up(tips["left"]))
    corner_bottom, corner_right = tips["bottom"][-1], tips["right"][0]
    lines.append(
        np.stack([
            corner_bottom,
            np.array([corner_right[0], corner_bottom[1]]),
            corner_right,
        ])
    )
    return lines


# ---------------------------------------------------------------------------
# Drawing-level generators (SVG out)
# ---------------------------------------------------------------------------


def _add_holes(drawing, block_centroids, hole_size, hole_type, orientation):
    holes = central_holes(block_centroids, hole_size, hole_type, orientation)
    if hole_type == "circle":
        centers, radius = holes
        drawing.add_circles(centers, radius, "hole")
    else:
        drawing.add_polygons(holes, "hole")


def blocks_cut_drawing(
    block_centroids,
    centroid_node_vectors,
    bond_connectivity,
    reference_bond_vectors,
    slot_size: float,
    out_file: Union[str, Path, None] = None,
    slot_type: str = "straight",
    chamfer_depth: Optional[float] = None,
    block_hole_size: Optional[float] = None,
    block_hole_type: str = "circle",
    block_hole_orientation=0.0,
    units_to_mm: float = 1.0,
) -> Drawing:
    """Block outlines + hinge slots (+ chamfers, + marker holes): the
    standard laser-cut sample drawing (reference
    scripts/fabrication.py:339-399). Works for any geometry family,
    including kagome."""

    drawing = Drawing()
    drawing.add_polygons(
        block_polygons(block_centroids, centroid_node_vectors), "block"
    )
    drawing.add_polylines(
        slot_lines(
            block_centroids,
            centroid_node_vectors,
            bond_connectivity,
            reference_bond_vectors,
            slot_size,
            slot_type,
        ),
        "slot",
    )
    if chamfer_depth is not None:
        drawing.add_polylines(
            chamfer_lines(
                block_centroids,
                centroid_node_vectors,
                bond_connectivity,
                reference_bond_vectors,
                chamfer_depth,
            ),
            "chamfer",
        )
    if block_hole_size is not None:
        _add_holes(
            drawing,
            block_centroids,
            block_hole_size,
            block_hole_type,
            block_hole_orientation,
        )
    if out_file is not None:
        drawing.save_svg(out_file, units_to_mm=units_to_mm)
    return drawing


def blocks_continuous_bond_drawing(
    block_centroids,
    centroid_node_vectors,
    bond_connectivity,
    reference_bond_vectors,
    n1_blocks: int,
    n2_blocks: int,
    out_file: Union[str, Path, None] = None,
    block_hole_size: Optional[float] = None,
    block_hole_type: str = "circle",
    block_hole_orientation=0.0,
    offset_type: str = "constant",
    offset_size: float = 0.0,
    path_orientation: str = "column",
    units_to_mm: float = 1.0,
) -> Drawing:
    """Block outlines + one continuous bond path (reference
    scripts/fabrication.py:401-456)."""

    drawing = Drawing()
    drawing.add_polygons(
        block_polygons(block_centroids, centroid_node_vectors), "block"
    )
    drawing.add_polylines(
        continuous_bond_lines(
            block_centroids,
            centroid_node_vectors,
            bond_connectivity,
            reference_bond_vectors,
            n1_blocks,
            n2_blocks,
            offset_type,
            offset_size,
            path_orientation,
        ),
        "slot",
    )
    if block_hole_size is not None:
        _add_holes(
            drawing,
            block_centroids,
            block_hole_size,
            block_hole_type,
            block_hole_orientation,
        )
    if out_file is not None:
        drawing.save_svg(out_file, units_to_mm=units_to_mm)
    return drawing


def shims_cut_drawing(
    n_shims: int,
    length: float,
    width: float,
    hole_size: float,
    out_file: Union[str, Path, None] = None,
    n_rows: int = 1,
    units_to_mm: float = 1.0,
) -> Drawing:
    """Hinge-shim sheet drawing (reference scripts/fabrication.py:495-515)."""

    rects, holes, radius = shim_outlines(
        n_shims, length, width, hole_size, n_rows
    )
    drawing = Drawing()
    drawing.add_polygons(rects, "shim")
    drawing.add_circles(holes, radius, "hole")
    if out_file is not None:
        drawing.save_svg(out_file, units_to_mm=units_to_mm)
    return drawing


def grippable_sample_drawing(
    geometry,
    angle,
    hinge_length: float,
    slot_size: float,
    grip_width: float,
    grip_lateral_spacing: float,
    out_file: Union[str, Path, None] = None,
    block_hole_size: Optional[float] = None,
    block_hole_type: str = "circle",
    block_hole_orientation=0.0,
    grip_hole_size: Optional[float] = None,
    slot_type: str = "straight",
    units_to_mm: float = 1.0,
) -> Drawing:
    """Rotated-square sample with tensile grips top/bottom (reference
    scripts/fabrication.py:607-683): the block drawing plus two grip
    outlines and an extra row of grip hinge slots above/below."""

    bc_fn, cnv_fn, bonds_fn, rbv_fn = geometry.get_parametrization()
    bc, cnv = _np(bc_fn(angle)), _np(cnv_fn(angle))
    bonds, rbv = np.asarray(bonds_fn()), _np(rbv_fn())

    drawing = blocks_cut_drawing(
        bc,
        cnv,
        bonds,
        rbv,
        slot_size,
        None,
        slot_type,
        None,
        block_hole_size,
        block_hole_type,
        block_hole_orientation,
    )

    xlim, ylim = np.asarray(geometry.get_xy_limits(angle))
    grips, grip_holes, grip_hole_radius = grip_outlines(
        xlim,
        ylim,
        hinge_length,
        grip_width,
        grip_lateral_spacing,
        grip_hole_size,
    )
    drawing.add_polygons(grips, "grip")
    if grip_holes is not None:
        drawing.add_circles(grip_holes, grip_hole_radius, "hole")

    # Grip hinge slots: replicate the top row of slots shifted up by two
    # lattice spacings, and the same row shifted down across the sample.
    all_slots = slot_lines(bc, cnv, bonds, rbv, slot_size, slot_type)
    n1 = geometry.n1_blocks
    top_row = all_slots[-2 * n1:-n1] + 2 * geometry.spacing * np.array(
        [0.0, 1.0]
    )
    bottom_row = top_row - geometry.n2_blocks * geometry.spacing * np.array(
        [0.0, 1.0]
    )
    drawing.add_polylines(np.concatenate([top_row, bottom_row]), "slot")

    if out_file is not None:
        drawing.save_svg(out_file, units_to_mm=units_to_mm)
    return drawing


def clamp_corner_ids(geometry, n_blocks_clamped_corners: int):
    """Block ids forming the four clamped corner wedges (L-shaped runs of
    ``n`` blocks along each edge from each corner), matching the reference's
    clamped-sample block bookkeeping (scripts/fabrication.py:706-733)."""

    n1, n2 = geometry.n1_blocks, geometry.n2_blocks
    nb = n1 * n2
    ncc = n_blocks_clamped_corners
    bl = np.concatenate(
        [np.arange(ncc), np.array([i * n1 for i in range(1, ncc)], int)]
    )
    br = np.concatenate(
        [
            np.arange(n1 - ncc, n1),
            np.array([(i + 1) * n1 - 1 for i in range(1, ncc)], int),
        ]
    )
    tr = np.concatenate(
        [
            np.arange(nb - ncc, nb),
            np.array([nb - i * n1 - 1 for i in range(1, ncc)], int),
        ]
    )
    tl = np.concatenate(
        [
            np.arange(nb - n1, nb - n1 + ncc),
            np.array([nb - n1 - i * n1 for i in range(1, ncc)], int),
        ]
    )
    return bl, br, tr, tl


def clamped_sample_drawing(
    geometry,
    block_centroids,
    centroid_node_vectors,
    bond_connectivity,
    reference_bond_vectors,
    slot_size: float,
    n_blocks_clamped_corners: int,
    attachment_size: Tuple[float, float],
    attachment_hole_size: float,
    out_file: Union[str, Path, None] = None,
    hole_size: Optional[float] = None,
    slot_type: str = "straight",
    units_to_mm: float = 1.0,
    breadboard_pitch: float = 25.4,
    max_plate_size: Tuple[float, float] = (25.4 * 24, 25.4 * 12),
) -> Drawing:
    """Sample clamped to a breadboard at its four corners (reference
    scripts/fabrication.py:686-934): interior blocks + slots are drawn as
    usual; each corner's L-shaped wedge of blocks is merged (exact polygon
    union) with two support legs and a bolt-pad box into a single clamp
    attachment outline with a breadboard-aligned bolt hole."""

    bc = _np(block_centroids)
    cnv = _np(centroid_node_vectors)
    bonds = np.asarray(bond_connectivity)
    rbv = _np(reference_bond_vectors)
    n1, n2 = geometry.n1_blocks, geometry.n2_blocks
    spacing = geometry.spacing

    bl, br, tr, tl = clamp_corner_ids(geometry, n_blocks_clamped_corners)
    corner_ids = np.concatenate([bl, br, tr, tl])
    inner_ids = np.setdiff1d(np.arange(geometry.n_blocks), corner_ids)

    # Bonds internal to a corner wedge are absorbed by the clamp outline.
    corner_set = set(int(b) for b in corner_ids)
    npb = cnv.shape[1]
    bond_blocks = bonds // npb
    internal = np.array(
        [
            int(a) in corner_set and int(b) in corner_set
            for a, b in bond_blocks
        ]
    )
    drawing = Drawing()
    blocks = block_polygons(bc, cnv)
    drawing.add_polygons(blocks[inner_ids], "block")
    drawing.add_polylines(
        slot_lines(bc, cnv, bonds[~internal], rbv[~internal], slot_size,
                   slot_type),
        "slot",
    )
    if hole_size is not None:
        _add_holes(drawing, bc[inner_ids], hole_size, "circle", 0.0)

    # Breadboard-aligned bolt holes outside each corner.
    shift_x = (breadboard_pitch - np.mod((n1 - 1) * spacing, breadboard_pitch)) / 2
    shift_y = (breadboard_pitch - np.mod((n2 - 1) * spacing, breadboard_pitch)) / 2
    hole_pos = {
        "bl": np.array([-shift_x, -shift_y]),
        "br": np.array([(n1 - 1) * spacing + shift_x, -shift_y]),
        "tl": np.array([-shift_x, (n2 - 1) * spacing + shift_y]),
        "tr": np.array(
            [(n1 - 1) * spacing + shift_x, (n2 - 1) * spacing + shift_y]
        ),
    }
    drawing.add_circles(
        np.stack(list(hole_pos.values())), attachment_hole_size / 2, "hole"
    )

    leg_w = 0.5 * spacing
    aw, ah = attachment_size
    outlines = []
    for name, ids in (("bl", bl), ("br", br), ("tr", tr), ("tl", tl)):
        wedge = blocks[ids]
        pts = wedge.reshape(-1, 2)
        x0, y0 = pts.min(axis=0)
        x1, y1 = pts.max(axis=0)
        hx, hy = hole_pos[name]
        sx = -1 if "l" in name else 1   # horizontal outward direction
        sy = -1 if "b" in name else 1   # vertical outward direction
        # Horizontal leg hugging the outer horizontal edge; trimmed a
        # quarter-spacing on the inboard end (reference's 0.25*spacing).
        if sx < 0:
            leg_h = _box(x0, x1 - 0.25 * spacing,
                         y0 if sy < 0 else y1 - leg_w,
                         (y0 + leg_w) if sy < 0 else y1)
            leg_v = _box(x0, x0 + leg_w,
                         y0 if sy < 0 else y0 + 0.25 * spacing,
                         (y1 - 0.25 * spacing) if sy < 0 else y1)
        else:
            leg_h = _box(x0 + 0.25 * spacing, x1,
                         y0 if sy < 0 else y1 - leg_w,
                         (y0 + leg_w) if sy < 0 else y1)
            leg_v = _box(x1 - leg_w, x1,
                         y0 if sy < 0 else y0 + 0.25 * spacing,
                         (y1 - 0.25 * spacing) if sy < 0 else y1)
        pad = _box(hx - aw / 2, hx + aw / 2, hy - ah / 2, hy + ah / 2)
        outline = polygon_union_outline(
            [*wedge, leg_h, leg_v, pad]
        )
        outlines.append(outline)
    drawing.add_polygons(outlines, "block")

    lo, hi = drawing.bounds()
    if hi[0] - lo[0] > max_plate_size[0] or hi[1] - lo[1] > max_plate_size[1]:
        raise ValueError(
            f"Design {hi - lo} exceeds the plate size {max_plate_size}"
        )

    if out_file is not None:
        drawing.save_svg(out_file, units_to_mm=units_to_mm)
    return drawing


def _box(x0, x1, y0, y1) -> np.ndarray:
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)
