"""Laser-cut drawing generation for quad-lattice samples (SVG output).

Generates the cut paths for a physical metamaterial sample: interior void
outlines (the holes between blocks and ligaments) and the outer perimeter,
for a designed quad lattice with finite-width ligaments.

Behavioral parity target: the reference's fabrication tooling
(scripts/fabrication.py, shapely-based). This implementation constructs the
void/perimeter polygons analytically from the lattice structure (no shapely
dependency): each interior void is bounded by four block edges and four
ligament flanks; the perimeter walks the boundary blocks and the outer
flanks of their connecting ligaments.

Coordinates are in lattice units; ``write_svg`` scales to mm.
"""

from pathlib import Path
from typing import List, Sequence, Union

import numpy as np


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
