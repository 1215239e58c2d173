"""Fabrication SVG generation and tracking pipeline tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from difflexmm_tpu.geometry import QuadGeometry
from difflexmm_tpu.fabrication import (
    chamfer_polygon,
    fabrication_drawing_quad,
    outer_boundary_quad,
    void_outlines_quad,
)
from difflexmm_tpu.tracking import (
    blocks_motion_from_marker_paths,
    damping_ratio_log_decrement,
    detect_markers,
    match_markers,
    rigid_pose_from_markers,
)


def _designed_quad():
    geo = QuadGeometry(4, 3, 1.0, 0.1)
    geo.compute_geometry()
    return geo, geo.get_design_from_rotated_square(0.2)


def test_void_outlines_counts_and_area():
    geo, design = _designed_quad()
    voids = void_outlines_quad(geo, design, ligament_width=0.04)
    assert len(voids) == (4 - 1) * (3 - 1)
    for v in voids:
        assert v.shape == (8, 2)
        # shoelace area positive (ccw) and bounded by a cell
        x, y = v[:, 0], v[:, 1]
        area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        assert 0 < area < 1.0


def test_outer_boundary_encloses_everything():
    geo, design = _designed_quad()
    outer = outer_boundary_quad(geo, design, ligament_width=0.04)
    nodes = np.asarray(geo.get_reference_geometry(*design)).reshape(-1, 2)
    assert outer[:, 0].min() <= nodes[:, 0].min()
    assert outer[:, 0].max() >= nodes[:, 0].max()
    assert outer[:, 1].min() <= nodes[:, 1].min()
    x, y = outer[:, 0], outer[:, 1]
    area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    assert area > 0  # ccw closed walk


def test_chamfer_shrinks_polygon():
    square = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    chamfered = chamfer_polygon(square, 0.1)
    assert len(chamfered) == 8
    x, y = chamfered[:, 0], chamfered[:, 1]
    area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    assert 0.97 < area < 1.0  # 4 corners of 0.005 each removed


def test_fabrication_drawing_svg(tmp_path):
    geo, design = _designed_quad()
    path = fabrication_drawing_quad(
        geo, design, ligament_width=0.04, chamfer=0.02,
        filename=tmp_path / "sample.svg",
    )
    svg = path.read_text()
    assert svg.startswith("<svg")
    assert svg.count("<path") == 1 + (4 - 1) * (3 - 1)
    assert "mm" in svg


def test_rigid_pose_recovery():
    ref = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    theta = 0.3
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]])
    centroid = ref.mean(axis=0)
    moved = (ref - centroid) @ R.T + centroid + np.array([0.5, -0.2])
    ux, uy, th = rigid_pose_from_markers(ref, moved)
    assert np.allclose([ux, uy, th], [0.5, -0.2, 0.3], atol=1e-12)


def test_marker_matching():
    prev = np.array([[0.0, 0.0], [10.0, 0.0]])
    cur = np.array([[10.5, 0.2], [0.3, -0.1]])  # swapped order
    matched = match_markers(prev, cur)
    assert np.allclose(matched[0], [0.3, -0.1])
    assert np.allclose(matched[1], [10.5, 0.2])


def test_detect_and_track_synthetic_frames():
    cv2 = pytest.importorskip("cv2")
    # Two bright markers moving right by 2 px/frame on a dark frame
    paths = []
    prev = None
    for t in range(5):
        frame = np.zeros((64, 64), dtype=np.uint8)
        for y in (20, 40):
            cv2.circle(frame, (10 + 2 * t, y), 3, 255, -1)
        det = detect_markers(frame, threshold=100)
        assert len(det) == 2
        prev = det[np.lexsort((det[:, 0], det[:, 1]))] if prev is None else match_markers(prev, det)
        paths.append(prev.copy())
    paths = np.stack(paths)
    dx = paths[-1, :, 0] - paths[0, :, 0]
    assert np.allclose(dx, 8, atol=0.5)

    motion = blocks_motion_from_marker_paths(
        paths, np.array([[0, 1]]), pixels_per_unit=2.0, timestep=1.0
    )
    assert motion.shape == (5, 2, 1, 3)
    assert np.allclose(motion[-1, 0, 0, 0], 4.0, atol=0.3)  # 8 px / 2 px-per-unit
    assert np.allclose(motion[1:, 1, 0, 0], 1.0, atol=0.3)  # velocity ~ 1 unit/frame


def test_damping_ratio_log_decrement():
    t = np.linspace(0, 20, 2000)
    zeta_true = 0.03
    omega = 2 * np.pi
    signal = np.exp(-zeta_true * omega * t) * np.cos(omega * np.sqrt(1 - zeta_true**2) * t)
    zeta, peaks = damping_ratio_log_decrement(signal)
    assert abs(zeta - zeta_true) / zeta_true < 0.05
    assert len(peaks) >= 5
