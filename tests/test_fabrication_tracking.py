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


# ---------------------------------------------------------------------------
# Layered cut drawings (reference scripts/fabrication.py parity)
# ---------------------------------------------------------------------------

from difflexmm_tpu.fabrication import (  # noqa: E402
    blocks_continuous_bond_drawing,
    blocks_cut_drawing,
    chamfer_lines,
    clamped_sample_drawing,
    central_holes,
    continuous_bond_lines,
    grip_outlines,
    grippable_sample_drawing,
    polygon_union_outline,
    shim_outlines,
    shims_cut_drawing,
    slot_lines,
)
from difflexmm_tpu.geometry import KagomeGeometry, RotatedSquareGeometry


def _loop_area(p):
    x, y = p[:, 0], p[:, 1]
    return abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2


def _rs_arrays(n1_cells=3, n2_cells=2, angle=0.3, spacing=10.0):
    geo = RotatedSquareGeometry(n1_cells, n2_cells, spacing, bond_length=1.0)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    return geo, np.asarray(bc(angle)), np.asarray(cnv(angle)), \
        np.asarray(bonds()), np.asarray(rbv())


def test_slot_lines_types():
    geo, bc, cnv, bonds, rbv = _rs_arrays()
    nodes = (cnv + bc[:, None, :]).reshape(-1, 2)
    straight = slot_lines(bc, cnv, bonds, rbv, 0.5, "straight")
    assert straight.shape == (len(bonds), 2, 2)
    # Straight slots contain the bond segment, extended by slot_size.
    lengths = np.linalg.norm(straight[:, 1] - straight[:, 0], axis=-1)
    bond_lengths = np.linalg.norm(
        nodes[bonds[:, 1]] - nodes[bonds[:, 0]], axis=-1
    )
    assert np.allclose(lengths, bond_lengths + 1.0, atol=1e-9)

    for slot_type in ("centroid", "bisectrix"):
        s = slot_lines(bc, cnv, bonds, rbv, 0.5, slot_type)
        assert s.shape == (len(bonds), 4, 2)
        # Middle two points are exactly the bond nodes.
        assert np.allclose(s[:, 1], nodes[bonds[:, 0]], atol=1e-9)
        assert np.allclose(s[:, 2], nodes[bonds[:, 1]], atol=1e-9)
        # Outer stubs have length slot_size.
        assert np.allclose(
            np.linalg.norm(s[:, 0] - s[:, 1], axis=-1), 0.5, atol=1e-9
        )


def test_chamfer_lines_orthogonal_depth():
    geo, bc, cnv, bonds, rbv = _rs_arrays()
    depth = 0.4
    lines = chamfer_lines(bc, cnv, bonds, rbv, depth)
    # One chamfer per distinct bonded node.
    assert len(lines) == len(np.unique(bonds))
    # Every chamfer point sits at distance depth from the node measured
    # along the bond direction (definition of depth/cos spacing).
    nodes = (cnv + bc[:, None, :]).reshape(-1, 2)
    node_ids = np.unique(bonds)
    for line, node_id in zip(lines, node_ids):
        bond_id = np.argwhere(bonds == node_id)[0][0]
        u = rbv[bond_id] / np.linalg.norm(rbv[bond_id])
        d = np.abs((line - nodes[node_id]) @ u)
        assert np.allclose(d, depth, atol=1e-9)


def test_central_holes_square_orientation():
    bc = np.array([[0.0, 0.0], [5.0, 0.0]])
    squares = central_holes(bc, 2.0, "square", np.pi / 4)
    assert squares.shape == (2, 4, 2)
    # Rotated square: vertices at distance sqrt(2) (half-diagonal of size-2).
    r = np.linalg.norm(squares[0] - bc[0], axis=-1)
    assert np.allclose(r, np.sqrt(2.0), atol=1e-12)
    centers, radius = central_holes(bc, 2.0, "circle")
    assert radius == 1.0 and np.allclose(centers, bc)


def test_shim_outlines():
    rects, holes, radius = shim_outlines(7, 20.0, 8.0, 2.0, n_rows=2)
    assert len(rects) == 7 and len(holes) == 28 and radius == 1.0
    # 2 rows: 3 in first, 4 in second (remainder goes to the last row).
    assert (rects[:, :, 1].max(axis=1) > 21).sum() == 4


def test_polygon_union_outline_cases():
    from difflexmm_tpu.fabrication import _box

    a, b = _box(0, 2, 0, 2), _box(1, 3, 1, 3)
    assert abs(_loop_area(polygon_union_outline([a, b])) - 7.0) < 1e-4
    # Degenerate contacts (shared edge, shared corner) must still union.
    assert abs(_loop_area(polygon_union_outline([a, _box(2, 4, 0, 2)])) - 8.0) < 1e-3
    assert abs(_loop_area(polygon_union_outline([a, _box(2, 4, 2, 4)])) - 8.0) < 1e-3
    # Rotated triangle over a box.
    tri = np.array([[1.0, 1.0], [4.0, 1.5], [2.0, 4.0]])
    u = polygon_union_outline([a, tri])
    assert _loop_area(u) > max(_loop_area(a), _loop_area(tri))


def test_blocks_cut_drawing_layers(tmp_path):
    geo, bc, cnv, bonds, rbv = _rs_arrays()
    d = blocks_cut_drawing(
        bc, cnv, bonds, rbv, 0.5, tmp_path / "blocks.svg",
        slot_type="bisectrix", chamfer_depth=0.3, block_hole_size=1.0,
    )
    assert len(d.polygons) == geo.n_blocks
    assert len(d.circles) == geo.n_blocks
    n_chamfers = len(np.unique(bonds))
    assert len(d.polylines) == len(bonds) + n_chamfers
    svg = (tmp_path / "blocks.svg").read_text()
    assert svg.count("<circle") == geo.n_blocks
    assert 'stroke="red"' in svg and 'stroke="blue"' in svg


def test_kagome_cut_drawing(tmp_path):
    geo = KagomeGeometry(4, 3, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    design = geo.zero_design()
    d = blocks_cut_drawing(
        np.asarray(bc(*design)), np.asarray(cnv(*design)),
        np.asarray(bonds()), np.asarray(rbv()),
        0.05, tmp_path / "kagome.svg", slot_type="centroid",
    )
    assert len(d.polygons) == geo.n_blocks
    assert len(d.polylines) == len(bonds())


def test_grip_outlines_and_drawing(tmp_path):
    geo, bc, cnv, bonds, rbv = _rs_arrays()
    d = grippable_sample_drawing(
        geo, 0.3, hinge_length=2.0, slot_size=0.5, grip_width=15.0,
        grip_lateral_spacing=3.0, out_file=tmp_path / "grip.svg",
        grip_hole_size=3.0,
    )
    # blocks + 2 grips; slots + 2 extra grip slot rows; 8 grip bolt holes
    assert len(d.polygons) == geo.n_blocks + 2
    assert len(d.polylines) == len(bonds) + 2 * geo.n1_blocks
    assert len(d.circles) == 8
    grips, holes, radius = grip_outlines(
        (0.0, 10.0), (0.0, 8.0), 1.0, 5.0, 2.0, hole_size=2.0
    )
    assert grips.shape == (2, 6, 2) and holes.shape == (8, 2)
    # Top grip sits above the sample, bottom grip below.
    assert grips[0][:, 1].max() > 8.0 and grips[1][:, 1].min() < 0.0


def test_clamped_sample_drawing(tmp_path):
    geo, bc, cnv, bonds, rbv = _rs_arrays(4, 3, 0.35, 20.0)
    ncc = 3
    d = clamped_sample_drawing(
        geo, bc, cnv, bonds, rbv, slot_size=1.0,
        n_blocks_clamped_corners=ncc, attachment_size=(30.0, 30.0),
        attachment_hole_size=6.0, out_file=tmp_path / "clamped.svg",
        hole_size=2.0,
    )
    n_corner_blocks = 4 * (2 * ncc - 1)
    # Interior blocks drawn individually + 4 merged clamp outlines.
    assert len(d.polygons) == geo.n_blocks - n_corner_blocks + 4
    # 4 attachment holes + interior marker holes.
    assert len(d.circles) == 4 + geo.n_blocks - n_corner_blocks
    # Each clamp outline must cover its wedge blocks and the bolt pad.
    clamp_outlines = [p for p, _ in d.polygons[-4:]]
    blocks_area = _loop_area(
        (cnv + bc[:, None, :])[0]
    )
    for outline in clamp_outlines:
        assert _loop_area(outline) > (2 * ncc - 1) * blocks_area

    # Oversized plate must raise.
    with pytest.raises(ValueError):
        clamped_sample_drawing(
            geo, bc, cnv, bonds, rbv, 1.0, ncc, (30.0, 30.0), 6.0,
            max_plate_size=(50.0, 50.0),
        )


def test_continuous_bond_drawing(tmp_path):
    geo, bc, cnv, bonds, rbv = _rs_arrays()
    lines = continuous_bond_lines(
        bc, cnv, bonds, rbv, geo.n1_blocks, geo.n2_blocks,
        offset_type="constant", offset_size=0.5,
    )
    n_boundary = 2 * geo.n1_blocks + 2 * geo.n2_blocks
    # bonds + 2 internal segments per block + boundary stubs + alternating
    # closure pairs per side (bottom/right skip end tips) + 1 corner piece
    n_closures = (
        (geo.n1_blocks - 2) // 2 + (geo.n2_blocks - 2) // 2
        + geo.n1_blocks // 2 + geo.n2_blocks // 2 + 1
    )
    assert len(lines) == len(bonds) + 2 * geo.n_blocks + n_boundary + n_closures
    # The reference's closure scheme keeps every stub tip at degree <= 2
    # (one stub + at most one closure) so the drawing remains traceable as
    # one continuous cut path.
    tip_lines = lines[len(bonds) + 2 * geo.n_blocks:]
    from collections import Counter
    endpoint_count = Counter()
    for line in tip_lines:
        for p in (line[0], line[-1]):
            endpoint_count[tuple(np.round(p, 9))] += 1
    assert max(endpoint_count.values()) <= 2
    d = blocks_continuous_bond_drawing(
        bc, cnv, bonds, rbv, geo.n1_blocks, geo.n2_blocks,
        out_file=tmp_path / "cont.svg", offset_type="ratio", offset_size=0.1,
    )
    assert len(d.polygons) == geo.n_blocks


def test_continuous_bond_serpentine_pairing():
    """Pin the internal-segment pairing: orientation alternates by the
    block's actual lattice column (or row) — the intended serpentine; the
    reference's generator mispairs on non-square lattices through a
    loop-order quirk (see continuous_bond_lines docstring)."""

    geo, bc, cnv, bonds, rbv = _rs_arrays()
    assert geo.n1_blocks != geo.n2_blocks  # quirk only visible off-square
    offset = 0.5
    nodes = cnv + bc[:, None, :]
    shifted = nodes - offset * cnv / np.linalg.norm(cnv, axis=-1, keepdims=True)

    for orientation in ("column", "row"):
        lines = continuous_bond_lines(
            bc, cnv, bonds, rbv, geo.n1_blocks, geo.n2_blocks,
            offset_type="constant", offset_size=offset,
            path_orientation=orientation,
        )
        for b in range(geo.n_blocks):
            i, j = b % geo.n1_blocks, b // geo.n1_blocks
            parity = (i if orientation == "column" else j) % 2
            expected = ((0, 1), (2, 3)) if parity == 0 else ((0, 3), (1, 2))
            for seg, (a, c) in zip(
                lines[len(bonds) + 2 * b:len(bonds) + 2 * b + 2], expected
            ):
                assert np.allclose(seg, shifted[b][np.array([a, c])])


def test_shims_cut_drawing(tmp_path):
    d = shims_cut_drawing(6, 20.0, 8.0, 2.0, tmp_path / "shims.svg", n_rows=3)
    assert len(d.polygons) == 6 and len(d.circles) == 24
    assert (tmp_path / "shims.svg").read_text().startswith("<svg")


# ---------------------------------------------------------------------------
# Tracking parity: xcorr tracker, preprocessing, threshold picker, damping fit
# ---------------------------------------------------------------------------

from difflexmm_tpu.tracking import (  # noqa: E402
    find_markers_xcorr,
    fit_damped_oscillation,
    get_contour_centroids,
    interpolate_nans,
    pick_threshold,
    preprocess_frame,
    smooth_fields_convolution,
    smooth_fields_savgol,
)


def _marker_frame(positions, size=128, radius=4, blur=True):
    """Synthetic grayscale frame with Gaussian-ish bright markers at
    subpixel positions (rendered on a 4x supersampled grid)."""

    cv2 = pytest.importorskip("cv2")
    ss = 4
    frame = np.zeros((size * ss, size * ss), dtype=np.uint8)
    for x, y in positions:
        cv2.circle(frame, (int(round(x * ss)), int(round(y * ss))), radius * ss, 255, -1)
    frame = cv2.resize(frame, (size, size), interpolation=cv2.INTER_AREA)
    if blur:
        frame = cv2.GaussianBlur(frame, (5, 5), 0)
    return frame


def test_find_markers_xcorr_subpixel():
    pytest.importorskip("cv2")
    base = np.array([[40.0, 40.0], [80.0, 60.0], [50.0, 90.0]])
    shift = np.array([2.4, -1.6])
    f0 = _marker_frame(base)
    f1 = _marker_frame(base + shift)
    found = find_markers_xcorr(f0, f1, base, base)
    err = np.linalg.norm(found - (base + shift), axis=-1)
    assert err.max() < 0.35  # sub-pixel at 5x upscaling


def test_preprocess_and_contours_roi():
    pytest.importorskip("cv2")
    base = np.array([[30.0, 30.0], [90.0, 90.0]])
    frame = _marker_frame(base, radius=5)
    mask = preprocess_frame(frame, blur_size=3, threshold=100)
    assert mask.dtype == np.uint8 and set(np.unique(mask)) <= {0, 255}
    cents = get_contour_centroids(frame, threshold=100, block_area=(10, 1e4))
    assert len(cents) == 2
    # ROI excludes the second marker; centroid still in full-frame coords.
    cents_roi = get_contour_centroids(
        frame, roi_xy=((0, 64), (0, 64)), threshold=100, block_area=(10, 1e4)
    )
    assert len(cents_roi) == 1
    assert np.linalg.norm(cents_roi[0] - base[0]) < 1.0


def test_pick_threshold_plateau():
    pytest.importorskip("cv2")
    frame = _marker_frame(np.array([[30.0, 30.0], [90.0, 90.0], [30.0, 90.0]]),
                          radius=5)
    th, table = pick_threshold(frame, expected_count=3, block_area=(10, 1e4))
    assert len(get_contour_centroids(frame, threshold=th, block_area=(10, 1e4))) == 3
    assert table.shape[1] == 2


def test_fit_damped_oscillation():
    framerate = 1000.0
    t = np.arange(4000) / framerate
    zeta, f_d = 0.04, 25.0
    omega_d = 2 * np.pi * f_d
    omega_n = omega_d / np.sqrt(1 - zeta**2)
    angle = 0.3 * np.exp(-zeta * omega_n * t) * np.cos(omega_d * t) + 0.05
    result = fit_damped_oscillation(angle, framerate, peak_distance=12)
    assert abs(result["zeta"] - zeta) / zeta < 0.05
    assert abs(result["frequency_d"] - f_d) / f_d < 0.02
    assert result["log_slope"] < 0


def test_interpolate_nans_and_smoothing():
    t = np.linspace(0, 1, 50)
    clean = np.stack([np.sin(2 * np.pi * t), np.cos(2 * np.pi * t)], axis=1)
    gappy = clean.copy()
    gappy[10:13, 0] = np.nan
    gappy[30, 1] = np.nan
    filled = interpolate_nans(gappy)
    assert not np.isnan(filled).any()
    assert np.abs(filled - clean).max() < 0.05  # linear interp on smooth data

    noisy = clean + 0.05 * np.sin(40 * np.pi * t)[:, None]
    for smoothed in (
        smooth_fields_convolution(noisy, kernel_size=5),
        smooth_fields_savgol(noisy, window_length=7, polyorder=2),
    ):
        assert smoothed.shape == noisy.shape
        mid = slice(5, -5)
        assert (
            np.abs(smoothed - clean)[mid].mean()
            < np.abs(noisy - clean)[mid].mean()
        )


def test_track_video_xcorr_synthetic(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from difflexmm_tpu.tracking import track_video_xcorr

    base = np.array([[40.0, 40.0], [80.0, 60.0]])
    video = tmp_path / "markers.avi"
    writer = cv2.VideoWriter(
        str(video), cv2.VideoWriter_fourcc(*"MJPG"), 30, (128, 128), False
    )
    n_frames, v = 12, np.array([0.8, 0.5])
    for k in range(n_frames):
        writer.write(_marker_frame(base + k * v))
    writer.release()

    paths = track_video_xcorr(video, base, search_window_size=30,
                              marker_template_size=14)
    assert paths.shape == (n_frames, 2, 2)
    # Recovered motion matches the imposed linear drift to sub-pixel.
    expected = base[None] + np.arange(n_frames)[:, None, None] * v
    assert np.abs(paths - expected).max() < 0.6
