"""Plotting + animation + CLI + node-loading coverage.

Plotting parity target: reference difflexmm/plotting.py (collections
54-105, field extraction 144-191, frames/animation 266-431, overlay
434-530, CLI 533-596). Runs headless (Agg); animation uses the Pillow
writer fallback so no ffmpeg is required.
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difflexmm_tpu.geometry.quad import RotatedSquareGeometry
from difflexmm_tpu.utils import SolutionData, save_data


@pytest.fixture(scope="module")
def solution():
    geo = RotatedSquareGeometry(n1_cells=2, n2_cells=2, spacing=1.0,
                                bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    nb = geo.n_blocks
    T = 3
    rng = np.random.default_rng(0)
    fields = jnp.asarray(0.05 * rng.normal(size=(T, 2, nb, 3)))
    return SolutionData(
        block_centroids=bc(0.2),
        centroid_node_vectors=cnv(0.2),
        bond_connectivity=bonds(),
        timepoints=jnp.linspace(0.0, 1.0, T),
        fields=fields,
    )


def test_extract_block_field_all_fields(solution):
    from difflexmm_tpu.plotting import extract_block_field

    T = len(np.asarray(solution.timepoints))
    nb = solution.fields.shape[2]
    f = np.asarray(solution.fields)
    for name in ("ux", "uy", "theta", "vx", "vy", "omega", "|u|", "|v|",
                 "kinetic"):
        out = extract_block_field(solution, name)
        assert out.shape == (T, nb), name
    assert np.allclose(extract_block_field(solution, "ux"), f[:, 0, :, 0])
    assert np.allclose(
        extract_block_field(solution, "|v|"),
        np.linalg.norm(f[:, 1, :, :2], axis=-1),
    )
    with pytest.raises(ValueError):
        extract_block_field(solution, "nope")


def test_plot_geometry_and_frame(solution):
    from difflexmm_tpu.plotting import plot_frame, plot_geometry

    ax = plot_geometry(
        solution.block_centroids,
        solution.centroid_node_vectors,
        solution.bond_connectivity,
    )
    # blocks + bonds collections present
    assert len(ax.collections) >= 2
    n_blocks = solution.fields.shape[2]
    assert len(ax.collections[0].get_paths()) == n_blocks
    matplotlib.pyplot.close("all")

    ax = plot_frame(solution, 1, field="|u|", vmin=0.0, vmax=0.1)
    assert ax.collections[0].get_array() is not None
    assert ax.collections[0].get_clim() == (0.0, 0.1)
    matplotlib.pyplot.close("all")


def test_generate_frames_and_animation(tmp_path, solution):
    from difflexmm_tpu.plotting import generate_animation, generate_frames

    paths = generate_frames(solution, tmp_path / "frames", field="kinetic")
    assert len(paths) == 3
    assert all(p.exists() and p.stat().st_size > 0 for p in paths)

    out = generate_animation(solution, tmp_path / "anim.gif", field="|u|",
                             fps=5, dpi=50)
    assert out.exists() and out.stat().st_size > 0
    assert out.suffix == ".gif"


def test_cli_animation_and_frames(tmp_path, solution, capsys):
    from difflexmm_tpu.plotting import main

    pkl = tmp_path / "solution.pkl"
    save_data(pkl, solution)

    main([str(pkl), "--out", str(tmp_path / "cli.gif"), "--fps", "5"])
    assert (tmp_path / "cli.gif").exists()
    assert "Wrote animation" in capsys.readouterr().out

    main([str(pkl), "--out", str(tmp_path / "cli_frames"), "--frames"])
    assert len(list((tmp_path / "cli_frames").glob("frame_*.png"))) == 3


def test_video_overlay(tmp_path, solution):
    cv2 = pytest.importorskip("cv2")
    from difflexmm_tpu.plotting import plot_video_frame_field_overlaid

    video = tmp_path / "tiny.avi"
    writer = cv2.VideoWriter(
        str(video), cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 48)
    )
    for i in range(3):
        writer.write(np.full((48, 64, 3), 40 * i, dtype=np.uint8))
    writer.release()
    if not video.exists() or video.stat().st_size == 0:
        pytest.skip("cv2 cannot write video in this environment")

    ax = plot_video_frame_field_overlaid(
        video, 1, solution, 1, field="|u|", pixels_per_unit=10.0,
        origin_px=(5.0, 5.0),
    )
    # image + overlaid block collection
    assert len(ax.images) == 1
    assert len(ax.collections) >= 1
    matplotlib.pyplot.close("all")


# ---------------------------------------------------------------------------
# Node loading (the reference's unimplemented stub, loading.py:50-68 —
# implemented here via the virtual-work transpose; previously untested).


def test_node_loading_virtual_work():
    """The generalized block force from a nodal force must equal
    F_node . d(node_position)/d(block_DOFs) — checked against jax.jacobian
    of the kinematics at a rotated configuration (where the rotational
    component is nontrivial)."""

    from difflexmm_tpu.ops.kinematics import block_to_node_kinematics
    from difflexmm_tpu.ops.loading import build_node_loading

    geo = RotatedSquareGeometry(n1_cells=2, n2_cells=1, spacing=1.0,
                                bond_length=0.1)
    geo.compute_geometry()
    cnv = geo.centroid_node_vectors(0.2)
    nb = geo.n_blocks

    # One x-force on node 1 of block 2, one y-force on node 3 of block 0.
    triples = np.array([[2, 1, 0], [0, 3, 1]])
    magnitudes = jnp.asarray([0.7, -1.3])
    loading = build_node_loading(geo, triples, lambda state, t: magnitudes)

    rng = np.random.default_rng(1)
    displacement = jnp.asarray(0.1 * rng.normal(size=(nb, 3)))
    state = (displacement, jnp.zeros_like(displacement))
    Q = loading(state, 0.0, {}, cnv)
    assert Q.shape == (nb, 3)

    # Oracle: dense jacobian contraction.
    jac = jax.jacobian(
        lambda u: block_to_node_kinematics(u, cnv)
    )(displacement)  # (nb, V, 3, nb, 3)
    expected = jnp.zeros((nb, 3))
    for (b, v, d), mag in zip(triples, magnitudes):
        expected = expected + mag * jac[b, v, d]
    assert jnp.allclose(Q, expected, atol=1e-12)

    # Untouched blocks receive nothing (kinematics is block-local).
    untouched = [i for i in range(nb) if i not in triples[:, 0]]
    assert jnp.allclose(Q[jnp.asarray(untouched)], 0.0)


def test_plot_band_structure_and_dos(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import jax.numpy as jnp

    from difflexmm_tpu.plotting import (
        plot_band_structure,
        plot_density_of_states,
    )
    from difflexmm_tpu.solver.bloch import (
        band_structure,
        bz_grid,
        density_of_states,
        frequencies,
        high_symmetry_path,
        reciprocal_basis,
        rotated_square_cell,
    )

    cell = rotated_square_cell(
        angle=0.25, k_stretch=1.0, k_shear=0.3, k_rot=0.05
    )
    b = reciprocal_basis(cell.direct_basis)
    ks, dist, ticks = high_symmetry_path(
        [[0.0, 0.0], 0.5 * b[0], 0.5 * (b[0] + b[1])], n_per_segment=6
    )
    om = frequencies(band_structure(cell, ks))
    ax = plot_band_structure(
        dist, om, corner_ticks=ticks, corner_labels=["G", "X", "M"]
    )
    # All bands plotted, gap shading present (this cell has 2 gaps).
    assert len(ax.lines) >= om.shape[1]
    assert len(ax.patches) >= 1
    assert ax.get_xticklabels()[0].get_text() == "G"

    og = jnp.linspace(0.0, float(om.max()) + 0.5, 100)
    g = density_of_states(
        frequencies(band_structure(cell, bz_grid(cell, 6, 6))), og, 0.05
    )
    ax2 = plot_density_of_states(og, g, vertical=True)
    assert ax2.get_xlabel() == "DOS"
    import matplotlib.pyplot as plt

    fig = ax.figure
    fig.savefig(tmp_path / "bands.png")
    plt.close("all")
