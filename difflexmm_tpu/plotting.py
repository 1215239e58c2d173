"""Visualization: geometry plots, field snapshots, animations, experiment
overlays, and a small CLI.

Behavioral parity: reference difflexmm/plotting.py (patch/bond collections
54-105, plot_geometry 108-141, field extraction 144-191, frames/animation
266-431, video overlay 434-530, CLI 533-596). Animation falls back to the
pillow writer when ffmpeg is unavailable.
"""

import argparse
from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np

import matplotlib
import matplotlib.pyplot as plt
from matplotlib.animation import FFMpegWriter, FuncAnimation, PillowWriter
from matplotlib.collections import LineCollection, PolyCollection

from difflexmm_tpu.utils.types import EigenmodeData, SolutionData, load_data


# ---------------------------------------------------------------------------
# Geometry -> matplotlib primitives
# ---------------------------------------------------------------------------


def current_block_polygons(
    block_centroids, centroid_node_vectors, displacement=None
) -> np.ndarray:
    """(n_blocks, V, 2) absolute polygon vertices, optionally displaced."""

    block_centroids = np.asarray(block_centroids)
    centroid_node_vectors = np.asarray(centroid_node_vectors)
    vertices = block_centroids[:, None, :] + centroid_node_vectors
    if displacement is not None:
        displacement = np.asarray(displacement)
        theta = displacement[:, 2]
        c, s = np.cos(theta), np.sin(theta)
        vx = centroid_node_vectors[..., 0]
        vy = centroid_node_vectors[..., 1]
        dx = displacement[:, None, 0] + (c[:, None] - 1) * vx - s[:, None] * vy
        dy = displacement[:, None, 1] + s[:, None] * vx + (c[:, None] - 1) * vy
        vertices = vertices + np.stack([dx, dy], axis=-1)
    return vertices


def block_collection(vertices, **kwargs) -> PolyCollection:
    """PolyCollection for an array of block polygons."""

    kwargs.setdefault("edgecolor", "black")
    kwargs.setdefault("linewidth", 0.5)
    kwargs.setdefault("facecolor", "#aad4ff")
    return PolyCollection(list(np.asarray(vertices)), **kwargs)


def bond_collection(vertices, bond_connectivity, **kwargs) -> LineCollection:
    """LineCollection of bonds on flattened node positions."""

    nodes = np.asarray(vertices).reshape(-1, 2)
    bonds = np.asarray(bond_connectivity)
    segments = np.stack([nodes[bonds[:, 0]], nodes[bonds[:, 1]]], axis=1)
    kwargs.setdefault("color", "crimson")
    kwargs.setdefault("linewidth", 1.0)
    return LineCollection(list(segments), **kwargs)


def plot_geometry(
    block_centroids,
    centroid_node_vectors,
    bond_connectivity=None,
    displacement=None,
    ax=None,
    field=None,
    cmap="viridis",
    **kwargs,
):
    """Plot the (possibly deformed) structure; optional per-block color field."""

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 8))
    vertices = current_block_polygons(block_centroids, centroid_node_vectors, displacement)
    blocks = block_collection(vertices, **kwargs)
    if field is not None:
        blocks.set_array(np.asarray(field))
        blocks.set_cmap(cmap)
        blocks.set_facecolor(None)
    ax.add_collection(blocks)
    if bond_connectivity is not None:
        ax.add_collection(bond_collection(vertices, bond_connectivity))
    ax.set_aspect("equal")
    ax.autoscale_view()
    ax.margins(0.05)
    return ax


# ---------------------------------------------------------------------------
# Field extraction
# ---------------------------------------------------------------------------

_FIELD_AXES = {"ux": (0, 0), "uy": (0, 1), "theta": (0, 2),
               "vx": (1, 0), "vy": (1, 1), "omega": (1, 2)}


def extract_block_field(solution: SolutionData, field: str) -> np.ndarray:
    """Per-block scalar field history (T, n_blocks) from a solution.

    ``field``: one of ux, uy, theta, vx, vy, omega, |u|, |v|, kinetic.
    """

    fields = np.asarray(solution.fields)
    if field in _FIELD_AXES:
        a, b = _FIELD_AXES[field]
        return fields[:, a, :, b]
    if field == "|u|":
        return np.linalg.norm(fields[:, 0, :, :2], axis=-1)
    if field == "|v|":
        return np.linalg.norm(fields[:, 1, :, :2], axis=-1)
    if field == "kinetic":
        return np.sum(fields[:, 1] ** 2, axis=-1) / 2
    raise ValueError(f"Unknown field {field!r}.")


# ---------------------------------------------------------------------------
# Frames & animation
# ---------------------------------------------------------------------------


def plot_frame(
    solution: SolutionData,
    timepoint_index: int,
    field: Optional[str] = "|u|",
    ax=None,
    vmin=None,
    vmax=None,
    **kwargs,
):
    """Single deformed-configuration frame colored by a field."""

    values = extract_block_field(solution, field)[timepoint_index] if field else None
    ax = plot_geometry(
        solution.block_centroids,
        solution.centroid_node_vectors,
        solution.bond_connectivity,
        displacement=np.asarray(solution.fields)[timepoint_index, 0],
        ax=ax,
        field=values,
        **kwargs,
    )
    if field and (vmin is not None or vmax is not None):
        ax.collections[0].set_clim(vmin, vmax)
    return ax


def generate_frames(
    solution: SolutionData,
    out_dir: Union[str, Path],
    field: Optional[str] = "|u|",
    timepoint_indices: Optional[Sequence[int]] = None,
    dpi: int = 120,
):
    """Write one PNG per requested timepoint into ``out_dir``."""

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_t = len(np.asarray(solution.timepoints))
    indices = range(n_t) if timepoint_indices is None else timepoint_indices
    values = extract_block_field(solution, field) if field else None
    vmin = float(values.min()) if field else None
    vmax = float(values.max()) if field else None
    paths = []
    for i in indices:
        fig, ax = plt.subplots(figsize=(8, 8))
        plot_frame(solution, i, field=field, ax=ax, vmin=vmin, vmax=vmax)
        path = out_dir / f"frame_{i:05d}.png"
        fig.savefig(path, dpi=dpi, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths


def _movie_writer(fps: int):
    if FFMpegWriter.isAvailable():
        return FFMpegWriter(fps=fps)
    return PillowWriter(fps=fps)


def generate_animation(
    solution: SolutionData,
    out_path: Union[str, Path],
    field: Optional[str] = "|u|",
    fps: int = 20,
    dpi: int = 100,
    timepoint_indices: Optional[Sequence[int]] = None,
):
    """Animate the deformed structure over time (mp4 if ffmpeg, else gif)."""

    out_path = Path(out_path)
    if not FFMpegWriter.isAvailable() and out_path.suffix != ".gif":
        out_path = out_path.with_suffix(".gif")
    out_path.parent.mkdir(parents=True, exist_ok=True)

    fields = np.asarray(solution.fields)
    n_t = fields.shape[0]
    indices = list(range(n_t)) if timepoint_indices is None else list(timepoint_indices)
    values = extract_block_field(solution, field) if field else None

    fig, ax = plt.subplots(figsize=(8, 8))
    plot_frame(solution, indices[0], field=field, ax=ax,
               vmin=float(values.min()) if field else None,
               vmax=float(values.max()) if field else None)
    blocks = ax.collections[0]
    bonds = ax.collections[1] if len(ax.collections) > 1 else None
    cnv = np.asarray(solution.centroid_node_vectors)
    bc = np.asarray(solution.block_centroids)

    def update(i):
        vertices = current_block_polygons(bc, cnv, fields[i, 0])
        blocks.set_verts(list(vertices))
        if field:
            blocks.set_array(values[i])
        if bonds is not None:
            nodes = vertices.reshape(-1, 2)
            b = np.asarray(solution.bond_connectivity)
            bonds.set_segments(list(np.stack([nodes[b[:, 0]], nodes[b[:, 1]]], axis=1)))
        return (blocks,)

    anim = FuncAnimation(fig, update, frames=indices, blit=False)
    anim.save(out_path, writer=_movie_writer(fps), dpi=dpi)
    plt.close(fig)
    return out_path


def plot_mode(
    eigenmode_data: EigenmodeData,
    mode_index: int,
    amplitude: float = 0.3,
    ax=None,
    **kwargs,
):
    """Plot one eigenmode as a displaced configuration."""

    mode = np.asarray(eigenmode_data.fields)[mode_index]
    scale = amplitude / (np.abs(mode).max() + 1e-30)
    return plot_geometry(
        eigenmode_data.block_centroids,
        eigenmode_data.centroid_node_vectors,
        displacement=mode * scale,
        ax=ax,
        **kwargs,
    )


def plot_band_structure(
    arclength,
    omegas,
    corner_ticks=None,
    corner_labels: Optional[Sequence[str]] = None,
    gap_shading: bool = True,
    ax=None,
    **kwargs,
):
    """Band diagram along a k-path (no reference counterpart — the
    reference has no dispersion tooling).

    Args:
        arclength: (n_k,) cumulative path coordinate from
            :func:`~difflexmm_tpu.solver.bloch.high_symmetry_path`.
        omegas: (n_k, n_bands) frequencies
            (:func:`~difflexmm_tpu.solver.bloch.frequencies` of
            ``band_structure``).
        corner_ticks: corner arclengths (third return of
            ``high_symmetry_path``) drawn as vertical guides.
        corner_labels: tick labels, e.g. ``["$\\Gamma$", "X", "M"]``.
        gap_shading: shade global band gaps (bands never enter them at
            any plotted k).
    """

    if ax is None:
        _, ax = plt.subplots(figsize=(5, 4))
    s = np.asarray(arclength)
    om = np.asarray(omegas)
    kwargs.setdefault("color", "tab:blue")
    kwargs.setdefault("lw", 1.2)
    ax.plot(s, om, **kwargs)
    if gap_shading:
        hi, lo = om.max(axis=0), om.min(axis=0)
        for b in range(om.shape[1] - 1):
            top, bottom = hi[: b + 1].max(), lo[b + 1 :].min()
            if bottom > top + 1e-9:
                ax.axhspan(top, bottom, color="0.85", zorder=0)
    if corner_ticks is not None:
        ticks = np.asarray(corner_ticks)
        for t in ticks[1:-1]:
            ax.axvline(t, color="0.7", lw=0.6, zorder=0)
        ax.set_xticks(ticks)
        if corner_labels is not None:
            ax.set_xticklabels(corner_labels)
    ax.set_xlim(s[0], s[-1])
    ax.set_ylim(0, None)
    ax.set_xlabel("wave vector")
    ax.set_ylabel(r"$\omega$")
    return ax


def plot_density_of_states(
    omega_grid, dos, ax=None, vertical: bool = False, **kwargs
):
    """Phonon DOS panel (pairs with :func:`plot_band_structure`; pass
    ``vertical=True`` to share its frequency axis side-by-side)."""

    if ax is None:
        _, ax = plt.subplots(figsize=(2.5, 4) if vertical else (5, 3))
    og, g = np.asarray(omega_grid), np.asarray(dos)
    kwargs.setdefault("color", "tab:orange")
    if vertical:
        ax.fill_betweenx(og, 0.0, g, alpha=0.4, **kwargs)
        ax.plot(g, og, lw=1.0, color=kwargs["color"])
        ax.set_xlabel("DOS")
        ax.set_ylabel(r"$\omega$")
        ax.set_xlim(0, None)
    else:
        ax.fill_between(og, 0.0, g, alpha=0.4, **kwargs)
        ax.plot(og, g, lw=1.0, color=kwargs["color"])
        ax.set_xlabel(r"$\omega$")
        ax.set_ylabel("DOS")
        ax.set_ylim(0, None)
    return ax


def plot_video_frame_field_overlaid(
    video_path: Union[str, Path],
    frame_index: int,
    solution: SolutionData,
    timepoint_index: int,
    field: str = "|u|",
    pixels_per_unit: float = 100.0,
    origin_px=(0.0, 0.0),
    ax=None,
    alpha: float = 0.6,
):
    """Overlay the simulated field on an experimental video frame (cv2)."""

    import cv2

    cap = cv2.VideoCapture(str(video_path))
    cap.set(cv2.CAP_PROP_POS_FRAMES, frame_index)
    ok, frame = cap.read()
    cap.release()
    if not ok:
        raise IOError(f"Could not read frame {frame_index} from {video_path}.")
    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    if ax is None:
        _, ax = plt.subplots(figsize=(10, 8))
    ax.imshow(frame)

    vertices = current_block_polygons(
        solution.block_centroids,
        solution.centroid_node_vectors,
        np.asarray(solution.fields)[timepoint_index, 0],
    )
    vertices_px = vertices * pixels_per_unit + np.asarray(origin_px)
    blocks = block_collection(vertices_px, alpha=alpha)
    values = extract_block_field(solution, field)[timepoint_index]
    blocks.set_array(values)
    ax.add_collection(blocks)
    return ax


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv=None):
    """Render frames or an animation from a saved SolutionData pickle."""

    # Rendering never needs an accelerator; pin jax (used only to unpickle
    # arrays) to CPU before any backend initializes.
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    parser = argparse.ArgumentParser(
        description="Render difflexmm_tpu solution files."
    )
    parser.add_argument("solution", help="Path to a pickled SolutionData.")
    parser.add_argument("--out", default="animation.gif", help="Output path.")
    parser.add_argument("--field", default="|u|", help="Color field.")
    parser.add_argument("--fps", type=int, default=20)
    parser.add_argument("--frames", action="store_true",
                        help="Write PNG frames instead of an animation.")
    args = parser.parse_args(argv)

    solution = load_data(args.solution)
    if args.frames:
        paths = generate_frames(solution, Path(args.out), field=args.field)
        print(f"Wrote {len(paths)} frames to {args.out}")
    else:
        path = generate_animation(solution, args.out, field=args.field, fps=args.fps)
        print(f"Wrote animation to {path}")


if __name__ == "__main__":
    main()
