"""Shared building blocks for the design-problem (models) layer.

Every model family pairs a ``ForwardProblem`` dataclass (physical + loading
parameters -> a differentiable ``solve(design) -> SolutionData`` closure)
with an ``OptimizationProblem`` dataclass (objective + fabrication
constraints + optimizer loop). This module holds the pieces they share:
boundary-condition index builders, the raised-cosine pulse, fabrication
constraint builders, and dict/data (de)serialization helpers.

Behavioral parity: the BC layouts and constraint definitions mirror the
reference problem scripts (problems/quads_focusing.py:104-228, 473-544);
construction here is vectorized numpy instead of Python list concatenation.
"""

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry.edges import compute_block_angles, compute_edge_angles
from difflexmm_tpu.geometry.polygon import compute_edge_lengths
from difflexmm_tpu.utils.types import SolutionData


def all_dofs_pairs(block_ids: np.ndarray) -> np.ndarray:
    """[block, DOF] pairs covering all 3 DOFs of the given blocks.

    Layout: all DOF-0 pairs, then DOF-1, then DOF-2 (so a drive vector can
    address the first family contiguously).
    """

    block_ids = np.asarray(block_ids).reshape(-1)
    return np.stack(
        [
            np.tile(block_ids, 3),
            np.repeat(np.arange(3), len(block_ids)),
        ],
        axis=1,
    )


def driven_side_pairs(
    n1_blocks: int,
    n2_blocks: int,
    n_excited_blocks: int,
    loaded_side: str,
    input_shift: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Constrained pairs for a dynamically driven strip of edge blocks.

    The excited blocks sit centered (plus ``input_shift``) on the chosen
    side; all three DOFs are constrained, with the drive applied on the
    side-normal translation DOF and the other two pinned to zero.

    Returns:
        (pairs (3k, 2), drive_mask (3k,)) — drive_mask is 1 on the driven
        DOF entries, 0 on the pinned ones.
    """

    k = n_excited_blocks
    if loaded_side in ("left", "right"):
        rows = np.arange((n2_blocks - k) // 2 + input_shift,
                         (n2_blocks + k) // 2 + input_shift)
        col = 0 if loaded_side == "left" else n1_blocks - 1
        blocks = rows * n1_blocks + col
        dof_order = [0, 1, 2]  # drive x
    elif loaded_side in ("bottom", "top"):
        cols = np.arange((n1_blocks - k) // 2 + input_shift,
                         (n1_blocks + k) // 2 + input_shift)
        row = 0 if loaded_side == "bottom" else n2_blocks - 1
        blocks = row * n1_blocks + cols
        dof_order = [1, 0, 2]  # drive y
    else:
        raise ValueError(
            f"Unknown loaded_side: {loaded_side!r}; expected left/right/bottom/top."
        )

    pairs = np.stack(
        [np.tile(blocks, 3), np.repeat(dof_order, k)], axis=1
    )
    drive_mask = np.zeros(3 * k)
    drive_mask[:k] = 1.0
    return pairs, drive_mask


def corner_block_ids(n1_blocks: int, n2_blocks: int, n_clamped: int) -> np.ndarray:
    """Blocks forming the four L-shaped clamped corners (2n-1 blocks each)."""

    n = n_clamped
    nb = n1_blocks * n2_blocks
    bl = np.concatenate([np.arange(n), np.arange(1, n) * n1_blocks])
    br = np.concatenate(
        [np.arange(n1_blocks - n, n1_blocks), (np.arange(1, n) + 1) * n1_blocks - 1]
    )
    tr = np.concatenate(
        [np.arange(nb - n, nb), nb - 1 - np.arange(1, n) * n1_blocks]
    )
    tl = np.concatenate(
        [np.arange(nb - n1_blocks, nb - n1_blocks + n),
         nb - n1_blocks - np.arange(1, n) * n1_blocks]
    )
    return np.concatenate([bl, br, tr, tl])


def clamped_corner_pairs(n1_blocks: int, n2_blocks: int, n_clamped: int) -> np.ndarray:
    """All-DOF constrained pairs for the four clamped corners."""

    return all_dofs_pairs(corner_block_ids(n1_blocks, n2_blocks, n_clamped))


def check_disjoint_constrained_pairs(**groups: np.ndarray) -> None:
    """Fail loudly when constraint groups claim the same [block, DOF].

    The solver resolves duplicate constrained pairs last-write-wins (the
    reference's ``.at[].set`` scatter does the same), so e.g. a corner
    clamp that overlaps the driven strip silently ZEROES the drive — the
    simulation runs, the objective is exactly 0, and nothing errors. This
    check turns that degenerate configuration (too-small lattices, large
    ``input_shift``) into a ValueError at setup time naming the colliding
    groups.
    """

    names = list(groups)
    keysets = {
        name: {(int(b), int(d)) for b, d in np.asarray(pairs).reshape(-1, 2)}
        for name, pairs in groups.items()
    }
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            overlap = keysets[a] & keysets[b]
            if overlap:
                sample = sorted(overlap)[:6]
                raise ValueError(
                    f"Constrained [block, DOF] pairs of '{a}' and '{b}' "
                    f"overlap on {len(overlap)} entries (e.g. {sample}); "
                    "the scatter is last-write-wins, so the earlier group's "
                    "drive would be silently overwritten. Shrink the clamps "
                    "or excited strip (or reduce input_shift) so the groups "
                    "are disjoint."
                )


def target_patch_ids(
    n1_blocks: int,
    n2_blocks: int,
    target_size: Tuple[int, int],
    target_shift: Tuple[int, int],
) -> np.ndarray:
    """Block ids of a centered (shifted) rectangular target patch.

    Iterates i (column) outer, j (row) inner, matching the reference target
    layout (quads_focusing.py:447-451).
    """

    i0 = (n1_blocks - target_size[0]) // 2 + target_shift[0]
    j0 = (n2_blocks - target_size[1]) // 2 + target_shift[1]
    I, J = np.meshgrid(
        np.arange(i0, i0 + target_size[0]),
        np.arange(j0, j0 + target_size[1]),
        indexing="ij",
    )
    return (J * n1_blocks + I).reshape(-1)


def resolve_model_guard(guard, min_angle, cutoff_angle, spacing):
    """Resolve a model-level ``guard`` field into a solver guard spec.

    ``None`` -> off; ``"auto"`` -> the cost-proportional production spec:
    threshold from the contact-barrier window (``cutoff_angle -
    min_angle``), translational travel counted at the lattice ``spacing``,
    the travel term gated on barrier PROXIMITY (2 windows —
    fast-but-far-from-contact trajectories pay nothing) plus the
    unconditional hard stability term (0.1 window — force spikes away
    from contact, exploding states, NaN). Margins measured at the
    flagship: PROXIMITY_STUDY.json (healthy voids stay >= 6 windows out
    at <= 1.6x-threshold travel; unstable optimizer-exploit designs
    exceed the hard term by ~1e8x). A dict passes through (with
    ``window`` / ``length_scale`` filled in when absent) — travel-only
    unless it sets proximity keys itself, which maximizes refinement
    (e.g. deliberately coarse ``n_substeps``) at travel-proportional
    cost. The ``translation`` mode is left to the backend: grid layouts
    default to "relative" (neighbor velocity differences — bulk pulse
    motion closes no void and must not fire), the dense layout to
    "absolute". See solver.dynamics.setup_dynamic_solver's ``guard``
    docs.
    """

    if guard is None:
        return None
    if guard == "auto":
        guard = {"proximity_windows": 2.0, "hard_fraction": 0.1}
    elif not isinstance(guard, dict):
        raise ValueError(f"guard must be None, 'auto', or a dict; got {guard!r}")
    guard = dict(guard)
    if "threshold" not in guard and "window" not in guard:
        guard["window"] = float(cutoff_angle) - float(min_angle)
    guard.setdefault("length_scale", float(spacing))
    return guard


def pulse(t, amplitude, loading_rate):
    """Raised-cosine displacement pulse of duration 1/loading_rate."""

    return amplitude * jnp.where(
        (t > 0.0) & (t < 1.0 / loading_rate),
        (1.0 - jnp.cos(2.0 * jnp.pi * loading_rate * t)) / 2.0,
        0.0,
    )


def quad_boundary_node_ids(n1_blocks: int, n2_blocks: int) -> np.ndarray:
    """Global node ids on the outer boundary of a quad lattice (ccw)."""

    nb = n1_blocks * n2_blocks
    bottom = np.arange(n1_blocks) * 4 + 3
    right = (np.arange(n1_blocks - 1, nb, n1_blocks)) * 4 + 0
    top = (np.arange(nb - 1, nb - n1_blocks - 1, -1)) * 4 + 1
    left = (np.arange(0, nb, n1_blocks)) * 4 + 2
    return np.concatenate([bottom, right, top, left])


def build_angle_constraints(
    centroid_node_vectors_fn,
    bond_connectivity,
    min_void_angle: float,
    min_block_angle: float,
    boundary_node_ids=None,
):
    """Fabrication angle constraints g(design) <= 0 on voids and blocks.

    Angles are wrapped to [0, 2pi) as in the reference
    (quads_focusing.py:497-532); optionally also constrains the boundary
    block wedges.
    """

    def angle_constraints(design):
        node_vectors = centroid_node_vectors_fn(*design)
        v1, v2, b1, b2 = compute_edge_angles(node_vectors, bond_connectivity)
        parts = [
            min_void_angle - jnp.mod(v1, 2 * jnp.pi),
            min_void_angle - jnp.mod(v2, 2 * jnp.pi),
            min_block_angle - jnp.mod(b1, 2 * jnp.pi),
            min_block_angle - jnp.mod(b2, 2 * jnp.pi),
        ]
        if boundary_node_ids is not None:
            boundary = compute_block_angles(node_vectors, boundary_node_ids)
            parts.append(min_block_angle - jnp.mod(boundary, 2 * jnp.pi))
        return jnp.concatenate(parts)

    return angle_constraints


def build_edge_length_constraints(centroid_node_vectors_fn, min_edge_length: float):
    """Fabrication edge-length constraints g(design) <= 0."""

    def edge_length_constraints(design):
        lengths = compute_edge_lengths(centroid_node_vectors_fn(*design))
        return (min_edge_length - lengths).reshape(-1)

    return edge_length_constraints


# ---------------------------------------------------------------------------
# (De)serialization helpers shared by all problem dataclasses.
# ---------------------------------------------------------------------------


def solution_to_dict(solution):
    if solution is None:
        return None
    if isinstance(solution, list):
        return [s._asdict() for s in solution]
    return solution._asdict()


def solution_from_dict(data):
    if data is None:
        return None
    if isinstance(data, list):
        return [SolutionData(**d) for d in data]
    if isinstance(data, dict):
        return SolutionData(**data)
    return data


def problem_to_dict(problem) -> dict:
    """Dataclass -> plain dict with SolutionData converted to dicts."""

    out = dataclasses.asdict(problem)
    if "solution_data" in out:
        sd = getattr(problem, "solution_data", None)
        out["solution_data"] = solution_to_dict(sd)
    return out


def forward_problem_from_dict(cls, dict_in: dict):
    """Rebuild a ForwardProblem-style dataclass from a dict."""

    data = dict(dict_in)
    if "solution_data" in data:
        data["solution_data"] = solution_from_dict(data["solution_data"])
    problem = cls(**data)
    problem.is_setup = False
    return problem
