"""Fused Pallas TPU kernel: velocity-Verlet on the kagome-grid energy.

Kagome binding of the lattice-agnostic machinery in
:mod:`difflexmm_tpu.ops.pallas.core` (quads: verlet_grid.py). Kagome cells
tile an (n2, n1) grid with two triangular blocks per cell (block ``2*cell``
"down", ``2*cell+1`` "up"); the state is SoA planes of shape (6, n2, n1)
with channel order (ux_down, uy_down, th_down, ux_up, uy_up, th_up). The
three bond families (internal / boundary-1 / boundary-2, see
ops/kagome_grid.py and geometry/kagome.py) are lane/sublane-shifted slices
over the cell grid — no gathers anywhere in the kernel.

Behavioral parity: the reference's kagome lattices run through its generic
gather-based assembly (difflexmm/energy.py:410-449 on
geometry.py:607-801 connectivity); this kernel is the TPU-native
equivalent, bit-matched to our general path by tests.

vmap (multi-start) note: trajectory outputs stream to HBM in chunks
(core.build_verlet_trajectory), so batch size is bounded by HBM, not VMEM;
under vmap the batch axis becomes the leading (batch-major) grid dimension.
Fleets beyond one chip shard designs over the device mesh
(parallel/scenarios.py).
"""

from typing import Callable

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.ops import kagome_grid
from difflexmm_tpu.ops.contact import contact_energy
from difflexmm_tpu.ops.pallas import core
from difflexmm_tpu.ops.pallas.verlet_grid import _angle, _ligament_planes

# Fixed (non-drive) leaves of the arrays tuple, in order:
# cnv_planes (2,3,2,n2,n1)  [triangle, corner, component, j, i],
# centroid_planes (2,2,n2,n1)  [triangle, component, j, i],
# ref_i (2,n2,n1), ref_b1 (2,n2-1,n1), ref_b2 (2,n2,n1-1),
# ks_i, ksh_i, kr_i, ks_b1, ksh_b1, kr_b1, ks_b2, ksh_b2, kr_b2
#   ((n2,n1) / (n2-1,n1) / (n2,n1-1) or (1,1)),
# cmin, ccut, kc (1,1), inertia (6,n2,n1), damping (6,n2,n1),
# free_mask (6,n2,n1), S_chan (6,k), S_row (n2,k), S_col (k,n1)
# [+ L_chan, L_row, L_col appended when force loading is fused].
N_FIXED_ARRAYS = 23


# ---------------------------------------------------------------------------
# Layout conversion (runs in XLA, outside the kernel)
# ---------------------------------------------------------------------------


def to_planes(field: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """(nb, C) block field -> (2*C, n2, n1) planes, down channels first."""

    C = field.shape[-1]
    return jnp.transpose(field.reshape(n2, n1, 2, C), (2, 3, 0, 1)).reshape(
        2 * C, n2, n1
    )


def fields_from_planes(out: jnp.ndarray, n_blocks: int) -> jnp.ndarray:
    """(T-1, 2, 6, n2, n1) stacked (U, V) planes -> (T-1, 2, nb, 3)."""

    T1, two, _, n2, n1 = out.shape
    out = out.reshape(T1, two, 2, 3, n2, n1)
    out = jnp.transpose(out, (0, 1, 4, 5, 2, 3))  # (T-1, 2, n2, n1, tri, 3)
    return out.reshape(T1, two, n_blocks, 3)


def cnv_to_planes(cnv: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """(nb, 3, 2) centroid-node vectors -> (2, 3, 2, n2, n1)."""

    return jnp.transpose(cnv.reshape(n2, n1, 2, 3, 2), (2, 3, 4, 0, 1))


def centroids_to_planes(bc: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """(nb, 2) block centroids -> (2, 2, n2, n1) [triangle, comp, j, i]."""

    return jnp.transpose(bc.reshape(n2, n1, 2, 2), (2, 3, 0, 1))


def scatter_matrix_planes(
    n1: int, n2: int, constrained_blocks, constrained_dofs, combine: str = "last"
):
    """Factorized one-hot scatter of [block, DOF] pairs into kagome plane
    layout (channel = triangle * 3 + DOF, row/col = cell grid position).
    Returns the ``(S_chan, S_row, S_col)`` triple consumed by
    ``core.apply_scatter``; duplicate handling in ``core.scatter_factors``."""

    blocks = np.asarray(constrained_blocks)
    cells, tris = blocks // 2, blocks % 2
    return core.scatter_factors(
        n1, n2, 6, tris * 3 + np.asarray(constrained_dofs),
        cells // n1, cells % n1, combine,
    )


def split_bond_planes(value, n1: int, n2: int):
    """Scalar-or-(n_bonds,) bond quantity -> (internal, b1, b2) planes.

    Delegates to ops/kagome_grid.py's splitter — the single source of truth
    for the bond-family ordering of geometry/kagome.py connectivity.
    """

    return kagome_grid._split(value, n1, n2)


def split_ref_planes(ref, n1: int, n2: int):
    """(n_bonds, 2) reference vectors -> three (2, ...) plane pairs."""

    ref = jnp.asarray(ref)
    if ref.ndim == 1:  # one shared (2,) reference vector
        return (
            jnp.broadcast_to(ref[:, None, None], (2, n2, n1)),
            jnp.broadcast_to(ref[:, None, None], (2, n2 - 1, n1)),
            jnp.broadcast_to(ref[:, None, None], (2, n2, n1 - 1)),
        )
    return tuple(
        jnp.moveaxis(r, -1, 0) for r in kagome_grid._split_ref(ref, n1, n2)
    )


# ---------------------------------------------------------------------------
# SoA physics
# ---------------------------------------------------------------------------


def kagome_grid_energy_planes(
    U,  # (6, *lead, n2, n1)
    cnv,  # (2, 3, 2, *lead, n2, n1)
    centroids,  # (2, 2, *lead, n2, n1)
    ref_i, ref_b1, ref_b2,
    ks_i, ksh_i, kr_i, ks_b1, ksh_b1, kr_b1, ks_b2, ksh_b2, kr_b2,
    cmin, ccut, kc,
    linearized: bool = False,
    use_contact: bool = True,
    b2_contact_mask=None,
):
    """Total strain (+ contact) energy of the kagome lattice on planes.

    Same physics as ops/kagome_grid.py:build_kagome_grid_energy, in SoA
    layout (bond ends and void corners per family documented there).

    Slicing is ellipsis-based on the trailing (n2, n1) pair, so planes may
    carry extra leading dims — the design-tiled batched layout
    (ops/pallas/tiling.py applied to kagome CELL planes) packs B2 designs
    along the lane (n1) axis and B1 along a leading dim. Only the
    boundary-2 family (cell (j, i) <-> (j, i+1)) crosses lane seams:
    seam bonds get zero stiffness + a safe reference from the tiler, and
    ``b2_contact_mask`` (broadcastable to the b2 void planes
    (*lead, n2, n1-1)) zeroes the seam-crossing contact barrier. Internal
    bonds never leave a cell and boundary-1 bonds cross rows only.
    """

    # Node displacements per triangle (d) / corner (k): 3 planes each side.
    d = []  # d[tri][corner] = (dx, dy)
    for tri in range(2):
        ux, uy, th = U[3 * tri], U[3 * tri + 1], U[3 * tri + 2]
        cth, sth = jnp.cos(th), jnp.sin(th)
        d.append([
            (
                ux + (cth - 1.0) * cnv[tri, k, 0] - sth * cnv[tri, k, 1],
                uy + sth * cnv[tri, k, 0] + (cth - 1.0) * cnv[tri, k, 1],
            )
            for k in range(3)
        ])
    thd, thu = U[2], U[5]
    down, up = d

    # Internal bonds: down corner 1 -> up corner 0, same cell.
    e_i = _ligament_planes(
        up[0][0] - down[1][0], up[0][1] - down[1][1],
        thd, thu, ref_i[0], ref_i[1], ks_i, ksh_i, kr_i, linearized,
    )
    # Boundary-1 bonds: down corner 0 of (j+1, i) -> up corner 2 of (j, i).
    e_b1 = _ligament_planes(
        up[2][0][..., :-1, :] - down[0][0][..., 1:, :],
        up[2][1][..., :-1, :] - down[0][1][..., 1:, :],
        thd[..., 1:, :], thu[..., :-1, :], ref_b1[0], ref_b1[1],
        ks_b1, ksh_b1, kr_b1, linearized,
    )
    # Boundary-2 bonds: down corner 2 of (j, i+1) -> up corner 1 of (j, i).
    e_b2 = _ligament_planes(
        up[1][0][..., :, :-1] - down[2][0][..., :, 1:],
        up[1][1][..., :, :-1] - down[2][1][..., :, 1:],
        thd[..., :, 1:], thu[..., :, :-1], ref_b2[0], ref_b2[1],
        ks_b2, ksh_b2, kr_b2, linearized,
    )
    energy = jnp.sum(e_i) + jnp.sum(e_b1) + jnp.sum(e_b2)

    if not use_contact:
        return energy

    # Absolute corner positions.
    p = [
        [
            (
                centroids[tri, 0] + cnv[tri, k, 0] + d[tri][k][0],
                centroids[tri, 1] + cnv[tri, k, 1] + d[tri][k][1],
            )
            for k in range(3)
        ]
        for tri in range(2)
    ]

    def voids(p1, c1, p2, c2, slice1, slice2):
        """Void angles at bonds joining corner c1 (tri planes p1, slice1)
        to corner c2 (tri planes p2, slice2); _angle is scale-invariant so
        edge vectors need no normalization."""

        n1x = p1[(c1 + 1) % 3][0][slice1] - p1[c1][0][slice1]
        n1y = p1[(c1 + 1) % 3][1][slice1] - p1[c1][1][slice1]
        p1x = p1[(c1 - 1) % 3][0][slice1] - p1[c1][0][slice1]
        p1y = p1[(c1 - 1) % 3][1][slice1] - p1[c1][1][slice1]
        n2x = p2[(c2 + 1) % 3][0][slice2] - p2[c2][0][slice2]
        n2y = p2[(c2 + 1) % 3][1][slice2] - p2[c2][1][slice2]
        p2x = p2[(c2 - 1) % 3][0][slice2] - p2[c2][0][slice2]
        p2y = p2[(c2 - 1) % 3][1][slice2] - p2[c2][1][slice2]
        return (
            _angle(p2x, p2y, n1x, n1y),
            _angle(p1x, p1y, n2x, n2y),
        )

    sl = jnp.index_exp
    full = sl[...]
    kc_b2 = kc if b2_contact_mask is None else kc * b2_contact_mask
    gaps = (
        # internal
        *((g, kc) for g in voids(p[0], 1, p[1], 0, full, full)),
        # boundary 1
        *((g, kc) for g in voids(
            p[0], 0, p[1], 2, sl[..., 1:, :], sl[..., :-1, :]
        )),
        # boundary 2 (the only family crossing design seams when tiled)
        *((g, kc_b2) for g in voids(
            p[0], 2, p[1], 1, sl[..., :, 1:], sl[..., :, :-1]
        )),
    )
    contact = sum(
        jnp.sum(contact_energy(g, min_angle=cmin, cutoff_angle=ccut, k_contact=k))
        for g, k in gaps
    )
    return energy + contact


def kagome_min_void_gap_planes(U, cnv, centroids, ccut):
    """Min void angle minus the contact cutoff, scalar (guard proximity).

    Same corner/void math as :func:`kagome_grid_energy_planes`'s contact
    term, reduced to the single closest gap (quad analogue:
    verlet_grid.quad_min_void_gap_planes)."""

    p = []
    for tri in range(2):
        ux, uy, th = U[3 * tri], U[3 * tri + 1], U[3 * tri + 2]
        cth, sth = jnp.cos(th), jnp.sin(th)
        p.append([
            (
                centroids[tri, 0] + ux
                + cth * cnv[tri, k, 0] - sth * cnv[tri, k, 1],
                centroids[tri, 1] + uy
                + sth * cnv[tri, k, 0] + cth * cnv[tri, k, 1],
            )
            for k in range(3)
        ])

    def voids(p1, c1, p2, c2, slice1, slice2):
        n1x = p1[(c1 + 1) % 3][0][slice1] - p1[c1][0][slice1]
        n1y = p1[(c1 + 1) % 3][1][slice1] - p1[c1][1][slice1]
        p1x = p1[(c1 - 1) % 3][0][slice1] - p1[c1][0][slice1]
        p1y = p1[(c1 - 1) % 3][1][slice1] - p1[c1][1][slice1]
        n2x = p2[(c2 + 1) % 3][0][slice2] - p2[c2][0][slice2]
        n2y = p2[(c2 + 1) % 3][1][slice2] - p2[c2][1][slice2]
        p2x = p2[(c2 - 1) % 3][0][slice2] - p2[c2][0][slice2]
        p2y = p2[(c2 - 1) % 3][1][slice2] - p2[c2][1][slice2]
        return (
            jnp.min(_angle(p2x, p2y, n1x, n1y)),
            jnp.min(_angle(p1x, p1y, n2x, n2y)),
        )

    sl = jnp.index_exp
    full = sl[...]
    gaps = (
        voids(p[0], 1, p[1], 0, full, full)
        + voids(p[0], 0, p[1], 2, sl[..., 1:, :], sl[..., :-1, :])
        + voids(p[0], 2, p[1], 1, sl[..., :, 1:], sl[..., :, :-1])
    )
    out = jnp.min(gaps[0])
    for g in gaps[1:]:
        out = jnp.minimum(out, jnp.min(g))
    return out - jnp.min(ccut)


def _kagome_gap_of(use_contact: bool) -> Callable:
    """Barrier-gap hook for the guard's proximity term; +inf with contact
    off (statically, or dynamically via k_contact = 0) so only the hard
    stability term remains."""

    def gap_of(U, fixed):
        if not use_contact:
            return jnp.asarray(jnp.inf, U.dtype)
        cnv, centroids = fixed[0], fixed[1]
        ccut, kc = fixed[15], fixed[16]
        gap = kagome_min_void_gap_planes(U, cnv, centroids, ccut)
        return jnp.where(
            jnp.min(kc) > 0, gap, jnp.asarray(jnp.inf, U.dtype)
        )

    return gap_of


def _kagome_energy_of(
    linearized: bool, use_contact: bool, tiled: bool = False
) -> Callable:
    """Bind kagome_grid_energy_planes to the fixed-leaves convention.

    ``tiled``: the design-tiled layout appends one extra fixed leaf — the
    boundary-2 seam contact mask (see ops/pallas/tiling.py)."""

    def energy_of(U, fixed):
        # The tail (inertia, damping, mask, scatter factors) is solver data.
        (cnv, centroids, ref_i, ref_b1, ref_b2,
         ks_i, ksh_i, kr_i, ks_b1, ksh_b1, kr_b1, ks_b2, ksh_b2, kr_b2,
         cmin, ccut, kc) = fixed[:17]
        b2_mask = fixed[17] if tiled else None
        return kagome_grid_energy_planes(
            U, cnv, centroids, ref_i, ref_b1, ref_b2,
            ks_i, ksh_i, kr_i, ks_b1, ksh_b1, kr_b1, ks_b2, ksh_b2, kr_b2,
            cmin, ccut, kc,
            linearized=linearized, use_contact=use_contact,
            b2_contact_mask=b2_mask,
        )

    return energy_of


def build_pallas_kagome_trajectory(
    n1: int,
    n2: int,
    n_substeps: int,
    n_timepoints: int,
    drive_values_fn: Callable,
    load_values_fn: Callable = None,
    linearized: bool = False,
    use_contact: bool = True,
    interpret: bool = False,
    chunk: int = None,
    forward_impl: str = "pallas",
    guard=None,
    tiled: bool = False,
):
    """Chunked whole-trajectory fused kagome kernel; see
    core.build_verlet_trajectory. ``guard``: reactive substep escalation
    (core.resolve_guard; theta lives in plane channels 2 and 5).
    ``tiled``: design-tiled batched layout — planes carry (B1, n2, B2*n1)
    and the fixed leaves gain the boundary-2 seam contact mask after the
    contact scalars (ops/pallas/tiling.py)."""

    n_fixed = (
        N_FIXED_ARRAYS
        + (1 if tiled else 0)
        + (3 if load_values_fn is not None else 0)
    )
    return core.build_verlet_trajectory(
        n_fixed,
        n_substeps,
        n_timepoints,
        _kagome_energy_of(linearized, use_contact, tiled=tiled),
        drive_values_fn,
        load_values_fn=load_values_fn,
        interpret=interpret,
        chunk=chunk,
        forward_impl=forward_impl,
        guard=core.resolve_guard(guard, theta_channels=(2, 5)),
        gap_of=_kagome_gap_of(use_contact),
    )
