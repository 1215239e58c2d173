"""Fused Pallas TPU kernel: velocity-Verlet on the quad-grid energy,
entirely in VMEM, in structure-of-arrays layout.

Why SoA: Mosaic tiles the trailing dimension to 128 lanes, so the physics'
natural (..., 2/3)-component arrays waste ~60x VMEM per intermediate — the
grad-traced energy OOMs scoped VMEM beyond tiny lattices. Here every field
is a component *plane* of shape (n2, n1): state (3, n2, n1), corner
geometry (4, 2, n2, n1), bond quantities (n2, n1-1)/(n2-1, n1). All physics
is elementwise plane arithmetic plus lane/sublane-shifted slices; the
driven-constraint scatter is a one-hot matmul emitting plane layout
directly. The whole interval (n_substeps Verlet steps, one energy gradient
each) runs as a single Pallas program.

Reverse-mode: ``jax.custom_vjp`` — forward is the Pallas kernel; backward
rematerializes the interval with the identical-math XLA body and transposes
it (the ``jax.checkpoint`` structure of the XLA path). atan2 lowers via a
minimax polynomial inside the kernel (ops/mathx.py).

The Verlet body / Pallas wrappers / scan transpose are lattice-agnostic and
live in :mod:`difflexmm_tpu.ops.pallas.core`; this module binds them to the
quad lattice (kagome binding: verlet_kagome.py).
"""

from typing import Callable

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.ops import mathx
from difflexmm_tpu.ops.contact import contact_energy
from difflexmm_tpu.ops.pallas import core
from difflexmm_tpu.ops.pallas.core import normalize_arrays  # re-export

# Fixed (non-drive) leaves of the arrays tuple, in order:
# cnv_planes (4,2,n2,n1), centroid_planes (2,n2,n1),
# ref_h (2,n2,n1-1), ref_v (2,n2-1,n1),
# ks_h, ksh_h, kr_h (n2,n1-1 or (1,1)), ks_v, ksh_v, kr_v,
# cmin, ccut, kc (1,1), inertia_planes (3,n2,n1), damping_planes (3,n2,n1),
# free_mask_planes (3,n2,n1), S_chan (3,k), S_row (n2,k), S_col (k,n1)
# [+ L_chan, L_row, L_col appended when force loading is fused].
N_FIXED_ARRAYS = 19


# ---------------------------------------------------------------------------
# Layout conversion (runs in XLA, outside the kernel)
# ---------------------------------------------------------------------------


def to_planes(field: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """(nb, C) block field -> (C, n2, n1) planes."""

    C = field.shape[-1]
    return jnp.moveaxis(field.reshape(n2, n1, C), -1, 0)


def cnv_to_planes(cnv: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """(nb, 4, 2) centroid-node vectors -> (4, 2, n2, n1)."""

    return jnp.transpose(cnv.reshape(n2, n1, 4, 2), (2, 3, 0, 1))


def fields_from_planes(out: jnp.ndarray, n_blocks: int) -> jnp.ndarray:
    """(T-1, 2, 3, n2, n1) stacked (U, V) planes -> (T-1, 2, nb, 3)."""

    return jnp.moveaxis(out, 2, -1).reshape(out.shape[0], 2, n_blocks, 3)


def scatter_matrix_planes(
    n1: int, n2: int, constrained_blocks, constrained_dofs, combine: str = "last"
):
    """Factorized one-hot scatter of [block, DOF] pairs into quad plane
    layout (channel = DOF, row/col = block grid position). Returns the
    ``(S_chan, S_row, S_col)`` triple consumed by ``core.apply_scatter``;
    duplicate handling (``last``/``add``) in ``core.scatter_factors``."""

    blocks = np.asarray(constrained_blocks)
    return core.scatter_factors(
        n1, n2, 3, np.asarray(constrained_dofs), blocks // n1, blocks % n1,
        combine,
    )


# ---------------------------------------------------------------------------
# SoA physics
# ---------------------------------------------------------------------------


def _ligament_planes(dUx, dUy, th1, th2, refx, refy, ks, ksh, kr, linearized):
    """Per-bond ligament energy on component planes."""

    l0sq = refx * refx + refy * refy
    dRot = th2 - th1
    if linearized:
        axial = (dUx * refx + dUy * refy) / l0sq
        shear = (refx * dUy - refy * dUx) / l0sq - (th1 + th2) / 2
    else:
        rx = dUx + refx
        ry = dUy + refy
        axial = jnp.sqrt((rx * rx + ry * ry) / l0sq) - 1.0
        mean = (th1 + th2) / 2
        c, s = jnp.cos(mean), jnp.sin(mean)
        px = c * refx - s * refy
        py = s * refx + c * refy
        shear = mathx.arctan2(px * ry - py * rx, px * rx + py * ry)
    return (ks * axial**2 * l0sq + ksh * shear**2 * l0sq + kr * dRot**2) / 2


def _angle(ax, ay, bx, by):
    """Signed angle from (ax, ay) to (bx, by) planes (scale-invariant)."""

    return mathx.arctan2(ax * by - ay * bx, ax * bx + ay * by)


def quad_grid_energy_planes(
    U,  # (3, *lead, n2, n1): ux, uy, theta
    cnv,  # (4, 2, *lead, n2, n1)
    centroids,  # (2, *lead, n2, n1)
    ref_h, ref_v,  # (2, *lead, n2, n1-1), (2, *lead, n2-1, n1)
    ks_h, ksh_h, kr_h, ks_v, ksh_v, kr_v,
    cmin, ccut, kc,
    linearized: bool = False,
    use_contact: bool = True,
    include_strain: bool = True,
    h_contact_mask=None,
):
    """Total strain (+ contact) energy of the quad lattice on planes.

    Same physics as ops/grid.py:quad_grid_energy_core, in SoA layout.
    ``include_strain=False`` returns the contact term alone (used to split
    the gradient graph when register pressure matters).

    Slicing is ellipsis-based on the trailing (n2, n1) pair, so planes may
    carry extra leading dims. The design-tiled batched layout
    (ops/pallas/tiling.py) uses this: ``B2`` independent designs side by
    side along the lane (n1) axis and ``B1`` along an extra leading dim —
    bonds crossing a lane seam get zero stiffness and a safe (1, 0)
    reference vector from the tiler, and ``h_contact_mask`` (broadcastable
    to the horizontal void-angle planes (*lead, n2, n1-1)) zeroes the
    seam-crossing contact barrier. Vertical bonds never cross designs (the
    B1 copies live in a separate leading dim), so no vertical mask exists.
    """

    ux, uy, th = U[0], U[1], U[2]
    cth, sth = jnp.cos(th), jnp.sin(th)

    # Node displacements and absolute positions per corner (4 planes each).
    dx = [ux + (cth - 1.0) * cnv[k, 0] - sth * cnv[k, 1] for k in range(4)]
    dy = [uy + sth * cnv[k, 0] + (cth - 1.0) * cnv[k, 1] for k in range(4)]

    energy = 0.0
    if include_strain:
        # Horizontal bonds: corner 0 of (j, i) -> corner 2 of (j, i+1).
        hUx = dx[2][..., 1:] - dx[0][..., :-1]
        hUy = dy[2][..., 1:] - dy[0][..., :-1]
        e_h = _ligament_planes(
            hUx, hUy, th[..., :-1], th[..., 1:], ref_h[0], ref_h[1],
            ks_h, ksh_h, kr_h, linearized,
        )
        # Vertical bonds: corner 1 of (j, i) -> corner 3 of (j+1, i).
        vUx = dx[3][..., 1:, :] - dx[1][..., :-1, :]
        vUy = dy[3][..., 1:, :] - dy[1][..., :-1, :]
        e_v = _ligament_planes(
            vUx, vUy, th[..., :-1, :], th[..., 1:, :], ref_v[0], ref_v[1],
            ks_v, ksh_v, kr_v, linearized,
        )
        energy = jnp.sum(e_h) + jnp.sum(e_v)

    if not use_contact:
        return energy

    px = [centroids[0] + cnv[k, 0] + dx[k] for k in range(4)]
    py = [centroids[1] + cnv[k, 1] + dy[k] for k in range(4)]

    def voids(c1, c2, slice1, slice2):
        """Void angles at bonds joining corner c1 (block slice1) to corner
        c2 (block slice2)."""

        n1x = px[(c1 + 1) % 4][slice1] - px[c1][slice1]
        n1y = py[(c1 + 1) % 4][slice1] - py[c1][slice1]
        p1x = px[(c1 - 1) % 4][slice1] - px[c1][slice1]
        p1y = py[(c1 - 1) % 4][slice1] - py[c1][slice1]
        n2x = px[(c2 + 1) % 4][slice2] - px[c2][slice2]
        n2y = py[(c2 + 1) % 4][slice2] - py[c2][slice2]
        p2x = px[(c2 - 1) % 4][slice2] - px[c2][slice2]
        p2y = py[(c2 - 1) % 4][slice2] - py[c2][slice2]
        void_1 = _angle(p2x, p2y, n1x, n1y)
        void_2 = _angle(p1x, p1y, n2x, n2y)
        return void_1, void_2

    sl = jnp.index_exp
    vh1, vh2 = voids(0, 2, sl[..., :-1], sl[..., 1:])
    vv1, vv2 = voids(1, 3, sl[..., :-1, :], sl[..., 1:, :])
    kc_h = kc if h_contact_mask is None else kc * h_contact_mask
    contact = sum(
        jnp.sum(contact_energy(g, min_angle=cmin, cutoff_angle=ccut, k_contact=k))
        for g, k in ((vh1, kc_h), (vh2, kc_h), (vv1, kc), (vv2, kc))
    )
    return energy + contact


def quad_min_void_gap_planes(U, cnv, centroids, ccut):
    """Min void angle minus the contact cutoff, scalar (guard proximity).

    Same corner/void math as :func:`quad_grid_energy_planes`'s contact
    term (slices, poly atan2 — Mosaic-lowerable), reduced to the single
    closest gap. Positive = the nearest void is that many radians above
    the barrier's C^1 cutoff; ~2 barrier windows is the measured safe
    proximity margin (PROXIMITY_STUDY.json).
    """

    ux, uy, th = U[0], U[1], U[2]
    cth, sth = jnp.cos(th), jnp.sin(th)
    px = [
        centroids[0] + ux + cth * cnv[k, 0] - sth * cnv[k, 1]
        for k in range(4)
    ]
    py = [
        centroids[1] + uy + sth * cnv[k, 0] + cth * cnv[k, 1]
        for k in range(4)
    ]

    def voids(c1, c2, slice1, slice2):
        n1x = px[(c1 + 1) % 4][slice1] - px[c1][slice1]
        n1y = py[(c1 + 1) % 4][slice1] - py[c1][slice1]
        p1x = px[(c1 - 1) % 4][slice1] - px[c1][slice1]
        p1y = py[(c1 - 1) % 4][slice1] - py[c1][slice1]
        n2x = px[(c2 + 1) % 4][slice2] - px[c2][slice2]
        n2y = py[(c2 + 1) % 4][slice2] - py[c2][slice2]
        p2x = px[(c2 - 1) % 4][slice2] - px[c2][slice2]
        p2y = py[(c2 - 1) % 4][slice2] - py[c2][slice2]
        return (
            jnp.min(_angle(p2x, p2y, n1x, n1y)),
            jnp.min(_angle(p1x, p1y, n2x, n2y)),
        )

    sl = jnp.index_exp
    gaps = voids(0, 2, sl[..., :-1], sl[..., 1:]) + voids(
        1, 3, sl[..., :-1, :], sl[..., 1:, :]
    )
    out = gaps[0]
    for g in gaps[1:]:
        out = jnp.minimum(out, g)
    return out - jnp.min(ccut)


def _quad_gap_of(use_contact: bool) -> Callable:
    """Barrier-gap hook for the guard's proximity term (core.gap_of
    convention). With contact statically off — or dynamically disabled
    via k_contact = 0 — there is no barrier to be near: +inf makes the
    proximity term never fire (only the hard stability term remains)."""

    def gap_of(U, fixed):
        if not use_contact:
            return jnp.asarray(jnp.inf, U.dtype)
        cnv, centroids = fixed[0], fixed[1]
        ccut, kc = fixed[11], fixed[12]
        gap = quad_min_void_gap_planes(U, cnv, centroids, ccut)
        return jnp.where(
            jnp.min(kc) > 0, gap, jnp.asarray(jnp.inf, U.dtype)
        )

    return gap_of


def _quad_energy_of(
    linearized: bool, use_contact: bool, tiled: bool = False
) -> Callable:
    """Bind quad_grid_energy_planes to the fixed-leaves convention.

    ``tiled``: the design-tiled layout appends one extra fixed leaf — the
    horizontal seam contact mask (see ops/pallas/tiling.py)."""

    def energy_of(U, fixed):
        # The tail (inertia, damping, mask, scatter factors) is solver data.
        (cnv, centroids, ref_h, ref_v, ks_h, ksh_h, kr_h, ks_v, ksh_v, kr_v,
         cmin, ccut, kc) = fixed[:13]
        h_mask = fixed[13] if tiled else None
        return quad_grid_energy_planes(
            U, cnv, centroids, ref_h, ref_v,
            ks_h, ksh_h, kr_h, ks_v, ksh_v, kr_v,
            cmin, ccut, kc,
            linearized=linearized, use_contact=use_contact,
            h_contact_mask=h_mask,
        )

    return energy_of


def build_pallas_verlet_trajectory(
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
    tiled: bool = False,
    backward_impl: str = "xla",
    guard=None,
):
    """Chunked whole-trajectory fused quad kernel; see
    core.build_verlet_trajectory. ``load_values_fn`` fuses time-dependent
    force loading (fixed leaves gain a trailing L_chan/L_row/L_col scatter).
    ``tiled``: design-tiled batched layout (ops/pallas/tiling.py) — planes
    carry (B1, n2, B2*n1) and the fixed leaves gain the horizontal seam
    contact mask after the contact scalars. ``guard``: reactive substep
    escalation spec (core.resolve_guard; theta is plane channel 2)."""

    n_fixed = (
        N_FIXED_ARRAYS
        + (1 if tiled else 0)
        + (3 if load_values_fn is not None else 0)
    )
    return core.build_verlet_trajectory(
        n_fixed,
        n_substeps,
        n_timepoints,
        _quad_energy_of(linearized, use_contact, tiled=tiled),
        drive_values_fn,
        load_values_fn=load_values_fn,
        interpret=interpret,
        chunk=chunk,
        forward_impl=forward_impl,
        backward_impl=backward_impl,
        guard=core.resolve_guard(guard, theta_channels=(2,)),
        gap_of=_quad_gap_of(use_contact),
    )
