"""Fused Pallas TPU kernel: one output interval of velocity-Verlet on the
quad-grid energy, entirely in VMEM, in structure-of-arrays layout.

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
"""

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from difflexmm_tpu.ops import mathx
from difflexmm_tpu.ops.contact import contact_energy

# Fixed (non-drive) leaves of the arrays tuple, in order:
# cnv_planes (4,2,n2,n1), centroid_planes (2,n2,n1),
# ref_h (2,n2,n1-1), ref_v (2,n2-1,n1),
# ks_h, ksh_h, kr_h (n2,n1-1 or (1,1)), ks_v, ksh_v, kr_v,
# cmin, ccut, kc (1,1), inertia_planes (3,n2,n1), damping_planes (3,n2,n1),
# free_mask_planes (3,n2,n1), S_planes (3*n2*n1, k)
N_FIXED_ARRAYS = 17


# ---------------------------------------------------------------------------
# Layout conversion (runs in XLA, outside the kernel)
# ---------------------------------------------------------------------------


def to_planes(field: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """(nb, C) block field -> (C, n2, n1) planes."""

    C = field.shape[-1]
    return jnp.moveaxis(field.reshape(n2, n1, C), -1, 0)


def from_planes(planes: jnp.ndarray) -> jnp.ndarray:
    """(C, n2, n1) -> (nb, C)."""

    C = planes.shape[0]
    return jnp.moveaxis(planes, 0, -1).reshape(-1, C)


def cnv_to_planes(cnv: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """(nb, 4, 2) centroid-node vectors -> (4, 2, n2, n1)."""

    return jnp.transpose(cnv.reshape(n2, n1, 4, 2), (2, 3, 0, 1))


def scatter_matrix_planes(
    n1: int, n2: int, constrained_blocks, constrained_dofs
) -> jnp.ndarray:
    """One-hot (3*n2*n1, k) matrix emitting component-major plane layout."""

    k = max(len(constrained_blocks), 1)
    S = np.zeros((3 * n2 * n1, k), dtype=np.float32)
    for col, (b, d) in enumerate(zip(np.asarray(constrained_blocks),
                                     np.asarray(constrained_dofs))):
        j, i = divmod(int(b), n1)
        S[int(d) * n2 * n1 + j * n1 + i, col] = 1.0
    return jnp.asarray(S)


def normalize_arrays(fixed_leaves, drive_args, dtype):
    """Shape leaves for Pallas: scalars -> (1, 1); floats cast to dtype."""

    def norm(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(dtype)
        if x.ndim == 0:
            return x.reshape(1, 1)
        return x

    return tuple(norm(x) for x in fixed_leaves) + (
        tuple(norm(x) for x in drive_args),
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
    U,  # (3, n2, n1): ux, uy, theta
    cnv,  # (4, 2, n2, n1)
    centroids,  # (2, n2, n1)
    ref_h, ref_v,  # (2, n2, n1-1), (2, n2-1, n1)
    ks_h, ksh_h, kr_h, ks_v, ksh_v, kr_v,
    cmin, ccut, kc,
    linearized: bool = False,
    use_contact: bool = True,
):
    """Total strain (+ contact) energy of the quad lattice on planes.

    Same physics as ops/grid.py:quad_grid_energy_core, in SoA layout.
    """

    ux, uy, th = U[0], U[1], U[2]
    cth, sth = jnp.cos(th), jnp.sin(th)

    # Node displacements and absolute positions per corner (4 planes each).
    dx = [ux + (cth - 1.0) * cnv[k, 0] - sth * cnv[k, 1] for k in range(4)]
    dy = [uy + sth * cnv[k, 0] + (cth - 1.0) * cnv[k, 1] for k in range(4)]

    # Horizontal bonds: corner 0 of (j, i) -> corner 2 of (j, i+1).
    hUx = dx[2][:, 1:] - dx[0][:, :-1]
    hUy = dy[2][:, 1:] - dy[0][:, :-1]
    e_h = _ligament_planes(
        hUx, hUy, th[:, :-1], th[:, 1:], ref_h[0], ref_h[1],
        ks_h, ksh_h, kr_h, linearized,
    )
    # Vertical bonds: corner 1 of (j, i) -> corner 3 of (j+1, i).
    vUx = dx[3][1:, :] - dx[1][:-1, :]
    vUy = dy[3][1:, :] - dy[1][:-1, :]
    e_v = _ligament_planes(
        vUx, vUy, th[:-1, :], th[1:, :], ref_v[0], ref_v[1],
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
    vh1, vh2 = voids(0, 2, sl[:, :-1], sl[:, 1:])
    vv1, vv2 = voids(1, 3, sl[:-1, :], sl[1:, :])
    contact = sum(
        jnp.sum(contact_energy(g, min_angle=cmin, cutoff_angle=ccut, k_contact=kc))
        for g in (vh1, vh2, vv1, vv2)
    )
    return energy + contact


def make_force_fn(n1, n2, linearized, use_contact, drive_values_fn):
    """Force planes on the masked free state (shared: kernel + XLA remat)."""

    def force(U_free, t, arrays):
        (cnv, centroids, ref_h, ref_v, ks_h, ksh_h, kr_h, ks_v, ksh_v, kr_v,
         cmin, ccut, kc, inertia, damping_c, free_mask, S, drive_args) = arrays

        def energy(Uf):
            drive = (S @ drive_values_fn(t, *drive_args).reshape(-1)).reshape(
                3, n2, n1
            )
            return quad_grid_energy_planes(
                Uf * free_mask + drive, cnv, centroids, ref_h, ref_v,
                ks_h, ksh_h, kr_h, ks_v, ksh_v, kr_v,
                cmin, ccut, kc,
                linearized=linearized, use_contact=use_contact,
            )

        return -jax.grad(energy)(U_free)

    return force


def make_interval_body(n1, n2, n_substeps, linearized, use_contact,
                       drive_values_fn):
    """All n_substeps Verlet steps on plane states (single source of truth
    for the Pallas kernel and the XLA rematerialization path)."""

    force = make_force_fn(n1, n2, linearized, use_contact, drive_values_fn)

    def body(U, V, A, t0, dt, arrays):
        inertia = arrays[13]
        damping_c = arrays[14]
        free_mask = arrays[15]
        inv_m = free_mask / inertia

        def step(i, carry):
            U, V, A = carry
            t1 = t0 + (i + 1) * dt
            U1 = U + dt * V + (0.5 * dt * dt) * A
            F1 = force(U1, t1, arrays)
            V_hat = V + 0.5 * dt * (A + F1 * inv_m)
            V1 = V_hat / (1.0 + 0.5 * dt * damping_c / inertia) * free_mask
            A1 = (F1 - damping_c * V1) * inv_m
            return U1, V1, A1

        return lax.fori_loop(0, n_substeps, step, (U, V, A))

    return body


def build_pallas_verlet_interval(
    n1: int,
    n2: int,
    n_substeps: int,
    drive_values_fn: Callable,
    linearized: bool = False,
    use_contact: bool = True,
    interpret: bool = False,
):
    """Build ``interval(carry, t0, dt, arrays) -> carry`` on plane states.

    ``carry = (U, V, A)``, each (3, n2, n1). ``arrays`` is the normalized
    tuple documented at the top of this module. Forward = Pallas kernel;
    backward = XLA remat + transpose.
    """

    body = make_interval_body(
        n1, n2, n_substeps, linearized, use_contact, drive_values_fn
    )

    def kernel(*refs):
        U_ref, V_ref, A_ref, t0_ref, dt_ref = refs[:5]
        array_refs = refs[5:-3]
        out_refs = refs[-3:]
        loaded = [r[:] for r in array_refs]
        arrays = tuple(loaded[:N_FIXED_ARRAYS]) + (
            tuple(loaded[N_FIXED_ARRAYS:]),
        )
        with mathx.pallas_math():  # Mosaic-lowerable atan2
            U1, V1, A1 = body(
                U_ref[:], V_ref[:], A_ref[:], t0_ref[0, 0], dt_ref[0, 0], arrays
            )
        out_refs[0][:] = U1
        out_refs[1][:] = V1
        out_refs[2][:] = A1

    def pallas_forward(carry, t0, dt, arrays):
        U, V, A = carry
        *fixed, drive_args = arrays
        flat_arrays = list(fixed) + list(drive_args)
        scalar = lambda x: jnp.asarray(x, U.dtype).reshape(1, 1)
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct(U.shape, U.dtype) for _ in range(3)
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (5 + len(flat_arrays)),
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
            interpret=interpret,
        )(U, V, A, scalar(t0), scalar(dt), *flat_arrays)
        return tuple(outs)

    def xla_interval(carry, t0, dt, arrays):
        return body(carry[0], carry[1], carry[2], t0, dt, arrays)

    @jax.custom_vjp
    def interval(carry, t0, dt, arrays):
        return pallas_forward(carry, t0, dt, arrays)

    def interval_fwd(carry, t0, dt, arrays):
        return pallas_forward(carry, t0, dt, arrays), (carry, t0, dt, arrays)

    def interval_bwd(residuals, cotangent):
        carry, t0, dt, arrays = residuals
        _, vjp = jax.vjp(xla_interval, carry, t0, dt, arrays)
        return vjp(tuple(cotangent))

    interval.defvjp(interval_fwd, interval_bwd)
    interval.xla_reference = xla_interval
    interval.force_fn = make_force_fn(
        n1, n2, linearized, use_contact, drive_values_fn
    )
    return interval


def build_pallas_verlet_trajectory(
    n1: int,
    n2: int,
    n_substeps: int,
    n_timepoints: int,
    drive_values_fn: Callable,
    linearized: bool = False,
    use_contact: bool = True,
    interpret: bool = False,
):
    """Whole-trajectory fused kernel: every interval of every output step in
    ONE Pallas program, writing interval-boundary states into VMEM outputs.

    Eliminates the ~200 us/interval launch + scan-stacking overhead of the
    per-interval kernel (the in-kernel substep costs ~1.5 us). Returns

        trajectory(carry0, timepoints, arrays) -> (outU, outV, outA)

    with each output (T-1, 3, n2, n1). Reverse-mode is a hand-written scan
    transpose: the stored interval-boundary states are exact checkpoints, so
    the backward replays one interval at a time through the XLA body's vjp
    (same memory profile as jax.checkpoint, no full-trajectory recompute).
    """

    T = n_timepoints
    body = make_interval_body(
        n1, n2, n_substeps, linearized, use_contact, drive_values_fn
    )

    def kernel(*refs):
        U0_ref, V0_ref, A0_ref, ts_ref = refs[:4]
        array_refs = refs[4:-3]
        outU_ref, outV_ref, outA_ref = refs[-3:]
        loaded = [r[:] for r in array_refs]
        arrays = tuple(loaded[:N_FIXED_ARRAYS]) + (
            tuple(loaded[N_FIXED_ARRAYS:]),
        )

        with mathx.pallas_math():
            def interval(k, carry):
                U, V, A = carry
                t0 = ts_ref[k, 0]
                t1 = ts_ref[k + 1, 0]
                U, V, A = body(U, V, A, t0, (t1 - t0) / n_substeps, arrays)
                outU_ref[k] = U
                outV_ref[k] = V
                outA_ref[k] = A
                return U, V, A

            lax.fori_loop(
                0, T - 1, interval, (U0_ref[:], V0_ref[:], A0_ref[:])
            )

    def pallas_forward(carry, timepoints, arrays):
        U0, V0, A0 = carry
        *fixed, drive_args = arrays
        flat_arrays = list(fixed) + list(drive_args)
        out_shape = jax.ShapeDtypeStruct((T - 1,) + U0.shape, U0.dtype)
        outs = pl.pallas_call(
            kernel,
            out_shape=(out_shape,) * 3,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (4 + len(flat_arrays)),
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
            interpret=interpret,
        )(U0, V0, A0, timepoints.astype(U0.dtype).reshape(T, 1), *flat_arrays)
        return tuple(outs)

    def xla_interval_t(carry, t0, t1, arrays):
        return body(carry[0], carry[1], carry[2], t0, (t1 - t0) / n_substeps, arrays)

    @jax.custom_vjp
    def trajectory(carry, timepoints, arrays):
        return pallas_forward(carry, timepoints, arrays)

    def trajectory_fwd(carry, timepoints, arrays):
        outs = pallas_forward(carry, timepoints, arrays)
        return outs, (carry, timepoints, arrays, outs)

    def trajectory_bwd(residuals, cotangents):
        carry0, timepoints, arrays, outs = residuals
        gU, gV, gA = cotangents
        outU, outV, outA = outs
        # Interval-input states: carry0 then the stored boundary states.
        cinU = jnp.concatenate([carry0[0][None], outU[:-1]])
        cinV = jnp.concatenate([carry0[1][None], outV[:-1]])
        cinA = jnp.concatenate([carry0[2][None], outA[:-1]])

        zero_arrays = jax.tree.map(jnp.zeros_like, arrays)

        def rev_step(acc, xs):
            cbar, d_arrays, d_ts = acc
            k, cU, cV, cA, t0, t1, gUk, gVk, gAk = xs
            cot = (cbar[0] + gUk, cbar[1] + gVk, cbar[2] + gAk)
            _, vjp = jax.vjp(
                lambda c, a, b, arr: xla_interval_t(c, a, b, arr),
                (cU, cV, cA), t0, t1, arrays,
            )
            d_cin, d_t0, d_t1, d_arr = vjp(cot)
            d_arrays = jax.tree.map(jnp.add, d_arrays, d_arr)
            d_ts = d_ts.at[k].add(d_t0).at[k + 1].add(d_t1)
            return (d_cin, d_arrays, d_ts), None

        n_int = T - 1
        ks = jnp.arange(n_int)
        init = (
            (jnp.zeros_like(carry0[0]),) * 3,
            zero_arrays,
            jnp.zeros_like(timepoints),
        )
        (d_carry0, d_arrays, d_ts), _ = lax.scan(
            rev_step,
            init,
            (ks, cinU, cinV, cinA, timepoints[:-1], timepoints[1:], gU, gV, gA),
            reverse=True,
        )
        return d_carry0, d_ts, d_arrays

    trajectory.defvjp(trajectory_fwd, trajectory_bwd)
    trajectory.xla_interval = xla_interval_t
    trajectory.force_fn = make_force_fn(
        n1, n2, linearized, use_contact, drive_values_fn
    )
    return trajectory
