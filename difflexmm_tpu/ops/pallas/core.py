"""Lattice-agnostic machinery for fused Pallas Verlet kernels.

A lattice family plugs in here with just two things:

- an ``energy_of(U_planes, fixed_leaves) -> scalar`` function operating on
  SoA component planes (state ``U`` of shape ``(C, n2, n1)``), and
- a *fixed-leaves* tuple whose last four entries are, by convention,
  ``(inertia_planes, damping_planes, free_mask_planes, S)`` — state-shaped
  inertia/damping/mask plus the one-hot drive scatter matrix
  ``(C * n2 * n1, k)``.

Everything else — the velocity-Verlet interval body with exact implicit
diagonal damping, the whole-trajectory Pallas kernel, and the hand-written
scan transpose for reverse mode — is shared between families (quads:
verlet_grid.py, kagome: verlet_kagome.py).

Why SoA planes: Mosaic tiles the trailing dimension to 128 lanes, so the
physics' natural (..., 2/3)-component arrays waste ~60x VMEM per
intermediate; component planes keep every intermediate dense. See
verlet_grid.py for the original design notes.
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from difflexmm_tpu.ops import mathx


def make_force_fn(n_fixed: int, energy_of: Callable, drive_values_fn: Callable):
    """Force planes on the masked free state (shared: kernel + XLA remat).

    ``arrays`` is ``tuple(fixed_leaves) + (drive_args_tuple,)``; the drive
    displacement is scattered into plane layout with the one-hot matmul
    ``S @ drive`` (no dynamic indexing inside the kernel).
    """

    def force(U_free, t, arrays):
        fixed = arrays[:n_fixed]
        drive_args = arrays[n_fixed]
        free_mask, S = fixed[-2], fixed[-1]

        def energy(Uf):
            drive = (S @ drive_values_fn(t, *drive_args).reshape(-1)).reshape(
                Uf.shape
            )
            return energy_of(Uf * free_mask + drive, fixed)

        return -jax.grad(energy)(U_free)

    return force


def make_interval_body(n_fixed: int, n_substeps: int, force: Callable):
    """All n_substeps Verlet steps on plane states (single source of truth
    for the Pallas kernel and the XLA rematerialization path)."""

    def body(U, V, A, t0, dt, arrays):
        fixed = arrays[:n_fixed]
        inertia, damping_c, free_mask = fixed[-4], fixed[-3], fixed[-2]
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


def build_verlet_interval(
    n_fixed: int,
    n_substeps: int,
    energy_of: Callable,
    drive_values_fn: Callable,
    interpret: bool = False,
):
    """Build ``interval(carry, t0, dt, arrays) -> carry`` on plane states.

    ``carry = (U, V, A)``, each (C, n2, n1). Forward = one Pallas program for
    the whole interval; backward = XLA remat + transpose (the
    ``jax.checkpoint`` structure of the XLA path).
    """

    force = make_force_fn(n_fixed, energy_of, drive_values_fn)
    body = make_interval_body(n_fixed, n_substeps, force)

    def kernel(*refs):
        U_ref, V_ref, A_ref, t0_ref, dt_ref = refs[:5]
        array_refs = refs[5:-3]
        out_refs = refs[-3:]
        loaded = [r[:] for r in array_refs]
        arrays = tuple(loaded[:n_fixed]) + (tuple(loaded[n_fixed:]),)
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
    interval.force_fn = force
    return interval


def build_verlet_trajectory(
    n_fixed: int,
    n_substeps: int,
    n_timepoints: int,
    energy_of: Callable,
    drive_values_fn: Callable,
    interpret: bool = False,
):
    """Whole-trajectory fused kernel: every interval of every output step in
    ONE Pallas program, writing interval-boundary states into VMEM outputs.

    Eliminates the ~200 us/interval launch + scan-stacking overhead of the
    per-interval kernel (the in-kernel substep costs ~1.5 us). Returns

        trajectory(carry0, timepoints, arrays) -> (outU, outV, outA)

    with each output (T-1, C, n2, n1). Reverse-mode is a hand-written scan
    transpose: the stored interval-boundary states are exact checkpoints, so
    the backward replays one interval at a time through the XLA body's vjp
    (same memory profile as jax.checkpoint, no full-trajectory recompute).
    """

    T = n_timepoints
    force = make_force_fn(n_fixed, energy_of, drive_values_fn)
    body = make_interval_body(n_fixed, n_substeps, force)

    def kernel(*refs):
        U0_ref, V0_ref, A0_ref, ts_ref = refs[:4]
        array_refs = refs[4:-3]
        outU_ref, outV_ref, outA_ref = refs[-3:]
        loaded = [r[:] for r in array_refs]
        arrays = tuple(loaded[:n_fixed]) + (tuple(loaded[n_fixed:]),)

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
    trajectory.force_fn = force
    return trajectory


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
