"""Lattice-agnostic machinery for fused Pallas Verlet kernels.

A lattice family plugs in here with just two things:

- an ``energy_of(U_planes, fixed_leaves) -> scalar`` function operating on
  SoA component planes (state ``U`` of shape ``(C, n2, n1)``), and
- a *fixed-leaves* tuple whose last entries are, by convention,
  ``(inertia_planes, damping_planes, free_mask_planes, S_chan, S_row,
  S_col)`` — state-shaped inertia/damping/mask plus the *factorized*
  one-hot drive scatter (``S_chan (C, k)``, ``S_row (n2, k)``,
  ``S_col (k, n1)``: pair ``k`` scatters into channel/row/column by outer
  product) — followed by ``L_chan, L_row, L_col`` when fused force loading
  is enabled. The factorization replaces a dense ``(C * n2 * n1, k)``
  matrix whose VMEM footprint grew with the lattice (3 MB at 96x64 — the
  round-1 VMEM-wall offender) with ``O(k * (n1 + n2))`` data and two tiny
  MXU matmuls per application.

Everything else — the velocity-Verlet interval body with exact implicit
diagonal damping, the chunked whole-trajectory Pallas kernel, and the
hand-written scan transpose for reverse mode — is shared between families
(quads: verlet_grid.py, kagome: verlet_kagome.py).

Why SoA planes: Mosaic tiles the trailing dimension to 128 lanes, so the
physics' natural (..., 2/3)-component arrays waste ~60x VMEM per
intermediate; component planes keep every intermediate dense. See
verlet_grid.py for the original design notes.

VMEM scaling: the trajectory kernel grids the ``pallas_call`` over chunks of
output intervals — the three ``(T-1, C, n2, n1)`` outputs live in HBM and
each grid step streams one ``(chunk, C, n2, n1)`` block out of VMEM while
the integration state is carried across grid steps in VMEM scratch. Inputs
use constant index maps, so Mosaic fetches them once. This removes the
whole-trajectory VMEM wall (round-1 VERDICT weak #3): lattice size and
multi-start batch are bounded by HBM, not by ~16 MB of scoped VMEM. Under
``jax.vmap`` the batch axis is prepended to the grid (batch-major
iteration), so the scratch carry is re-initialized at chunk 0 of each batch
element; ``pl.program_id(0)`` keeps addressing the chunk axis because
vmapped grid dims are excluded from user grid indices.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from difflexmm_tpu.ops import mathx

# Target VMEM footprint for the three streamed output blocks of a chunk.
_CHUNK_VMEM_BYTES = 4 * 1024 * 1024


def _tail_offsets(has_loading: bool) -> int:
    """Fixed-leaves tail grows by (L_chan, L_row, L_col) when loading is
    fused."""

    return 3 if has_loading else 0


def scatter_factors(
    n1: int,
    n2: int,
    n_channels: int,
    chan_ids,
    row_ids,
    col_ids,
    combine: str = "last",
):
    """Factorized one-hot scatter of ``k`` (channel, row, col) targets into
    plane layout: ``(S_chan (C, k), S_row (n2, k), S_col (k, n1))`` with
    ``planes = stack_c(S_row @ diag(S_chan[c] * values) @ S_col)``.

    ``combine="last"``: duplicate targets keep only the LAST column
    (matching the general path's ``.at[].set`` scatter, where the later
    pair wins); ``combine="add"``: duplicates sum (matching
    ``build_loading``'s ``.at[].add``). Deactivated duplicates are zeroed
    in ``S_chan``.
    """

    k = max(len(chan_ids), 1)
    chan = np.zeros((n_channels, k), dtype=np.float32)
    row = np.zeros((n2, k), dtype=np.float32)
    col = np.zeros((k, n1), dtype=np.float32)
    last_col = {}
    for c, (d, j, i) in enumerate(
        zip(np.asarray(chan_ids), np.asarray(row_ids), np.asarray(col_ids))
    ):
        row[int(j), c] = 1.0
        col[c, int(i)] = 1.0
        if combine == "add":
            chan[int(d), c] = 1.0
        else:
            last_col[(int(d), int(j), int(i))] = c
    for (d, _, _), c in last_col.items():
        chan[d, c] = 1.0
    return jnp.asarray(chan), jnp.asarray(row), jnp.asarray(col)


def apply_scatter(S_chan, S_row, S_col, values):
    """Scatter ``values (k,)`` into ``(C, n2, n1)`` planes via the
    factorized one-hot matrices (two small MXU matmuls per channel).

    HIGHEST precision is required: the TPU's default matmul rounds f32
    operands to bf16 passes, which would quantize the drive displacements
    (one-hot entries are exact either way)."""

    if values.shape[0] == 0:
        # No scatter targets (scatter_factors pads its matrices to k=1, so
        # a zero-length value vector would otherwise be a shape mismatch).
        return jnp.zeros(
            (S_chan.shape[0], S_row.shape[0], S_col.shape[1]), values.dtype
        )
    weighted = values[:, None] * S_col  # (k, n1)
    return jnp.stack(
        [
            jnp.dot(
                S_row,
                S_chan[c][:, None] * weighted,
                precision=lax.Precision.HIGHEST,
            )
            for c in range(S_chan.shape[0])
        ]
    )


def make_force_fn(
    n_fixed: int,
    energy_of: Callable,
    drive_values_fn: Callable,
    load_values_fn: Optional[Callable] = None,
):
    """Force planes on the masked free state (shared: kernel + XLA remat).

    ``arrays`` is ``tuple(fixed_leaves) + (drive_args_tuple,)`` plus a
    trailing ``(load_args_tuple,)`` when ``load_values_fn`` is given; the
    drive displacement and external load are scattered into plane layout
    with the factorized one-hot matmuls (``apply_scatter`` — no dynamic
    indexing inside the kernel).
    """

    off = _tail_offsets(load_values_fn is not None)

    def _expand_to(planes, ndim):
        # Scattered (C, n2, n1) planes broadcast against tiled (C, *lead,
        # n2, n1) states by inserting the missing middle dims (the drive is
        # shared across the tiled B1 copies).
        while planes.ndim < ndim:
            planes = planes[:, None]
        return planes

    def force(U_free, t, arrays):
        fixed = arrays[:n_fixed]
        drive_args = arrays[n_fixed]
        free_mask = fixed[-4 - off]
        S_chan, S_row, S_col = (
            fixed[-3 - off], fixed[-2 - off], fixed[-1 - off]
        )

        def energy(Uf):
            drive = apply_scatter(
                S_chan, S_row, S_col,
                drive_values_fn(t, *drive_args).reshape(-1),
            )
            return energy_of(
                Uf * free_mask + _expand_to(drive, Uf.ndim), fixed
            )

        f = -jax.grad(energy)(U_free)
        if load_values_fn is not None:
            L_chan, L_row, L_col = fixed[-3], fixed[-2], fixed[-1]
            load_args = arrays[n_fixed + 1]
            load = load_values_fn(t, *load_args).reshape(-1)
            f = f + _expand_to(
                apply_scatter(L_chan, L_row, L_col, load), f.ndim
            )
        return f

    return force


def resolve_guard(guard, theta_channels, default_translation="relative"):
    """Normalize a reactive-substep-guard spec into static fields.

    The guard is the fixed-step answer to the reference's adaptive
    Dormand-Prince stepping (reference difflexmm/dynamics.py:166): when a
    substep is about to move any rotational DOF a large fraction of the
    contact-barrier window — the tunneling failure mode, where one step can
    land next to the barrier's 1/x asymptote (reference energy.py:349-360)
    — that substep is re-run as ``refine`` micro-steps instead. The risk
    predicate also fires on exploding states (|v| dt grows without bound,
    and on NaN), so it doubles as a stability governor for too-coarse
    ``n_substeps``.

    Spec keys (dict):
        threshold: max allowed rotational travel per substep, radians.
        window: alternative to ``threshold`` — the barrier window
            ``cutoff_angle - min_angle``; threshold = ``fraction * window``.
        fraction: of ``window`` (default 0.02).
        proximity / proximity_windows: barrier-proximity gate (radians /
            multiples of ``window``). When set, the travel term fires ONLY
            while the closest void angle is within ``proximity`` of the
            contact cutoff — fast-but-far-from-contact trajectories pay
            nothing (the travel-only r4 predicate fired on ~50% of
            flagship intervals whose contacts never engage,
            TUNNELING.json GUARDED_ADJOINT). Measured margins
            (PROXIMITY_STUDY.json, flagship 24x16): healthy trajectories
            keep every void >= 6 windows from the cutoff while the
            travel term alone fires on 30-50% of intervals, so a
            2-window margin zeroes the healthy firing rate with 3x
            headroom. Requires a lattice family with a gap function
            (the grid backends; the dense layout needs connectivity).
        hard / hard_fraction: unconditional stability threshold (radians /
            multiples of ``window``). Travel beyond it refines REGARDLESS
            of proximity — the governor for force spikes away from
            contact (nonlinear ligament stiffening, exploding states,
            NaN). Defaults to ``5 * threshold`` (= 0.1 window at the
            default fraction) when ``proximity`` is enabled: healthy
            flagship travel tops out at 1.6x threshold while unstable
            optimizer-exploit designs exceed it by 1e8x
            (PROXIMITY_STUDY.json), so 5x separates them cleanly.
            Without ``proximity`` the travel term is already
            unconditional and ``hard`` stays off.
        refine: micro-steps per refined substep (default 16).
        levels: recursive refinement depth (default 1). Extra levels
            re-check the predicate at the finer dt and can refine again,
            but on TPU each level multiplies the XLA cond's branch size,
            and an XLA cond costs ~its TOTAL branch body size per
            traversal even when not taken (measured: a nested level-2
            stepper is ~150 us/substep vs ~16 us for level-1 — the
            guarded flagship adjoint went 1377 -> 287 ms switching the
            default to 1, at IDENTICAL rescue accuracy; TUNNELING.json
            GUARD_L1R16 vs GUARD_THRESHOLD_SWEEP["0.02"]). Raise levels
            (or refine) only for spikes a single 16x refinement cannot
            resolve.
        length_scale: optional length so translational motion counts too:
            travel += |v_xy| dt / length_scale (void angles rotate with
            relative edge displacement as well as block rotation).
        translation: how the translational term measures |v_xy| —
            "relative" (default for the plane-layout kernels): max
            NEIGHBOR velocity difference (grid-axis shifts, plus
            within-cell block pairs for multi-block cells). Bulk motion
            of the lattice — a traveling pulse carrying whole regions at
            the drive velocity — closes no void, so only relative motion
            should fire the guard (pinned by
            test_relative_guard_noop_under_bulk_motion). NOTE the
            flagship pulse itself is genuinely relative motion: the
            predicate still flags ~80% of output intervals there
            (TUNNELING.json GUARDED_ADJOINT estimated_firing_rate), so
            the win over "absolute" is correctness on drifting frames,
            not a flagship speedup.
            "absolute" (default for the dense layout, which has no
            connectivity to difference against without gathers): max
            |v_xy| of any block.

    Defaults measured on the paper flagship at n_substeps=5 (f64 CPU,
    tools/tunneling_study.py + tools/guard_threshold_sweep.py ->
    TUNNELING.json): plain NaNs at a force spike;
    fraction=0.02/refine=16/levels=1 recovers the odeint oracle objective
    to 2.8e-4 f64 / 6.2e-5 f32 — bit-identical objective to levels=2 at
    a ~5x cheaper guarded adjoint. The fraction is load-bearing:
    0.05 leaves 8.6e-3, 0.1+ diverges entirely (GUARD_THRESHOLD_SWEEP).
    """

    if guard is None:
        return None
    g = dict(guard)
    threshold = g.pop("threshold", None)
    window = g.pop("window", None)
    fraction = float(g.pop("fraction", 0.02))
    if threshold is None:
        if window is None:
            raise ValueError(
                "guard spec needs 'threshold' (rad/substep) or 'window' "
                "(the contact barrier window cutoff_angle - min_angle)."
            )
        threshold = fraction * float(window)

    def _windows(key_abs, key_rel, default=None):
        """A radians-or-window-multiples pair of spec keys."""

        value = g.pop(key_abs, None)
        rel = g.pop(key_rel, None)
        if value is not None and rel is not None:
            raise ValueError(f"give '{key_abs}' or '{key_rel}', not both")
        if rel is not None:
            if window is None:
                raise ValueError(f"'{key_rel}' needs 'window' in the spec")
            return float(rel) * float(window)
        return float(value) if value is not None else default

    proximity = _windows("proximity", "proximity_windows")
    # NaN-safety: with the travel term gated on proximity, a NaN state far
    # from any barrier would never refine without the unconditional hard
    # term — so enabling proximity always enables hard.
    hard = _windows(
        "hard", "hard_fraction",
        default=5.0 * float(threshold) if proximity is not None else None,
    )
    resolved = dict(
        threshold=float(threshold),
        proximity=proximity,
        hard=hard,
        refine=int(g.pop("refine", 16)),
        levels=int(g.pop("levels", 1)),
        length_scale=g.pop("length_scale", None),
        translation=str(g.pop("translation", default_translation)),
        theta_channels=tuple(theta_channels),
    )
    if g:
        raise ValueError(f"unknown guard spec keys: {sorted(g)}")
    if proximity is not None and proximity <= 0:
        raise ValueError("guard proximity must be positive")
    if hard is not None and hard <= resolved["threshold"]:
        raise ValueError("guard hard threshold must exceed 'threshold'")
    if resolved["translation"] not in ("relative", "absolute"):
        raise ValueError(
            "guard translation must be 'relative' or 'absolute'; got "
            f"{resolved['translation']!r}"
        )
    if resolved["refine"] < 2 or resolved["levels"] < 1:
        raise ValueError("guard needs refine >= 2 and levels >= 1")
    if resolved["length_scale"] is not None:
        resolved["length_scale"] = float(resolved["length_scale"])
    return resolved


def guard_travel(V, A, dt, guard):
    """Predicted max rotational travel of any block in one substep of dt.

    Channel-plane layout: V/A are (C, ..., n2, n1); static channel indices
    and static slices only (fancy indexing would lower to gathers Mosaic
    can't take). With ``translation="relative"`` the translational term
    differences each velocity plane against its grid neighbors (axis
    shifts) and, for multi-block cells (kagome: channels grouped 3 per
    block), against the same DOF of the other blocks in the cell — bulk
    motion cancels, only void-closing relative motion counts.
    """

    theta = set(guard["theta_channels"])

    def travel(v, a):
        return jnp.max(jnp.abs(v) * dt + (0.5 * dt * dt) * jnp.abs(a))

    def max_of(parts):
        out = parts[0]
        for p in parts[1:]:
            out = jnp.maximum(out, p)
        return out

    t = max_of([travel(V[c], A[c]) for c in sorted(theta)])
    if guard["length_scale"] is not None:
        trans = [c for c in range(V.shape[0]) if c not in theta]
        if guard["translation"] == "absolute":
            tt = max_of([travel(V[c], A[c]) for c in trans])
        else:
            parts = []
            for c in trans:
                v, a = V[c], A[c]
                if v.shape[-1] > 1:
                    parts.append(travel(
                        v[..., :, 1:] - v[..., :, :-1],
                        a[..., :, 1:] - a[..., :, :-1],
                    ))
                if v.shape[-2] > 1:
                    parts.append(travel(
                        v[..., 1:, :] - v[..., :-1, :],
                        a[..., 1:, :] - a[..., :-1, :],
                    ))
            # Within-cell block pairs: channels are grouped (x, y, theta)
            # per block, so same-offset channels of different blocks are
            # the same DOF of cell-mates (kagome: (0,3) and (1,4)).
            for i, c1 in enumerate(trans):
                for c2 in trans[i + 1:]:
                    if (c1 - c2) % 3 == 0:
                        parts.append(travel(V[c1] - V[c2], A[c1] - A[c2]))
            if not parts:  # single-cell lattice: nothing to move relative to
                parts = [jnp.zeros((), dtype=V.dtype)]
            tt = max_of(parts)
        t = t + tt / guard["length_scale"]
    return t


def make_risk_predicate(guard, travel_fn, gap_fn):
    """The guard's per-substep risk predicate.

    ``travel_fn(V, A, dt) -> scalar`` predicted travel;
    ``gap_fn(U) -> scalar`` min void angle minus the contact cutoff
    (+inf semantics when the family has no active barrier), or ``None``
    when the layout cannot compute gaps — then ``proximity`` must not be
    set (callers validate with a named error).

    risky = (travel > threshold  AND  gap < proximity)   [accuracy term]
          OR travel > hard                               [stability term]

    NaN travel fires through either term (``~(x <= t)`` is True for NaN);
    a NaN gap disables the proximity term but the hard term still fires
    (resolve_guard forces ``hard`` on whenever ``proximity`` is set).
    """

    threshold = guard["threshold"]
    proximity = guard.get("proximity")
    hard = guard.get("hard")
    if proximity is not None and gap_fn is None:
        raise ValueError(
            "guard 'proximity' needs a lattice gap function; this layout "
            "has none (use the grid backends, or drop the proximity gate)."
        )

    def risk(carry, dt):
        U, V, A = carry
        travel = travel_fn(V, A, dt)
        risky = ~(travel <= threshold)
        if proximity is not None:
            risky = risky & (gap_fn(U) < proximity)
        if hard is not None:
            risky = risky | ~(travel <= hard)
        return risky

    return risk


# Trace-time switch for the guarded adjoint's per-interval risky dispatch
# (tests flip it to validate the dispatch against the always-guarded vjp).
_GUARD_ADJOINT_DISPATCH = True

# Debug/benchmark knob: override the adjoint's risk monitor. None -> use the
# monitored flags; "all"/"none" -> force every interval (in)to the guarded/
# unguarded branch. Separates the cost of the cond DISPATCH STRUCTURE from
# the cost of the guarded branch itself when profiling (see
# tools/guarded_adjoint_bench.py); never set in production.
_GUARD_FORCE_RISKY = None


def make_guarded_stepper(
    one_step, risk_fn, guard, remat: bool = True, return_risk: bool = False
):
    """Wrap a single Verlet step with reactive substep escalation.

    ``one_step(carry, t_start, dt) -> carry`` advances by dt;
    ``risk_fn(carry, dt) -> bool`` is the risk predicate (see
    :func:`make_risk_predicate`). Returns a stepper with the same
    signature that, when the predicate fires, re-runs the substep as
    ``refine`` micro-steps (recursively up to ``levels`` deep). NaN
    states also refine (too late to save that step, but the refined
    replay inside the adjoint stays consistent).

    Differentiable: ``lax.cond`` supports reverse-mode; under ``vmap`` it
    becomes a select (both branches run — every substep pays the full
    refine**levels micro-stepping, ~17x at the defaults), which is why
    batched multi-start drivers should prefer un-guarded screening plus
    guarded re-evaluation of finalists
    (parallel/multistart.reevaluate_finalists).

    Replay caveat: with ``forward_impl="pallas"`` the stored-state adjoint
    replays the interval in XLA; Mosaic and XLA are not bit-identical, so
    a substep whose travel sits exactly AT the threshold can replay the
    other branch. Both branches integrate the same dynamics (the fine one
    merely refines dt), so the mismatch is bounded by the branch
    difference at a near-threshold substep — far from the spikes the
    guard exists for — but bit-level forward/backward consistency is only
    guaranteed for ``verlet``/``verlet_ckpt`` (XLA forward).

    ``return_risk``: the returned stepper also reports whether its
    outer-level predicate fired — ``stepper(carry, t, dt) -> (carry,
    risk)`` — so the forward pass can record per-interval risk flags for
    the stored-state adjoint at zero extra cost (the predicate is
    computed for the cond anyway).
    """

    refine = guard["refine"]

    def build(level, outer=False):
        if level == 0:
            return one_step

        inner = build(level - 1)

        def stepper(carry, t_start, dt):
            risk = risk_fn(carry, dt)

            # Rematerialized (remat=True): without it, reverse-mode stores
            # every micro-step's residuals (refine**levels per risky
            # substep — the guarded adjoint measured ~1000x the unguarded
            # one); checkpointing stores only the branch inputs and
            # replays the micro-loop in the backward. remat=False is for
            # the Mosaic kernel body: the remat2 primitive has no Pallas
            # TPU lowering, and the kernel forward is never differentiated
            # through anyway (its adjoint replays the XLA body).
            def fine(c):
                ddt = dt / refine

                def micro(j, c2):
                    return inner(c2, t_start + j * ddt, ddt)

                return lax.fori_loop(0, refine, micro, c)

            if remat:
                fine = jax.checkpoint(fine)

            def coarse(c):
                return one_step(c, t_start, dt)

            new = lax.cond(risk, fine, coarse, carry)
            return (new, risk) if outer else new

        return stepper

    return build(guard["levels"], outer=return_risk)


def make_interval_body(
    n_fixed: int,
    n_substeps: int,
    force: Callable,
    has_loading: bool = False,
    guard=None,
    guard_remat: bool = True,
    risk_flag: bool = False,
    gap_of: Optional[Callable] = None,
    emit_risk: bool = False,
):
    """All n_substeps Verlet steps on plane states (single source of truth
    for the Pallas kernel and the XLA rematerialization path).

    ``emit_risk`` (requires ``guard``): integrate GUARDED and also return
    ``((U, V, A), risky)`` where ``risky`` is True iff any substep's
    outer predicate fired. The flags are recorded by the forward pass so
    the stored-state adjoint can dispatch per interval WITHOUT a
    separate monitor replay (the flags cost nothing — the predicate is
    computed for each substep's cond anyway). Equivalence to the
    ``risk_flag`` monitor: up to (and including) the first firing
    substep the guarded and unguarded trajectories coincide, so both
    modes fire on exactly the same first substep; after it both are
    already True.

    ``guard``: resolved reactive-substep spec (see :func:`resolve_guard`);
    risky substeps are re-run as micro-steps via ``lax.cond``.

    ``gap_of(U, fixed) -> scalar``: family-specific barrier gap (min void
    angle minus the contact cutoff) for the guard's proximity term; pass
    ``None`` for layouts without one (proximity then rejects at build).

    ``risk_flag`` (requires ``guard``): integrate UNGUARDED but monitor the
    guard's outer-level predicate, returning ``((U, V, A), risky)`` where
    ``risky`` is True iff any substep would have fired. Used by the
    stored-state adjoint: up to (and including) the FIRST firing substep
    the unguarded and guarded trajectories coincide, so ``risky`` is exact
    — and when it is False the unguarded vjp IS the guarded vjp (the
    derivative of ``lax.cond`` is the derivative of the taken branch),
    with none of the per-substep control flow that defeats XLA fusion.
    """

    off = _tail_offsets(has_loading)

    def body(U, V, A, t0, dt, arrays):
        fixed = arrays[:n_fixed]
        inertia = fixed[-6 - off]
        damping_c = fixed[-5 - off]
        free_mask = fixed[-4 - off]
        inv_m = free_mask / inertia

        def one_step(carry, t_start, ddt):
            U, V, A = carry
            t1 = t_start + ddt
            U1 = U + ddt * V + (0.5 * ddt * ddt) * A
            F1 = force(U1, t1, arrays)
            V_hat = V + 0.5 * ddt * (A + F1 * inv_m)
            V1 = V_hat / (1.0 + 0.5 * ddt * damping_c / inertia) * free_mask
            A1 = (F1 - damping_c * V1) * inv_m
            return U1, V1, A1

        if guard is not None:
            risk_fn = make_risk_predicate(
                guard,
                lambda Vc, Ac, ddt: guard_travel(Vc, Ac, ddt, guard),
                None if gap_of is None else (lambda Uc: gap_of(Uc, fixed)),
            )

        if risk_flag:
            if guard is None:
                raise ValueError("risk_flag requires a guard spec")

            def step_flagged(i, acc):
                carry, risky = acc
                return (
                    one_step(carry, t0 + i * dt, dt),
                    risky | risk_fn(carry, dt),
                )

            return lax.fori_loop(
                0, n_substeps, step_flagged,
                ((U, V, A), jnp.asarray(False)),
            )

        if guard is None:
            stepper = one_step
        else:
            stepper = make_guarded_stepper(
                one_step, risk_fn, guard, remat=guard_remat,
                return_risk=emit_risk,
            )

        if emit_risk:
            if guard is None:
                raise ValueError("emit_risk requires a guard spec")

            def step_emitting(i, acc):
                carry, fired = acc
                carry, risk = stepper(carry, t0 + i * dt, dt)
                return carry, fired | risk

            return lax.fori_loop(
                0, n_substeps, step_emitting,
                ((U, V, A), jnp.asarray(False)),
            )

        def step(i, carry):
            return stepper(carry, t0 + i * dt, dt)

        return lax.fori_loop(0, n_substeps, step, (U, V, A))

    return body


def _flatten_arrays(arrays, n_fixed: int, has_loading: bool):
    """arrays pytree -> (flat list, (n_drive, n_load)) for kernel operands."""

    fixed = list(arrays[:n_fixed])
    drive_args = list(arrays[n_fixed])
    load_args = list(arrays[n_fixed + 1]) if has_loading else []
    return fixed + drive_args + load_args, (len(drive_args), len(load_args))


def _unflatten_arrays(loaded, n_fixed: int, counts, has_loading: bool):
    n_drive, n_load = counts
    fixed = tuple(loaded[:n_fixed])
    drive = tuple(loaded[n_fixed:n_fixed + n_drive])
    if has_loading:
        load = tuple(loaded[n_fixed + n_drive:n_fixed + n_drive + n_load])
        return fixed + (drive, load)
    return fixed + (drive,)


def _padded_plane_bytes(plane_shape, dtype) -> int:
    """VMEM bytes of one plane block after Mosaic tiling: the minor dim is
    padded to 128 lanes and the second-minor to 8 sublanes (f32)."""

    import math

    shape = list(plane_shape)
    shape[-1] = -(-shape[-1] // 128) * 128
    if len(shape) >= 2:
        shape[-2] = -(-shape[-2] // 8) * 8
    return math.prod(shape) * jnp.dtype(dtype).itemsize


def default_chunk(n_intervals: int, plane_shape, dtype) -> int:
    """Output intervals per grid step, sized so the three streamed output
    blocks stay within the VMEM budget (in *padded* bytes — Mosaic tiles
    (n2, n1) planes up to (8k, 128k), which is what scoped VMEM charges)."""

    bytes_per_interval = 3 * _padded_plane_bytes(plane_shape, dtype)
    return max(1, min(n_intervals, _CHUNK_VMEM_BYTES // max(bytes_per_interval, 1)))


def build_verlet_trajectory(
    n_fixed: int,
    n_substeps: int,
    n_timepoints: int,
    energy_of: Callable,
    drive_values_fn: Callable,
    load_values_fn: Optional[Callable] = None,
    interpret: bool = False,
    chunk: Optional[int] = None,
    forward_impl: str = "pallas",
    backward_impl: str = "xla",
    guard=None,
    gap_of: Optional[Callable] = None,
):
    """Chunked whole-trajectory fused kernel.

    One Pallas program integrates all ``(T-1) * n_substeps`` Verlet steps;
    the grid runs over chunks of output intervals, streaming the
    interval-boundary states to the HBM-resident ``(T-1, C, n2, n1)``
    outputs while the carry lives in VMEM scratch. Returns

        trajectory(carry0, timepoints, arrays) -> (outU, outV, outA)

    Reverse-mode is a hand-written scan transpose: the stored
    interval-boundary states are exact checkpoints, so the backward replays
    one interval at a time through the XLA body's vjp (same memory profile
    as jax.checkpoint, no full-trajectory recompute).

    Args beyond the forward physics:
        load_values_fn: optional fused external loading ``(t, *load_args) ->
            (m,)`` force values scattered with the ``S_load`` fixed leaf.
            Time-dependent only (it never sees the state); state-dependent
            loading must use the XLA path.
        chunk: output intervals per grid step; default sized from the VMEM
            budget.
        forward_impl: ``"pallas"`` (fused Mosaic kernel — fastest for
            single designs and small batches, where per-step latency
            dominates) or ``"xla"`` (a ``lax.scan`` of the identical
            interval body — faster under large ``vmap`` batches, where XLA
            re-layouts the batched planes to fill all 128 lanes while the
            SoA kernel's (n2, n1) tiles stay mostly padding). Both produce
            the same interval-boundary outputs, so the stored-state custom
            vjp below (cheaper than XLA's remat-everything adjoint) is
            shared.
    """

    if backward_impl not in ("xla", "pallas"):
        raise ValueError(f"backward_impl={backward_impl!r}: 'xla' or 'pallas'")
    T = n_timepoints
    n_int = T - 1
    has_loading = load_values_fn is not None
    force = make_force_fn(n_fixed, energy_of, drive_values_fn, load_values_fn)
    # Two bodies, one physics: the XLA body keeps jax.checkpoint on the
    # guard's fine branch (adjoint memory); the Mosaic kernel body must
    # not (remat2 has no Pallas TPU lowering) and is forward-only anyway.
    emit = guard is not None
    body = make_interval_body(
        n_fixed, n_substeps, force, has_loading, guard, gap_of=gap_of
    )
    # Guarded forwards also emit per-interval risk flags (free — the
    # predicate is computed for each substep's cond anyway); the
    # stored-state adjoint dispatches on them directly instead of paying
    # a separate monitor replay (measured 14.9 ms of the 37.3 ms guarded
    # flagship fwd+grad before this, TUNNELING.json GUARDED_ADJOINT r5).
    body_run = (
        make_interval_body(
            n_fixed, n_substeps, force, has_loading, guard, gap_of=gap_of,
            emit_risk=True,
        )
        if emit
        else body
    )
    kernel_body = make_interval_body(
        n_fixed, n_substeps, force, has_loading, guard, guard_remat=False,
        gap_of=gap_of, emit_risk=emit,
    )

    def pallas_forward(carry, timepoints, arrays):
        U0, V0, A0 = carry
        flat_arrays, counts = _flatten_arrays(arrays, n_fixed, has_loading)
        n_arrays = len(flat_arrays)
        _chunk = chunk or default_chunk(n_int, U0.shape, U0.dtype)
        n_chunks = -(-n_int // _chunk)  # ceil

        def kernel(*refs):
            U0_ref, V0_ref, A0_ref, ts_ref = refs[:4]
            array_refs = refs[4:4 + n_arrays]
            n_outs = 4 if emit else 3
            out_refs = refs[4 + n_arrays:4 + n_arrays + n_outs]
            outU_ref, outV_ref, outA_ref = out_refs[:3]
            scrU, scrV, scrA = refs[-3:]
            g = pl.program_id(0)

            @pl.when(g == 0)
            def _init():
                scrU[:] = U0_ref[:]
                scrV[:] = V0_ref[:]
                scrA[:] = A0_ref[:]

            loaded = [r[:] for r in array_refs]
            arrays_k = _unflatten_arrays(loaded, n_fixed, counts, has_loading)

            with mathx.pallas_math():  # Mosaic-lowerable atan2
                def interval(kk, carry):
                    U, V, A = carry
                    k = g * _chunk + kk
                    # The last chunk may be ragged: padded intervals clamp
                    # their timepoint reads, keep the carry frozen, and
                    # write only into the dropped block padding.
                    valid = k < n_int
                    k_safe = jnp.minimum(k, n_int - 1)
                    t0 = ts_ref[k_safe, 0]
                    t1 = ts_ref[k_safe + 1, 0]
                    stepped = kernel_body(
                        U, V, A, t0, (t1 - t0) / n_substeps, arrays_k
                    )
                    if emit:
                        (U1, V1, A1), risky = stepped
                        out_refs[3][kk] = jnp.where(
                            valid & risky, 1.0, 0.0
                        ).astype(U.dtype).reshape(1)
                    else:
                        U1, V1, A1 = stepped
                    U1 = jnp.where(valid, U1, U)
                    V1 = jnp.where(valid, V1, V)
                    A1 = jnp.where(valid, A1, A)
                    outU_ref[kk] = U1
                    outV_ref[kk] = V1
                    outA_ref[kk] = A1
                    return U1, V1, A1

                U, V, A = lax.fori_loop(
                    0, _chunk, interval, (scrU[:], scrV[:], scrA[:])
                )
            scrU[:] = U
            scrV[:] = V
            scrA[:] = A

        whole = lambda x: pl.BlockSpec(x.shape, lambda g: (0,) * x.ndim)
        out_shape = jax.ShapeDtypeStruct((n_int,) + U0.shape, U0.dtype)
        out_spec = pl.BlockSpec(
            (_chunk,) + U0.shape, lambda g: (g,) + (0,) * U0.ndim
        )
        out_shapes = (out_shape,) * 3
        out_specs = (out_spec,) * 3
        if emit:
            out_shapes = out_shapes + (
                jax.ShapeDtypeStruct((n_int, 1), U0.dtype),
            )
            out_specs = out_specs + (
                pl.BlockSpec((_chunk, 1), lambda g: (g, 0)),
            )
        ts = timepoints.astype(U0.dtype).reshape(T, 1)
        outs = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=out_shapes,
            in_specs=[whole(U0)] * 3 + [whole(ts)] + [whole(x) for x in flat_arrays],
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM(U0.shape, U0.dtype)] * 3,
            interpret=interpret,
        )(U0, V0, A0, ts, *flat_arrays)
        if emit:
            return tuple(outs[:3]) + (outs[3][:, 0] > 0.5,)
        return tuple(outs)

    def xla_interval_t(carry, t0, t1, arrays):
        return body(carry[0], carry[1], carry[2], t0, (t1 - t0) / n_substeps, arrays)

    if emit:
        # Flag-emitting forward interval, plus the unguarded twin body
        # the adjoint's non-risky branch differentiates.
        def run_interval_t(carry, t0, t1, arrays):
            return body_run(
                carry[0], carry[1], carry[2], t0,
                (t1 - t0) / n_substeps, arrays,
            )

        _plain_body = make_interval_body(
            n_fixed, n_substeps, force, has_loading, None
        )

        def plain_interval_t(carry, t0, t1, arrays):
            return _plain_body(
                carry[0], carry[1], carry[2], t0,
                (t1 - t0) / n_substeps, arrays,
            )

    def xla_forward(carry, timepoints, arrays):
        """Same interval-boundary outputs as the Pallas kernel, as a plain
        scan (vmap-friendly: XLA batches the planes across lanes)."""

        def step(c, ts_pair):
            t0, t1 = ts_pair
            if emit:
                c1, risky = run_interval_t(c, t0, t1, arrays)
                return c1, (c1, risky)
            c1 = xla_interval_t(c, t0, t1, arrays)
            return c1, c1

        _, outs = lax.scan(
            step, carry, (timepoints[:-1], timepoints[1:])
        )
        if emit:
            (oU, oV, oA), risky = outs
            return oU, oV, oA, risky
        return tuple(outs)

    forward = pallas_forward if forward_impl == "pallas" else xla_forward

    @jax.custom_vjp
    def trajectory(carry, timepoints, arrays):
        return tuple(forward(carry, timepoints, arrays)[:3])

    def trajectory_fwd(carry, timepoints, arrays):
        outs = forward(carry, timepoints, arrays)
        primal = tuple(outs[:3])
        risky = outs[3] if emit else None
        return primal, (carry, timepoints, arrays, primal, risky)

    def trajectory_bwd(residuals, cotangents):
        carry0, timepoints, arrays, outs, risky_fwd = residuals
        gU, gV, gA = cotangents
        outU, outV, outA = outs
        # Interval-input states: carry0 then the stored boundary states.
        cinU = jnp.concatenate([carry0[0][None], outU[:-1]])
        cinV = jnp.concatenate([carry0[1][None], outV[:-1]])
        cinA = jnp.concatenate([carry0[2][None], outA[:-1]])

        zero_arrays = jax.tree.map(jnp.zeros_like, arrays)

        dispatch = guard is not None and _GUARD_ADJOINT_DISPATCH
        if dispatch:
            # Guarded adjoint, fast path: the FORWARD pass already
            # recorded which intervals fired the guard (emit_risk — the
            # predicate is computed for each substep's cond anyway), so
            # the backward dispatches on the stored flags with NO monitor
            # replay (the r4 monitor sweep cost 14.9 ms of the 37.3 ms
            # guarded flagship fwd+grad). Where no substep fired, the
            # unguarded vjp IS the guarded vjp (lax.cond differentiates
            # the taken branch), so only risky intervals pay the
            # per-substep control flow of differentiating the guarded
            # body. Each cond branch runs its own jax.vjp INSIDE the
            # branch: hoisting vjp_u out of the cond forces its
            # linearization residuals — every per-substep intermediate of
            # the replay — across the cond boundary as materialized
            # operands; branch-internal replay keeps residuals fused and
            # only states/cotangents cross.
            risky_all = risky_fwd
            if _GUARD_FORCE_RISKY == "all":
                risky_all = jnp.ones_like(risky_all)
            elif _GUARD_FORCE_RISKY == "none":
                risky_all = jnp.zeros_like(risky_all)
        else:
            risky_all = jnp.zeros((n_int,), dtype=bool)

        def make_rev_step(mode):
            """Reverse-scan body. ``mode``: "guarded" differentiates the
            guarded interval unconditionally; "plain" the unguarded twin
            (exact when no substep fired); "dispatch" conds per interval
            on the stored flag."""

            def rev_step(acc, xs):
                cbar, d_arrays, d_ts = acc
                k, cU, cV, cA, t0, t1, gUk, gVk, gAk, risky = xs
                cot = (cbar[0] + gUk, cbar[1] + gVk, cbar[2] + gAk)

                def grads_of(interval_fn):
                    def grads(cot):
                        _, vjp = jax.vjp(
                            lambda c, a, b, arr: interval_fn(c, a, b, arr),
                            (cU, cV, cA), t0, t1, arrays,
                        )
                        return vjp(cot)

                    return grads

                if mode == "guarded":
                    d_cin, d_t0, d_t1, d_arr = grads_of(xla_interval_t)(cot)
                elif mode == "plain":
                    d_cin, d_t0, d_t1, d_arr = grads_of(plain_interval_t)(cot)
                else:
                    d_cin, d_t0, d_t1, d_arr = lax.cond(
                        risky,
                        grads_of(xla_interval_t),
                        grads_of(plain_interval_t),
                        cot,
                    )
                d_arrays = jax.tree.map(jnp.add, d_arrays, d_arr)
                d_ts = d_ts.at[k].add(d_t0).at[k + 1].add(d_t1)
                return (d_cin, d_arrays, d_ts), None

            return rev_step

        ks = jnp.arange(n_int)
        init = (
            (jnp.zeros_like(carry0[0]),) * 3,
            zero_arrays,
            jnp.zeros_like(timepoints),
        )
        xs = (ks, cinU, cinV, cinA, timepoints[:-1], timepoints[1:], gU, gV,
              gA, risky_all)

        def scan_with(mode):
            def run(_):
                (d_carry0, d_arrays, d_ts), _ = lax.scan(
                    make_rev_step(mode), init, xs, reverse=True
                )
                return d_carry0, d_ts, d_arrays

            return run

        if not dispatch:
            return scan_with("guarded")(None)
        # Whole-scan dispatch on ANY interval being risky: the common case
        # (healthy trajectory, zero firing) takes a cond-free reverse scan
        # XLA can fuse — a per-interval data-dependent cond costs ~11 ms
        # at the flagship even when never taken (r5 measured, TUNNELING
        # GUARDED_ADJOINT). Only trajectories that actually fired pay the
        # per-interval dispatch scan. (Under vmap both branches execute —
        # vmapped guarded adjoints are already the discouraged path.)
        return lax.cond(
            jnp.any(risky_all),
            scan_with("dispatch"),
            scan_with("plain"),
            None,
        )

    trajectory.defvjp(trajectory_fwd, trajectory_bwd)
    trajectory.xla_interval = xla_interval_t
    trajectory.force_fn = force
    return trajectory


def normalize_arrays(fixed_leaves, drive_args, dtype, load_args=None):
    """Shape leaves for Pallas: scalars -> (1, 1); floats cast to dtype."""

    def norm(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(dtype)
        if x.ndim == 0:
            return x.reshape(1, 1)
        return x

    out = tuple(norm(x) for x in fixed_leaves) + (
        tuple(norm(x) for x in drive_args),
    )
    if load_args is not None:
        out = out + (tuple(norm(x) for x in load_args),)
    return out
