"""Trajectory health diagnostics: locate blow-ups and explain them.

The one numerical hazard of the fixed-step f32 production path is
contact-barrier tunneling (documented in README/CLAUDE): a strong pulse
slams a void shut, the block's angular rate approaches (or exceeds) the
barrier window per substep, and a substep can land arbitrarily close to
the barrier's 1/x asymptote — inf forces, NaN state — INDEPENDENT of
substep refinement. (The reference's adaptive ``odeint`` shrinks dt at
the force spike instead; its semantics, zero energy below ``min_angle``,
mean f64 usually crosses harmlessly — see
/root/reference/difflexmm/energy.py:349-360 for the barrier.)

These helpers turn that triage prose into code: find the first non-finite
output, and report which intervals moved rotational DOFs fast enough,
relative to the barrier window, to be at tunneling risk. Pure
post-processing on a solved trajectory — no solver coupling, safe to run
on any (T, 2, n_blocks, 3) solution from ``setup_dynamic_solver``.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp


class TunnelingReport(NamedTuple):
    """Per-trajectory contact-tunneling risk summary.

    Attributes:
        first_nonfinite: index of the first output timepoint with any
            non-finite field value, or ``None`` if the solution is finite.
        max_rotation_per_substep: (T-1,) max |dtheta| any block rotates in
            one substep during each output interval (estimated from the
            interval-mean angular velocity).
        window_fraction: (T-1,) ``max_rotation_per_substep`` over the
            barrier window ``cutoff_angle - min_angle`` — the tunneling
            risk metric. Values >= ~0.5 mean a substep can jump deep into
            (or across) the barrier in one step; ~>= 1 means it can cross
            entirely. Estimated from interval-ENDPOINT velocities at the
            output sampling rate, so a velocity spike confined to the
            interior of one interval — exactly the non-smooth blow-up
            scenario — can be underestimated: a silent barrier crossing
            that leaves both endpoints finite may go unflagged. Non-finite
            endpoints are always flagged (NaN/inf map to fraction=inf).
        risky_intervals: (T-1,) bool, ``window_fraction >= threshold``.
    """

    first_nonfinite: Optional[int]
    max_rotation_per_substep: jnp.ndarray
    window_fraction: jnp.ndarray
    risky_intervals: jnp.ndarray


def first_nonfinite_timepoint(solution: jnp.ndarray) -> Optional[int]:
    """Index of the first output timepoint whose fields are not all finite.

    Args:
        solution: (T, 2, n_blocks, 3) solver output.

    Returns ``None`` for a healthy trajectory. Once one timepoint is
    non-finite every later one is too (the integrator propagates NaN), so
    this is the blow-up location.
    """

    bad = ~jnp.all(jnp.isfinite(solution), axis=(1, 2, 3))  # (T,)
    if not bool(jnp.any(bad)):
        return None
    return int(jnp.argmax(bad))


def contact_tunneling_report(
    solution: jnp.ndarray,
    timepoints: jnp.ndarray,
    n_substeps: int,
    min_angle: float,
    cutoff_angle: float,
    threshold: float = 0.5,
) -> TunnelingReport:
    """Flag output intervals where fixed-step integration can tunnel
    through the contact barrier.

    The barrier lives in ``(min_angle, cutoff_angle)`` (zero energy below
    ``min_angle``, reference semantics). If a block rotates a large
    fraction of that window in ONE substep, the integrator can step from
    "outside the barrier" to "next to the 1/x asymptote" (f32: inf force)
    or clean across it (silently missed contact). The per-interval rate is
    estimated from the solved angular velocities at the interval ENDPOINTS
    — cheap and post-hoc, but it can underestimate a spike confined to one
    interval's interior: a silent crossing that leaves finite endpoints
    may go unflagged (non-finite endpoints always flag). For in-the-loop
    protection use the solver's ``guard`` option instead.

    Args:
        solution: (T, 2, n_blocks, 3) solver output (may contain NaNs).
        timepoints: (T,) output times the solution was sampled at.
        n_substeps: the solver's fixed substeps per output interval.
        min_angle, cutoff_angle: the ``ContactParams`` barrier window.
        threshold: window fraction above which an interval is flagged.

    Typical use after a blown-up f32 run::

        report = contact_tunneling_report(sol, t, 10, cp.min_angle,
                                          cp.cutoff_angle)
        if report.first_nonfinite is not None:
            # re-run the suspect design on CPU f64, lower the drive, or
            # raise n_substeps until window_fraction drops well below 1.
            print(report.window_fraction[:report.first_nonfinite + 1])
    """

    window = float(cutoff_angle) - float(min_angle)
    if window <= 0:
        raise ValueError(
            f"cutoff_angle ({cutoff_angle}) must exceed min_angle "
            f"({min_angle}); got a non-positive barrier window."
        )
    solution = jnp.asarray(solution)
    timepoints = jnp.asarray(timepoints, dtype=float)
    dt = jnp.diff(timepoints) / n_substeps  # (T-1,) substep lengths

    # Max |angular velocity| over each interval's endpoints. For smooth
    # motion this bounds the interior; the caveat is a spike confined to
    # the INTERIOR of one interval (the non-smooth blow-up case), which
    # endpoint sampling can miss unless it leaves a non-finite endpoint.
    omega = jnp.abs(solution[:, 1, :, 2])  # (T, n_blocks)
    omega = jnp.nan_to_num(omega, nan=jnp.inf, posinf=jnp.inf)
    omega_iv = jnp.maximum(omega[:-1], omega[1:]).max(axis=1)  # (T-1,)

    per_substep = omega_iv * dt
    frac = per_substep / window
    return TunnelingReport(
        first_nonfinite=first_nonfinite_timepoint(solution),
        max_rotation_per_substep=per_substep,
        window_fraction=frac,
        risky_intervals=frac >= threshold,
    )
