"""Trajectory health diagnostics (solver/diagnose.py): pure post-processing
that codifies the contact-tunneling triage (fixed-step f32 hazard notes in
README): locate the first non-finite timepoint and flag output intervals
whose per-substep rotation spans a risky fraction of the barrier window."""

import jax.numpy as jnp
import numpy as np
import pytest

from difflexmm_tpu.solver import (
    contact_tunneling_report,
    first_nonfinite_timepoint,
)

T, NB = 9, 4
TIMEPOINTS = jnp.linspace(0.0, 2.0, T)  # dt = 0.25
WINDOW = np.deg2rad(5.0)


def _healthy(omega=0.01):
    sol = np.zeros((T, 2, NB, 3))
    sol[:, 1, :, 2] = omega  # slow uniform rotation rate
    return jnp.asarray(sol)


def test_healthy_trajectory_unflagged():
    rep = contact_tunneling_report(
        _healthy(), TIMEPOINTS, 10, min_angle=-WINDOW, cutoff_angle=0.0
    )
    assert rep.first_nonfinite is None
    assert not bool(jnp.any(rep.risky_intervals))
    # omega * dt/substeps = 0.01 * 0.025 = 2.5e-4 rad per substep.
    assert np.allclose(np.asarray(rep.max_rotation_per_substep), 2.5e-4)
    assert np.allclose(
        np.asarray(rep.window_fraction), 2.5e-4 / WINDOW, rtol=1e-6
    )


def test_fast_rotation_flagged():
    # One block spins fast enough to cross half the barrier window per
    # substep from interval 4 onward.
    sol = np.asarray(_healthy()).copy()
    fast = 0.6 * WINDOW / 0.025  # window_fraction 0.6
    sol[5:, 1, 2, 2] = fast
    rep = contact_tunneling_report(
        jnp.asarray(sol), TIMEPOINTS, 10, -WINDOW, 0.0
    )
    flagged = np.asarray(rep.risky_intervals)
    assert not flagged[:4].any()
    assert flagged[4:].all()  # interval k spans timepoints (k, k+1)
    assert np.allclose(np.asarray(rep.window_fraction)[4:], 0.6, rtol=1e-6)


def test_nonfinite_located_and_treated_as_risky():
    sol = np.asarray(_healthy()).copy()
    sol[6:, 0, 1, 0] = np.nan  # blow-up at timepoint 6
    rep = contact_tunneling_report(
        jnp.asarray(sol), TIMEPOINTS, 10, -WINDOW, 0.0
    )
    assert rep.first_nonfinite == 6
    assert first_nonfinite_timepoint(jnp.asarray(sol)) == 6
    # NaN velocities count as infinite rate: intervals touching the
    # blow-up must be flagged, finite early intervals must not.
    flagged = np.asarray(rep.risky_intervals)
    assert not flagged[:4].any()


def test_nan_velocity_intervals_flagged():
    sol = np.asarray(_healthy()).copy()
    sol[6:, 1, 1, 2] = np.nan
    rep = contact_tunneling_report(
        jnp.asarray(sol), TIMEPOINTS, 10, -WINDOW, 0.0
    )
    assert bool(np.asarray(rep.risky_intervals)[5])  # interval (5, 6)
    assert np.isinf(np.asarray(rep.max_rotation_per_substep)[5])


def test_bad_window_raises():
    with pytest.raises(ValueError, match="barrier window"):
        contact_tunneling_report(_healthy(), TIMEPOINTS, 10, 0.0, 0.0)
