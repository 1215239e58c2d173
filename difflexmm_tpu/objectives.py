"""Objective functions for inverse design and experiment matching.

Space-time cross-correlation objectives (behavioral parity: reference
difflexmm/objective.py:10-89) plus re-exports of the energy/momentum
observables commonly used as design targets.
"""

from typing import Literal, Optional, Tuple

import jax.numpy as jnp
import jax.scipy as jsp

from difflexmm_tpu.ops.observables import angular_momentum, kinetic_energy  # noqa: F401


def compute_xcorr2d(
    signal0: jnp.ndarray,
    signal1: jnp.ndarray,
    shift: Tuple[Optional[int], Optional[int]] = (None, None),
):
    """Full 2D cross-correlation normalized by the autocorrelation peak.

    Optionally slice at a given shift along one or both axes (0 = aligned).
    """

    xcorr2d = jsp.signal.correlate2d(signal0, signal1) / jsp.signal.correlate2d(
        signal0, signal0
    ).max()

    if shift == (None, None):
        return xcorr2d
    if shift[1] is None and shift[0] is not None:
        return xcorr2d[signal1.shape[0] - 1 + shift[0], :]
    if shift[0] is None and shift[1] is not None:
        return xcorr2d[:, signal1.shape[1] - 1 + shift[1]]
    if shift[0] is not None and shift[1] is not None:
        return xcorr2d[signal1.shape[0] - 1 + shift[0], signal1.shape[1] - 1 + shift[1]]
    raise ValueError("Invalid shift specification.")


def compute_xcorr(signal0: jnp.ndarray, signal1: jnp.ndarray, shift: Optional[int] = None):
    """1D cross-correlation normalized by the autocorrelation peak."""

    xcorr = jsp.signal.correlate(signal0, signal1) / jsp.signal.correlate(
        signal0, signal0
    ).max()
    return xcorr if shift is None else xcorr[signal1.shape[0] - 1 + shift]


def compute_max_xcorr2d_at_shift(
    signal0: jnp.ndarray,
    signal1: jnp.ndarray,
    shift: int,
    shift_axis: Literal[0, 1] = 0,
):
    """Max correlation and delay at a fixed shift along one axis.

    A positive delay means ``signal1`` lags ``signal0``.
    """

    xcorr_slice = compute_xcorr2d(
        signal0, signal1, shift=(shift, None) if shift_axis == 0 else (None, shift)
    )
    max_xcorr = xcorr_slice.max()
    max_index = xcorr_slice.argmax()
    return max_xcorr, -(max_index + 1 - signal1.shape[1 if shift_axis == 0 else 0])


def compute_space_time_xcorr(space_time0: jnp.ndarray, space_time1: jnp.ndarray):
    """Max space-aligned cross-correlation and time delay between two fields.

    Inputs are (space, time) arrays; returns (max_xcorr, time_delay).
    """

    return compute_max_xcorr2d_at_shift(space_time0, space_time1, shift=0, shift_axis=0)
