"""Objective functions for inverse design and experiment matching.

Space-time cross-correlation objectives (behavioral parity with reference
difflexmm/objective.py:10-89, re-derived here via FFT correlation on an
explicit lag lattice) plus re-exports of the energy/momentum observables
commonly used as design targets.

Lag convention used throughout: the full linear cross-correlation of
``a`` against ``b`` along one axis has length ``len_a + len_b - 1`` and is
indexed so that entry ``len_b - 1 + lag`` holds

    sum_n a[n + lag] * b[n]

i.e. the correlation of ``a`` with ``b`` displaced by ``lag`` samples
(lag 0 = signals aligned). This matches the standard "full" correlation
layout, so values agree with ``scipy.signal.correlate(a, b)``.
"""

from typing import Literal, Optional, Tuple

import jax.numpy as jnp

from difflexmm_tpu.ops.observables import angular_momentum, kinetic_energy  # noqa: F401


def _corr_full(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full linear cross-correlation of two real nD arrays, via FFT.

    Computed as a circular correlation on a zero-padded grid of shape
    ``a.shape + b.shape - 1`` (so wrap-around never aliases), then rolled so
    index ``b.shape[d] - 1`` along each axis ``d`` is the zero-lag entry —
    the lag convention documented in the module docstring.
    """

    full_shape = tuple(na + nb - 1 for na, nb in zip(a.shape, b.shape))
    axes = tuple(range(a.ndim))
    spec = jnp.fft.rfftn(a, full_shape) * jnp.conj(jnp.fft.rfftn(b, full_shape))
    circular = jnp.fft.irfftn(spec, full_shape)
    # circular[lag mod N] = sum_n a[n + lag] b[n]; place lag 0 at b.shape - 1.
    return jnp.roll(circular, tuple(nb - 1 for nb in b.shape), axis=axes)


def _pinned_index(n_a: int, n_b: int, lag: int, axis: int) -> int:
    """Index of pinned ``lag`` on the full-correlation axis, bounds-checked.

    Valid lags span ``[-(n_b - 1), n_a - 1]``; outside that the correlation
    is identically zero, and Python's negative indexing would otherwise
    silently WRAP an out-of-range request onto a large positive lag."""

    if not -(n_b - 1) <= lag <= n_a - 1:
        raise ValueError(
            f"shift {lag} along axis {axis} is outside the valid lag range "
            f"[{-(n_b - 1)}, {n_a - 1}] for signal lengths ({n_a}, {n_b})"
        )
    return n_b - 1 + lag


def compute_xcorr2d(
    signal0: jnp.ndarray,
    signal1: jnp.ndarray,
    shift: Tuple[Optional[int], Optional[int]] = (None, None),
):
    """Full 2D cross-correlation normalized by signal0's autocorrelation peak.

    ``shift`` optionally pins the lag along either axis (0 = aligned); a
    pinned axis is sliced out of the result, so e.g. ``shift=(0, None)``
    returns the 1D correlation-vs-lag curve along axis 1 at zero lag
    along axis 0.
    """

    # The denominator equals sum(signal0**2) mathematically (zero-lag
    # autocorrelation), but it is computed through the SAME FFT path as the
    # numerator so that self-correlation gives xcorr == 1.0 EXACTLY — the
    # reference's oracle test asserts exact equality
    # (tests/test_objectives.py::test_xcorr).
    corr = _corr_full(signal0, signal1) / _corr_full(signal0, signal0).max()
    index = tuple(
        slice(None)
        if lag is None
        else _pinned_index(signal0.shape[axis], signal1.shape[axis], lag, axis)
        for axis, lag in enumerate(shift)
    )
    return corr[index]


def compute_xcorr(signal0: jnp.ndarray, signal1: jnp.ndarray, shift: Optional[int] = None):
    """1D cross-correlation normalized by signal0's autocorrelation peak."""

    corr = _corr_full(signal0, signal1) / _corr_full(signal0, signal0).max()
    if shift is None:
        return corr
    return corr[_pinned_index(signal0.shape[0], signal1.shape[0], shift, 0)]


def compute_max_xcorr2d_at_shift(
    signal0: jnp.ndarray,
    signal1: jnp.ndarray,
    shift: int,
    shift_axis: Literal[0, 1] = 0,
):
    """Peak correlation and delay along the free axis, at a pinned lag.

    Pins the lag along ``shift_axis`` to ``shift``, scans the other axis for
    the correlation peak, and reports (peak value, delay). The delay is the
    negative of the peak's lag — a positive delay means ``signal1`` lags
    ``signal0``.
    """

    free_axis = 1 - shift_axis
    pinned = (shift, None) if shift_axis == 0 else (None, shift)
    curve = compute_xcorr2d(signal0, signal1, shift=pinned)
    peak_index = curve.argmax()
    peak_lag = peak_index - (signal1.shape[free_axis] - 1)
    return curve.max(), -peak_lag


def compute_space_time_xcorr(space_time0: jnp.ndarray, space_time1: jnp.ndarray):
    """Max space-aligned cross-correlation and time delay between two fields.

    Inputs are (space, time) arrays; returns (max_xcorr, time_delay).
    """

    return compute_max_xcorr2d_at_shift(space_time0, space_time1, shift=0, shift_axis=0)


def spectral_dispersion(
    space_time: jnp.ndarray,
    dt: float,
    dx: float,
    window: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Experimental-style dispersion measurement: 2D Fourier transform of
    a space-time wave field into the (k, omega) plane.

    The standard lab analysis for both simulated trajectories and tracked
    high-speed-video fields (the reference's experiment notebooks compare
    fields directly; this exposes the k-omega picture): ridges of the
    returned amplitude map trace the lattice's dispersion branches, which
    for this framework must agree with :func:`difflexmm_tpu.solver.bloch.
    band_structure` (cross-checked in tests/test_objectives.py).

    Args:
        space_time: (n_t, n_x) real field — one DOF sampled on a uniform
            spatial line at uniform times (e.g.
            ``solution.fields[:, 0, row_blocks, 0]``).
        dt / dx: sample spacings.
        window: apply a separable Hann window before transforming
            (suppresses edge-truncation leakage).

    Returns:
        ``(omegas, ks, amplitude)``: positive angular frequencies
        (n_t // 2 + 1,), wavenumbers (n_x,) centered on zero, and the
        |FFT| magnitude (n_omega, n_k).
    """

    f = jnp.asarray(space_time)
    n_t, n_x = f.shape
    if window:
        hann_t = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n_t) / (n_t - 1))
        hann_x = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n_x) / (n_x - 1))
        f = f * hann_t[:, None] * hann_x[None, :]
    spectrum = jnp.fft.fft(jnp.fft.rfft(f, axis=0), axis=1)
    amplitude = jnp.abs(jnp.fft.fftshift(spectrum, axes=1))
    omegas = 2 * jnp.pi * jnp.fft.rfftfreq(n_t, d=dt)
    ks = 2 * jnp.pi * jnp.fft.fftshift(jnp.fft.fftfreq(n_x, d=dx))
    return omegas, ks, amplitude
