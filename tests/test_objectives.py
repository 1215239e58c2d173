"""Objective tests. Oracle parity: reference tests/test_difflexmm.py:23-33."""

import jax
import jax.numpy as jnp

import difflexmm_tpu
from difflexmm_tpu.objectives import (
    compute_space_time_xcorr,
    compute_xcorr,
    compute_xcorr2d,
    kinetic_energy,
    angular_momentum,
)


def test_version():
    assert difflexmm_tpu.__version__ == "0.1.0"


def test_xcorr():
    sp0 = jax.random.uniform(jax.random.PRNGKey(0), (10, 20))
    xcorr, _ = compute_space_time_xcorr(sp0, sp0)
    assert xcorr == 1

    delay = 3
    _, delay_trial = compute_space_time_xcorr(sp0, jnp.roll(sp0, delay, axis=1))
    assert delay_trial == delay


def test_xcorr_1d():
    s = jax.random.uniform(jax.random.PRNGKey(1), (32,))
    xc = compute_xcorr(s, s, shift=0)
    assert jnp.allclose(xc, 1.0)


def test_kinetic_energy_and_angular_momentum():
    v = jnp.array([[1.0, 0.0, 2.0]])
    inertia = jnp.array([[2.0, 2.0, 0.5]])
    assert jnp.allclose(kinetic_energy(v, inertia), 0.5 * 2 * 1 + 0.5 * 0.5 * 4)

    pos = jnp.array([[1.0, 0.0, 0.0]])
    vel = jnp.array([[0.0, 3.0, 2.0]])
    L = angular_momentum(pos, vel, inertia)
    # orbital: x * m*vy = 1 * 2*3 = 6; spin: J*omega = 0.5*2 = 1
    assert jnp.allclose(L, jnp.array([7.0]))


def test_spectral_dispersion_recovers_chain_band():
    """Numerical-experiment oracle: the k-omega spectrum of a broadband
    time-domain simulation traces the analytic dispersion of the chain,
    omega(k) = 2 |sin(k/2)| — the time-domain solver and the FFT
    dispersion analysis agreeing with closed-form lattice dynamics across
    the whole Brillouin zone (ridge error ~ one frequency bin)."""

    from typing import Any, NamedTuple

    import jax
    import numpy as np

    from difflexmm_tpu.objectives import spectral_dispersion
    from difflexmm_tpu.ops.assembly import build_strain_energy
    from difflexmm_tpu.ops.bonds import simple_spring_energy
    from difflexmm_tpu.solver import setup_dynamic_solver
    from difflexmm_tpu.utils import (
        ControlParams,
        GeometricalParams,
        MechanicalParams,
    )

    class SpringParams(NamedTuple):
        reference_vector: Any
        k_stretch: Any

    N = 64
    centroids = jnp.stack(
        [jnp.arange(N, dtype=float), jnp.zeros(N)], axis=1
    )
    bonds = jnp.stack([jnp.arange(N - 1), jnp.arange(1, N)], axis=1)
    energy = build_strain_energy(bonds, simple_spring_energy)

    def drive(t, amplitude=0.1):
        # Short displacement kick: broadband up to the 2.0 band edge.
        return amplitude * jnp.exp(-(((t - 3.0) / 0.8) ** 2))

    solve = setup_dynamic_solver(
        geometry=N,
        energy_fn=energy,
        constrained_block_DOF_pairs=jnp.array([[0, 0]]),
        constrained_DOFs_fn=drive,
        method="verlet",
        n_substeps=40,
    )
    cp = ControlParams(
        geometrical_params=GeometricalParams(
            centroids, jnp.zeros((N, 1, 2))
        ),
        mechanical_params=MechanicalParams(
            bond_params=SpringParams(
                jnp.tile(jnp.array([[1.0, 0.0]]), (N - 1, 1)), 1.0
            ),
            density=1.0,
            damping=0.0,
            inertia=jnp.full((N, 3), 1.0),
        ),
        constraint_params=dict(amplitude=0.1),
    )
    T, n_t = 400.0, 1000
    sol = jax.jit(solve)(
        jnp.zeros((2, N, 3)), jnp.linspace(0.0, T, n_t), cp
    )
    omegas, ks, amp = spectral_dispersion(
        sol[:, 0, :, 0], dt=T / (n_t - 1), dx=1.0
    )
    omegas, ks, amp = np.asarray(omegas), np.asarray(ks), np.asarray(amp)
    d_omega = omegas[1] - omegas[0]
    for k_target in (0.5, 1.0, 1.5, 2.0, 2.5, 3.0):
        j = np.argmin(np.abs(ks - k_target))
        mask = (omegas > 0.2) & (omegas < 2.5)
        ridge = omegas[mask][np.argmax(amp[mask, j])]
        analytic = 2.0 * abs(np.sin(ks[j] / 2.0))
        assert abs(ridge - analytic) < 2.0 * d_omega, (k_target, ridge, analytic)


def test_xcorr_out_of_range_shift_raises():
    """A pinned lag outside the valid range must raise, not wrap through
    Python negative indexing onto a large positive lag."""

    import numpy as np
    import pytest

    a = jnp.asarray(np.random.default_rng(0).normal(size=(4, 5)))
    with pytest.raises(ValueError, match="valid lag range"):
        compute_xcorr2d(a, a, shift=(None, -6))
    with pytest.raises(ValueError, match="valid lag range"):
        compute_xcorr2d(a, a, shift=(4, None))
    with pytest.raises(ValueError, match="valid lag range"):
        compute_xcorr(a[0], a[1], shift=5)
    # Boundary lags are legal.
    assert np.isfinite(float(compute_xcorr(a[0], a[1], shift=4)))
    assert np.isfinite(float(compute_xcorr(a[0], a[1], shift=-4)))
