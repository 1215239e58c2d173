"""Objective tests. Oracle parity: reference tests/test_difflexmm.py:23-33."""

import jax
import jax.numpy as jnp

import difflexmm_tpu
from difflexmm_tpu.objectives import (
    compute_space_time_xcorr,
    compute_xcorr,
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
