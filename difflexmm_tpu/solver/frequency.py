"""Frequency-domain harmonic response (transmission spectra), on-device.

Steady-state response of the linearized lattice to time-harmonic forcing
``f e^{i omega t}``: solve ``(K - omega^2 M + i omega C) u = f`` for a batch
of drive frequencies as one vmapped complex linear solve. Completes the
linear-analysis toolkit (finite-lattice modal analysis in
:mod:`difflexmm_tpu.solver.modal`, infinite-lattice dispersion in
:mod:`difflexmm_tpu.solver.bloch`) with the quantity measured in
metamaterial transmission experiments.

No counterpart exists in the reference repository (its only
frequency-domain tool is the modal analysis, difflexmm/dynamics.py:189-245;
transmission there must be extracted from time-domain runs). Here K is the
autodiff Hessian of the *same* energy the dynamic solver integrates, M the
same polygon inertia, and C the same per-block viscous damping — so
frequency- and time-domain results are mutually consistent by construction.
Everything (Hessian, batched LU solves) is jit/grad-friendly: transmission
curves are differentiable w.r.t. the design.
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.ops.loading import build_damping_coefficients
from difflexmm_tpu.solver.modal import reduced_stiffness_inertia
from difflexmm_tpu.utils.types import ControlParams

_EMPTY_PAIRS = np.zeros((0, 2), dtype=np.int64)


def harmonic_response(
    displacement: jnp.ndarray,
    geometry,
    energy_fn,
    control_params: ControlParams,
    forcing: jnp.ndarray,
    omegas: jnp.ndarray,
    constrained_block_DOF_pairs=_EMPTY_PAIRS,
    damped_blocks=None,
    constrained_DOFs_fn=None,
    t=0.0,
) -> jnp.ndarray:
    """Complex steady-state displacement per drive frequency.

    Args:
        displacement: (n_blocks, 3) linearization state (constrained DOFs
            are held at zero, matching ``linear_mode_analysis``).
        geometry: geometry object or ``n_blocks``.
        energy_fn: ``(block_displacement, control_params) -> scalar``.
        forcing: (n_blocks, 3) real or complex force amplitude pattern;
            entries on constrained DOFs are ignored.
        omegas: (n_omega,) angular drive frequencies.
        damped_blocks: per-block viscous damping ids as in
            ``setup_dynamic_solver`` (None: no damping — responses diverge
            at resonance).

    Returns:
        (n_omega, n_blocks, 3) complex response amplitudes, zero on
        constrained DOFs. ``jnp.abs`` of it is the transmission amplitude;
        ``jnp.angle`` the phase lag.
    """

    n_blocks = geometry if isinstance(geometry, int) else geometry.n_blocks
    # Shared linearization front end with linear_mode_analysis — incl. the
    # driven-state kwargs, so harmonic response about a statically driven
    # equilibrium composes exactly like tangent modes do.
    K, m, free_idx, _ = reduced_stiffness_inertia(
        displacement, n_blocks, energy_fn, control_params,
        constrained_block_DOF_pairs=constrained_block_DOF_pairs,
        constrained_DOFs_fn=constrained_DOFs_fn, t=t,
    )

    if damped_blocks is not None:
        damping_coeffs = build_damping_coefficients(n_blocks, damped_blocks)(
            control_params.mechanical_params.damping
        ).reshape(-1)
    else:
        damping_coeffs = jnp.zeros(3 * n_blocks)
    c = damping_coeffs[free_idx]
    f = jnp.asarray(forcing).reshape(-1)[free_idx]

    cplx = jnp.result_type(K.dtype, jnp.complex64)

    def solve_at(omega):
        A = (
            K.astype(cplx)
            - (omega**2) * jnp.diag(m).astype(cplx)
            + 1j * omega * jnp.diag(c).astype(cplx)
        )
        return jnp.linalg.solve(A, f.astype(cplx))

    u_free = jax.vmap(solve_at)(jnp.asarray(omegas, dtype=K.dtype))

    out = jnp.zeros((u_free.shape[0], 3 * n_blocks), dtype=cplx)
    out = out.at[:, free_idx].set(u_free)
    return out.reshape(-1, n_blocks, 3)


def transmission(
    response: jnp.ndarray, input_blocks, output_blocks
) -> jnp.ndarray:
    """|output| / |input| amplitude ratio per frequency.

    Args:
        response: (n_omega, n_blocks, 3) complex field from
            :func:`harmonic_response`.
        input_blocks / output_blocks: block id arrays to average over
            (translational DOFs only).

    Returns:
        (n_omega,) transmission ratios.
    """

    def rms(blocks):
        u = response[:, jnp.asarray(blocks), :2]
        return jnp.sqrt(jnp.mean(jnp.abs(u) ** 2, axis=(1, 2)))

    return rms(output_blocks) / rms(input_blocks)
