"""Linear modal analysis, fully on-device.

Solves the generalized eigenproblem K q = w^2 M q around a configuration by
symmetrizing with the diagonal mass matrix: with y = M^{1/2} q,
M^{-1/2} K M^{-1/2} y = w^2 y is a standard symmetric problem handled by
``jnp.linalg.eigh`` on the accelerator — no scipy host roundtrip (contrast
with reference difflexmm/dynamics.py:229-234 which falls back to LAPACK).
"""

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.ops.assembly import constrain_energy
from difflexmm_tpu.ops.kinematics import build_constrained_kinematics
from difflexmm_tpu.solver.dynamics import _resolve_inertia
from difflexmm_tpu.utils.types import ControlParams, EigenmodeData

_EMPTY_PAIRS = np.zeros((0, 2), dtype=np.int64)


def reduced_stiffness_inertia(
    displacement,
    geometry,
    energy_fn,
    control_params: ControlParams,
    constrained_block_DOF_pairs=_EMPTY_PAIRS,
    constrained_DOFs_fn=None,
    t=0.0,
):
    """Free-DOF-reduced tangent stiffness about a (possibly driven) state.

    The shared linearization front end of modal analysis and the
    frequency-domain harmonic response: constrained kinematics ->
    constrained-energy Hessian -> free-index reduction.

    Returns:
        (K (n_free, n_free), m (n_free,), free_idx (n_free,), dof_set).
    """

    n_blocks = geometry if isinstance(geometry, int) else geometry.n_blocks
    kin_kwargs = (
        dict(constrained_DOFs_fn=constrained_DOFs_fn)
        if constrained_DOFs_fn is not None
        else {}
    )
    kinematics = build_constrained_kinematics(
        n_blocks,
        constrained_block_DOF_pairs=constrained_block_DOF_pairs,
        **kin_kwargs,
    )
    dof_set = kinematics.dof_set
    constrained_energy = constrain_energy(energy_fn, kinematics)

    u0 = jnp.asarray(displacement).reshape(n_blocks, 3) * dof_set.free_mask
    K_full = jax.hessian(constrained_energy)(u0, t, control_params).reshape(
        3 * n_blocks, 3 * n_blocks
    )
    inertia = _resolve_inertia(control_params).reshape(-1)

    free_idx = np.where(np.asarray(dof_set.free_mask).reshape(-1) > 0)[0]
    K = K_full[jnp.ix_(free_idx, free_idx)]
    m = inertia[free_idx]
    return K, m, free_idx, dof_set


def linear_mode_analysis(
    displacement: jnp.ndarray,
    geometry,
    energy_fn,
    control_params: ControlParams,
    constrained_block_DOF_pairs=_EMPTY_PAIRS,
    constrained_DOFs_fn=None,
    t=0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigenfrequencies (squared) and mode shapes about ``displacement``.

    ``constrained_DOFs_fn`` / ``t`` set the driven-DOF values the tangent
    stiffness is evaluated at — pass the same drive and load-path parameter
    used to reach a statically deformed state (e.g. from
    :func:`difflexmm_tpu.solver.statics.setup_static_solver`) to get tangent
    modes about that equilibrium; the default is the undriven configuration.

    Returns:
        (eigenvalues (n_free,), modes (n_free, n_blocks, 3)); modes are
        normalized to unit Euclidean norm and zero on constrained DOFs.
    """

    n_blocks = geometry if isinstance(geometry, int) else geometry.n_blocks
    K, m, free_idx, _ = reduced_stiffness_inertia(
        displacement, n_blocks, energy_fn, control_params,
        constrained_block_DOF_pairs=constrained_block_DOF_pairs,
        constrained_DOFs_fn=constrained_DOFs_fn, t=t,
    )

    inv_sqrt_m = 1.0 / jnp.sqrt(m)
    K_sym = K * inv_sqrt_m[:, None] * inv_sqrt_m[None, :]
    eigenvalues, Y = jnp.linalg.eigh(K_sym)

    modes_free = Y.T * inv_sqrt_m[None, :]  # rows are modes
    modes_free = modes_free / jnp.linalg.norm(modes_free, axis=1, keepdims=True)

    modes = jnp.zeros((len(free_idx), 3 * n_blocks))
    modes = modes.at[:, free_idx].set(modes_free)
    return eigenvalues, modes.reshape(len(free_idx), n_blocks, 3)


def eigenmode_analysis(
    displacement: jnp.ndarray,
    geometry,
    energy_fn,
    control_params: ControlParams,
    constrained_block_DOF_pairs=_EMPTY_PAIRS,
    constrained_DOFs_fn=None,
    t=0.0,
) -> EigenmodeData:
    """Modal analysis packaged as :class:`EigenmodeData` (ready for
    ``plotting.plot_mode``), mirroring the reference's artifact shape
    (reference difflexmm/utils.py:28-42, dynamics.py:189-245)."""

    eigenvalues, modes = linear_mode_analysis(
        displacement, geometry, energy_fn, control_params,
        constrained_block_DOF_pairs=constrained_block_DOF_pairs,
        constrained_DOFs_fn=constrained_DOFs_fn,
        t=t,
    )
    return EigenmodeData(
        block_centroids=control_params.geometrical_params.block_centroids,
        centroid_node_vectors=(
            control_params.geometrical_params.centroid_node_vectors
        ),
        eigenvalues=eigenvalues,
        fields=modes,
    )
