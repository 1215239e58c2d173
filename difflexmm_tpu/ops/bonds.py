"""Per-bond elastic energies, batched over bonds.

Each energy takes ``nodal_DOFs = (DOFs1, DOFs2)`` with shapes (n_bonds, 3)
and per-bond (or scalar) stiffness parameters, and returns per-bond energies
(n_bonds,). Everything is broadcast elementwise math — no vmap, no small
matmuls — so the whole bond bundle evaluates as a handful of fused VPU ops.

Behavioral parity: reference difflexmm/energy.py:30-176. The nonlinear shear
strain here is computed as a single atan2 of (cross, dot) between the pushed
reference vector and the current bond vector, which equals the reference's
mod-2pi difference of two atan2 angles on (-pi, pi] but is cheaper and has
one branch-free wrap.
"""

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def vdot(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Row-wise dot product over the last axis."""

    return jnp.sum(v1 * v2, axis=-1)


# numpy, not jnp: a jnp default would create a device array at import
# time, committing the backend before callers can pin a platform.
_UNIT_X = np.array([1.0, 0.0])


def _cross2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def simple_spring_energy(
    nodal_DOFs: Tuple[jnp.ndarray, jnp.ndarray],
    reference_vector: jnp.ndarray = _UNIT_X,
    k_stretch=1.0,
) -> jnp.ndarray:
    """Linear spring on the bond length change, per bond."""

    DOFs1, DOFs2 = nodal_DOFs
    dU = DOFs2[..., :2] - DOFs1[..., :2]
    l = jnp.linalg.norm(dU + reference_vector, axis=-1)
    l0 = jnp.linalg.norm(reference_vector, axis=-1)
    return k_stretch * (l - l0) ** 2 / 2


def stretching_torsional_spring_energy(
    nodal_DOFs: Tuple[jnp.ndarray, jnp.ndarray], k_stretch=1.0, k_rot=1.0
) -> jnp.ndarray:
    """Zero-length spring: stretching of the gap + relative rotation."""

    DOFs1, DOFs2 = nodal_DOFs
    dU = DOFs2[..., :2] - DOFs1[..., :2]
    dRot = DOFs2[..., 2] - DOFs1[..., 2]
    return k_stretch * vdot(dU, dU) / 2 + k_rot * dRot**2 / 2


def ligament_strains_linearized(
    DOFs1: jnp.ndarray,
    DOFs2: jnp.ndarray,
    reference_vector: jnp.ndarray = _UNIT_X,
):
    """Linearized beam strains (axial, shear, rotational), per bond.

    axial = dU . r0 / |r0|^2; shear = r0 x dU / |r0|^2 - (th1+th2)/2;
    rotational = th2 - th1.
    """

    dU = DOFs2[..., :2] - DOFs1[..., :2]
    dRot = DOFs2[..., 2] - DOFs1[..., 2]
    inv_l0_sq = 1.0 / vdot(reference_vector, reference_vector)
    axial = vdot(dU, reference_vector) * inv_l0_sq
    shear = _cross2(reference_vector, dU) * inv_l0_sq - (
        DOFs1[..., 2] + DOFs2[..., 2]
    ) / 2
    return axial, shear, dRot


def ligament_strains(
    DOFs1: jnp.ndarray,
    DOFs2: jnp.ndarray,
    reference_vector: jnp.ndarray = _UNIT_X,
):
    """Nonlinear (finite-rotation) beam strains, per bond.

    axial = |r|/|r0| - 1 with r the current bond vector; shear = signed angle
    from the reference vector pushed forward by the mean rotation to r, in
    (-pi, pi]; rotational = th2 - th1. Exactly frame-invariant.
    """

    dU = DOFs2[..., :2] - DOFs1[..., :2]
    dRot = DOFs2[..., 2] - DOFs1[..., 2]
    mean_rot = (DOFs1[..., 2] + DOFs2[..., 2]) / 2
    r = dU + reference_vector

    c, s = jnp.cos(mean_rot), jnp.sin(mean_rot)
    r0x = jnp.broadcast_to(reference_vector[..., 0], mean_rot.shape)
    r0y = jnp.broadcast_to(reference_vector[..., 1], mean_rot.shape)
    pushed_x = c * r0x - s * r0y
    pushed_y = s * r0x + c * r0y

    from difflexmm_tpu.ops.mathx import arctan2

    axial = jnp.sqrt(vdot(r, r) / vdot(reference_vector, reference_vector)) - 1.0
    shear = arctan2(
        pushed_x * r[..., 1] - pushed_y * r[..., 0],
        pushed_x * r[..., 0] + pushed_y * r[..., 1],
    )
    return axial, shear, dRot


def _ligament_energy_from_strains(axial, shear, dRot, reference_vector,
                                  k_stretch, k_shear, k_rot) -> jnp.ndarray:
    l0_sq = vdot(reference_vector, reference_vector)
    return (
        k_stretch * axial**2 * l0_sq / 2
        + k_shear * shear**2 * l0_sq / 2
        + k_rot * dRot**2 / 2
    )


def ligament_energy_linearized(
    nodal_DOFs: Tuple[jnp.ndarray, jnp.ndarray],
    reference_vector: jnp.ndarray = _UNIT_X,
    k_stretch=1.0,
    k_shear=1.0,
    k_rot=1.0,
) -> jnp.ndarray:
    """Ligament energy with linearized strains (moderate rotations)."""

    axial, shear, dRot = ligament_strains_linearized(
        *nodal_DOFs, reference_vector=reference_vector
    )
    return _ligament_energy_from_strains(
        axial, shear, dRot, reference_vector, k_stretch, k_shear, k_rot
    )


def ligament_energy(
    nodal_DOFs: Tuple[jnp.ndarray, jnp.ndarray],
    reference_vector: jnp.ndarray = _UNIT_X,
    k_stretch=1.0,
    k_shear=1.0,
    k_rot=1.0,
) -> jnp.ndarray:
    """Ligament energy with nonlinear strains (arbitrary rotations)."""

    axial, shear, dRot = ligament_strains(
        *nodal_DOFs, reference_vector=reference_vector
    )
    return _ligament_energy_from_strains(
        axial, shear, dRot, reference_vector, k_stretch, k_shear, k_rot
    )
