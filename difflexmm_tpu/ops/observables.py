"""Diagnostics computed on solutions: energies, momenta, strain histories.

Behavioral parity: reference difflexmm/energy.py:494-534.
"""

import numpy as np
import jax.numpy as jnp

from difflexmm_tpu.ops.bonds import ligament_strains
from difflexmm_tpu.ops.kinematics import block_to_node_kinematics


def kinetic_energy(block_velocity: jnp.ndarray, inertia: jnp.ndarray) -> jnp.ndarray:
    """Total kinetic energy: sum over blocks and DOFs of m v^2 / 2."""

    return jnp.sum(inertia * block_velocity**2 / 2)


def angular_momentum(
    block_position: jnp.ndarray,
    block_velocity: jnp.ndarray,
    inertia: jnp.ndarray,
    # numpy, not jnp: a jnp default would initialize the backend at import
    reference_point: jnp.ndarray = np.array([0.0, 0.0]),
) -> jnp.ndarray:
    """Per-block angular momentum about ``reference_point``, (n_blocks,)."""

    r = block_position[..., :2] - reference_point
    p = block_velocity[..., :2] * inertia[..., :2]
    orbital = r[..., 0] * p[..., 1] - r[..., 1] * p[..., 0]
    spin = block_velocity[..., 2] * inertia[..., 2]
    return orbital + spin


def compute_ligament_strains(
    block_displacement: jnp.ndarray,
    centroid_node_vectors: jnp.ndarray,
    bond_connectivity: jnp.ndarray,
    reference_bond_vectors: jnp.ndarray,
):
    """Nonlinear (axial, shear, rotational) strains of every bond."""

    node_DOFs = block_to_node_kinematics(
        block_displacement, centroid_node_vectors
    ).reshape(-1, 3)
    return ligament_strains(
        node_DOFs[bond_connectivity[:, 0]],
        node_DOFs[bond_connectivity[:, 1]],
        reference_vector=reference_bond_vectors,
    )


def compute_ligament_strains_history(
    displacement_history: jnp.ndarray,
    centroid_node_vectors: jnp.ndarray,
    bond_connectivity: jnp.ndarray,
    reference_bond_vectors: jnp.ndarray,
):
    """Strain histories over time: each output is (n_timepoints, n_bonds).

    The kinematics and strain maps broadcast over leading axes, so no
    explicit time loop or vmap is needed.
    """

    T = displacement_history.shape[0]
    node_DOFs = block_to_node_kinematics(
        displacement_history, centroid_node_vectors
    ).reshape(T, -1, 3)
    return ligament_strains(
        node_DOFs[:, bond_connectivity[:, 0]],
        node_DOFs[:, bond_connectivity[:, 1]],
        reference_vector=reference_bond_vectors,
    )
