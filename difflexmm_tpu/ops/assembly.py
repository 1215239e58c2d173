"""Energy assembly over static bond connectivity, and energy composition.

The strain energy of the structure is the sum of per-bond energies evaluated
on node DOFs gathered at the two ends of every bond. Connectivity is static,
so the gather indices are compile-time constants; the reverse-mode transpose
of the gather (the force scatter) lowers to a single segment-sum, which XLA
handles natively on TPU.

Behavioral parity: reference difflexmm/energy.py:179-197, 410-491 (which
used jax_md.smap.bond; this framework has no jax_md dependency).
"""

from typing import Callable

import jax.numpy as jnp

from difflexmm_tpu.ops.bonds import ligament_energy_linearized
from difflexmm_tpu.ops.kinematics import block_to_node_kinematics


def strain_energy_bond(
    bond_connectivity: jnp.ndarray,
    bond_energy_fn: Callable = ligament_energy_linearized,
):
    """Lift a per-bond energy to a total energy over a set of bonds.

    Returns ``fn(node_DOFs_flat, **bond_params) -> float`` where
    ``node_DOFs_flat`` has shape (n_nodes, 3).
    """

    ends_1 = bond_connectivity[:, 0]
    ends_2 = bond_connectivity[:, 1]

    def total_bond_energy(node_DOFs: jnp.ndarray, **bond_params):
        d1 = node_DOFs[ends_1]
        d2 = node_DOFs[ends_2]
        return jnp.sum(bond_energy_fn((d1, d2), **bond_params))

    return total_bond_energy


def build_strain_energy(
    bond_connectivity: jnp.ndarray,
    bond_energy_fn: Callable = ligament_energy_linearized,
):
    """Total strain energy as a function of block DOFs and control params.

    Returns ``strain_energy_fn(block_displacement, control_params)``.
    """

    bond_sum = strain_energy_bond(bond_connectivity, bond_energy_fn)

    def strain_energy_fn(block_displacement: jnp.ndarray, control_params):
        cnv = control_params.geometrical_params.centroid_node_vectors
        bond_params = control_params.mechanical_params.bond_params
        n_blocks, n_npb, _ = cnv.shape
        node_DOFs = block_to_node_kinematics(block_displacement, cnv).reshape(
            n_blocks * n_npb, 3
        )
        return bond_sum(node_DOFs, **bond_params._asdict())

    return strain_energy_fn


def combine_block_energies(*energy_fns: Callable):
    """Sum multiple (block_displacement, control_params) -> float energies."""

    def combined(block_displacement: jnp.ndarray, control_params):
        total = jnp.asarray(0.0)
        for fn in energy_fns:
            total = total + fn(block_displacement, control_params)
        return total

    return combined


def constrain_energy(energy_fn: Callable, constrained_kinematics: Callable):
    """Compose an energy with driven-constraint kinematics.

    Returns ``E(free_DOFs, t, control_params)``; differentiation with respect
    to ``free_DOFs`` automatically masks forces on constrained DOFs (the mask
    is part of the kinematics map).
    """

    def constrained_energy_fn(free_DOFs, t, control_params):
        return energy_fn(
            constrained_kinematics(free_DOFs, t, control_params.constraint_params),
            control_params,
        )

    return constrained_energy_fn
