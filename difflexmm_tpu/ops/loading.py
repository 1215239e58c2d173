"""External loading and viscous damping as dense (n_blocks, 3) force fields.

TPU-first design: forces are assembled densely with static-index scatters
and masks (no flat-DOF reductions); the solver multiplies by the free-DOF
mask, so loads on constrained DOFs are inert automatically.

Behavioral parity: reference difflexmm/loading.py:12-106. Unlike the
reference, ``build_node_loading`` is fully implemented here (the reference
left it as a stub at loading.py:50-68) using the virtual-work transpose of
the block-to-node kinematics.
"""

from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.ops.kinematics import block_to_node_kinematics


def build_loading(
    geometry,
    loaded_block_DOF_pairs,
    loading_fn: Callable,
    constrained_block_DOF_pairs=None,
):
    """Scatter a user loading function onto [block, DOF] pairs.

    ``loading_fn(state, t, **loading_params)`` returns a scalar or
    (n_loaded,) force values. The returned function produces the dense
    (n_blocks, 3) force field.

    ``constrained_block_DOF_pairs`` is accepted for API parity but unused:
    constrained-DOF forces are masked inside the solver.
    """

    del constrained_block_DOF_pairs
    n_blocks = geometry if isinstance(geometry, int) else geometry.n_blocks
    pairs = np.asarray(loaded_block_DOF_pairs, dtype=np.int64).reshape(-1, 2)
    blocks = jnp.asarray(pairs[:, 0], dtype=jnp.int32)
    dofs = jnp.asarray(pairs[:, 1], dtype=jnp.int32)
    n_loaded = len(pairs)

    def global_loading_fn(state, t, loading_params: Dict) -> jnp.ndarray:
        values = jnp.broadcast_to(
            jnp.asarray(loading_fn(state, t, **loading_params)), (n_loaded,)
        )
        dense = jnp.zeros((n_blocks, 3), dtype=values.dtype)
        return dense.at[blocks, dofs].add(values)

    return global_loading_fn


def build_node_loading(
    geometry,
    loaded_block_node_DOF_triples,
    loading_fn: Callable,
    constrained_block_DOF_pairs=None,
):
    """Forces applied at block *nodes*, reduced to block DOFs by virtual work.

    Each row of ``loaded_block_node_DOF_triples`` is [block_id, node_id, DOF]
    with DOF in {0, 1} (nodal x/y force). The generalized block force is the
    kinematics-Jacobian transpose applied to the nodal force field, obtained
    with one ``jax.vjp`` of the block-to-node map (exact, and configuration-
    dependent through the current block rotations).

    Returns ``fn(state, t, loading_params, centroid_node_vectors) ->
    (n_blocks, 3)``.
    """

    del constrained_block_DOF_pairs
    n_blocks = geometry if isinstance(geometry, int) else geometry.n_blocks
    triples = np.asarray(loaded_block_node_DOF_triples, dtype=np.int64).reshape(-1, 3)
    blocks = jnp.asarray(triples[:, 0], dtype=jnp.int32)
    nodes = jnp.asarray(triples[:, 1], dtype=jnp.int32)
    dofs = jnp.asarray(triples[:, 2], dtype=jnp.int32)
    n_loaded = len(triples)

    def node_loading_fn(state, t, loading_params: Dict, centroid_node_vectors):
        displacement = state[0]
        values = jnp.broadcast_to(
            jnp.asarray(loading_fn(state, t, **loading_params)), (n_loaded,)
        )
        V = centroid_node_vectors.shape[1]
        node_forces = jnp.zeros((n_blocks, V, 3), dtype=values.dtype)
        node_forces = node_forces.at[blocks, nodes, dofs].add(values)
        # Virtual work: Q = (d node_disp / d block_disp)^T . F_nodes
        _, vjp = jax.vjp(
            lambda u: block_to_node_kinematics(u, centroid_node_vectors),
            displacement,
        )
        (block_forces,) = vjp(node_forces)
        return block_forces

    return node_loading_fn


def build_damping_coefficients(geometry, damped_blocks):
    """Dense (n_blocks, 3) viscous coefficient field from per-block values.

    Used by integrators that treat the linear damping term implicitly
    (solver.dynamics velocity-Verlet); ``build_viscous_damping`` remains for
    force-style composition.
    """

    n_blocks = geometry if isinstance(geometry, int) else geometry.n_blocks
    damped = np.asarray(damped_blocks, dtype=np.int64).reshape(-1)
    damped_idx = jnp.asarray(damped, dtype=jnp.int32)
    n_damped = len(damped)

    def coefficients(damping) -> jnp.ndarray:
        coeffs = jnp.broadcast_to(jnp.asarray(damping), (n_damped, 3))
        dense = jnp.zeros((n_blocks, 3), dtype=coeffs.dtype)
        return dense.at[damped_idx].add(coeffs)

    return coefficients


def build_viscous_damping(
    geometry,
    damped_blocks,
    constrained_block_DOF_pairs=None,
):
    """Per-block viscous force -c * v on the damped blocks.

    ``damping`` passed at call time is a scalar or (n_damped_blocks, 3)
    array of coefficients. Returns ``fn(state, t, damping) -> (n_blocks, 3)``.
    """

    del constrained_block_DOF_pairs
    # One scatter definition: reuse the coefficient builder so the two
    # damping entry points (force-style here, implicit-Verlet coefficients
    # there) can never drift apart.
    coefficients = build_damping_coefficients(geometry, damped_blocks)

    def damping_fn(state, t, damping) -> jnp.ndarray:
        _, velocity = state
        return -coefficients(damping) * velocity

    return damping_fn
