"""Scenario- and candidate-parallel objectives over a device mesh.

Replaces the reference's ``jax.pmap`` pattern
(quads_kinetic_energy_static_tuning.py:473-478: pmap over loading scenarios,
grad-through-pmap with an implicit all-reduce) with ``shard_map`` over a
named mesh: scenario inputs are sharded on the scenario axis, the design is
replicated, and the weighted objective is psum-reduced over ICI. Reverse-mode
AD through shard_map yields the replicated design gradient automatically
(the transpose of the broadcast is the psum of per-shard gradients).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from difflexmm_tpu.parallel.mesh import SCENARIO_AXIS, make_mesh


def scenario_parallel_objective(
    per_scenario_fn: Callable,
    mesh: Optional[Mesh] = None,
    axis_name: str = SCENARIO_AXIS,
):
    """Build a sharded weighted-sum objective over scenarios.

    Args:
        per_scenario_fn: ``fn(design, scenario_input) -> scalar`` where
            ``scenario_input`` is a pytree holding one scenario's data.
        mesh: device mesh with ``axis_name``; default: all devices, 1D.
        axis_name: mesh axis to shard scenarios over.

    Returns:
        ``objective(design, scenario_inputs, weights) -> scalar`` where
        ``scenario_inputs`` leaves have a leading scenario axis divisible by
        the mesh axis size, and ``weights`` has shape (n_scenarios,). The
        value (and its design gradient under AD) is identical on all devices.
        Call it under ``jax.jit`` (rematerialized solver segments cannot be
        evaluated eagerly inside shard_map).
    """

    if mesh is None:
        mesh = make_mesh(axis_names=(axis_name,))

    def shard_fn(design, inputs_shard, weights_shard):
        values = jax.vmap(lambda inp: per_scenario_fn(design, inp))(inputs_shard)
        return jax.lax.psum(jnp.sum(weights_shard * values), axis_name)

    # check_vma=False: solver scans close over replicated initial states
    # whose carries become scenario-varying; the collective structure here
    # is the single explicit psum, so the varying-axis bookkeeping is off.
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )

    def objective(design, scenario_inputs, weights):
        return sharded(design, scenario_inputs, weights)

    return objective


def multistart_map(
    fn: Callable,
    mesh: Optional[Mesh] = None,
    axis_name: str = SCENARIO_AXIS,
):
    """vmap ``fn`` over a leading candidate axis, sharded across the mesh.

    For batched multi-start inverse design: each device advances its own
    design candidates; there is no cross-candidate communication.

    Returns ``mapped(candidates_pytree) -> results`` with outputs sharded on
    the same axis.
    """

    if mesh is None:
        mesh = make_mesh(axis_names=(axis_name,))

    vf = jax.vmap(fn)
    return jax.shard_map(
        vf, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name),
        check_vma=False,
    )
