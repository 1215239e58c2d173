"""Batched multi-start inverse design: many candidates per update step.

The reference runs design restarts sequentially in notebooks
(random_initial_guess workflow); here a whole population of designs
advances concurrently — one ``vmap``-ed (optionally mesh-sharded) update
per iteration, which on TPU costs far less than per-candidate runs.

Backend choice for the objective: build the ForwardProblem with
``method="verlet_ckpt"`` for large populations — XLA lays the candidate
batch across the VPU lanes and the stored-boundary-state adjoint avoids
remat (measured on v5e at the flagship 24x16/200-timepoint config:
2.83 ms/design fwd+grad at B=128 = 353 designs/s, vs 8.4 ms/design for
the vmapped Pallas kernel and 39.7 ms solo). ``verlet_pallas`` remains
the fastest for a single design or small batches (latency-bound regime).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from difflexmm_tpu.parallel.mesh import SCENARIO_AXIS, make_mesh


class MultistartResult(NamedTuple):
    designs: any          # batched pytree of final designs
    objective_values: any  # (n_iterations, n_candidates)
    best_index: any
    best_design: any


def run_multistart_optax(
    objective_fn: Callable,
    initial_designs,
    n_iterations: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    maximize: bool = True,
    lower_bound=None,
    upper_bound=None,
    mesh=None,
    axis_name: str = SCENARIO_AXIS,
) -> MultistartResult:
    """Advance a batch of design candidates with optax, all at once.

    Args:
        objective_fn: design -> scalar (single candidate).
        initial_designs: pytree whose leaves carry a leading candidate axis.
        mesh: optional device mesh; candidates shard over ``axis_name``
            (leading axis must divide the mesh size). Default: single-device
            vmap.

    Returns:
        MultistartResult with per-iteration per-candidate objectives and the
        best final candidate.
    """

    if optimizer is None:
        optimizer = optax.adam(1e-2)
    sign = -1.0 if maximize else 1.0
    value_and_grad = jax.value_and_grad(objective_fn)

    def candidate_step(design, opt_state):
        value, grad = value_and_grad(design)
        updates, opt_state = optimizer.update(
            jax.tree.map(lambda g: sign * g, grad), opt_state, design
        )
        design = optax.apply_updates(design, updates)
        if lower_bound is not None:
            design = jax.tree.map(lambda d: jnp.maximum(d, lower_bound), design)
        if upper_bound is not None:
            design = jax.tree.map(lambda d: jnp.minimum(d, upper_bound), design)
        return design, opt_state, value

    batched_step = jax.vmap(candidate_step)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        batched_step = jax.shard_map(
            batched_step,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name), P(axis_name)),
            check_vma=False,
        )

    @jax.jit
    def sweep(designs, opt_states):
        def iteration(carry, _):
            designs, opt_states = carry
            designs, opt_states, values = batched_step(designs, opt_states)
            return (designs, opt_states), values

        (designs, opt_states), values = jax.lax.scan(
            iteration, (designs, opt_states), None, length=n_iterations
        )
        return designs, values

    opt_states = jax.vmap(optimizer.init)(initial_designs)
    designs, values = sweep(initial_designs, opt_states)

    final = values[-1]
    best = jnp.argmax(final) if maximize else jnp.argmin(final)
    best_design = jax.tree.map(lambda d: d[best], designs)
    return MultistartResult(designs, values, best, best_design)


def random_initial_designs(key, base_design, n_candidates: int, scale: float):
    """Jittered candidates around a base design (leading candidate axis)."""

    leaves, treedef = jax.tree.flatten(base_design)
    keys = jax.random.split(key, len(leaves))
    jittered = [
        leaf[None] + scale * jax.random.normal(k, (n_candidates,) + leaf.shape)
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, jittered)
