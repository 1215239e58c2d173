"""Optimization drivers: optax loops, bounded gradient descent, pytree ravel.

These drive design-variable pytrees directly (flattening only where the
optimizer needs a flat vector). Replaces the reference's notebook-side nlopt
loops (quads_focusing.py:546-649) and hand-rolled ``naive_GD``
(hinge_characterization.py:563-585) with on-device update steps.
"""

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import flatten_util

import optax


def ravel_pytree(tree):
    """Flatten a pytree of arrays to (flat_vector, unflatten_fn)."""

    return flatten_util.ravel_pytree(tree)


class OptLoopResult(NamedTuple):
    design: any
    objective_values: list
    design_values: list


def project_box(design, lower_bound=None, upper_bound=None):
    """Clamp a design pytree to box bounds.

    Each bound may be None, a scalar (applied to every leaf), or a pytree
    matching ``design`` (per-leaf bound arrays).
    """

    def is_pytree_bound(bound):
        return jax.tree_util.tree_structure(bound) == jax.tree_util.tree_structure(design)

    if lower_bound is not None:
        if is_pytree_bound(lower_bound):
            design = jax.tree.map(jnp.maximum, design, lower_bound)
        else:
            design = jax.tree.map(lambda d: jnp.maximum(d, lower_bound), design)
    if upper_bound is not None:
        if is_pytree_bound(upper_bound):
            design = jax.tree.map(jnp.minimum, design, upper_bound)
        else:
            design = jax.tree.map(lambda d: jnp.minimum(d, upper_bound), design)
    return design


def run_optimization_optax(
    objective_fn: Callable,
    initial_design,
    n_iterations: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    maximize: bool = True,
    lower_bound=None,
    upper_bound=None,
    callback: Optional[Callable] = None,
) -> OptLoopResult:
    """Gradient loop on a design pytree with optional box projection.

    Args:
        objective_fn: design -> scalar.
        initial_design: pytree of arrays.
        optimizer: optax transformation; default adam(1e-2).
        maximize: ascend (True, the inverse-design convention) or descend.
        lower_bound/upper_bound: optional scalars or matching pytrees for a
            projection after each step.
        callback: ``callback(iteration, design, value)``.
    """

    if optimizer is None:
        optimizer = optax.adam(1e-2)

    sign = -1.0 if maximize else 1.0
    value_and_grad = jax.value_and_grad(objective_fn)

    @jax.jit
    def step(design, opt_state):
        value, grad = value_and_grad(design)
        updates, opt_state = optimizer.update(
            jax.tree.map(lambda g: sign * g, grad), opt_state, design
        )
        design = optax.apply_updates(design, updates)
        design = project_box(design, lower_bound, upper_bound)
        return design, opt_state, value

    design = initial_design
    opt_state = optimizer.init(design)
    objective_values, design_values = [], []
    for it in range(n_iterations):
        new_design, opt_state, value = step(design, opt_state)
        objective_values.append(float(value))
        design_values.append(design)
        if callback is not None:
            callback(it, design, float(value))
        design = new_design

    return OptLoopResult(design, objective_values, design_values)


def naive_gd(
    objective_and_grad: Callable,
    initial_guess,
    n_iterations: int,
    learning_rate: float,
    lower_bound=None,
    upper_bound=None,
    maximize: bool = False,
    callback: Optional[Callable] = None,
) -> Tuple[any, list, list]:
    """Plain projected gradient descent on a design pytree.

    Behavioral parity with the reference's bounded hand-rolled loop
    (hinge_characterization.py:563-585).
    """

    sign = -1.0 if maximize else 1.0
    design = initial_guess
    objective_values, design_values = [], []
    for it in range(n_iterations):
        value, grad = objective_and_grad(design)
        design = jax.tree.map(lambda d, g: d - sign * learning_rate * g, design, grad)
        design = project_box(design, lower_bound, upper_bound)
        objective_values.append(float(value))
        design_values.append(design)
        if callback is not None:
            callback(it, design, float(value))
    return design, objective_values, design_values
