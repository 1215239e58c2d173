"""Regression guard for the private-API seam in solver.dynamics._hoist_consts.

The Pallas trajectory path re-evaluates a user drive closure's jaxpr with
its closed-over constants hoisted into explicit kernel arguments
(solver/dynamics.py::_hoist_consts), because Pallas kernels cannot capture
constants. That leans on two jax internals:

1. ``jax.make_jaxpr(fn)(*args)`` returning a ClosedJaxpr whose ``.consts``
   are exactly the closure's captured arrays, and
2. ``jax.core.eval_jaxpr(jaxpr, consts, *args)`` re-evaluating it.

``jax.closure_convert`` is NOT a drop-in replacement: it only hoists
perturbable (inexact-dtype) constants, while drive closures also capture
integer index arrays. If a JAX upgrade changes either contract, this test
fails with a message naming the seam instead of the solver failing deep in
kernel tracing.
"""

import jax
import jax.numpy as jnp
import numpy as np


_SEAM = (
    "jax private-API contract behind solver.dynamics._hoist_consts changed "
    "(jax.make_jaxpr().consts / jax.core.eval_jaxpr). Update _hoist_consts "
    "for this JAX version."
)


def test_eval_jaxpr_contract():
    assert hasattr(jax.core, "eval_jaxpr"), _SEAM

    float_const = jnp.arange(4.0)
    int_const = jnp.asarray(np.array([2, 0, 1, 3]))

    def closure(t, x):
        return t * float_const[int_const] + x

    closed = jax.make_jaxpr(closure)(jnp.zeros(()), jnp.ones(4))
    # Both the float AND the int captured arrays must surface as consts
    # (closure_convert would drop the int one — see module docstring).
    const_dtypes = {jnp.asarray(c).dtype.kind for c in closed.consts}
    assert "f" in const_dtypes and "i" in const_dtypes, _SEAM

    out = jax.core.eval_jaxpr(
        closed.jaxpr, closed.consts, jnp.asarray(2.0), jnp.ones(4)
    )
    assert len(out) == 1, _SEAM
    expected = closure(jnp.asarray(2.0), jnp.ones(4))
    assert jnp.allclose(out[0], expected), _SEAM


def test_hoist_consts_end_to_end():
    """The actual helper: hoisted re-evaluation reproduces the closure and
    is jit/grad-traceable with the consts as runtime arguments."""

    from difflexmm_tpu.solver.dynamics import setup_dynamic_solver  # noqa: F401
    # _hoist_consts is nested inside setup_dynamic_solver; replicate its
    # exact mechanics here against the same contract.
    scatter = jnp.asarray(np.array([0.0, 1.0, 0.0, 1.0]))
    idx = jnp.asarray(np.array([1, 3]))

    def raw_drive(t, amplitude):
        return (amplitude * jnp.sin(t) * scatter)[idx]

    closed = jax.make_jaxpr(raw_drive)(jnp.zeros(()), jnp.zeros((1, 1)))

    def converted(t, *all_args):
        args = all_args[:1]
        hoisted = all_args[1:]
        (out,) = jax.core.eval_jaxpr(closed.jaxpr, hoisted, t, *args)
        return out

    consts = tuple(jnp.asarray(c) for c in closed.consts)
    t = jnp.asarray(0.7)
    amp = jnp.full((1, 1), 2.5)
    assert jnp.allclose(
        converted(t, amp, *consts), raw_drive(t, amp)
    ), _SEAM
    g = jax.grad(lambda tt: jnp.sum(converted(tt, amp, *consts)))(t)
    assert jnp.isfinite(g), _SEAM
