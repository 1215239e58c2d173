"""Snap-through design by differentiable arc-length continuation.

Workflow the reference cannot do (its only quasi-statics integrates damped
dynamics, which jumps dynamically across limit points and never sees the
unstable branch):

1. Trace the FULL equilibrium path of a bistable von Mises truss — up the
   loading branch, through both limit points, across the unstable branch,
   onto the inverted stable branch — with per-point stability eigenvalues.
2. PROGRAM the snap-through threshold: gradient-descend the truss rise ``h``
   so the limit load (max lambda over the traced path, differentiable
   through every Newton corrector via the per-step implicit adjoint)
   matches a prescribed target.

Run:

    python examples/snap_through_continuation.py [target_limit_load]
"""

import sys
from pathlib import Path
from typing import NamedTuple

# Self-bootstrap so `python examples/<name>.py` works from anywhere.
# (Do NOT use PYTHONPATH: the session's TPU-plugin registration breaks
# when PYTHONPATH is set.)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# Statics path tracing wants f64 Newton (like the other statics examples);
# eigen/dense-solve statics runs on CPU.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from difflexmm_tpu.ops import build_strain_energy
from difflexmm_tpu.ops.bonds import simple_spring_energy
from difflexmm_tpu.solver import fold_points, setup_arclength_solver
from difflexmm_tpu.utils import (
    ControlParams,
    GeometricalParams,
    MechanicalParams,
)


class SpringParams(NamedTuple):
    reference_vector: jnp.ndarray
    k_stretch: jnp.ndarray


HALF_SPAN = 1.0
N_BLOCKS = 3  # two clamped anchors + the free apex

# Only the apex's vertical DOF is free.
CONSTRAINED = np.array(
    [[b, d] for b in (0, 1) for d in range(3)] + [[2, 0], [2, 2]]
)
LOADED = np.array([[2, 1]])  # downward force = lambda on the apex


def control_params(h, k=1.0) -> ControlParams:
    """Anchors at (-a, 0), (a, 0); apex at (0, h); one node per block."""

    centroids = jnp.stack(
        [
            jnp.array([-HALF_SPAN, 0.0]),
            jnp.array([HALF_SPAN, 0.0]),
            jnp.array([0.0, 0.0]) + h * jnp.array([0.0, 1.0]),
        ]
    )
    reference_vectors = jnp.stack(
        [
            jnp.array([HALF_SPAN, 0.0]) + h * jnp.array([0.0, 1.0]),
            jnp.array([-HALF_SPAN, 0.0]) + h * jnp.array([0.0, 1.0]),
        ]
    )
    return ControlParams(
        geometrical_params=GeometricalParams(
            centroids, jnp.zeros((N_BLOCKS, 1, 2))
        ),
        mechanical_params=MechanicalParams(
            bond_params=SpringParams(reference_vectors, jnp.asarray(k)),
            density=1.0,
            damping=0.0,
        ),
        constraint_params=dict(),
    )


def build_tracer():
    energy = build_strain_energy(
        jnp.array([[0, 2], [1, 2]]), simple_spring_energy
    )
    return setup_arclength_solver(
        N_BLOCKS,
        energy,
        loaded_block_DOF_pairs=LOADED,
        loading_fn=lambda state, lam, **kw: -lam,
        constrained_block_DOF_pairs=CONSTRAINED,
    )


def main(target_limit_load: float = 0.05):
    trace = build_tracer()

    # --- 1. The full path at the initial rise, with stability. ------------
    h0 = 0.35
    path = jax.jit(
        lambda cp: trace(
            jnp.zeros((N_BLOCKS, 3)),
            0.0,
            ds=0.04,
            n_steps=60,
            control_params=cp,
            compute_stability=True,
        )
    )(control_params(h0))
    assert bool(jnp.all(path.converged)), "continuation corrector stalled"
    folds = fold_points(path)
    lam = np.asarray(path.load_factor)
    v = np.asarray(path.displacement[:, 2, 1])
    eig = np.asarray(path.stability_eig)
    print(f"rise h = {h0}: traced {len(lam)} points, folds at steps {folds}")
    print(
        f"  limit load (snap-through) = {lam[folds[0]]:.5f} at drop "
        f"v = {v[folds[0]]:.4f}"
    )
    print(
        f"  snap-back load            = {lam[folds[1]]:.5f} at drop "
        f"v = {v[folds[1]]:.4f}"
    )
    n_unstable = int((eig < 0).sum())
    print(f"  unstable branch: {n_unstable} points with min-eig < 0 "
          f"(between the folds)")
    print(f"  final point: v = {v[-1]:.4f} (inverted stable branch)")

    # --- 2. Program the threshold: fit h so limit load == target. ---------
    # A short path that ends past the fold but before the far branch
    # re-exceeds it, so max(lambda) IS the limit load.
    def limit_load(h):
        p = trace(
            jnp.zeros((N_BLOCKS, 3)),
            0.0,
            ds=0.03,
            n_steps=12,
            control_params=control_params(h),
        )
        return jnp.max(p.load_factor)

    loss = jax.jit(
        jax.value_and_grad(lambda h: (limit_load(h) - target_limit_load) ** 2)
    )
    h, lr = jnp.asarray(h0), 2.0
    print(f"\nprogramming limit load -> {target_limit_load}")
    for it in range(30):
        value, grad = loss(h)
        h = jnp.clip(h - lr * grad, 0.1, 0.8)
        if it % 5 == 0 or float(value) < 1e-12:
            print(f"  iter {it:2d}: h = {float(h):.5f}  "
                  f"(limit-load error^2 = {float(value):.3e})")
        if float(value) < 1e-12:
            break
    achieved = float(limit_load(h))
    print(f"designed rise h = {float(h):.5f} -> limit load {achieved:.6f}")
    assert abs(achieved - target_limit_load) < 1e-4
    return float(h)


if __name__ == "__main__":
    main(*(float(a) for a in sys.argv[1:2]))
