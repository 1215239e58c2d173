"""Arc-length continuation oracles.

Gold checks against the von Mises truss — the classical snap-through
problem with a closed-form load-displacement curve: two springs from
clamped anchors at (-a, 0), (a, 0) to an apex block at (0, h), loaded
downward. With spring stiffness ``k`` (energy k/2 (L - L0)^2 per spring)
and apex drop ``v`` (so the current length is L(v) = sqrt(a^2 + (h+v)^2)):

    lambda(v) = -dE/dv = -2 k (L - L0) (h + v) / L

has two limit points at L* = (L0 a^2)^(1/3); the middle branch between them
is unstable. Plus: whole-path design gradients vs finite differences, and a
rotated-square-lattice consistency check against the plain Newton statics
solver on the stable branch.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry import RotatedSquareGeometry
from difflexmm_tpu.ops.assembly import build_strain_energy
from difflexmm_tpu.ops.bonds import ligament_energy, simple_spring_energy
from difflexmm_tpu.solver import setup_static_solver
from difflexmm_tpu.solver.continuation import (
    fold_points,
    setup_arclength_solver,
)
from difflexmm_tpu.utils import (
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


class SpringParams(NamedTuple):
    reference_vector: jnp.ndarray
    k_stretch: jnp.ndarray


A, H = 1.0, 0.35


def _truss(k=1.0):
    """3 blocks (anchor, anchor, apex), one node each at the centroid."""

    centroids = jnp.array([[-A, 0.0], [A, 0.0], [0.0, H]])
    cnv = jnp.zeros((3, 1, 2))
    bonds = jnp.array([[0, 2], [1, 2]])  # node ids == block ids (1 node/blk)
    reference_vectors = jnp.array([[A, H], [-A, H]])
    cp = ControlParams(
        geometrical_params=GeometricalParams(centroids, cnv),
        mechanical_params=MechanicalParams(
            bond_params=SpringParams(reference_vectors, jnp.asarray(k)),
            density=1.0,
            damping=0.0,
        ),
        constraint_params=dict(),
    )
    energy = build_strain_energy(bonds, simple_spring_energy)
    # Clamp both anchors fully and the apex's ux, theta: only uy(apex) free.
    pairs = np.array(
        [[b, d] for b in (0, 1) for d in range(3)] + [[2, 0], [2, 2]]
    )
    return energy, cp, pairs


def _analytic_lambda(v, k=1.0):
    L0 = np.sqrt(A**2 + H**2)
    L = np.sqrt(A**2 + (H + v) ** 2)
    return -2.0 * k * (L - L0) * (H + v) / L


def _analytic_limit_load(k=1.0):
    L0 = np.sqrt(A**2 + H**2)
    L_star = (L0 * A**2) ** (1.0 / 3.0)
    v_star = -H + np.sqrt(L_star**2 - A**2)  # upper fold: h + v > 0
    return _analytic_lambda(v_star, k), v_star


def _truss_tracer(k=1.0, **kwargs):
    energy, cp, pairs = _truss(k)
    trace = setup_arclength_solver(
        3,
        energy,
        loaded_block_DOF_pairs=np.array([[2, 1]]),
        loading_fn=lambda state, lam, **kw: -lam,  # downward load = lambda
        constrained_block_DOF_pairs=pairs,
        **kwargs,
    )
    return trace, cp


def test_truss_path_on_analytic_curve():
    """Every converged point lies on the closed-form lambda(v) curve, and
    the traced path passes BOTH limit points into the inverted branch."""

    trace, cp = _truss_tracer()
    path = trace(jnp.zeros((3, 3)), 0.0, ds=0.04, n_steps=60, control_params=cp)
    assert bool(jnp.all(path.converged))
    assert float(jnp.max(path.residual_norm)) < 1e-9

    v = np.asarray(path.displacement[:, 2, 1])
    lam = np.asarray(path.load_factor)
    np.testing.assert_allclose(lam, _analytic_lambda(v), atol=1e-9)

    # Snap-through: the apex ends below the mirror configuration v = -2h
    # (far stable branch) while the load factor stayed on the curve.
    assert v[-1] < -2 * H
    # Two folds: lambda rises, falls through the unstable branch, rises.
    folds = fold_points(path)
    assert len(folds) == 2

    # The fold load matches the analytic limit load (the path brackets the
    # fold to ds resolution; the max lies within the bracketing secant gap,
    # second-order below the true limit load).
    lam_max, _ = _analytic_limit_load()
    assert abs(lam[folds[0]] - lam_max) < 2e-3
    assert lam[folds[0]] <= lam_max + 1e-9


def test_truss_stability_flags():
    """stability_eig is positive on the outer branches and negative exactly
    on the segment between the two folds (1 free DOF: stability changes AT
    the limit points under force control)."""

    trace, cp = _truss_tracer()
    path = trace(
        jnp.zeros((3, 3)),
        0.0,
        ds=0.04,
        n_steps=60,
        control_params=cp,
        compute_stability=True,
    )
    eig = np.asarray(path.stability_eig)
    assert np.all(np.isfinite(eig))
    folds = fold_points(path)
    assert np.all(eig[: folds[0]] > 0)
    assert np.all(eig[folds[0] + 1 : folds[1]] < 0)
    assert np.all(eig[folds[1] + 1 :] > 0)


def test_whole_path_gradient_matches_finite_differences():
    """d(sum lambda_i^2)/dk through the scanned correctors (per-step
    implicit adjoint) matches finite differences."""

    def objective(k):
        energy, cp, pairs = _truss(k)
        trace = setup_arclength_solver(
            3,
            energy,
            loaded_block_DOF_pairs=np.array([[2, 1]]),
            loading_fn=lambda state, lam, **kw: -lam,
            constrained_block_DOF_pairs=pairs,
        )
        path = trace(
            jnp.zeros((3, 3)), 0.0, ds=0.05, n_steps=30, control_params=cp
        )
        return jnp.sum(path.load_factor**2)

    k0 = 1.0
    value, grad = jax.value_and_grad(objective)(k0)
    eps = 1e-6
    fd = (float(objective(k0 + eps)) - float(objective(k0 - eps))) / (2 * eps)
    assert np.isfinite(float(value)) and float(value) > 0
    np.testing.assert_allclose(float(grad), fd, rtol=1e-5)


def test_limit_load_gradient():
    """The limit load (max lambda over a path that ends beyond the fold but
    before the stiffening far branch re-exceeds it) is differentiable
    w.r.t. stiffness."""

    def limit_load(k):
        energy, cp, pairs = _truss(k)
        trace = setup_arclength_solver(
            3,
            energy,
            loaded_block_DOF_pairs=np.array([[2, 1]]),
            loading_fn=lambda state, lam, **kw: -lam,
            constrained_block_DOF_pairs=pairs,
        )
        path = trace(
            jnp.zeros((3, 3)), 0.0, ds=0.03, n_steps=12, control_params=cp
        )
        return jnp.max(path.load_factor)

    k0 = 1.3
    value, grad = jax.value_and_grad(limit_load)(k0)
    # The argmax SAMPLE sits within ds of the true fold, so the discrete
    # limit load tracks the analytic one to the bracketing error...
    lam_max, _ = _analytic_limit_load(k0)
    np.testing.assert_allclose(float(value), lam_max, atol=3e-3)
    # ...but its k-derivative is a path quantity (the sample point migrates
    # along the branch as k changes), so the gradient oracle is finite
    # differences of the SAME discrete objective, not the analytic
    # d(lambda_max)/dk = lambda_max/k.
    eps = 1e-6
    fd = (limit_load(k0 + eps) - limit_load(k0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(grad), float(fd), rtol=1e-5)
    assert float(grad) > 0


def test_lattice_displacement_control_matches_statics():
    """On a rotated-square lattice under driven compression (displacement
    control via lambda), continuation points agree with the plain Newton
    statics solver re-solved at the same load factor."""

    geo = RotatedSquareGeometry(3, 2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    angle = 0.25
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
            density=1.0,
            damping=0.0,
        ),
        constraint_params=dict(squeeze=0.1),
    )
    energy = build_strain_energy(bonds(), ligament_energy)
    right = np.arange(geo.n1_blocks - 1, geo.n_blocks, geo.n1_blocks)
    pairs = np.concatenate(
        [
            np.array(
                [
                    [b, d]
                    for b in range(0, geo.n_blocks, geo.n1_blocks)
                    for d in range(3)
                ]
            ),
            np.stack([right, np.zeros_like(right)], 1),
        ]
    )

    def drive(lam, squeeze):
        values = jnp.zeros(len(pairs))
        return values.at[-len(right):].set(-squeeze * lam)

    trace = setup_arclength_solver(
        geo, energy, constrained_block_DOF_pairs=pairs, constrained_DOFs_fn=drive
    )
    path = trace(
        jnp.zeros((geo.n_blocks, 3)), 0.0, ds=0.08, n_steps=12, control_params=cp
    )
    assert bool(jnp.all(path.converged))
    lam = np.asarray(path.load_factor)
    assert lam[-1] > lam[0]  # monotone stable branch here

    solve = setup_static_solver(
        geo, energy, constrained_block_DOF_pairs=pairs, constrained_DOFs_fn=drive
    )
    i = len(lam) - 1
    u_static = solve(jnp.zeros((geo.n_blocks, 3)), float(lam[i]), cp)
    np.testing.assert_allclose(
        np.asarray(path.displacement[i]), np.asarray(u_static), atol=1e-9
    )
    # The drive actually compressed the lattice.
    assert float(jnp.abs(path.displacement[i][:, 2]).max()) > 1e-3
