"""Pallas fused Verlet interval kernel: parity with the XLA verlet path.

Runs in interpreter mode on CPU (semantics check); the compiled TPU path is
exercised by bench/driver runs on real hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difflexmm_tpu.geometry import QuadGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.bonds import ligament_energy
from difflexmm_tpu.solver import setup_dynamic_solver
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _setup(method, n1=5, n2=4, n_substeps=8, **kwargs):
    geo = QuadGeometry(n1, n2, 1.0, 0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    design = geo.get_design_from_rotated_square(0.2)

    driven_pairs, drive_mask = base.driven_side_pairs(n1, n2, 2, "left")
    drive_vector = jnp.asarray(drive_mask)

    def drive(t, amplitude, rate):
        return base.pulse(t, amplitude, rate) * drive_vector

    from difflexmm_tpu.ops.grid import build_quad_grid_energy

    solve = setup_dynamic_solver(
        geometry=geo,
        energy_fn=build_quad_grid_energy(n1, n2, ligament_energy),
        constrained_block_DOF_pairs=driven_pairs,
        constrained_DOFs_fn=drive,
        damped_blocks=np.arange(geo.n_blocks),
        method=method,
        n_substeps=n_substeps,
        quad_grid=dict(n1=n1, n2=n2, linearized=False),
        **kwargs,
    )

    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(*design), cnv(*design)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.02, 1e-3, rbv()),
            density=1.0,
            damping=0.05,
            contact_params=ContactParams(0.0, jnp.deg2rad(5.0), 1.0),
        ),
        constraint_params=dict(amplitude=0.15, rate=1.0),
    )
    timepoints = jnp.linspace(0.0, 2.0, 9)
    state0 = jnp.zeros((2, geo.n_blocks, 3))
    return solve, state0, timepoints, cp, design, (bc, cnv)


def test_pallas_interval_matches_verlet():
    solve_ref, state0, timepoints, cp, *_ = _setup("verlet")
    solve_pal, *_ = _setup("verlet_pallas", pallas_interpret=True)

    sol_ref = solve_ref(state0, timepoints, cp)
    sol_pal = solve_pal(state0, timepoints, cp)
    assert sol_pal.shape == sol_ref.shape
    assert float(jnp.max(jnp.abs(sol_ref))) > 1e-3  # something happened
    # poly-atan2 inside the kernel differs from jnp.arctan2 by ~2e-8
    assert jnp.allclose(sol_pal, sol_ref, atol=1e-6)


def test_pallas_gradient_matches_verlet():
    solve_ref, state0, timepoints, cp, *_ = _setup("verlet")
    solve_pal, *_ = _setup("verlet_pallas", pallas_interpret=True)

    def objective(solve):
        def fn(k_scale):
            bp = cp.mechanical_params.bond_params._replace(
                k_stretch=k_scale * cp.mechanical_params.bond_params.k_stretch
            )
            cp2 = cp._replace(
                mechanical_params=cp.mechanical_params._replace(bond_params=bp)
            )
            return jnp.sum(solve(state0, timepoints, cp2)[:, 1] ** 2)
        return fn

    v_ref, g_ref = jax.value_and_grad(objective(solve_ref))(1.0)
    v_pal, g_pal = jax.value_and_grad(objective(solve_pal))(1.0)
    assert jnp.allclose(v_pal, v_ref, rtol=1e-6)
    assert jnp.allclose(g_pal, g_ref, rtol=1e-5)


def test_pallas_geometry_gradient():
    """Design gradients flow through the Pallas path (custom_vjp arrays)."""

    solve_pal, state0, timepoints, cp, design, (bc, cnv) = _setup(
        "verlet_pallas", pallas_interpret=True
    )

    def objective(h):
        cp2 = cp._replace(
            geometrical_params=GeometricalParams(bc(h, design[1]), cnv(h, design[1]))
        )
        return jnp.sum(solve_pal(state0, timepoints, cp2)[:, 1] ** 2)

    g = jax.grad(objective)(design[0])
    assert g.shape == design[0].shape
    assert jnp.all(jnp.isfinite(g))
    assert float(jnp.linalg.norm(g)) > 0


def test_poly_arctan2_accuracy():
    from difflexmm_tpu.ops.mathx import poly_arctan2

    angles = jnp.linspace(-jnp.pi + 1e-6, jnp.pi - 1e-6, 2001)
    y, x = jnp.sin(angles), jnp.cos(angles)
    err = jnp.abs(poly_arctan2(2.5 * y, 2.5 * x) - angles)
    assert float(err.max()) < 5e-8
    # gradient finite everywhere on the circle
    g = jax.vmap(jax.grad(lambda a: poly_arctan2(jnp.sin(a), jnp.cos(a))))(angles)
    assert jnp.all(jnp.isfinite(g))
    # the polynomial's derivative error is larger than its value error
    assert jnp.allclose(g, 1.0, atol=1e-4)
