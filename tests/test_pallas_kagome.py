"""Kagome fused Pallas Verlet kernel: parity with the XLA verlet path.

Runs in interpreter mode on CPU (semantics check); the compiled TPU path is
exercised by bench/driver runs on real hardware.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from difflexmm_tpu.geometry import KagomeGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.bonds import ligament_energy
from difflexmm_tpu.ops.kagome_grid import build_kagome_grid_energy
from difflexmm_tpu.solver import setup_dynamic_solver
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _setup(method, n1=4, n2=3, n_substeps=8, k_arrays=False, **kwargs):
    geo = KagomeGeometry(n1_cells=n1, n2_cells=n2, bond_length=0.05)
    geo.compute_geometry()
    bc, cnv, bond_fn, rbv = geo.get_parametrization()
    design = geo.zero_design()

    # Drive the down triangle of the two middle rows of the first column.
    rows = np.array([n2 // 2 - 1, n2 // 2])
    driven_blocks = rows * 2 * n1
    driven_pairs = base.all_dofs_pairs(driven_blocks)
    k = len(driven_blocks)
    drive_vector = jnp.asarray(np.concatenate([np.ones(k), np.zeros(2 * k)]))

    def drive(t, amplitude, rate):
        return base.pulse(t, amplitude, rate) * drive_vector

    solve = setup_dynamic_solver(
        geometry=geo,
        energy_fn=build_kagome_grid_energy(n1, n2, ligament_energy),
        constrained_block_DOF_pairs=driven_pairs,
        constrained_DOFs_fn=drive,
        damped_blocks=np.arange(geo.n_blocks),
        method=method,
        n_substeps=n_substeps,
        kagome_grid=(
            dict(n1=n1, n2=n2, linearized=False)
            if method in ("verlet_pallas", "verlet_ckpt", "auto")
            else None
        ),
        **kwargs,
    )

    n_bonds = len(bond_fn())
    if k_arrays:
        ks = 1.0 + 0.3 * jax.random.uniform(jax.random.PRNGKey(3), (n_bonds,))
        ksh = 0.02 * (1 + 0.5 * jax.random.uniform(jax.random.PRNGKey(4), (n_bonds,)))
        kr = 1e-3 * (1 + jax.random.uniform(jax.random.PRNGKey(5), (n_bonds,)))
    else:
        ks, ksh, kr = 1.0, 0.02, 1e-3
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(*design), cnv(*design)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(ks, ksh, kr, rbv()),
            density=1.0,
            damping=0.05,
            contact_params=ContactParams(0.0, jnp.deg2rad(30.0), 1.0),
        ),
        constraint_params=dict(amplitude=0.02, rate=4.0),
    )
    timepoints = jnp.linspace(0.0, 1.0, 7)
    state0 = jnp.zeros((2, geo.n_blocks, 3))
    return solve, state0, timepoints, cp, design, (bc, cnv)


def test_kagome_pallas_matches_verlet():
    solve_ref, state0, timepoints, cp, *_ = _setup("verlet", k_arrays=True)
    solve_pal, *_ = _setup("verlet_pallas", k_arrays=True, pallas_interpret=True)

    sol_ref = solve_ref(state0, timepoints, cp)
    sol_pal = solve_pal(state0, timepoints, cp)
    assert sol_pal.shape == sol_ref.shape
    assert float(jnp.max(jnp.abs(sol_ref))) > 1e-4  # something happened
    # poly-atan2 inside the kernel differs from jnp.arctan2 by ~2e-8
    assert jnp.allclose(sol_pal, sol_ref, atol=1e-6)


@pytest.mark.slow
def test_kagome_pallas_gradient_matches_verlet():
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


@pytest.mark.slow
def test_kagome_pallas_design_gradient():
    """Design (hinge-shift) gradients flow through the kagome Pallas path."""

    solve_pal, state0, timepoints, cp, design, (bc, cnv) = _setup(
        "verlet_pallas", pallas_interpret=True
    )

    def objective(s3):
        shifts = (design[0], design[1], s3)
        cp2 = cp._replace(
            geometrical_params=GeometricalParams(bc(*shifts), cnv(*shifts))
        )
        return jnp.sum(solve_pal(state0, timepoints, cp2)[:, 1] ** 2)

    g = jax.grad(objective)(design[2])
    assert g.shape == design[2].shape
    assert jnp.all(jnp.isfinite(g))
    assert float(jnp.linalg.norm(g)) > 0


@pytest.mark.slow
def test_kagome_focusing_model_pallas_parity():
    """The model's verlet_pallas method reproduces the verlet trajectory."""

    from difflexmm_tpu.models.kagome_focusing import ForwardProblem

    # n2=6 keeps the driven rows clear of the clamped corner columns (on
    # tiny lattices they overlap; duplicate-pair semantics are covered by
    # the last-write-wins scatter matrix).
    kwargs = dict(
        n1_cells=4, n2_cells=6, cell_size=1.0, cell_angle=jnp.pi / 3,
        bond_length=0.05, k_stretch=1.0, k_shear=0.02, k_rot=1e-3,
        density=1.0, damping=0.02, amplitude=0.05, loading_rate=20.0,
        input_delay=0.0, n_excited_blocks=2, simulation_time=0.3,
        n_timepoints=5, n_substeps=6,
    )
    design = KagomeGeometry(4, 6, bond_length=0.05).zero_design()

    fp_ref = ForwardProblem(method="verlet", **kwargs)
    fp_ref.setup()
    fp_pal = ForwardProblem(
        method="verlet_pallas", pallas_interpret=True, **kwargs
    )
    fp_pal.setup()
    sol_ref = fp_ref.solve(design).fields
    sol_pal = fp_pal.solve(design).fields
    assert jnp.allclose(sol_pal, sol_ref, atol=1e-6)


def test_kagome_verlet_ckpt_matches_verlet():
    """verlet_ckpt (XLA-scan forward + stored-state adjoint) on the kagome
    binding matches the plain verlet scan, gradients included."""

    solve_ref, state0, timepoints, cp, design, geo = _setup("verlet")
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

    g_ref = jax.grad(objective(solve_ref))(0.1)
    g_ckpt = jax.grad(objective(solve_ckpt))(0.1)
    assert jnp.allclose(g_ckpt, g_ref, rtol=1e-10)


def test_kagome_fused_force_loading_matches_verlet():
    """Fused time-dependent force loading through the KAGOME binding
    (S_load factorized scatter on 6-channel planes) == XLA verlet — the
    quad-side equivalent lives in test_pallas_verlet.py."""

    geo = KagomeGeometry(n1_cells=4, n2_cells=3, bond_length=0.05)
    geo.compute_geometry()
    bc, cnv, bond_fn, rbv = geo.get_parametrization()
    design = geo.zero_design()
    n1, n2 = 4, 3

    # Clamp the left column's down-triangles; pull two right-edge blocks.
    clamped = base.all_dofs_pairs(np.arange(n2) * 2 * n1)
    right = np.array([2 * n1 - 1, 4 * n1 - 1])
    loaded_pairs = np.stack([right, np.zeros_like(right)], axis=1)

    def loading(state, t, force_amplitude, rate):
        return force_amplitude * jnp.minimum(t * rate, 1.0)

    kwargs = dict(
        geometry=geo,
        energy_fn=build_kagome_grid_energy(n1, n2, ligament_energy),
        loaded_block_DOF_pairs=loaded_pairs,
        loading_fn=loading,
        constrained_block_DOF_pairs=clamped,
        constrained_DOFs_fn=lambda t, **kw: 0.0,
        damped_blocks=np.arange(geo.n_blocks),
        n_substeps=8,
        kagome_grid=dict(n1=n1, n2=n2, linearized=False),
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
            contact_params=ContactParams(0.0, jnp.deg2rad(30.0), 1.0),
        ),
        constraint_params=dict(),
        loading_params=dict(force_amplitude=0.01, rate=2.0),
    )
    timepoints = jnp.linspace(0.0, 1.0, 6)
    state0 = jnp.zeros((2, geo.n_blocks, 3))

    sol_ref = solve_ref(state0, timepoints, cp)
    sol_pal = solve_pal(state0, timepoints, cp)
    assert float(jnp.max(jnp.abs(sol_ref))) > 1e-5  # the ramp pulled
    assert jnp.allclose(sol_pal, sol_ref, atol=1e-6)

    # Gradient w.r.t. the load amplitude flows through the fused path.
    def obj(solve):
        def fn(amp):
            cp2 = cp._replace(
                loading_params=dict(force_amplitude=amp, rate=2.0)
            )
            return jnp.sum(solve(state0, timepoints, cp2)[:, 1] ** 2)
        return fn

    v_ref, g_ref = jax.value_and_grad(obj(solve_ref))(0.01)
    v_pal, g_pal = jax.value_and_grad(obj(solve_pal))(0.01)
    assert jnp.allclose(v_pal, v_ref, rtol=1e-6)
    assert jnp.allclose(g_pal, g_ref, rtol=1e-5)


def test_kagome_auto_population_routes_to_ckpt():
    """Under method="auto" a vmapped kagome population PAST the tiling
    crossover must reroute to the lazily built verlet_ckpt sibling (a
    plain vmap of the SoA Pallas kernel is the measured-worst batching
    strategy), matching per-design solves exactly. Small populations
    design-tile instead (test_kagome_design_tiling_parity)."""

    solve, state0, timepoints, cp, design, _ = _setup(
        "auto", pallas_interpret=True, batch_tiling=dict(max_batch=2),
    )
    solve_ref, *_ = _setup("verlet")

    ks = jnp.array([0.9, 1.0, 1.1])
    cps = jax.vmap(
        lambda k: cp._replace(
            mechanical_params=cp.mechanical_params._replace(
                bond_params=cp.mechanical_params.bond_params._replace(
                    k_stretch=k
                )
            )
        )
    )(ks)
    out = jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps)
    assert solve._tiling_fallback_cache, (
        "auto kagome population should have built the ckpt fallback"
    )
    ref = jnp.stack([
        solve_ref(
            state0, timepoints,
            cp._replace(
                mechanical_params=cp.mechanical_params._replace(
                    bond_params=cp.mechanical_params.bond_params._replace(
                        k_stretch=float(k)
                    )
                )
            ),
        )
        for k in ks
    ])
    assert float(jnp.max(jnp.abs(ref))) > 1e-5
    assert jnp.allclose(out, ref, atol=1e-6), float(jnp.max(jnp.abs(out - ref)))


def test_kagome_explicit_pallas_keeps_pallas_below_cap():
    """Explicit verlet_pallas with a max_batch cap keeps Pallas numerics
    for populations at or below the cap and reroutes past it."""

    solve, state0, timepoints, cp, design, _ = _setup(
        "verlet_pallas",
        pallas_interpret=True,
        batch_tiling=dict(max_batch=2),
    )
    ks2 = jnp.array([0.9, 1.1])

    def cps_for(ks):
        return jax.vmap(
            lambda k: cp._replace(
                mechanical_params=cp.mechanical_params._replace(
                    bond_params=cp.mechanical_params.bond_params._replace(
                        k_stretch=k
                    )
                )
            )
        )(ks)

    jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps_for(ks2))
    assert not solve._tiling_fallback_cache, (
        "2 <= max_batch=2 must stay on Pallas numerics (design-tiled)"
    )
    ks3 = jnp.array([0.9, 1.0, 1.1])
    jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps_for(ks3))
    assert solve._tiling_fallback_cache, (
        "3 > max_batch=2 must reroute to the verlet_ckpt sibling"
    )


def test_kagome_auto_population_routes_under_jit():
    """The lazy ckpt-fallback build inside the custom_vmap rule must work
    under jit (jax.ensure_compile_time_eval in dynamics.py — without it,
    setup's np conversions raise TracerArrayConversionError, found via
    the kagome multistart bench on TPU)."""

    solve, state0, timepoints, cp, design, _ = _setup(
        "auto", pallas_interpret=True, batch_tiling=dict(max_batch=2),
    )
    ks = jnp.array([0.9, 1.0, 1.1])

    def cps_for(k):
        return cp._replace(
            mechanical_params=cp.mechanical_params._replace(
                bond_params=cp.mechanical_params.bond_params._replace(
                    k_stretch=k
                )
            )
        )

    @jax.jit
    def run(kk):
        cps = jax.vmap(cps_for)(kk)
        return jax.vmap(solve, in_axes=(None, None, 0))(
            state0, timepoints, cps
        )

    out = run(ks)
    assert solve._tiling_fallback_cache
    solve_ref, *_ = _setup("verlet")
    ref = jnp.stack(
        [solve_ref(state0, timepoints, cps_for(float(k))) for k in ks]
    )
    assert jnp.allclose(out, ref, atol=1e-6), float(jnp.max(jnp.abs(out - ref)))


def test_kagome_design_tiling_parity():
    """The kagome design-tiling rule (r5): a small eligible population
    under vmap runs as ONE seam-masked super-lattice kernel trajectory
    (B2 designs along the cell-lane axis) — no ckpt fallback is built —
    and matches per-design solves in value AND vjp-of-vmap gradients."""

    solve, state0, timepoints, cp, design, _ = _setup(
        "verlet_pallas", pallas_interpret=True,
    )
    solve_ref, *_ = _setup("verlet")
    ks = jnp.array([0.9, 1.0, 1.1])

    def cp_for(k):
        return cp._replace(
            mechanical_params=cp.mechanical_params._replace(
                bond_params=cp.mechanical_params.bond_params._replace(
                    k_stretch=k
                )
            )
        )

    out = jax.vmap(solve, in_axes=(None, None, 0))(
        state0, timepoints, jax.vmap(cp_for)(ks)
    )
    assert not solve._tiling_fallback_cache, (
        "small eligible kagome population must design-tile, not reroute"
    )
    ref = jnp.stack(
        [solve_ref(state0, timepoints, cp_for(float(k))) for k in ks]
    )
    assert float(jnp.max(jnp.abs(ref))) > 1e-5
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-6

    def batched_obj(kv):
        o = jax.vmap(solve, in_axes=(None, None, 0))(
            state0, timepoints, jax.vmap(cp_for)(kv)
        )
        return jnp.sum(o[:, :, 1] ** 2, axis=(1, 2, 3))

    vals, pull = jax.vjp(batched_obj, ks)
    (g,) = pull(jnp.ones_like(vals))
    g_ref = jnp.stack([
        jax.grad(
            lambda k: jnp.sum(
                solve_ref(state0, timepoints, cp_for(k))[:, 1] ** 2
            )
        )(k)
        for k in ks
    ])
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-6
    )
