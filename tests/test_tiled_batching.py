"""Design-tiled batched Pallas path: vmap(solve) == per-design solves.

The tiler (ops/pallas/tiling.py) packs a vmapped population of designs onto
one super-lattice with seam-masked bonds/contacts; a jax.custom_batching
rule installed by setup_dynamic_solver routes vmapped calls there. These
tests run the kernel in interpreter mode on CPU and pin

- layout round-trips and the seam-masked energy identity,
- value parity of the tiled vmap vs stacked per-design solves,
- design-gradient parity through the vjp-of-vmap order,
- the fallback (batched constraint params) matching plain vmap,
- plain (non-vmapped) grad being untouched by the wrapper, and
- the BatchTracer dispatch seam (private JAX API, fail-safe by design).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difflexmm_tpu.geometry import QuadGeometry
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.bonds import ligament_energy
from difflexmm_tpu.ops.grid import build_quad_grid_energy
from difflexmm_tpu.ops.pallas import tiling
from difflexmm_tpu.solver import setup_dynamic_solver
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)

N1, N2 = 5, 4


def _setup(method, batch_tiling="auto", **kwargs):
    geo = QuadGeometry(N1, N2, 1.0, 0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()

    driven_pairs, drive_mask = base.driven_side_pairs(N1, N2, 2, "left")
    drive_vector = jnp.asarray(drive_mask)

    def drive(t, amplitude, rate):
        return base.pulse(t, amplitude, rate) * drive_vector

    solve = setup_dynamic_solver(
        geometry=geo,
        energy_fn=build_quad_grid_energy(N1, N2, ligament_energy),
        constrained_block_DOF_pairs=driven_pairs,
        constrained_DOFs_fn=drive,
        damped_blocks=np.arange(geo.n_blocks),
        method=method,
        n_substeps=6,
        quad_grid=dict(n1=N1, n2=N2, linearized=False),
        pallas_interpret=True,
        batch_tiling=batch_tiling,
        **kwargs,
    )

    def cp_for(design, amplitude=0.15):
        return ControlParams(
            geometrical_params=GeometricalParams(bc(*design), cnv(*design)),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(1.0, 0.02, 1e-3, rbv()),
                density=1.0,
                damping=0.05,
                contact_params=ContactParams(0.0, jnp.deg2rad(5.0), 1.0),
            ),
            constraint_params=dict(amplitude=amplitude, rate=1.0),
        )

    timepoints = jnp.linspace(0.0, 1.5, 7)
    state0 = jnp.zeros((2, geo.n_blocks, 3))
    return solve, state0, timepoints, cp_for, geo


def _design_batch(geo, n):
    angles = np.linspace(0.1, 0.3, n)
    designs = [geo.get_design_from_rotated_square(float(a)) for a in angles]
    return designs


def _stack_cps(cp_for, designs):
    return jax.tree.map(
        lambda *xs: jnp.stack(xs), *[cp_for(d) for d in designs]
    )


def test_tile_roundtrip_and_seam_mask():
    x = jnp.arange(2 * 3 * 7 * 4 * 5.0).reshape(6, 7, 4, 5)
    rt = tiling.untile_planes(tiling.tile_planes(x, 2, 3), 2, 3)
    assert jnp.array_equal(rt, x)

    mask = np.asarray(tiling.h_seam_mask(5, 3))[0]
    assert mask.shape == (14,)
    # Pairs (4, 9) couple columns (4->5) and (9->10): design seams.
    assert mask[4] == 0 and mask[9] == 0 and mask.sum() == 12


@pytest.mark.parametrize("cfg", ["auto", dict(b1=2, b2=3)])
def test_tiled_vmap_matches_per_design(cfg):
    solve, state0, timepoints, cp_for, geo = _setup(
        "verlet_pallas", batch_tiling=cfg
    )
    solve_ref, *_ = _setup("verlet")
    designs = _design_batch(geo, 6)
    cps = _stack_cps(cp_for, designs)

    out = jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps)
    ref = jnp.stack(
        [solve_ref(state0, timepoints, cp_for(d)) for d in designs]
    )
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(ref))) > 1e-4  # something happened
    assert jnp.allclose(out, ref, atol=1e-6), float(jnp.max(jnp.abs(out - ref)))


def test_tiled_vmap_padding():
    # Population not divisible by b1*b2: padded designs must not leak.
    solve, state0, timepoints, cp_for, geo = _setup(
        "verlet_pallas", batch_tiling=dict(b1=2, b2=2)
    )
    designs = _design_batch(geo, 5)  # pads to 8
    cps = _stack_cps(cp_for, designs)
    out = jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps)
    one = solve(state0, timepoints, cp_for(designs[4]))
    assert out.shape[0] == 5
    assert jnp.allclose(out[4], one, atol=1e-6)


def test_tiled_vmap_design_gradient():
    solve, state0, timepoints, cp_for, geo = _setup("verlet_pallas")
    solve_ref, *_ = _setup("verlet")
    designs = _design_batch(geo, 4)
    cps = _stack_cps(cp_for, designs)

    def obj_batch(cps_):
        sols = jax.vmap(solve, in_axes=(None, None, 0))(
            state0, timepoints, cps_
        )
        return jnp.sum(sols[:, -1, 1] ** 2, axis=(1, 2))

    vals, pullback = jax.vjp(obj_batch, cps)
    (g,) = pullback(jnp.ones_like(vals))
    g = g.geometrical_params.centroid_node_vectors

    def obj_one(cp_):
        sol = solve_ref(state0, timepoints, cp_)
        return jnp.sum(sol[-1, 1] ** 2)

    g_ref = jnp.stack(
        [
            jax.grad(obj_one)(cp_for(d)).geometrical_params.centroid_node_vectors
            for d in designs
        ]
    )
    scale = float(jnp.max(jnp.abs(g_ref)))
    assert scale > 0
    assert float(jnp.max(jnp.abs(g - g_ref))) / scale < 1e-5


def test_batched_constraints_fall_back():
    # Scenario-style vmap (shared design, batched drive amplitude) is NOT
    # tileable (per-design drive values); the rule must fall back to plain
    # vmap with identical results.
    solve, state0, timepoints, cp_for, geo = _setup("verlet_pallas")
    solve_off, *_ = _setup("verlet_pallas", batch_tiling="off")
    design = geo.get_design_from_rotated_square(0.2)
    amps = jnp.linspace(0.05, 0.2, 3)
    cps = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[cp_for(design, float(a)) for a in amps]
    )
    out = jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps)
    ref = jax.vmap(solve_off, in_axes=(None, None, 0))(
        state0, timepoints, cps
    )
    assert jnp.allclose(out, ref, atol=0.0), "fallback must be exact"


def test_plain_grad_unaffected_by_wrapper():
    # Single-design value_and_grad must bypass the custom_vmap wrapper
    # (which does not support plain AD) and match batch_tiling="off".
    solve, state0, timepoints, cp_for, geo = _setup("verlet_pallas")
    solve_off, *_ = _setup("verlet_pallas", batch_tiling="off")
    design = geo.get_design_from_rotated_square(0.2)

    def obj(solve_fn, cp_):
        sol = solve_fn(state0, timepoints, cp_)
        return jnp.sum(sol[-1, 1] ** 2)

    v1, g1 = jax.value_and_grad(lambda c: obj(solve, c))(cp_for(design))
    v2, g2 = jax.value_and_grad(lambda c: obj(solve_off, c))(cp_for(design))
    assert v1 == v2
    assert jnp.array_equal(
        g1.geometrical_params.centroid_node_vectors,
        g2.geometrical_params.centroid_node_vectors,
    )


def test_batch_tracer_seam_pinned():
    # The vmap-dispatch uses jax._src.interpreters.batching.BatchTracer.
    # If this import breaks on a JAX upgrade the solver silently loses the
    # tiled fast path (fail-safe) — this test makes the loss loud.
    try:
        from jax._src.interpreters.batching import BatchTracer  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise AssertionError(
            "jax._src.interpreters.batching.BatchTracer moved: update the "
            "vmap dispatch in solver/dynamics.py (_dispatching_solve) or "
            "the design-tiled batched path silently degrades to plain vmap."
        ) from e


def test_resolve_method_rules():
    from difflexmm_tpu.solver import resolve_method

    grid = dict(n1=N1, n2=N2)
    # No grid: nothing for the fused kernels to run on.
    assert resolve_method(None, None, backend="tpu") == "verlet"
    # Grid + TPU: fused Pallas kernel; grid + CPU: XLA verlet.
    assert resolve_method(grid, None, backend="tpu") == "verlet_pallas"
    assert resolve_method(grid, None, backend="cpu") == "verlet"
    assert resolve_method(None, grid, backend="tpu") == "verlet_pallas"
    # Interpreter mode forces the Pallas path (CPU test parity).
    assert resolve_method(grid, None, pallas_interpret=True, backend="cpu") == (
        "verlet_pallas"
    )


def test_auto_method_tiled_vmap_matches_per_design():
    # method="auto" with pallas_interpret resolves to the Pallas path and
    # installs the tiling rule; small populations run tiled.
    solve, state0, timepoints, cp_for, geo = _setup("auto")
    solve_ref, *_ = _setup("verlet")
    designs = _design_batch(geo, 4)
    cps = _stack_cps(cp_for, designs)
    out = jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps)
    ref = jnp.stack(
        [solve_ref(state0, timepoints, cp_for(d)) for d in designs]
    )
    assert jnp.allclose(out, ref, atol=1e-6), float(
        jnp.max(jnp.abs(out - ref))
    )


def test_max_batch_routes_large_populations_to_ckpt(monkeypatch):
    # Populations above batch_tiling["max_batch"] must leave the tiled
    # kernel for a plain vmap of the verlet_ckpt forward (the measured
    # winner at scale), with per-design parity intact.
    from difflexmm_tpu.solver import dynamics

    built_methods = []
    orig_setup = dynamics.setup_dynamic_solver

    def spy(**kwargs):
        built_methods.append(kwargs.get("method"))
        return orig_setup(**kwargs)

    monkeypatch.setattr(dynamics, "setup_dynamic_solver", spy)

    solve, state0, timepoints, cp_for, geo = _setup(
        "verlet_pallas", batch_tiling=dict(max_batch=2)
    )
    solve_ref, *_ = _setup("verlet")
    designs = _design_batch(geo, 4)
    cps = _stack_cps(cp_for, designs)
    out = jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps)
    assert "verlet_ckpt" in built_methods, (
        "population of 4 > max_batch=2 should have built the ckpt fallback"
    )
    ref = jnp.stack(
        [solve_ref(state0, timepoints, cp_for(d)) for d in designs]
    )
    assert jnp.allclose(out, ref, atol=1e-6), float(
        jnp.max(jnp.abs(out - ref))
    )


def test_ineligible_batch_auto_routes_to_ckpt():
    # Scenario-style vmap (batched drive amplitude) is not tileable; under
    # method="auto" (routing enabled, perf-first) it must run the ckpt
    # forward, not a plain vmap of the Pallas kernel — the measured-worst
    # strategy — still matching per-scenario solves.
    solve, state0, timepoints, cp_for, geo = _setup("auto")
    solve_ref, *_ = _setup("verlet")
    design = geo.get_design_from_rotated_square(0.2)
    amps = [0.05, 0.1, 0.15]
    cps = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[cp_for(design, a) for a in amps]
    )
    out = jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps)
    assert solve._tiling_fallback_cache, (
        "auto + ineligible batch should have built the ckpt fallback"
    )
    ref = jnp.stack(
        [solve_ref(state0, timepoints, cp_for(design, a)) for a in amps]
    )
    assert jnp.allclose(out, ref, atol=1e-6), float(
        jnp.max(jnp.abs(out - ref))
    )


def test_ineligible_small_batch_explicit_pallas_keeps_pallas():
    # A user who EXPLICITLY chose verlet_pallas with a max_batch cap keeps
    # Pallas numerics for un-tileable batches at or below the cap (the
    # backend only switches past it) — solver/dynamics.py reroute rule.
    solve, state0, timepoints, cp_for, geo = _setup(
        "verlet_pallas", batch_tiling=dict(max_batch=8)
    )
    design = geo.get_design_from_rotated_square(0.2)
    amps = [0.05, 0.1, 0.15]
    cps = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[cp_for(design, a) for a in amps]
    )
    jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps)
    assert not solve._tiling_fallback_cache, (
        "3 <= max_batch=8 un-tileable scenarios must stay on the plain "
        "Pallas vmap (user chose Pallas numerics explicitly)"
    )
    # ... and past the cap the fallback kicks in.
    amps9 = [0.05 + 0.01 * i for i in range(9)]
    cps9 = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[cp_for(design, a) for a in amps9]
    )
    jax.vmap(solve, in_axes=(None, None, 0))(state0, timepoints, cps9)
    assert solve._tiling_fallback_cache


def test_mixed_vmap_of_grad_routes_to_plain_with_warning():
    # vmap-of-grad whose batch carries EXTRA non-differentiated leaves
    # (raw batch tracers alongside the design's AD tracers) cannot go
    # through custom_vmap ("Linearization failed..."); the dispatcher must
    # route it to the plain solve (fully supported, just slower) with a
    # one-time performance warning naming the vjp-of-vmap fast order —
    # preserving reference-style per-candidate grad code.
    solve, state0, timepoints, cp_for, geo = _setup("verlet_pallas")
    solve_off, *_ = _setup("verlet_pallas", batch_tiling="off")
    designs = _design_batch(geo, 3)
    ds = jax.tree.map(lambda *xs: jnp.stack(xs), *designs)
    damps = jnp.linspace(0.04, 0.06, 3)

    def per_candidate_grad(solve_fn, d, damp):
        def f(dd):
            cp = cp_for(dd)
            mp = cp.mechanical_params._replace(damping=damp)
            sol = solve_fn(
                state0, timepoints, cp._replace(mechanical_params=mp)
            )
            return jnp.sum(sol[-1, 1] ** 2)

        return jax.grad(f)(d)

    with pytest.warns(UserWarning, match="vjp of the vmapped"):
        g = jax.vmap(lambda d, a: per_candidate_grad(solve, d, a))(ds, damps)
    g_ref = jax.vmap(lambda d, a: per_candidate_grad(solve_off, d, a))(
        ds, damps
    )
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        assert jnp.allclose(a, b, rtol=1e-9)

    # Pure vmap-of-grad over the design alone stays supported and silent
    # (routed to the plain solve, bypassing the tiler).
    def design_only_grad(d):
        def f(dd):
            sol = solve(state0, timepoints, cp_for(dd))
            return jnp.sum(sol[-1, 1] ** 2)

        return jax.grad(f)(d)

    g = jax.vmap(design_only_grad)(ds)
    assert all(
        bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree.leaves(g)
    )


def test_jitted_oversized_population_builds_fallback():
    # The lazy verlet_ckpt fallback is built INSIDE the custom_vmap rule,
    # i.e. inside whatever trace the solve call sits in. Under jit, setup
    # would stage its jnp ops as tracers and its np conversions raised
    # TracerArrayConversionError (found via the kagome auto bench on
    # TPU); dynamics.py wraps the build in jax.ensure_compile_time_eval.
    solve, state0, timepoints, cp_for, geo = _setup(
        "verlet_pallas", batch_tiling=dict(max_batch=2)
    )
    solve_ref, *_ = _setup("verlet")
    designs = _design_batch(geo, 4)
    cps = _stack_cps(cp_for, designs)

    @jax.jit
    def run(c):
        return jax.vmap(solve, in_axes=(None, None, 0))(
            state0, timepoints, c
        )

    out = run(cps)
    assert solve._tiling_fallback_cache
    ref = jnp.stack(
        [solve_ref(state0, timepoints, cp_for(d)) for d in designs]
    )
    assert jnp.allclose(out, ref, atol=1e-6), float(
        jnp.max(jnp.abs(out - ref))
    )
