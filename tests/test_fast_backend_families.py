"""Fast-backend (verlet_ckpt / verlet_pallas) parity for the model families
beyond quads_focusing/kagome_focusing: reference_design, static tuning, and
the hinge-characterization quads variant.

These lock the round-3 wiring of ``quad_grid`` through every quad-family
model (reference pattern: problems/quads_kinetic_energy_static_tuning.py and
problems/reference_design.py run the same solver as quads_focusing.py), and
the mesh-sharded objective over the custom-vjp trajectory backend — the
production multi-chip path (reference pmap pattern:
problems/quads_kinetic_energy_static_tuning.py:473-537).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difflexmm_tpu.parallel import make_mesh


# ---------------------------------------------------------------------------
# reference_design


def _reference_design(method, **overrides):
    from difflexmm_tpu.models.reference_design import ForwardProblem

    params = dict(
        n1_cells=3,
        n2_cells=3,
        spacing=1.0,
        bond_length=0.1,
        initial_angle=0.25,
        k_stretch=1.0,
        k_shear=0.02,
        k_rot=1e-3,
        density=1.0,
        damping=0.02,
        amplitude=0.1,
        loading_rate=2.0,
        input_delay=0.0,
        n_excited_blocks=2,
        loaded_side="left",
        simulation_time=2.0,
        n_timepoints=5,
        n_substeps=8,
        method=method,
    )
    params.update(overrides)
    problem = ForwardProblem(**params)
    problem.setup()
    return problem


def test_reference_design_verlet_ckpt_matches_verlet():
    ref = _reference_design("verlet")
    ckpt = _reference_design("verlet_ckpt")
    f_ref = ref.solve().fields
    f_ckpt = ckpt.solve().fields
    assert jnp.all(jnp.isfinite(f_ref))
    assert jnp.allclose(f_ckpt, f_ref, atol=1e-12)


@pytest.mark.slow
def test_reference_design_verlet_pallas_interpret_matches_verlet():
    ref = _reference_design("verlet")
    pal = _reference_design("verlet_pallas", pallas_interpret=True)
    f_ref = ref.solve().fields
    f_pal = pal.solve().fields
    assert jnp.all(jnp.isfinite(f_ref))
    assert jnp.allclose(f_pal, f_ref, atol=1e-6)


# ---------------------------------------------------------------------------
# quads static tuning


def _static_tuning(method):
    from difflexmm_tpu.models.quads_static_tuning import ForwardProblem

    problem = ForwardProblem(
        n1_blocks=5,
        n2_blocks=5,
        spacing=1.0,
        bond_length=0.1,
        k_stretch=1.0,
        k_shear=0.02,
        k_rot=1e-3,
        density=1.0,
        damping=0.1,
        n_excited_blocks=1,
        simulation_time_dynamic=1.5,
        n_timepoints=5,
        n_timepoints_static=5,
        n_substeps=8,
        method=method,
    )
    problem.setup()
    return problem


def test_static_tuning_verlet_ckpt_matches_verlet():
    """Two-phase (static ramp chained into dynamics) on the fast backend:
    the dynamic phase restarts the trajectory kernel from the compressed
    state, so this covers nonzero initial conditions too."""

    ref = _static_tuning("verlet")
    ckpt = _static_tuning("verlet_ckpt")
    design = ref.geometry.get_design_from_rotated_square(0.25)
    args = (0.1, 2.0, 0.04, 0.05)

    f_ref = ref.solve_full(design, *args).fields
    f_ckpt = ckpt.solve_full(design, *args).fields
    assert jnp.all(jnp.isfinite(f_ref))
    assert jnp.allclose(f_ckpt, f_ref, atol=1e-11)

    def objective(problem):
        def fn(d):
            sol = problem.solve_dynamic(d, *args)
            return jnp.sum(sol.fields[:, 1] ** 2)

        return fn

    v_ref, g_ref = jax.value_and_grad(objective(ref))(design)
    v_ckpt, g_ckpt = jax.value_and_grad(objective(ckpt))(design)
    assert jnp.allclose(v_ckpt, v_ref, rtol=1e-10)
    for a, b in zip(jax.tree.leaves(g_ckpt), jax.tree.leaves(g_ref)):
        assert jnp.allclose(a, b, rtol=1e-8, atol=1e-12)


@pytest.mark.slow
def test_static_tuning_mesh_verlet_ckpt_matches_vmap():
    """Mesh-sharded scenarios x the custom-vjp trajectory backend: value AND
    design gradient equal the single-device vmap result. This is the
    multi-chip production path (shard_map over the stored-boundary-state
    custom vjp)."""

    from difflexmm_tpu.models.quads_static_tuning import (
        ForwardInput,
        OptimizationProblem,
    )

    n = 8
    forward_input_of = lambda design: ForwardInput(
        *design,
        amplitude=tuple(0.05 + 0.01 * i for i in range(n)),
        loading_rate=(2.0,) * n,
        compressive_strain=tuple(0.01 + 0.005 * i for i in range(n)),
        compressive_strain_rate=(0.05,) * n,
    )
    targets = tuple((1, 1) for _ in range(n))
    shifts = tuple((0, 0) for _ in range(n))
    weights = tuple(1.0 if i % 2 == 0 else -0.5 for i in range(n))

    problem = _static_tuning("verlet_ckpt")
    design = problem.geometry.get_design_from_rotated_square(0.25)

    opt_vmap = OptimizationProblem(
        problem, forward_input_of(design), targets, shifts, weights
    )
    opt_vmap.setup_objective()
    value_vmap, grad_vmap = jax.jit(jax.value_and_grad(opt_vmap.objective_fn))(design)

    opt_mesh = OptimizationProblem(
        problem, forward_input_of(design), targets, shifts, weights
    )
    opt_mesh.setup_objective(mesh=make_mesh())
    value_mesh, grad_mesh = jax.jit(jax.value_and_grad(opt_mesh.objective_fn))(design)

    assert jnp.allclose(value_mesh, value_vmap, rtol=1e-10)
    for a, b in zip(jax.tree.leaves(grad_mesh), jax.tree.leaves(grad_vmap)):
        assert jnp.allclose(a, b, rtol=1e-8, atol=1e-12)


# ---------------------------------------------------------------------------
# hinge characterization (quads variant)


def _hinge_quads(method):
    from difflexmm_tpu.models.hinge_characterization import ForwardProblemQuads
    from difflexmm_tpu.geometry.quad import QuadGeometry

    geometry = QuadGeometry(n1_blocks=3, n2_blocks=3, spacing=1.0, bond_length=0.1)
    h, v = geometry.get_design_from_rotated_square(0.2)
    problem = ForwardProblemQuads(
        n1_blocks=3,
        n2_blocks=3,
        spacing=1.0,
        bond_length=0.1,
        horizontal_shifts=h,
        vertical_shifts=v,
        k_stretch=1.0,
        k_shear=0.02,
        k_rot=1e-3,
        density=1.0,
        damping=1.0,
        loading_type="tension",
        amplitude=0.05,
        loading_rate=0.01,
        n_timepoints=6,
        # The quasi-static window spans 1/loading_rate = 100 s; substeps
        # must keep dt below the ~1/omega stability bound.
        n_substeps=80,
        method=method,
    )
    problem.setup()
    return problem


def test_hinge_quads_verlet_ckpt_matches_verlet():
    ref = _hinge_quads("verlet")
    ckpt = _hinge_quads("verlet_ckpt")
    k = (1.0, 0.02, 1e-3)
    sol_ref, cp_ref = ref.solve(k)
    sol_ckpt, cp_ckpt = ckpt.solve(k)
    assert jnp.all(jnp.isfinite(sol_ref.fields))
    assert jnp.allclose(sol_ckpt.fields, sol_ref.fields, atol=1e-12)
    fd_ref = ref.force_displacement(sol_ref, cp_ref)
    fd_ckpt = ckpt.force_displacement(sol_ckpt, cp_ckpt)
    assert jnp.allclose(fd_ckpt, fd_ref, atol=1e-12)


def test_mesh_trace_then_unsharded_reuse():
    """A design derived from the SHARDED objective's gradient (which is
    committed to the scenario mesh) must still be usable by the unsharded
    vmap objective — the MMA runner does exactly this every iteration
    (sharded value_and_grad -> MMA update -> per-scenario logging).
    Locks the mesh-context keying of the solver's trajectory cache
    (solver/dynamics.py): a drive jaxpr traced under shard_map's Manual
    mesh bakes sharding params that poison later plain traces."""

    from difflexmm_tpu.models.quads_static_tuning import (
        ForwardInput,
        OptimizationProblem,
    )

    n = 8
    problem = _static_tuning("verlet_ckpt")
    design = problem.geometry.get_design_from_rotated_square(0.25)
    opt = OptimizationProblem(
        problem,
        ForwardInput(
            *design,
            amplitude=tuple(0.05 + 0.01 * i for i in range(n)),
            loading_rate=(2.0,) * n,
            compressive_strain=tuple(0.01 + 0.005 * i for i in range(n)),
            compressive_strain_rate=(0.05,) * n,
        ),
        target_sizes=tuple((1, 1) for _ in range(n)),
        target_shifts=tuple((0, 0) for _ in range(n)),
        weights=(1.0,) * n,
    )
    opt.setup_objective(mesh=make_mesh())
    value, grad = jax.jit(jax.value_and_grad(opt.objective_fn))(design)
    assert jnp.isfinite(value)

    # Mesh-committed input (inherits the gradient's NamedSharding).
    poisoned = jax.tree.map(lambda a, b: a - 0.0 * b, tuple(design), tuple(grad))
    individual = jax.jit(opt.objective_fn_individual)(poisoned)
    assert individual.shape == (n,)
    assert jnp.all(jnp.isfinite(individual))


# ---------------------------------------------------------------------------
# experiment-playback drives (excited_blocks_fn) on the fast backends


def _playback_problem(method, excited_blocks_fn, **overrides):
    from difflexmm_tpu.models.quads_focusing import ForwardProblem

    params = dict(
        n1_blocks=5, n2_blocks=5, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.0, loading_rate=1.0, input_delay=0.0,  # unused by playback
        n_excited_blocks=2, loaded_side="left",
        n_blocks_clamped_corner=1,  # keep clamps clear of driven rows on 5x5
        simulation_time=2.0, n_timepoints=5, n_substeps=10,
        method=method,
    )
    params.update(overrides)
    problem = ForwardProblem(**params)
    problem.setup(excited_blocks_fn=excited_blocks_fn)
    return problem


def test_experiment_playback_drive_verlet_ckpt():
    """A tracked-experiment drive (jnp.interp playback of a sampled
    boundary signal, the exp/*/experiment_vs_simulation workflow —
    reference quads_focusing.py:82,218-227) through the fast custom-vjp
    backend: the interp data arrays are closure constants the solver must
    hoist into the cached drive jaxpr."""

    t_samples = jnp.linspace(0.0, 2.0, 32)
    u_samples = 0.08 * jnp.sin(2.0 * jnp.pi * t_samples) * jnp.exp(-t_samples)

    def playback(t):
        return jnp.interp(t, t_samples, u_samples)

    ref = _playback_problem("verlet", playback)
    ckpt = _playback_problem("verlet_ckpt", playback)
    design = ref.geometry.get_design_from_rotated_square(0.25)
    f_ref = ref.solve(design).fields
    f_ckpt = ckpt.solve(design).fields
    assert jnp.all(jnp.isfinite(f_ref))
    assert float(jnp.max(jnp.abs(f_ref))) > 1e-3  # playback actually drove
    assert jnp.allclose(f_ckpt, f_ref, atol=1e-12)


@pytest.mark.slow
def test_experiment_playback_drive_verlet_pallas_interpret():
    """Sampled-experiment playback through the fused kernel: jnp.interp
    lowers to a gather (unsupported in Mosaic), so tracked drives use the
    hat-function interpolation ops/mathx.interp_uniform — verified to
    compile on-chip and exactly match jnp.interp on uniform grids."""

    from difflexmm_tpu.ops.mathx import interp_uniform

    t_samples = jnp.linspace(0.0, 2.0, 32)
    u_samples = 0.08 * jnp.sin(2.0 * jnp.pi * t_samples) * jnp.exp(-t_samples)
    dt_sample = float(t_samples[1] - t_samples[0])

    def playback(t):
        return interp_uniform(t, 0.0, dt_sample, u_samples)

    ref = _playback_problem("verlet", playback)
    pal = _playback_problem("verlet_pallas", playback, pallas_interpret=True)
    design = ref.geometry.get_design_from_rotated_square(0.25)
    f_ref = ref.solve(design).fields
    f_pal = pal.solve(design).fields
    assert jnp.all(jnp.isfinite(f_ref))
    assert float(jnp.max(jnp.abs(f_ref))) > 1e-3
    assert jnp.allclose(f_pal, f_ref, atol=1e-6)


def test_reference_design_auto_method_on_cpu_matches_verlet():
    # method="auto" without a TPU (and without interpret mode) resolves to
    # the XLA verlet scan — the model builds and matches the explicit
    # method bit-exactly.
    ref = _reference_design("verlet")
    auto = _reference_design("auto")
    assert jnp.allclose(auto.solve().fields, ref.solve().fields, atol=0.0)


@pytest.mark.slow
def test_reference_design_auto_method_interpret_takes_pallas_path():
    # With pallas_interpret=True, "auto" must resolve to the Pallas kernel
    # (interpreter mode), matching verlet to kernel tolerance.
    ref = _reference_design("verlet")
    auto = _reference_design("auto", pallas_interpret=True)
    f_ref = ref.solve().fields
    f_auto = auto.solve().fields
    assert jnp.all(jnp.isfinite(f_ref))
    assert jnp.allclose(f_auto, f_ref, atol=1e-6)
