"""End-to-end model test: quads focusing forward + inverse design (tiny)."""

import jax
import pytest
import jax.numpy as jnp

from difflexmm_tpu.models.quads_focusing import ForwardProblem, OptimizationProblem


def _tiny_problem(**overrides):
    params = dict(
        n1_blocks=6,
        n2_blocks=6,  # n2 >= 6 so driven mid-rows don't overlap clamped corners
        spacing=1.0,
        bond_length=0.1,
        k_stretch=1.0,
        k_shear=0.02,
        k_rot=1e-3,
        density=1.0,
        damping=0.02,
        amplitude=0.15,
        loading_rate=2.0,
        input_delay=0.0,
        n_excited_blocks=2,
        loaded_side="left",
        input_shift=0,
        simulation_time=3.0,
        n_timepoints=16,
        n_substeps=24,
    )
    params.update(overrides)
    return ForwardProblem(**params)


def test_forward_solve_and_response_data():
    problem = _tiny_problem()
    problem.setup()
    geo = problem.geometry
    design = geo.get_design_from_rotated_square(0.25)
    solution = problem.solve(design)
    assert solution.fields.shape == (16, 2, geo.n_blocks, 3)
    # Pulse enters: driven blocks displaced in +x at the pulse peak
    peak_idx = jnp.argmin(jnp.abs(solution.timepoints - 0.25))
    driven = problem.driven_blocks_ids
    assert jnp.all(solution.fields[peak_idx, 0, driven, 0] > 0.05)
    # Clamped corners do not move
    assert jnp.allclose(solution.fields[:, :, problem.clamped_blocks_ids, :], 0.0)

    problem.solution_data = solution
    response = problem.compute_response_data()
    assert response["kinetic_energy"].shape == (16, geo.n_blocks)
    assert response["strain_energy_stretch"].shape[0] == 16
    assert bool(jnp.all(jnp.isfinite(response["strain_energy_shear"])))


@pytest.mark.slow
def test_objective_gradient_and_optimization_step():
    problem = _tiny_problem()
    opt = OptimizationProblem(problem, target_size=(2, 2))
    opt.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(0.25)

    value, grad = jax.value_and_grad(opt.objective_fn)(design)
    assert value > 0
    gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grad)))
    assert jnp.isfinite(gnorm) and gnorm > 0

    final = opt.run_optimization_mma(
        design,
        n_iterations=4,
        lower_bound=-0.3,
        upper_bound=0.3,
        min_void_angle=0.0,
        min_block_angle=0.0,
        min_edge_length=0.05,
        verbose=False,
    )
    assert len(opt.objective_values) == 4
    # The optimizer made progress on the objective
    assert opt.objective_values[-1] > opt.objective_values[0]
    assert opt.forward_problem.solution_data is not None
    assert jax.tree.structure(final) == jax.tree.structure(design)


def test_serialization_roundtrip():
    problem = _tiny_problem()
    opt = OptimizationProblem(problem, target_size=(2, 2), target_shift=(1, 0))
    d = opt.to_dict()
    opt2 = OptimizationProblem.from_dict(d)
    assert opt2.forward_problem.n1_blocks == 6
    assert opt2.target_size == (2, 2) or tuple(opt2.target_size) == (2, 2)
    opt2.setup_objective()
    assert callable(opt2.objective_fn)


def test_robustness_map():
    """(amplitude x loading_rate) target-KE sweep — the paper's robustness
    grid (reference quads_focusing_3dp_pla_shims notebook cell 33,
    notebook-only there). Values match per-scenario solves; the mesh-
    sharded map matches vmap.

    NOTE: runs in a SUBPROCESS. Compiling this vmapped-sweep executable
    mid-suite crashes the whole pytest process on this XLA:CPU build —
    6x reproduced, segfaulting/aborting inside backend_compile_and_load
    or the compile-cache serialization depending on cache state — while
    the identical body passes solo every time (in-process state
    interaction inside XLA, not physics). Isolation costs one
    interpreter + compile (~40 s) and keeps the gate.
    """

    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = str(Path(__file__).resolve().parents[1])
    env = dict(
        os.environ, XLA_FLAGS="--xla_force_host_platform_device_count=8"
    )
    env.pop("PYTHONPATH", None)  # breaks the sitecustomize plugin reg
    code = (
        f"import sys; sys.path.insert(0, {repo!r}); "
        f"sys.path.insert(0, {repo + '/tests'!r}); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "from test_models_quads_focusing import _test_robustness_map_body; "
        "_test_robustness_map_body(); print('ROBUSTNESS_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=repo, env=env,
    )
    assert out.returncode == 0 and "ROBUSTNESS_OK" in out.stdout, (
        out.stdout[-1000:] + "\n" + out.stderr[-2000:]
    )


def _test_robustness_map_body():
    from difflexmm_tpu.parallel import make_mesh

    problem = ForwardProblem(
        n1_blocks=5, n2_blocks=5, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.15, loading_rate=2.0, input_delay=0.0,
        n_excited_blocks=2, loaded_side="left",
        n_blocks_clamped_corner=1,  # keep clamps clear of driven rows on 5x5
        simulation_time=2.0, n_timepoints=5, n_substeps=10,
        method="verlet_ckpt",
    )
    opt = OptimizationProblem(problem, target_size=(2, 2))
    opt.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(0.25)

    amplitudes = jnp.array([0.1, 0.15])
    rates = jnp.array([1.0, 2.0, 3.0, 4.0])
    grid = jax.jit(
        lambda d: opt.compute_robustness_map(d, amplitudes, rates)
    )(design)
    assert grid.shape == (2, 4)
    assert jnp.all(jnp.isfinite(grid)) and jnp.all(grid > 0)

    # The problem's own (amplitude, loading_rate) cell equals objective_fn.
    assert jnp.allclose(grid[1, 1], opt.objective_fn(design), rtol=1e-12)

    # Every cell equals an independent single-scenario solve (spot-check
    # the off-diagonal corners). The map is genuinely non-monotone in
    # amplitude at this config — contact saturates the larger pulse — so
    # no monotonicity is asserted.
    def independent(amp, rate):
        p2 = ForwardProblem(**{**problem.to_dict(), "is_setup": False,
                               "amplitude": amp, "loading_rate": rate,
                               "solution_data": None})
        o2 = OptimizationProblem(p2, target_size=(2, 2))
        o2.setup_objective()
        return o2.objective_fn(design)

    assert jnp.allclose(grid[0, 0], independent(0.1, 1.0), rtol=1e-10)
    assert jnp.allclose(grid[1, 3], independent(0.15, 4.0), rtol=1e-10)

    # Mesh-sharded sweep (8 scenarios over 8 virtual devices) == vmap.
    grid_mesh = jax.jit(
        lambda d: opt.compute_robustness_map(
            d, amplitudes, rates, mesh=make_mesh()
        )
    )(design)
    assert jnp.allclose(grid_mesh, grid, rtol=1e-10)


def test_runner_rearms_guard_and_runs_device_loop():
    """Trustworthy optimization by default (VERDICT r4 next #2): the MMA
    driver rebuilds an unguarded forward problem with guard="auto"
    (proximity-gated — bit-exact no-op on healthy trajectories) and runs
    the iteration loop on-device (run_mma_fused)."""

    # Grid backend: the general-path dense guarded objective compiles a
    # much larger XLA:CPU program whose mid-suite compile crashes this
    # XLA build (same class as test_robustness_map's isolation note).
    problem = _tiny_problem(n_timepoints=8, n_substeps=8,
                            method="verlet_ckpt")
    problem.setup()
    opt = OptimizationProblem(problem, target_size=(2, 2))
    design = problem.geometry.get_design_from_rotated_square(0.25)
    assert opt.forward_problem.guard is None
    final = opt.run_optimization_mma(
        design,
        n_iterations=3,
        lower_bound=-0.3,
        upper_bound=0.3,
        verbose=False,
        chunk=2,  # exercises the ragged last device chunk
    )
    assert opt.forward_problem.guard == "auto"
    assert len(opt.objective_values) == 3
    assert all(jnp.isfinite(v) for v in opt.objective_values)
    assert jax.tree.structure(final) == jax.tree.structure(design)

    # Expert opt-out: guard=None keeps the problem exactly as configured.
    problem2 = _tiny_problem(n_timepoints=8, n_substeps=8,
                             method="verlet_ckpt")
    opt2 = OptimizationProblem(problem2, target_size=(2, 2))
    opt2.run_optimization_mma(
        design, n_iterations=1, lower_bound=-0.3, upper_bound=0.3,
        verbose=False, guard=None,
    )
    assert opt2.forward_problem.guard is None


def test_multistart_mma_guarded_finalist_reranking():
    """run_multistart_mma screens candidates unguarded (vmap-friendly)
    and re-ranks the top-k through the guarded sibling objective
    (parallel.reevaluate_finalists) — the honest value wins and the
    evidence lands on result.finalists."""

    problem = _tiny_problem(n_timepoints=8, n_substeps=8, method="verlet_ckpt",
                            grid_energy=True)
    problem.setup()
    opt = OptimizationProblem(problem, target_size=(2, 2))
    geo_design = problem.geometry.get_design_from_rotated_square(0.25)
    guesses = [
        jax.tree.map(lambda x, s=s: x * s, geo_design)
        for s in (0.8, 1.0, 1.2)
    ]
    result = opt.run_multistart_mma(
        guesses,
        n_iterations=2,
        lower_bound=-0.3,
        upper_bound=0.3,
        n_finalists=2,
    )
    assert result.finalists is not None
    assert result.finalists.values.shape == (2,)
    assert int(result.best_index) in [int(i) for i in result.finalists.indices]
    assert len(opt.objective_values) == 1
    assert jnp.isfinite(opt.objective_values[-1])
    # The recorded best value is the guarded truth of the winner.
    assert opt.objective_values[-1] == float(jnp.max(result.finalists.values))
