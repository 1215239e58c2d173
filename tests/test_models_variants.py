"""Tests for the remaining model families (tiny configurations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difflexmm_tpu.models.quads_focusing import ForwardProblem


def _tiny_forward(**overrides):
    params = dict(
        n1_blocks=6,
        n2_blocks=6,
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
        n_timepoints=10,
        n_substeps=24,
        method="verlet",
    )
    params.update(overrides)
    return ForwardProblem(**params)


@pytest.mark.slow
def test_energy_splitting_objective():
    from difflexmm_tpu.models.quads_energy_splitting import OptimizationProblem

    problem = _tiny_forward()
    opt = OptimizationProblem(
        problem,
        target_sizes=((2, 2), (1, 1)),
        target_shifts=((0, 1), (0, -1)),
        weights=(1.0, -0.5),
    )
    opt.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(0.25)
    individual = opt.objective_fn_individual(design)
    assert individual.shape == (2,)
    total = opt.objective_fn(design)
    assert jnp.allclose(total, jnp.array([1.0, -0.5]) @ individual)
    g = jax.grad(opt.objective_fn)(design)
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))


def test_multi_input_objective():
    from difflexmm_tpu.models.quads_focusing_multi_input import OptimizationProblem

    problems = [_tiny_forward(loaded_side="left"), _tiny_forward(loaded_side="bottom")]
    opt = OptimizationProblem(
        problems, target_size=(2, 2), target_shift=(0, 0), weights=(1.0, 1.0)
    )
    opt.setup_objective()
    design = problems[0].geometry.get_design_from_rotated_square(0.25)
    individual = opt.objective_fn_individual(design)
    assert individual.shape == (2,)
    assert jnp.all(individual > 0)
    assert jnp.allclose(opt.objective_fn(design), jnp.sum(individual))


def test_spin_objective():
    from difflexmm_tpu.models.quads_spin import ForwardInput, OptimizationProblem

    problem = _tiny_forward()
    problem.setup()
    h, v = problem.geometry.get_design_from_rotated_square(0.25)
    opt = OptimizationProblem(
        problem,
        ForwardInput(h, v),
        target_size=(2, 2),
        target_shift=(0, 0),
    )
    opt.setup_objective()
    value = opt.objective_fn((h, v))
    assert jnp.isfinite(value)
    g = jax.grad(opt.objective_fn)((h, v))
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))


@pytest.mark.slow
def test_restricted_space_reduced_design():
    from difflexmm_tpu.models.quads_focusing_restricted_space import (
        OptimizationProblem,
    )

    problem = _tiny_forward()
    problem.setup()
    guess = problem.geometry.get_design_from_rotated_square(0.25)
    opt = OptimizationProblem(
        problem,
        target_size=(2, 2),
        target_shift=(0, 0),
        initial_guess_all=guess,
        design_patch_size=2,
    )
    opt.setup_objective()

    reduced = opt.all_to_reduced_shifts(guess)
    # Patch is much smaller than the full design
    assert reduced[0].shape[0] < guess[0].reshape(-1, 2).shape[0]
    full = opt.reduced_to_all_shifts(reduced)
    assert jnp.allclose(full[0], guess[0]) and jnp.allclose(full[1], guess[1])

    value = opt.objective_fn(reduced)
    assert value > 0
    g = jax.grad(opt.objective_fn)(reduced)
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))


def test_reference_design_forward():
    from difflexmm_tpu.models.reference_design import ForwardProblem as RSForward

    problem = RSForward(
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
        n_timepoints=8,
        n_substeps=16,
        method="verlet",
    )
    problem.setup()
    solution = problem.solve()
    assert solution.fields.shape == (8, 2, problem.geometry.n_blocks, 3)
    assert jnp.allclose(solution.fields[:, :, problem.clamped_blocks_ids, :], 0.0)
    assert float(jnp.max(jnp.abs(solution.fields))) > 1e-3


@pytest.mark.slow
def test_kagome_focusing_forward_and_grad():
    from difflexmm_tpu.models.kagome_focusing import (
        ForwardProblem as KagomeForward,
        OptimizationProblem as KagomeOpt,
    )

    problem = KagomeForward(
        n1_cells=4,
        n2_cells=4,
        cell_size=1.0,
        cell_angle=jnp.pi / 3,
        bond_length=0.05,
        k_stretch=1.0,
        k_shear=0.02,
        k_rot=1e-3,
        density=1.0,
        damping=0.02,
        amplitude=0.1,
        loading_rate=2.0,
        input_delay=0.0,
        n_excited_blocks=2,
        simulation_time=2.0,
        n_timepoints=8,
        n_substeps=24,
        method="verlet",
        n_blocks_clamped_corner=1,
    )
    opt = KagomeOpt(problem, target_size=(1, 1))
    opt.setup_objective()
    design = problem.geometry.zero_design()
    value = opt.objective_fn(design)
    assert value > 0
    g = jax.grad(opt.objective_fn)(design)
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))
    # driven blocks actually move
    sol = problem.solve(design)
    assert float(jnp.max(jnp.abs(sol.fields[:, 0, problem.driven_blocks_ids, 0]))) > 0.05


@pytest.mark.slow
def test_static_tuning_two_phase():
    from difflexmm_tpu.models.quads_static_tuning import (
        ForwardInput,
        ForwardProblem as STForward,
        OptimizationProblem as STOpt,
    )

    problem = STForward(
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
        simulation_time_dynamic=2.0,
        n_timepoints=8,
        n_timepoints_static=9,
        n_substeps=24,
        method="verlet",
    )
    problem.setup()
    quad = problem.geometry
    design = quad.get_design_from_rotated_square(0.25)

    sol = problem.solve_full(design, 0.1, 2.0, 0.05, 0.05)
    # Compression: top row moved down by ~strain*gauge/2 at the end of the ramp
    gauge = (problem.n2_blocks - 1) * problem.spacing
    top = np.arange(quad.n_blocks - quad.n1_blocks, quad.n_blocks)
    assert jnp.allclose(
        sol.fields[-1, 0, top, 1], -0.5 * 0.05 * gauge, atol=1e-8
    )

    opt = STOpt(
        problem,
        ForwardInput(*design, amplitude=(0.1, 0.2), loading_rate=(2.0, 2.0),
                     compressive_strain=(0.02, 0.06),
                     compressive_strain_rate=(0.05, 0.05)),
        target_sizes=((1, 1), (1, 1)),
        target_shifts=((0, 0), (0, 0)),
        weights=(1.0, -1.0),
    )
    opt.setup_objective()
    individual = opt.objective_fn_individual(design)
    assert individual.shape == (2,)
    assert jnp.allclose(opt.objective_fn(design), individual[0] - individual[1])
    g = jax.grad(opt.objective_fn)(design)
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))


@pytest.mark.slow
def test_hinge_characterization_fit():
    from difflexmm_tpu.models.hinge_characterization import (
        ForwardProblem as HingeForward,
        OptimizationProblem as HingeOpt,
    )

    def make(loading_type):
        return HingeForward(
            n1_cells=2,
            n2_cells=2,
            spacing=1.0,
            bond_length=0.1,
            initial_angle=0.2,
            k_stretch=1.0,
            k_shear=0.02,
            k_rot=1e-3,
            density=1.0,
            damping=1.0,
            loading_type=loading_type,
            amplitude=0.05,
            loading_rate=0.01,
            n_timepoints=10,
            n_substeps=64,
            method="verlet",
        )

    # Generate synthetic "experimental" data from known stiffnesses
    true_k = (1.0, 0.02, 1e-3)
    problems = [make("tension"), make("shear")]
    for p in problems:
        p.setup()
    targets = {}
    for p in problems:
        u, f = p.force_displacement(*p.solve(true_k))
        targets[p.loading_type] = jnp.stack([u, f, jnp.zeros_like(f)])

    opt = HingeOpt(problems, targets)
    opt.setup_objective()
    # Perfect fit at the true parameters
    assert opt.objective_fn(true_k) < 1e-20
    # Worse away from them
    assert opt.objective_fn((1.5, 0.02, 1e-3)) > 1e-8

    # A few GD steps reduce the error from a perturbed start
    design = opt.run_optimization_GD(
        (1.3, 0.02, 1e-3), n_iterations=5, step_size=0.5,
        lower_bound=1e-6,
    )
    assert opt.objective_values[-1] < opt.objective_values[0]
    assert opt.fitted_responses is not None


def test_overlapping_driven_and_clamped_pairs_raise():
    """A lattice too small for its corner clamps must fail at setup, not
    silently zero the drive (the constraint scatter is last-write-wins)."""

    problem = _tiny_forward(n2_blocks=4, n_excited_blocks=2)  # clamps hit rows 1-2
    with pytest.raises(ValueError, match="last-write-wins"):
        problem.setup()

    # Disjoint clamps on the same lattice set up fine and actually drive.
    ok = _tiny_forward(n2_blocks=4, n_excited_blocks=2, n_blocks_clamped_corner=1)
    ok.setup()
    design = ok.geometry.get_design_from_rotated_square(0.2)
    fields = ok.solve(design).fields
    assert float(jnp.abs(fields).max()) > 0.0


def test_simulation_time_effect_f64_cross_eval_subprocess(tmp_path):
    """The horizon study's f64 verification pass: the subprocess mode must
    pin CPU+x64 BEFORE package imports (a late platform switch leaves the
    Pallas method selected, whose f64 Mosaic lowering recurses) and print
    one JSON line mapping horizon -> objective."""

    import json
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    script = repo / "examples" / "simulation_time_effect.py"

    import examples.simulation_time_effect as ste
    from difflexmm_tpu.utils import save_data

    longest = ste.build(6, 4, ste.HORIZONS[-1], method="verlet")
    design = longest.forward_problem.geometry.get_design_from_rotated_square(0.2)
    pkl = tmp_path / "designs.pkl"
    save_data(pkl, {h: design for h in ste.HORIZONS})

    result = subprocess.run(
        [_sys.executable, str(script), "--cross-eval-f64", str(pkl), "6x4", "2,8"],
        capture_output=True, text=True, timeout=900,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    values = json.loads(result.stdout.strip().splitlines()[-1])
    assert set(values) == {"2", "8"}
    for v in values.values():
        assert np.isfinite(v)
    # f64 eval of the same design/config matches the in-process f32/f64
    # objective to solver accuracy.
    ref = float(longest.objective_fn(design))
    np.testing.assert_allclose(values["2"], ref, rtol=1e-6)
