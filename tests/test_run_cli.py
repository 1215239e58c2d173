"""CLI runner (difflexmm_tpu/run.py): JSON config -> artifacts."""

import json

import jax.numpy as jnp
import pytest

from difflexmm_tpu import run as cli
from difflexmm_tpu.utils import load_data


def _tiny_focusing_config(**optimize_overrides):
    optimize = {
        "method": "mma", "n_iterations": 2,
        "lower_bound": -0.3, "upper_bound": 0.3,
        "min_void_angle": 0.0, "min_block_angle": 0.0,
        "min_edge_length": 0.05, "move_limit": 0.08,
    }
    optimize.update(optimize_overrides)
    return {
        "problem": "quads_focusing",
        "forward": {
            "n1_blocks": 5, "n2_blocks": 5, "spacing": 1.0, "bond_length": 0.1,
            "k_stretch": 1.0, "k_shear": 0.02, "k_rot": 1e-3, "density": 1.0,
            "damping": 0.02, "amplitude": 0.15, "loading_rate": 2.0,
            "input_delay": 0.0, "n_excited_blocks": 2, "loaded_side": "left",
            "n_blocks_clamped_corner": 1,
            "simulation_time": 2.0, "n_timepoints": 5, "n_substeps": 10,
            "method": "verlet",
        },
        "optimization": {"target_size": [2, 2]},
        "initial_design": {"rotated_square_angle": 0.25},
        "optimize": optimize,
    }


def test_cli_mma_run_writes_artifacts(tmp_path):
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(_tiny_focusing_config()))
    out = tmp_path / "out"

    cli.main([str(config_path), "--out", str(out), "--quiet"])

    assert (out / "optimization.pkl").exists()
    assert (out / "best_solution.pkl").exists()
    assert (out / "metrics.jsonl").exists()
    saved = load_data(out / "optimization.pkl")
    assert len(saved["objective_values"]) == 2

    # Round-trip: the saved dict reloads into a working problem.
    from difflexmm_tpu.models.quads_focusing import OptimizationProblem

    restored = OptimizationProblem.from_dict(saved)
    restored.setup_objective()
    value = restored.objective_fn(restored.design_values[-1])
    assert jnp.isfinite(value)


def test_cli_forward_only(tmp_path):
    config = {
        "problem": "reference_design",
        "forward": {
            "n1_cells": 4, "n2_cells": 3, "spacing": 1.0, "bond_length": 0.1,
            "initial_angle": 0.4,
            "k_stretch": 1.0, "k_shear": 0.02, "k_rot": 1e-3, "density": 1.0,
            "damping": 0.02, "amplitude": 0.15, "loading_rate": 2.0,
            "input_delay": 0.0, "n_excited_blocks": 2, "loaded_side": "left",
            "n_blocks_clamped_corner": 1,
            "simulation_time": 2.0, "n_timepoints": 5, "n_substeps": 10,
        },
        "optimize": {"method": "forward"},
    }
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(config))
    out = tmp_path / "out"

    cli.main([str(config_path), "--out", str(out)])
    solution = load_data(out / "solution.pkl")
    assert float(jnp.abs(solution.fields).max()) > 0.0


def test_cli_rejects_structured_families(tmp_path):
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps({"problem": "quads_static_tuning"}))
    with pytest.raises(SystemExit, match="not CLI-drivable"):
        cli.main([str(config_path), "--out", str(tmp_path / "out")])


def test_cli_zero_iteration_wall_clock_expiry(tmp_path):
    """--max-seconds 0 expires before iteration 0: the runner stops
    gracefully and the CLI must not crash printing an empty history."""

    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(_tiny_focusing_config()))
    out = tmp_path / "out"

    cli.main([str(config_path), "--out", str(out), "--quiet",
              "--max-seconds", "0"])
    assert (out / "optimization.pkl").exists()


def test_cli_optax_rejects_unsupported_options(tmp_path):
    """optax has no constraint/wall-clock machinery; silently dropping
    those options would run an unconstrained unbounded job — reject."""

    config = _tiny_focusing_config(method="optax")
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(config))
    with pytest.raises(SystemExit, match="does not support"):
        cli.main([str(config_path), "--out", str(tmp_path / "out")])
