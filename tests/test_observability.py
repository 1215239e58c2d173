"""Metrics logging, tracing, and checkpoint/resume tests."""

import pytest
import jax.numpy as jnp

from difflexmm_tpu.utils.observability import (
    MetricsLogger,
    OptimizationCheckpoint,
    trace,
)


def test_metrics_logger_roundtrip(tmp_path):
    logger = MetricsLogger(tmp_path / "metrics.jsonl")
    logger.log(1, objective=1.5, grad_norm=0.1)
    logger.log(2, objective=2.5, note="hello")
    records = logger.read()
    assert len(records) == 2
    assert records[0]["objective"] == 1.5
    assert records[1]["note"] == "hello"
    assert all("seconds_since_last" in r for r in records)


def test_trace_context(capsys):
    with trace("phase"):
        _ = jnp.sum(jnp.arange(10))
    out = capsys.readouterr().out
    assert "[trace] phase:" in out


def test_checkpoint_save_restore(tmp_path):
    ckpt = OptimizationCheckpoint(tmp_path / "run.ckpt", every=2)
    design = {"x": jnp.arange(3.0)}
    assert not ckpt.save(1, design)          # not due
    assert ckpt.save(2, design, objective_values=[1.0, 2.0])
    snapshot = ckpt.restore()
    assert snapshot["iteration"] == 2
    assert jnp.allclose(snapshot["design"]["x"], jnp.arange(3.0))
    assert snapshot["objective_values"] == [1.0, 2.0]


@pytest.mark.slow
def test_checkpoint_resume_in_mma_runner(tmp_path):
    """A crashed MMA run resumes from its snapshot with histories intact."""

    import jax
    from difflexmm_tpu.models.quads_focusing import ForwardProblem, OptimizationProblem

    def make_opt():
        problem = ForwardProblem(
            n1_blocks=6, n2_blocks=6, spacing=1.0, bond_length=0.1,
            k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
            amplitude=0.15, loading_rate=2.0, input_delay=0.0,
            n_excited_blocks=2, loaded_side="left",
            simulation_time=2.0, n_timepoints=6, n_substeps=16,
        )
        return OptimizationProblem(problem, target_size=(2, 2))

    ckpt = OptimizationCheckpoint(tmp_path / "opt.ckpt", every=1)
    logger = MetricsLogger(tmp_path / "opt.jsonl")

    opt1 = make_opt()
    opt1.setup_objective()
    design0 = opt1.forward_problem.geometry.get_design_from_rotated_square(0.25)
    opt1.run_optimization_mma(
        design0, n_iterations=2, lower_bound=-0.3, upper_bound=0.3,
        verbose=False, metrics_logger=logger, checkpoint=ckpt,
    )
    assert len(opt1.objective_values) == 2
    assert len(logger.read()) == 2

    # "Restart" in a fresh object: histories restored and continued
    opt2 = make_opt()
    opt2.setup_objective()
    opt2.run_optimization_mma(
        design0, n_iterations=1, lower_bound=-0.3, upper_bound=0.3,
        verbose=False, checkpoint=ckpt, resume=True,
    )
    assert len(opt2.objective_values) == 3  # 2 restored + 1 new


@pytest.mark.slow
def test_max_seconds_expiry_checkpoint_and_aligned_resume(tmp_path):
    """Wall-clock expiry forces a snapshot; resuming restores ALL histories
    (objective, design, per-group constraint violations) index-aligned."""

    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    def make_opt():
        problem = ForwardProblem(
            n1_blocks=5, n2_blocks=5, spacing=1.0, bond_length=0.1,
            k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0,
            damping=0.02, amplitude=0.15, loading_rate=2.0, input_delay=0.0,
            n_excited_blocks=2, loaded_side="left",
            n_blocks_clamped_corner=1,  # clamps clear of driven rows on 5x5
            simulation_time=2.0, n_timepoints=5, n_substeps=12,
        )
        return OptimizationProblem(problem, target_size=(2, 2))

    # Snapshot cadence chosen to NOT be due at the expiry iteration, so
    # only the forced expiry save can explain a fresh snapshot.
    ckpt = OptimizationCheckpoint(tmp_path / "opt.ckpt", every=1000)

    opt1 = make_opt()
    opt1.setup_objective()
    design0 = opt1.forward_problem.geometry.get_design_from_rotated_square(0.25)
    opt1.run_optimization_mma(
        design0, n_iterations=10_000, lower_bound=-0.3, upper_bound=0.3,
        min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
        verbose=False, checkpoint=ckpt,
        # Iteration 0 includes the jit compile (tens of seconds on CPU),
        # so this deterministically expires right after it: exactly one
        # iteration runs.
        max_seconds=0.5,
    )
    n_done = len(opt1.objective_values)
    assert 0 < n_done < 10_000
    assert ckpt.exists()  # forced snapshot on expiry

    opt2 = make_opt()
    opt2.setup_objective()
    opt2.run_optimization_mma(
        design0, n_iterations=1, lower_bound=-0.3, upper_bound=0.3,
        min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
        verbose=False, checkpoint=ckpt, resume=True,
    )
    assert len(opt2.objective_values) == n_done + 1
    # Constraint-violation histories stay index-aligned after resume
    # (ADVICE r2: they used to restart empty).
    for name, values in opt2.constraints_violation.items():
        assert len(values) == n_done + 1, name


def test_load_data_reads_reference_written_archives(tmp_path):
    """A pickle written by the REFERENCE package (classes under the
    ``difflexmm.*`` module tree, reference difflexmm/utils.py:9-25) loads
    through this package's load_data, remapped onto our same-named
    containers. Simulated with a synthetic ``difflexmm.utils`` module so
    the test does not depend on the reference being importable."""

    import pickle
    import sys
    import types as pytypes
    from typing import Any, NamedTuple

    import numpy as np

    class SolutionData(NamedTuple):
        block_centroids: Any
        centroid_node_vectors: Any
        bond_connectivity: Any
        timepoints: Any
        fields: Any

    fake_pkg = pytypes.ModuleType("difflexmm")
    fake_utils = pytypes.ModuleType("difflexmm.utils")
    SolutionData.__module__ = "difflexmm.utils"
    SolutionData.__qualname__ = "SolutionData"
    fake_utils.SolutionData = SolutionData
    fake_pkg.utils = fake_utils
    sys.modules["difflexmm"] = fake_pkg
    sys.modules["difflexmm.utils"] = fake_utils
    try:
        ref_solution = SolutionData(
            block_centroids=np.zeros((4, 2)),
            centroid_node_vectors=np.zeros((4, 4, 2)),
            bond_connectivity=np.zeros((3, 2), dtype=np.int32),
            timepoints=np.linspace(0.0, 1.0, 5),
            fields=np.zeros((5, 2, 4, 3)),
        )
        pkl = tmp_path / "reference_solution.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(ref_solution, f)
    finally:
        del sys.modules["difflexmm"]
        del sys.modules["difflexmm.utils"]

    from difflexmm_tpu.utils.types import SolutionData as OurSolutionData
    from difflexmm_tpu.utils.types import load_data

    loaded = load_data(pkl)
    assert isinstance(loaded, OurSolutionData)
    assert isinstance(loaded.fields, jnp.ndarray)
    assert loaded.fields.shape == (5, 2, 4, 3)
    assert loaded.timepoints.shape == (5,)
