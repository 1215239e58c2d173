"""Static tuning: design a lattice whose pulse response is RECONFIGURED by
static pre-compression — focusing at one compression level, protected at
another — optimizing a weighted multi-scenario objective in parallel.

Mirrors the reference's focusing-vs-protection static-tuning notebook
(reference problems/quads_kinetic_energy_static_tuning.py:188-196 chained
ramp+pulse drive, 431-484 pmap'd scenario objective). Scenarios shard over
the device mesh when more than one device is attached (our shard_map
replacement for the reference's pmap). Run:

    python examples/quads_static_tuning_optimization.py [n_iterations] [out_dir]
"""

import sys
from pathlib import Path

# Self-bootstrap (no PYTHONPATH: it breaks the session's TPU plugin).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from difflexmm_tpu.models.quads_static_tuning import (
    ForwardInput,
    ForwardProblem,
    OptimizationProblem,
)
from difflexmm_tpu.utils import save_data
from difflexmm_tpu.utils.observability import MetricsLogger


def main(n_iterations: int = 8, out_dir: str = "out/static_tuning") -> None:
    out = Path(out_dir)

    problem = ForwardProblem(
        n1_blocks=12, n2_blocks=10, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.1,
        n_excited_blocks=3,
        simulation_time_dynamic=12.0, n_timepoints=80,
        n_timepoints_static=12, n_substeps=12,
        method="verlet",
    )
    problem.setup()
    design0 = problem.geometry.get_design_from_rotated_square(0.25)

    # Scenario 1: light pre-compression -> focus onto the target (+1).
    # Scenario 2: heavier pre-compression -> protect the same patch (-1).
    optimization = OptimizationProblem(
        problem,
        ForwardInput(
            *design0,
            amplitude=(0.15, 0.15),
            loading_rate=(0.5, 0.5),
            compressive_strain=(0.02, 0.08),
            compressive_strain_rate=(0.05, 0.05),
        ),
        target_sizes=((2, 2), (2, 2)),
        target_shifts=((2, 0), (2, 0)),
        weights=(1.0, -1.0),
    )
    # With >1 device, scenarios shard over a mesh and the weighted gradient
    # reduces with a psum over ICI (tests/test_static_tuning_mesh.py).
    optimization.setup_objective()

    before = optimization.objective_fn_individual(design0)
    best = optimization.run_optimization_mma(
        design0,
        n_iterations=n_iterations,
        lower_bound=-0.3, upper_bound=0.3,
        min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
        move_limit=0.08,
        metrics_logger=MetricsLogger(out / "metrics.jsonl"),
    )
    after = optimization.objective_fn_individual(best)
    print("per-scenario target KE (focused@2%, protected@8%):")
    print(f"  initial:  {float(before[0]):.4e}, {float(before[1]):.4e}")
    print(f"  optimized:{float(after[0]):.4e}, {float(after[1]):.4e}")

    # Full trajectory including the static ramp for the focused scenario.
    solution = problem.solve_full(best, 0.15, 0.5, 0.02, 0.05)
    save_data(out / "optimization.pkl", optimization.to_dict())
    save_data(out / "best_solution.pkl", solution)
    try:
        from difflexmm_tpu.plotting import generate_animation

        generate_animation(solution, out / "static_tuning.mp4", field="kinetic")
        print(f"animation: {out / 'static_tuning.mp4'}")
    except Exception as error:
        print(f"animation skipped ({error})")


if __name__ == "__main__":
    argv = sys.argv[1:3]
    main(
        n_iterations=int(argv[0]) if argv else 8,
        out_dir=argv[1] if len(argv) > 1 else "out/static_tuning",
    )
