"""Multi-input focusing: one design that focuses pulses arriving from
DIFFERENT sides onto the same target patch.

Mirrors the reference's quads_focusing_multi_input workflow (reference
problems/quads_focusing_multi_input.py:21-80): several ForwardProblems —
one per input side — share a single design, and the objective is the
weighted sum of the target kinetic energies across inputs. Run:

    python examples/quads_focusing_multi_input_optimization.py [n_iterations] [out_dir]
"""

import sys
from pathlib import Path

# Self-bootstrap (no PYTHONPATH: it breaks the session's TPU plugin).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import dataclasses

import jax

from difflexmm_tpu.models.quads_focusing import ForwardProblem
from difflexmm_tpu.models.quads_focusing_multi_input import OptimizationProblem
from difflexmm_tpu.utils import save_data
from difflexmm_tpu.utils.observability import MetricsLogger


def main(n_iterations: int = 10, out_dir: str = "out/multi_input") -> None:
    out = Path(out_dir)

    base_problem = ForwardProblem(
        n1_blocks=16, n2_blocks=12, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.2, loading_rate=0.5, input_delay=0.0,
        n_excited_blocks=4, loaded_side="left",
        simulation_time=16.0, n_timepoints=120, n_substeps=10,
        method="verlet_pallas" if jax.default_backend() == "tpu" else "verlet",
    )
    problems = [
        dataclasses.replace(base_problem, loaded_side=side)
        for side in ("left", "bottom")
    ]

    # Center-right patch, equally weighted across the two input sides.
    optimization = OptimizationProblem(
        problems,
        target_size=(2, 2),
        target_shift=(3, 0),
        weights=(0.5, 0.5),
    )
    optimization.setup_objective()
    design0 = problems[0].geometry.get_design_from_rotated_square(0.25)

    best = optimization.run_optimization_mma(
        design0,
        n_iterations=n_iterations,
        lower_bound=-0.3, upper_bound=0.3,
        min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
        move_limit=0.08,
        metrics_logger=MetricsLogger(out / "metrics.jsonl"),
    )

    per_input = optimization.objective_fn_individual(best)
    save_data(out / "optimization.pkl", optimization.to_dict())
    print(f"weighted objective: {optimization.objective_values[0]:.4e} -> "
          f"{optimization.objective_values[-1]:.4e}")
    for problem, value in zip(problems, per_input):
        print(f"  target KE from {problem.loaded_side:>6}: {float(value):.4e}")
        solution = problem.solve(best)
        save_data(out / f"best_solution_{problem.loaded_side}.pkl", solution)
    try:
        from difflexmm_tpu.plotting import generate_animation

        for problem in problems:
            from difflexmm_tpu.utils import load_data

            solution = load_data(
                out / f"best_solution_{problem.loaded_side}.pkl"
            )
            path = out / f"multi_input_{problem.loaded_side}.mp4"
            generate_animation(solution, path, field="kinetic")
            print(f"animation: {path}")
    except Exception as error:
        print(f"animation skipped ({error})")


if __name__ == "__main__":
    argv = sys.argv[1:3]
    main(
        n_iterations=int(argv[0]) if argv else 10,
        out_dir=argv[1] if len(argv) > 1 else "out/multi_input",
    )
