"""Restricted-space focusing: optimize only a design patch around the
target; the rest of the lattice keeps the initial rotated-square design.

Mirrors the reference's restricted-space notebook flow (reference
problems/quads_focusing_restricted_space.py:439-510: boolean masks over the
shift grids, reduced<->full design maps, objective on reduced variables).
Run:

    python examples/quads_focusing_restricted_space_optimization.py [n_iterations] [out_dir]
"""

import sys
from pathlib import Path

# Self-bootstrap (no PYTHONPATH: it breaks the session's TPU plugin).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from difflexmm_tpu.models.quads_focusing import ForwardProblem
from difflexmm_tpu.models.quads_focusing_restricted_space import (
    OptimizationProblem,
)
from difflexmm_tpu.utils import save_data
from difflexmm_tpu.utils.observability import MetricsLogger


def main(n_iterations: int = 10, out_dir: str = "out/restricted") -> None:
    out = Path(out_dir)

    problem = ForwardProblem(
        n1_blocks=16, n2_blocks=12, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.2, loading_rate=0.5, input_delay=0.0,
        n_excited_blocks=4, loaded_side="left",
        simulation_time=16.0, n_timepoints=120, n_substeps=10,
        method="verlet_pallas" if jax.default_backend() == "tpu" else "verlet",
    )
    problem.setup()
    guess_all = problem.geometry.get_design_from_rotated_square(0.25)

    optimization = OptimizationProblem(
        problem,
        target_size=(2, 2),
        target_shift=(3, 0),
        initial_guess_all=guess_all,
        design_patch_size=6,
    )
    optimization.setup_objective()
    reduced0 = optimization.all_to_reduced_shifts(guess_all)
    n_reduced = sum(x.size for x in jax.tree.leaves(reduced0))
    n_full = sum(x.size for x in jax.tree.leaves(guess_all))
    print(f"design space: {n_reduced} reduced vars of {n_full} total")

    optimization.run_optimization_mma(
        reduced0,
        n_iterations=n_iterations,
        lower_bound=-0.3, upper_bound=0.3,
        min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
        move_limit=0.08,
        metrics_logger=MetricsLogger(out / "metrics.jsonl"),
    )
    solution = optimization.compute_best_forward()

    save_data(out / "optimization.pkl", optimization.to_dict())
    save_data(out / "best_solution.pkl", solution)
    print(f"objective: {optimization.objective_values[0]:.4e} -> "
          f"{optimization.objective_values[-1]:.4e}")
    try:
        from difflexmm_tpu.plotting import generate_animation

        generate_animation(solution, out / "restricted.mp4", field="kinetic")
        print(f"animation: {out / 'restricted.mp4'}")
    except Exception as error:
        print(f"animation skipped ({error})")


if __name__ == "__main__":
    argv = sys.argv[1:3]
    main(
        n_iterations=int(argv[0]) if argv else 10,
        out_dir=argv[1] if len(argv) > 1 else "out/restricted",
    )
