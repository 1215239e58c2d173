"""Spin focusing: design a quad lattice so a pulse sets a target patch
spinning (maximal time-integrated angular momentum about its center).

Mirrors the reference's quads_spin notebook flow (reference
problems/quads_spin.py:380-433): build the forward problem, anchor the spin
center on the initial design's target patch, run constrained MMA, save
artifacts, render the optimized response. Run:

    python examples/quads_spin_optimization.py [n_iterations] [out_dir]
"""

import sys
from pathlib import Path

# Self-bootstrap so `python examples/<name>.py` works from anywhere.
# (Do NOT use PYTHONPATH: the session's TPU-plugin registration breaks
# when PYTHONPATH is set.)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from difflexmm_tpu.models.quads_focusing import ForwardProblem
from difflexmm_tpu.models.quads_spin import ForwardInput, OptimizationProblem
from difflexmm_tpu.utils import save_data
from difflexmm_tpu.utils.observability import MetricsLogger


def main(n_iterations: int = 10, out_dir: str = "out/spin") -> None:
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
    design0 = problem.geometry.get_design_from_rotated_square(0.25)

    optimization = OptimizationProblem(
        problem,
        ForwardInput(*design0),
        target_size=(2, 2),
        target_shift=(2, 0),
    )
    optimization.setup_objective()

    best = optimization.run_optimization_mma(
        design0,
        n_iterations=n_iterations,
        lower_bound=-0.3, upper_bound=0.3,
        min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
        move_limit=0.08,
        metrics_logger=MetricsLogger(out / "metrics.jsonl"),
    )

    solution = problem.solve(best)
    save_data(out / "optimization.pkl", optimization.to_dict())
    save_data(out / "best_solution.pkl", solution)
    print(f"angular momentum: {optimization.objective_values[0]:.4e} -> "
          f"{optimization.objective_values[-1]:.4e}")
    try:
        from difflexmm_tpu.plotting import generate_animation

        generate_animation(solution, out / "spin.mp4", field="theta")
        print(f"animation: {out / 'spin.mp4'}")
    except Exception as error:  # matplotlib/ffmpeg optional
        print(f"animation skipped ({error})")


if __name__ == "__main__":
    argv = sys.argv[1:3]
    main(
        n_iterations=int(argv[0]) if argv else 10,
        out_dir=argv[1] if len(argv) > 1 else "out/spin",
    )
