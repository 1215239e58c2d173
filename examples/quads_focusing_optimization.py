"""Canonical inverse design: optimize a quad lattice to focus a pulse's
energy onto a target patch (the paper's headline workflow).

Mirrors the reference's quads_focusing notebook flow: build the problem,
run constrained MMA from the rotated-square initial guess, save artifacts,
render the optimized response. Run:

    python examples/quads_focusing_optimization.py [n_iterations] [out_dir]
"""

import sys
from pathlib import Path

# Self-bootstrap so `python examples/<name>.py` works from anywhere.
# (Do NOT use PYTHONPATH: the session's TPU-plugin registration breaks
# when PYTHONPATH is set.)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from difflexmm_tpu.models.quads_focusing import ForwardProblem, OptimizationProblem
from difflexmm_tpu.utils import save_data
from difflexmm_tpu.utils.observability import MetricsLogger, OptimizationCheckpoint


def main(n_iterations: int = 10, out_dir: str = "out") -> None:
    out = Path(out_dir)

    problem = ForwardProblem(
        n1_blocks=24, n2_blocks=16, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.2, loading_rate=0.5, input_delay=0.0,
        n_excited_blocks=4, loaded_side="left",
        simulation_time=20.0, n_timepoints=200, n_substeps=10,
        method="verlet_pallas" if jax.default_backend() == "tpu" else "verlet",
    )
    optimization = OptimizationProblem(problem, target_size=(3, 3))
    optimization.setup_objective()

    design0 = problem.geometry.get_design_from_rotated_square(0.25)
    best = optimization.run_optimization_mma(
        design0,
        n_iterations=n_iterations,
        lower_bound=-0.3, upper_bound=0.3,
        min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
        # Conservative steps: the fixed-step solver's stability region
        # depends on the design (thin blocks -> tiny inertia -> stiff).
        move_limit=0.08,
        metrics_logger=MetricsLogger(out / "metrics.jsonl"),
        checkpoint=OptimizationCheckpoint(out / "optimization.ckpt", every=5),
    )

    save_data(out / "optimization.pkl", optimization.to_dict())
    save_data(out / "best_solution.pkl", problem.solution_data)
    print(f"objective: {optimization.objective_values[0]:.4e} -> "
          f"{optimization.objective_values[-1]:.4e} "
          f"over {len(optimization.objective_values)} iterations")
    print(f"artifacts in {out}/ (render with: python -m difflexmm_tpu.plotting "
          f"{out / 'best_solution.pkl'} --field kinetic)")


if __name__ == "__main__":
    argv = sys.argv[1:3]
    main(
        n_iterations=int(argv[0]) if argv else 10,
        out_dir=argv[1] if len(argv) > 1 else "out",
    )
