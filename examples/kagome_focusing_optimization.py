"""Kagome inverse design: optimize per-hinge shifts to focus a pulse's
energy onto a target patch, on the fused kagome Pallas kernel.

Mirrors the reference's kagome_focusing notebook flow (behavioral parity:
reference problems/kagome_focusing.py) with the TPU-native solver stack:
gather-free kagome grid energy, velocity-Verlet, and — on TPU — the fused
Pallas trajectory kernel (ops/pallas/verlet_kagome.py). The design space is
the three independent hinge-shift grids of the free kagome lattice. Run:

    python examples/kagome_focusing_optimization.py [n_iterations] [out_dir]
"""

import sys
from pathlib import Path

# Self-bootstrap so `python examples/<name>.py` works from anywhere.
# (Do NOT use PYTHONPATH here: the session's sitecustomize TPU-plugin
# registration breaks when PYTHONPATH is set.)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from difflexmm_tpu.models.kagome_focusing import ForwardProblem, OptimizationProblem
from difflexmm_tpu.utils import save_data


def main(n_iterations: int = 10, out_dir: str = "out_kagome") -> None:
    out = Path(out_dir)

    problem = ForwardProblem(
        n1_cells=16, n2_cells=16, cell_size=1.0, cell_angle=jax.numpy.pi / 3,
        bond_length=0.05,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.2, loading_rate=0.5, input_delay=0.0,
        n_excited_blocks=4,
        simulation_time=20.0, n_timepoints=200, n_substeps=10,
        method="verlet_pallas" if jax.default_backend() == "tpu" else "verlet",
    )
    optimization = OptimizationProblem(problem, target_size=(3, 3))
    optimization.setup_objective()

    design0 = problem.geometry.zero_design()
    optimization.run_optimization_optax(
        design0,
        n_iterations=n_iterations,
        # Shift bounds keep hinges inside their cells (fabricable designs).
        lower_bound=jax.tree_util.tree_map(lambda x: x - 0.15, design0),
        upper_bound=jax.tree_util.tree_map(lambda x: x + 0.15, design0),
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
        out_dir=argv[1] if len(argv) > 1 else "out_kagome",
    )
