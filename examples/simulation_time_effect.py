"""Simulation-time-effect study: how the optimization horizon shapes the
design (reference workflow:
notebooks/quads_focusing_3dp_pla_shims_simulation_time_effect.ipynb —
optimize the focusing design at simulation_time = {2, 4, 8, 16} pulse
widths, then re-evaluate every optimized design on the LONGEST horizon and
compare integrated target energies).

Short-horizon designs chase the first wavefront only; longer horizons
reward designs that keep energy trapped in the target patch. The cross
table (rows = optimization horizon, single column = integrated target
energy on the longest horizon) makes the effect quantitative.

Run:

    python examples/simulation_time_effect.py [n_iterations] [out_dir] [n1xn2]
"""

import json
import sys
from pathlib import Path

# Self-bootstrap so `python examples/<name>.py` works from anywhere.
# (Do NOT use PYTHONPATH: the session's TPU-plugin registration breaks
# when PYTHONPATH is set.)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from difflexmm_tpu.models.quads_focusing import ForwardProblem, OptimizationProblem
from difflexmm_tpu.utils import save_data

# Optimization horizons in units of the pulse width 1/loading_rate
# (reference notebook cell: simulation_times = [2, 4, 8, 16]).
HORIZONS = (2, 4, 8, 16)


def build(n1: int, n2: int, horizon: int, loading_rate: float = 0.5):
    problem = ForwardProblem(
        n1_blocks=n1, n2_blocks=n2, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.2, loading_rate=loading_rate, input_delay=0.0,
        n_excited_blocks=max(2, n2 // 4), loaded_side="left",
        # Fixed timepoint count across horizons (as in the reference
        # notebook): longer horizons sample the same number of output
        # frames, so the summed objective converts to an integral via
        # dt = simulation_time / n_timepoints.
        simulation_time=horizon / loading_rate,
        n_timepoints=100,
        n_substeps=10,
        method="verlet_pallas" if jax.default_backend() == "tpu" else "verlet",
        # Keep the corner clamps clear of the centered driven strip on
        # small smoke lattices (setup raises on overlap).
        n_blocks_clamped_corner=2 if n2 >= 10 else 1,
    )
    optimization = OptimizationProblem(problem, target_size=(2, 2))
    optimization.setup_objective()
    return optimization


def main(n_iterations: int = 10, out_dir: str = "out", n1: int = 24, n2: int = 16) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    designs = {}
    summary = {"horizons": list(HORIZONS), "n_iterations": n_iterations,
               "lattice": [n1, n2], "optimized": {}, "cross_eval": {}}

    for horizon in HORIZONS:
        optimization = build(n1, n2, horizon)
        design0 = optimization.forward_problem.geometry.get_design_from_rotated_square(0.25)
        best = optimization.run_optimization_mma(
            design0,
            n_iterations=n_iterations,
            lower_bound=-0.3, upper_bound=0.3,
            min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
            move_limit=0.08,
        )
        designs[horizon] = best
        problem = optimization.forward_problem
        dt = problem.simulation_time / problem.n_timepoints
        summary["optimized"][str(horizon)] = {
            "objective": float(optimization.objective_values[-1]),
            "integrated_energy": float(optimization.objective_values[-1]) * dt,
        }
        print(f"horizon {horizon:>2} pulse widths: objective "
              f"{optimization.objective_values[0]:.4e} -> "
              f"{optimization.objective_values[-1]:.4e}")

    # Re-evaluate every optimized design on the longest horizon (the
    # notebook's integrated-energy comparison).
    longest = build(n1, n2, HORIZONS[-1])
    dt = longest.forward_problem.simulation_time / longest.forward_problem.n_timepoints
    eval_fn = jax.jit(longest.objective_fn)
    print(f"\nintegrated target energy over the {HORIZONS[-1]}-pulse-width horizon:")
    for horizon, design in designs.items():
        integrated = float(eval_fn(design)) * dt
        summary["cross_eval"][str(horizon)] = integrated
        print(f"  design optimized at {horizon:>2} pulse widths: {integrated:.4e}")

    save_data(out / "simulation_time_effect_designs.pkl",
              {h: jax.tree.map(lambda x: x, d) for h, d in designs.items()})
    (out / "simulation_time_effect.json").write_text(json.dumps(summary, indent=2))
    print(f"artifacts in {out}/")


if __name__ == "__main__":
    argv = sys.argv[1:4]
    n1, n2 = (int(v) for v in argv[2].split("x")) if len(argv) > 2 else (24, 16)
    main(
        n_iterations=int(argv[0]) if argv else 10,
        out_dir=argv[1] if len(argv) > 1 else "out",
        n1=n1, n2=n2,
    )
