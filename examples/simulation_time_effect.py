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

# The f64 verification subprocess must pin CPU + x64 BEFORE the package
# imports below: module-level jnp constants initialize the backend, after
# which jax.config platform updates are too late (the TPU plugin would
# win and build() would pick the Pallas path, which has no f64 lowering).
if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "--cross-eval-f64":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.models.quads_focusing import ForwardProblem, OptimizationProblem
from difflexmm_tpu.utils import save_data

# Optimization horizons in units of the pulse width 1/loading_rate
# (reference notebook cell: simulation_times = [2, 4, 8, 16]).
HORIZONS = (2, 4, 8, 16)


def build(n1: int, n2: int, horizon: int, loading_rate: float = 0.25,
          method: str = None):
    # Pulse width 1/loading_rate = 4: even the shortest horizon (2 pulse
    # widths = 8 time units) extends past the wavefront's ~7-unit arrival
    # at the 24x16 center target, so every horizon's objective has signal
    # (a faster pulse leaves the short-horizon runs with zero gradient).
    problem = ForwardProblem(
        n1_blocks=n1, n2_blocks=n2, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.2, loading_rate=loading_rate, input_delay=0.0,
        n_excited_blocks=max(2, n2 // 4), loaded_side="left",
        # Fixed timepoint count across horizons (as in the reference
        # notebook): longer horizons sample the same number of output
        # frames, so the summed objective converts to an integral via the
        # frame spacing dt = simulation_time / (n_timepoints - 1). The
        # SUBSTEP count scales with the horizon so the integration dt (and
        # hence the fixed-step stability region) stays the same for every
        # horizon — the reference's adaptive odeint gets this for free;
        # the scan integrator needs it made explicit.
        simulation_time=horizon / loading_rate,
        n_timepoints=100,
        n_substeps=4 * horizon,
        # Paper-flagship contact window (bench.py): the barrier diverges
        # at 15 degrees of overlap rather than at exact void closure —
        # with a zero min_angle, a pulse that fully closes one void sends
        # the ~1/x barrier to infinity and the re-simulation of a design
        # beyond its optimization horizon can NaN.
        k_contact=1e-3,
        min_angle=-15 * jnp.pi / 180,
        cutoff_angle=-10 * jnp.pi / 180,
        # Reactive substep escalation: long-horizon re-simulation of
        # designs optimized at a shorter horizon can hit force spikes the
        # fixed step would blow up on; the guard re-runs those substeps as
        # micro-steps (the reference's adaptive odeint shrinks dt — see
        # TUNNELING.json for the flagship case table).
        guard="auto",
        method=method
        or ("verlet_pallas" if jax.default_backend() == "tpu" else "verlet"),
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
            # The reference study ran with 30-degree angle + edge-length
            # constraints (its artifact names: opt_with_angle_30_and_
            # length_3_constraints). Razor-thin voids (min angle 0) can
            # cross the contact-barrier asymptote when re-simulated over a
            # LONGER horizon than they were optimized for -> NaN fields.
            min_void_angle=float(np.deg2rad(30.0)),
            min_block_angle=float(np.deg2rad(30.0)),
            min_edge_length=0.05,
            move_limit=0.08,
        )
        designs[horizon] = best
        problem = optimization.forward_problem
        dt = problem.simulation_time / (problem.n_timepoints - 1)
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
    dt = longest.forward_problem.simulation_time / (
        longest.forward_problem.n_timepoints - 1
    )
    eval_fn = jax.jit(longest.objective_fn)
    cross = {h: float(eval_fn(d)) * dt for h, d in designs.items()}
    save_data(out / "simulation_time_effect_designs.pkl", designs)

    # Focusing designs concentrate energy until voids slam shut; past its
    # optimization horizon a design's f32 trajectory can then land on the
    # 1/x contact-barrier asymptote (inf forces -> NaN) even though the
    # f64 dynamics are fine — the reference's adaptive odeint shrinks dt
    # at the force spike instead. Re-evaluate any non-finite entry in
    # float64 on CPU (fresh process: the x64 flag must be set before jax
    # initializes a backend).
    bad = [h for h, v in cross.items() if not np.isfinite(v)]
    f64_note = {}
    if bad:
        import subprocess

        # Annotate each blow-up with the tunneling diagnosis before the f64
        # rescue: where the trajectory went non-finite and how close the
        # per-substep rotation came to spanning the barrier window.
        from difflexmm_tpu.solver import contact_tunneling_report

        fp = longest.forward_problem
        summary["tunneling_reports"] = {}
        for h in bad:
            sol = fp.solve(designs[h])
            report = contact_tunneling_report(
                sol.fields, sol.timepoints, fp.n_substeps,
                fp.min_angle, fp.cutoff_angle,
            )
            frac = np.asarray(report.window_fraction)
            frac = frac[np.isfinite(frac)]
            summary["tunneling_reports"][str(h)] = {
                "first_nonfinite_timepoint": report.first_nonfinite,
                "max_finite_window_fraction": (
                    float(frac.max()) if frac.size else None
                ),
            }

        result = subprocess.run(
            [sys.executable, __file__, "--cross-eval-f64",
             str(out / "simulation_time_effect_designs.pkl"),
             f"{n1}x{n2}", ",".join(str(h) for h in bad)],
            capture_output=True, text=True, timeout=3600,
        )
        try:
            f64_values = json.loads(result.stdout.strip().splitlines()[-1])
        except (json.JSONDecodeError, IndexError):
            raise SystemExit(f"f64 re-evaluation failed: {result.stderr[-2000:]}")
        for h_str, value in f64_values.items():
            cross[int(h_str)] = value * dt
            f64_note[int(h_str)] = True

    print(f"\nintegrated target energy over the {HORIZONS[-1]}-pulse-width horizon:")
    for horizon in HORIZONS:
        note = "  (f64 CPU re-evaluation: f32 crossed the contact barrier)" \
            if f64_note.get(horizon) else ""
        summary["cross_eval"][str(horizon)] = cross[horizon]
        print(f"  design optimized at {horizon:>2} pulse widths: "
              f"{cross[horizon]:.4e}{note}")
    (out / "simulation_time_effect.json").write_text(json.dumps(summary, indent=2))
    print(f"artifacts in {out}/")


def cross_eval_f64(pkl_path: str, n1: int, n2: int, horizons) -> None:
    """Subprocess mode: evaluate saved designs at the longest horizon in
    float64 on CPU; prints one JSON line {horizon: objective}. (The CPU +
    x64 config happens at the top of the module, before the package
    imports can initialize a backend.)"""

    from difflexmm_tpu.utils import load_data

    designs = load_data(pkl_path)
    longest = build(n1, n2, HORIZONS[-1], method="verlet")
    eval_fn = jax.jit(longest.objective_fn)
    values = {str(h): float(eval_fn(designs[h])) for h in horizons}
    print(json.dumps(values))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cross-eval-f64":
        n1, n2 = (int(v) for v in sys.argv[3].split("x"))
        cross_eval_f64(
            sys.argv[2], n1, n2, [int(h) for h in sys.argv[4].split(",")]
        )
        sys.exit(0)
    argv = sys.argv[1:4]
    n1, n2 = (int(v) for v in argv[2].split("x")) if len(argv) > 2 else (24, 16)
    main(
        n_iterations=int(argv[0]) if argv else 10,
        out_dir=argv[1] if len(argv) > 1 else "out",
        n1=n1, n2=n2,
    )
