"""Thin CLI runner: drive a design problem from a JSON config.

The configuration model of both the reference and this framework is typed
dataclasses (SURVEY.md §5); this runner is the thin shell around them —
one JSON file maps onto the ``ForwardProblem`` / ``OptimizationProblem``
fields and an optimizer section, so a full inverse design runs without
writing a script::

    difflexmm-run config.json --out out/ [--iterations 80] [--resume]

Config schema (see ``examples/configs/quads_focusing.json``)::

    {
      "problem": "quads_focusing",          // module under models/
      "forward": { ...ForwardProblem kwargs... },
      "optimization": { ...OptimizationProblem kwargs (minus forward)... },
      "initial_design": {"rotated_square_angle": 0.25}
                       | {"zero": true} | {"pickle": "designs.pkl"},
      "optimize": {"method": "mma" | "optax" | "forward",
                   "n_iterations": 10, ...runner kwargs...}
    }

Artifacts written to ``--out``: ``optimization.pkl`` (full problem dict,
reloadable with ``from_dict``), ``best_solution.pkl``, per-iteration
``metrics.jsonl``, and a resumable ``optimization.ckpt``. CLI flags
override the config's ``optimize`` section.
"""

import argparse
import importlib
import json
from pathlib import Path
from typing import Any, Dict

from difflexmm_tpu.utils import load_data, save_data
from difflexmm_tpu.utils.observability import MetricsLogger, OptimizationCheckpoint

# Families whose OptimizationProblem wraps ONE ForwardProblem with plain
# kwargs; the multi-forward/scenario/experiment families (multi_input,
# static_tuning, hinge_characterization) need structured Python inputs and
# keep their scripted workflow (see examples/).
SINGLE_FORWARD_PROBLEMS = (
    "quads_focusing",
    "quads_energy_splitting",
    "quads_focusing_restricted_space",
    "quads_spin",
    "kagome_focusing",
    "reference_design",
)


def _tuplify(value: Any) -> Any:
    """JSON arrays -> tuples (dataclass fields like target_size expect them)."""

    if isinstance(value, list):
        return tuple(_tuplify(v) for v in value)
    if isinstance(value, dict):
        return {k: _tuplify(v) for k, v in value.items()}
    return value


def build_problem(config: Dict[str, Any]):
    """Instantiate (optimization_or_forward, module) from a config dict."""

    name = config["problem"]
    if name not in SINGLE_FORWARD_PROBLEMS:
        raise SystemExit(
            f"problem {name!r} is not CLI-drivable (choose from "
            f"{SINGLE_FORWARD_PROBLEMS}); the multi-forward families need "
            "structured inputs — use the scripted workflow in examples/."
        )
    module = importlib.import_module(f"difflexmm_tpu.models.{name}")
    forward = module.ForwardProblem(**_tuplify(config.get("forward", {})))
    if not hasattr(module, "OptimizationProblem"):
        return forward, module
    args = [forward]
    if "forward_input" in config:  # e.g. quads_spin's pulse parameters
        args.append(module.ForwardInput(**_tuplify(config["forward_input"])))
    optimization = module.OptimizationProblem(
        *args, **_tuplify(config.get("optimization", {}))
    )
    return optimization, module


def initial_design(optimization, spec: Dict[str, Any]):
    problem = getattr(optimization, "forward_problem", optimization)
    if not problem.is_setup:
        problem.setup()
    geometry = problem.geometry
    if "pickle" in spec:
        return load_data(spec["pickle"])
    if "rotated_square_angle" in spec:
        return geometry.get_design_from_rotated_square(
            float(spec["rotated_square_angle"])
        )
    if spec.get("zero"):
        if hasattr(geometry, "zero_design"):
            return geometry.zero_design()
        # Quad lattices: zero shifts == rotated-square angle 0.
        return geometry.get_design_from_rotated_square(0.0)
    raise SystemExit(
        "initial_design must provide one of: rotated_square_angle, zero, pickle"
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        prog="difflexmm-run", description=__doc__.split("\n\n")[0]
    )
    parser.add_argument("config", type=Path, help="JSON config file")
    parser.add_argument("--out", type=Path, default=Path("out"))
    parser.add_argument("--iterations", type=int, default=None,
                        help="override optimize.n_iterations")
    parser.add_argument("--max-seconds", type=float, default=None,
                        help="wall-clock cap (MMA only)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the checkpoint in --out")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    config = json.loads(args.config.read_text())
    out = args.out
    out.mkdir(parents=True, exist_ok=True)

    target, module = build_problem(config)
    optimize = dict(config.get("optimize", {}))
    method = optimize.pop("method", "mma")
    if args.iterations is not None:
        optimize["n_iterations"] = args.iterations
    if args.max_seconds is not None:
        optimize["max_seconds"] = args.max_seconds

    if method == "forward" or not hasattr(target, "run_optimization_mma"):
        problem = getattr(target, "forward_problem", target)
        if not problem.is_setup:
            problem.setup()
        spec = config.get("initial_design")
        # Without a design spec, solve the problem's own baseline (e.g.
        # reference_design solves at its initial_angle).
        problem.solution_data = (
            problem.solve(initial_design(target, spec)) if spec else problem.solve()
        )
        save_data(out / "solution.pkl", problem.solution_data)
        print(f"forward solve done; solution in {out / 'solution.pkl'}")
        return

    design0 = initial_design(target, config.get("initial_design", {}))
    common = dict(
        metrics_logger=MetricsLogger(out / "metrics.jsonl"),
        checkpoint=OptimizationCheckpoint(out / "optimization.ckpt", every=5),
        resume=args.resume,
        verbose=not args.quiet,
    )
    if method == "mma":
        best = target.run_optimization_mma(design0, **common, **optimize)
    elif method == "optax":
        # The optax runner has no constraint/checkpoint/wall-clock
        # machinery — reject options it would silently drop.
        supported = {"n_iterations", "lower_bound", "upper_bound"}
        rejected = sorted(set(optimize) - supported)  # incl. max_seconds
        if args.resume:
            rejected.append("--resume")
        if rejected:
            raise SystemExit(
                f"optimize.method 'optax' does not support {rejected}; "
                "use method 'mma' (constraints, wall-clock cap, resume) or "
                "remove these options."
            )
        best = target.run_optimization_optax(
            design0, verbose=not args.quiet, **optimize
        )
    else:
        raise SystemExit(f"unknown optimize.method: {method!r}")

    save_data(out / "optimization.pkl", target.to_dict())
    problem = getattr(target, "forward_problem", None)
    if problem is not None and problem.solution_data is not None:
        save_data(out / "best_solution.pkl", problem.solution_data)
    if target.objective_values:
        print(
            f"objective: {target.objective_values[0]:.4e} -> "
            f"{target.objective_values[-1]:.4e} over "
            f"{len(target.objective_values)} iterations; artifacts in {out}/"
        )
    else:
        print(f"no iterations ran (zero budget or immediate wall-clock "
              f"expiry); artifacts in {out}/")
    return best


if __name__ == "__main__":
    main()
