"""Calibrate the guard's firing threshold (``fraction`` of the barrier
window) against the f64 odeint oracle at the paper flagship.

Motivation (GUARDED_ADJOINT in TUNNELING.json): at the default
fraction=0.02 the predicate flags ~80% of intervals during an ordinary
healthy pulse — the threshold is ~25x more conservative than the ~0.5
window-fraction that actually risks tunneling (solver/diagnose.py), so the
guarded adjoint pays the expensive risky-branch vjp almost everywhere.
This sweep records, per fraction, the n_substeps=5 RESCUE accuracy (the
strong-spike case that NaNs unguarded) in f64 and f32, so the default can
be loosened to the largest fraction that still rescues well under the
1e-3 objective budget.

Each case runs in a subprocess (x64 toggling), CPU. Results merge into
TUNNELING.json under "GUARD_THRESHOLD_SWEEP". Usage:

    python tools/guard_threshold_sweep.py [--fractions 0.02 0.05 ...]
"""

import json
import math
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_EMIT = "--emit"

FRACTIONS = (0.02, 0.05, 0.1, 0.2, 0.4)


def _emit_objective(out_path: str, x64: str, guard_json: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    if x64 == "1":
        jax.config.update("jax_enable_x64", True)
    import numpy as np

    from tools.tunneling_study import build

    # verlet_ckpt = the production grid path (relative-translation
    # predicate, same interval body the Pallas kernel's adjoint replays).
    guard = json.loads(guard_json)
    optimization, design = build(5, "verlet_ckpt", guard, True)
    value = optimization.objective_fn(design)
    np.save(out_path, np.asarray(value, dtype=np.float64))


if __name__ == "__main__" and _EMIT in sys.argv:
    i = sys.argv.index(_EMIT)
    _emit_objective(sys.argv[i + 1], sys.argv[i + 2], sys.argv[i + 3])
    sys.exit(0)


def main():
    import argparse
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--fractions", nargs="*", type=float,
                    default=list(FRACTIONS))
    ap.add_argument("--refine", type=int, default=None)
    ap.add_argument("--levels", type=int, default=None)
    ap.add_argument("--key", default="GUARD_THRESHOLD_SWEEP",
                    help="TUNNELING.json section to merge results under")
    ap.add_argument("--out", default=str(REPO / "TUNNELING.json"))
    args = ap.parse_args()

    doc = json.loads(Path(args.out).read_text())
    oracle = doc["objectives"]["f64_odeint_oracle"]

    base_guard = {}
    if args.refine is not None:
        base_guard["refine"] = args.refine
    if args.levels is not None:
        base_guard["levels"] = args.levels

    sweep = {}
    with tempfile.TemporaryDirectory() as td:
        for frac in args.fractions:
            guard = dict(base_guard, fraction=frac)
            entry = {}
            for x64, tag in ((True, "f64"), (False, "f32")):
                out = Path(td) / f"obj_{tag}_{frac}.npy"
                subprocess.run(
                    [sys.executable, __file__, _EMIT, str(out),
                     "1" if x64 else "0", json.dumps(guard)],
                    check=True,
                    cwd=REPO,
                )
                import numpy as np

                v = float(np.load(out))
                entry[f"{tag}_objective"] = v
                entry[f"{tag}_rel_err"] = (
                    None if math.isnan(v)
                    else abs(v - oracle) / max(abs(oracle), 1e-30)
                )
            sweep[str(frac)] = entry
            print(f"guard={guard}: {entry}", flush=True)

    doc[args.key] = dict(
        config="n_substeps=5 rescue case (plain NaNs); rel err vs the "
               "recorded f64 odeint oracle; guard=dict(fraction=...), "
               "window/length_scale from the model ('auto' semantics)"
               + (f"; guard overrides {base_guard}" if base_guard else ""),
        oracle=oracle,
        sweep=sweep,
    )
    Path(args.out).write_text(json.dumps(doc, indent=1) + "\n")
    print(f"merged {args.key} into {args.out}")


if __name__ == "__main__":
    main()
