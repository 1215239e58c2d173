"""Contact-tunneling study: reproduce the strong-pulse fixed-step NaN at
the paper flagship and gate the reactive substep guard against the f64
odeint oracle.

The failure mode (VERDICT r3 missing #1, ACCURACY.json verlet@5=NaN): the
flagship pulse (amplitude 0.5*spacing) produces a localized nonlinear
force spike at n_substeps=5 that the fixed-step integrator steps across in
~one substep and blows up to NaN. MEASURED ATTRIBUTION: the
f64_n5_nocontact case also NaNs, so at this config the spike is nonlinear
ligament stiffening under the strong drive, not the contact barrier
specifically (a true contact-barrier tunneling case is gated separately in
tests/test_guard.py). Either way the reference's adaptive Dormand-Prince
(reference difflexmm/dynamics.py:166) shrinks dt through the spike and
survives; the guard (ops/pallas/core.resolve_guard) is the fixed-step
equivalent: substeps whose predicted travel exceeds a fraction of the
contact window re-run as micro-steps (recursively) — the same travel
predicate fires on any force spike or local instability, contact or not.

Cases (all at the paper flagship, 24x16, 200 timepoints):
  - f64_odeint_oracle       reference-semantics truth (adaptive)
  - f64_n5_plain            expected NaN (the ACCURACY.json row)
  - f64_n5_nocontact        also NaN -> spike is not contact-specific here
  - f64_n5_guarded          expected finite, rel err << 1e-3
  - f32_n5_plain            expected NaN (f32 is strictly worse)
  - f32_n5_guarded          expected finite, rel err <= 1e-3
  - f32_n10_plain           control: the bench config is healthy

Each case runs in a subprocess so x64 can differ per case. Writes
TUNNELING.json. Usage: python tools/tunneling_study.py [--out PATH]
"""

import json
import math
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_EMIT = "--emit"

#: case name -> (x64, n_substeps, method, guard, use_contact)
#:
#: Guard variants at the n=5 rescue case (r5): "auto" is now the
#: proximity-gated cost-proportional spec — at n=5 it rescues the NaN via
#: the HARD stability term but integrates the (badly under-resolved)
#: pulse coarsely wherever voids stay far from the barrier, so its
#: accuracy reflects n=5 truncation error, not guard failure. The
#: travel-only dict spec ({} -> window/length_scale from the model, no
#: proximity keys) refines on travel anywhere — effectively adaptive
#: global accuracy — and preserves the r4 rescue-accuracy record.
CASES = {
    "f64_odeint_oracle": (True, 10, "odeint", None, True),
    "f64_n5_plain": (True, 5, "verlet", None, True),
    "f64_n5_nocontact": (True, 5, "verlet", None, False),
    "f64_n5_guarded": (True, 5, "verlet", {}, True),
    "f64_n5_guarded_auto": (True, 5, "verlet", "auto", True),
    "f32_n5_plain": (False, 5, "verlet", None, True),
    "f32_n5_guarded": (False, 5, "verlet", {}, True),
    "f32_n5_guarded_auto": (False, 5, "verlet", "auto", True),
    "f32_n10_plain": (False, 10, "verlet", None, True),
    "f32_n10_guarded_auto": (False, 10, "verlet", "auto", True),
}


def build(n_substeps, method, guard, use_contact):
    from bench import paper_config
    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )
    import jax.numpy as jnp

    cfg = paper_config(method, n_substeps)
    cfg["use_contact"] = use_contact
    problem = ForwardProblem(guard=guard, **cfg)
    optimization = OptimizationProblem(
        problem, target_size=(2, 2), target_shift=(4, 5)
    )
    optimization.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(
        25 * jnp.pi / 180
    )
    return optimization, design


def _emit_objective(out_path: str, mode: str) -> None:
    """Subprocess entry: compute one case's objective on CPU."""

    import jax

    jax.config.update("jax_platforms", "cpu")
    x64, n_substeps, method, guard, use_contact = CASES[mode]
    if x64:
        jax.config.update("jax_enable_x64", True)
    import numpy as np

    optimization, design = build(n_substeps, method, guard, use_contact)
    value = optimization.objective_fn(design)
    np.save(out_path, np.asarray(value, dtype=np.float64))


if __name__ == "__main__" and _EMIT in sys.argv:
    i = sys.argv.index(_EMIT)
    _emit_objective(sys.argv[i + 1], sys.argv[i + 2])
    sys.exit(0)


def run_case(mode: str, tmp: Path) -> float:
    import numpy as np

    out = tmp / f"obj_{mode}.npy"
    subprocess.run(
        [sys.executable, __file__, _EMIT, str(out), mode],
        check=True,
        cwd=REPO,
    )
    return float(np.load(out))


def main():
    import argparse
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*", default=list(CASES))
    ap.add_argument("--out", default=str(REPO / "TUNNELING.json"))
    args = ap.parse_args()

    results = {}
    with tempfile.TemporaryDirectory() as td:
        for mode in args.modes:
            v = run_case(mode, Path(td))
            results[mode] = v
            print(f"{mode}: {v}", flush=True)

    # Merge: other tools (guarded_adjoint_bench, guard_threshold_sweep)
    # store their sections in the same artifact, and a --modes subset run
    # must keep previously recorded cases — never clobber either.
    out = Path(args.out)
    record = json.loads(out.read_text()) if out.exists() else {}
    record["config"] = (
        "paper flagship (24x16, 200 timepoints; bench.paper_config)"
    )
    objectives = dict(record.get("objectives", {}))
    objectives.update(results)
    record["objectives"] = objectives
    if "f64_odeint_oracle" in objectives:
        oracle = objectives["f64_odeint_oracle"]
        for mode, v in objectives.items():
            if mode != "f64_odeint_oracle":
                record[f"{mode}_rel_err"] = (
                    None
                    if math.isnan(v)
                    else abs(v - oracle) / max(abs(oracle), 1e-30)
                )
    out.write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
