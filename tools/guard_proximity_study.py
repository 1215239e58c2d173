"""Joint (travel, barrier-gap) statistics on the flagship: the evidence
base for the guard's proximity gate (VERDICT r4 next #1).

The r4 travel-only risk predicate fires on ~50% of flagship intervals
(TUNNELING.json GUARDED_ADJOINT.estimated_firing_rate) even though the
flagship pulse never engages contact — the predicate measures *motion*,
not *barrier proximity*. Before gating the predicate on proximity, this
tool measures, per output interval of the real trajectories:

  - travel: the guard's rotational travel metric (max |omega| dt_sub +
    translational term / length_scale) — evaluated at interval boundaries,
    the same states the adjoint's risk monitor sees;
  - gap: min void angle minus cutoff_angle (how far the closest void is
    from the barrier, in radians; negative = inside the active window).

Designs measured: the paper initial design (rotated-square 25 deg) and the
recorded MMA optima (MMA_FLAGSHIP_DESIGN.npz unguarded-run best,
MMA_FLAGSHIP_GUARDED_DESIGN.npz oracle-true best) — optimization pressure
is exactly where integrator-error exploits (and therefore near-barrier
states) concentrate. Writes PROXIMITY_STUDY.json: for each design, travel
and gap quantiles plus the would-be firing rate of the travel predicate
alone and AND-ed with proximity margins of {1, 2, 3, 4} windows.

Usage: python tools/guard_proximity_study.py [--n-substeps 10] [--out PATH]
(runs on CPU f64).
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-substeps", type=int, default=10)
    ap.add_argument("--out", default=str(REPO / "PROXIMITY_STUDY.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp

    from bench import build_flagship, paper_config
    from difflexmm_tpu.ops.contact import void_angles
    from difflexmm_tpu.ops.kinematics import current_node_positions

    cfg = paper_config("verlet", args.n_substeps)
    window = float(cfg["cutoff_angle"] - cfg["min_angle"])
    threshold = 0.02 * window
    spacing = float(cfg["spacing"])

    optimization, design0 = build_flagship(
        method="verlet", n_substeps=args.n_substeps
    )
    fp = optimization.forward_problem
    bonds = fp.geometry.bond_connectivity()

    designs = {"initial": design0}
    for tag, path in (
        ("mma_best_unguarded", REPO / "MMA_FLAGSHIP_DESIGN.npz"),
        ("mma_best_guarded", REPO / "MMA_FLAGSHIP_GUARDED_DESIGN.npz"),
    ):
        if path.exists():
            z = np.load(path)
            keys = sorted(z.files)
            designs[tag] = tuple(jnp.asarray(z[k]) for k in keys)

    dt_sub = float(cfg["simulation_time"]) / (
        (cfg["n_timepoints"] - 1) * args.n_substeps
    )

    def stats_for(design):
        sol = fp.solve(design)
        fields = np.asarray(sol.fields)  # (T, 2, nb, 3)
        bc = np.asarray(sol.block_centroids)
        cnv = np.asarray(sol.centroid_node_vectors)

        gaps, travels = [], []
        for i in range(fields.shape[0]):
            nodes = current_node_positions(
                jnp.asarray(fields[i, 0]), jnp.asarray(bc), jnp.asarray(cnv)
            )
            gaps.append(
                float(jnp.min(void_angles(nodes, bonds)))
                - float(cfg["cutoff_angle"])
            )
            v = fields[i, 1]
            rot = np.max(np.abs(v[:, 2])) * dt_sub
            # Upper bound on the relative translational term (abs |v|).
            trans = np.max(np.abs(v[:, :2])) * dt_sub / spacing
            travels.append(rot + trans)
        gaps = np.array(gaps)
        travels = np.array(travels)

        def q(x):
            return {
                "min": float(np.min(x)),
                "p10": float(np.percentile(x, 10)),
                "p50": float(np.percentile(x, 50)),
                "p90": float(np.percentile(x, 90)),
                "max": float(np.max(x)),
            }

        fired = travels > threshold
        out = {
            "gap_over_window": q(gaps / window),
            "travel_over_threshold": q(travels / threshold),
            "travel_fire_rate": float(np.mean(fired)),
        }
        for m in (1.0, 2.0, 3.0, 4.0):
            near = gaps < m * window
            out[f"fire_rate_margin_{m:g}w"] = float(np.mean(fired & near))
        # Hard-term would-be rates at candidate hard thresholds.
        for frac in (0.1, 0.25, 0.5):
            out[f"hard_rate_{frac:g}w"] = float(
                np.mean(travels > frac * window)
            )
        return out

    record = {
        "config": (
            f"paper flagship 24x16/200tp, method=verlet f64 CPU, "
            f"n_substeps={args.n_substeps}; travel at interval boundaries "
            "(abs translational bound); gap = min void angle - cutoff"
        ),
        "window_rad": window,
        "threshold_rad": threshold,
        "designs": {},
    }
    for tag, d in designs.items():
        print(f"measuring {tag}...", flush=True)
        record["designs"][tag] = stats_for(d)
        print(json.dumps(record["designs"][tag], indent=1), flush=True)

    Path(args.out).write_text(json.dumps(record, indent=1) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
