"""End-to-end cost/benefit of the guarded multi-start rescue recipe
(VERDICT r4 weak #7 / next #7).

The production recipe for guarded populations (a guarded solver must not
be vmapped — under vmap its lax.cond becomes a select and every candidate
pays both branches): SCREEN the whole population unguarded with one
vmapped evaluation, then re-evaluate only the top-k finalists through the
guarded sibling objective with ``parallel.reevaluate_finalists``
(lax.map — real branches) and re-rank.

This tool runs the recipe on a population that genuinely contains
unstable designs — interpolations from the paper initial design toward
the r4 unguarded-MMA optimum, which the unguarded flagship solve blows up
on (PROXIMITY_STUDY.json: travel ~1e8x threshold) — and records:

- the screen cost (vmapped unguarded, B designs at once),
- the finalist re-evaluation cost (k guarded lax.map solves),
- the fully-guarded lax.map baseline over ALL B (what the recipe avoids),
- how many candidates the guard RESCUES (screen non-finite -> guarded
  finite) and how the top-k re-ranks (screen order vs guarded truth).

Writes RESCUE_RECIPE.json. Run on TPU:
    nohup python -u tools/rescue_recipe_bench.py > /tmp/rrb.log 2>&1 &
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp


def main(B=128, k=8):
    if jax.devices()[0].platform == "cpu":
        print("refusing to record: no TPU attached", file=sys.stderr)
        return 2

    from bench import build_flagship, paper_config
    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )
    from difflexmm_tpu.parallel import reevaluate_finalists

    # Screening objective: unguarded verlet_ckpt (the large-batch backend).
    screen_opt, design0 = build_flagship(method="verlet_ckpt")
    # Truth objective: the guarded sibling (proximity-gated auto).
    gproblem = ForwardProblem(
        guard="auto", **paper_config("verlet_pallas", 10)
    )
    gopt = OptimizationProblem(
        gproblem, target_size=(2, 2), target_shift=(4, 5)
    )
    gopt.setup_objective()

    # Population: interpolations toward the exploding r4 MMA optimum plus
    # jitter — ts near 1 are genuinely unstable unguarded.
    z = np.load(REPO / "MMA_FLAGSHIP_DESIGN.npz")
    bad = tuple(jnp.asarray(z[f]) for f in sorted(z.files))
    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, 1.1, B)
    keys = jax.random.split(key, len(jax.tree.leaves(design0)))
    designs = jax.tree.map(
        lambda a, b, kk: a[None] * (1 - ts).reshape(
            (B,) + (1,) * a.ndim
        ) + b[None] * ts.reshape((B,) + (1,) * a.ndim)
        + 0.02 * jax.random.normal(kk, (B,) + a.shape),
        design0, bad, jax.tree.unflatten(jax.tree.structure(design0), keys),
    )

    screen_fn = jax.jit(lambda ds: jax.vmap(screen_opt.objective_fn)(ds))
    screen_vals = screen_fn(designs)
    jax.block_until_ready(screen_vals)
    t0 = time.perf_counter()
    screen_vals = screen_fn(designs)
    jax.block_until_ready(screen_vals)
    t_screen = time.perf_counter() - t0

    # Finalist re-evaluation (compile + steady measured separately).
    def run_finalists():
        return reevaluate_finalists(
            gopt.objective_fn, designs, screen_vals, k=k, maximize=True
        )

    res = run_finalists()
    jax.block_until_ready(res.values)
    t0 = time.perf_counter()
    res = run_finalists()
    jax.block_until_ready(res.values)
    t_finalists = time.perf_counter() - t0

    # Fully-guarded baseline: lax.map over ALL B (one compile, sequential).
    full_fn = jax.jit(
        lambda ds: jax.lax.map(gopt.objective_fn, ds)
    )
    full_vals = full_fn(designs)
    jax.block_until_ready(full_vals)
    t0 = time.perf_counter()
    full_vals = full_fn(designs)
    jax.block_until_ready(full_vals)
    t_full = time.perf_counter() - t0

    screen_np = np.asarray(screen_vals)
    full_np = np.asarray(full_vals)
    finite_screen = np.isfinite(screen_np)
    rescued = int(np.sum(~finite_screen & np.isfinite(full_np)))

    # Rank agreement: the screen's top-k vs the guarded truth's top-k.
    def top(v, kk):
        vv = np.where(np.isfinite(v), v, -np.inf)
        return list(np.argsort(-vv)[:kk])

    screen_topk = top(screen_np, k)
    truth_topk = top(full_np, k)
    winner_screen = screen_topk[0]
    winner_recipe = int(res.best_index)
    winner_truth = truth_topk[0]

    record = {
        "config": (
            f"flagship 24x16/200tp, B={B} interpolations toward the "
            f"exploding r4 MMA optimum (+2% jitter), k={k}; screen "
            "verlet_ckpt unguarded vmap, truth verlet_pallas guard=auto"
        ),
        "screen_seconds": round(t_screen, 3),
        "finalist_reeval_seconds": round(t_finalists, 3),
        "recipe_total_seconds": round(t_screen + t_finalists, 3),
        "fully_guarded_laxmap_seconds": round(t_full, 3),
        "recipe_speedup_vs_fully_guarded": round(
            t_full / (t_screen + t_finalists), 1
        ),
        "screen_nonfinite": int(np.sum(~finite_screen)),
        "guard_rescued_candidates": rescued,
        "guarded_nonfinite": int(np.sum(~np.isfinite(full_np))),
        "screen_topk": [int(i) for i in screen_topk],
        "truth_topk": [int(i) for i in truth_topk],
        "recipe_winner": winner_recipe,
        "truth_winner": int(winner_truth),
        "screen_winner": int(winner_screen),
        "recipe_winner_matches_truth": bool(winner_recipe == winner_truth),
        "rank_changes_in_topk": int(
            sum(a != b for a, b in zip(screen_topk, truth_topk))
        ),
        "winner_screen_value": float(screen_np[winner_screen]),
        "winner_truth_value": float(full_np[winner_truth]),
    }
    out = REPO / "RESCUE_RECIPE.json"
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(json.dumps(record, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
