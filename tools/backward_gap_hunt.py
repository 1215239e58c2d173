"""Hunt the batched-backward factor above its arithmetic bound
(VERDICT r4 weak #5 / next #6).

At B=1024 the flagship multistart fwd+grad ran 371 designs/s against
1,948 fwd-only — 5.3x, while the stored-state adjoint's replay+transpose
FLOP ratio bounds the backward at ~3.1x (ADJOINT_SPLIT.json). The r4 fix
(lax.map over 128-candidate vjp chunks) recovered 284 -> 371/s; this tool
maps the remaining gap:

- chunk-size sweep well beyond {None, 128} at B in {512, 1024},
- fwd-only rate at the same B (the denominator of the ratio),
- a transpose-free control: fwd+grad at n_timepoints cut 4x (shorter
  reverse scan, same per-interval arithmetic) — if the ratio improves,
  the loss is in the reverse scan's working set, not per-interval math.

Writes BACKWARD_GAP.json. Run on TPU:
    nohup python -u tools/backward_gap_hunt.py > /tmp/bgh.log 2>&1 &
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


def perturbed(design, B):
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        * (1 + 1e-3 * jnp.arange(B).reshape((B,) + (1,) * x.ndim)),
        design,
    )


def rate(fn, designs, B, reps=3):
    out = fn(designs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(designs))
    return B / ((time.perf_counter() - t0) / reps)


def main():
    if jax.devices()[0].platform == "cpu":
        print("refusing to record: no TPU attached", file=sys.stderr)
        return 2

    from bench import build_flagship
    from difflexmm_tpu.parallel.multistart import population_value_and_grad

    record = {"config": "flagship 24x16/200tp verlet_ckpt, v5e", "B": {}}
    optimization, design = build_flagship(method="verlet_ckpt")
    obj = optimization.objective_fn

    for B in (512, 1024):
        designs = perturbed(design, B)
        entry = {}
        entry["fwd_only_designs_per_second"] = round(
            rate(jax.jit(lambda ds: jax.vmap(obj)(ds)), designs, B), 1
        )
        for chunk in (32, 64, 128, 256, None):
            fn = jax.jit(
                lambda ds, c=chunk: population_value_and_grad(
                    obj, ds, grad_chunk=c
                )
            )
            key = f"fwd_grad_chunk_{chunk}"
            try:
                entry[key] = round(rate(fn, designs, B), 1)
            except Exception as err:  # pragma: no cover
                entry[key] = f"failed: {err}"
            print(f"B={B} {key}: {entry[key]}", flush=True)
        record["B"][str(B)] = entry

    # Transpose-length control: 4x shorter output grid (50 timepoints) at
    # B=1024, same physics per interval. If fwd+grad/fwd-only improves
    # markedly, the gap lives in the reverse scan's length/working set.
    from bench import paper_config
    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    cfg = paper_config("verlet_ckpt", 10)
    cfg.update(n_timepoints=50)
    problem = ForwardProblem(**cfg)
    opt_short = OptimizationProblem(
        problem, target_size=(2, 2), target_shift=(4, 5)
    )
    opt_short.setup_objective()
    design_s = problem.geometry.get_design_from_rotated_square(
        25 * jnp.pi / 180
    )
    B = 1024
    designs = perturbed(design_s, B)
    short = {
        "fwd_only": round(
            rate(jax.jit(lambda ds: jax.vmap(opt_short.objective_fn)(ds)),
                 designs, B), 1
        ),
        "fwd_grad_chunk_128": round(
            rate(
                jax.jit(
                    lambda ds: population_value_and_grad(
                        opt_short.objective_fn, ds, grad_chunk=128
                    )
                ),
                designs, B,
            ),
            1,
        ),
    }
    short["ratio"] = round(short["fwd_only"] / short["fwd_grad_chunk_128"], 2)
    record["short_50tp_B1024"] = short

    full = record["B"]["1024"]
    best_key = max(
        (k for k in full if k.startswith("fwd_grad") and
         isinstance(full[k], (int, float))),
        key=lambda k: full[k],
    )
    record["best_1024"] = {best_key: full[best_key]}
    record["ratio_1024_best"] = round(
        full["fwd_only_designs_per_second"] / full[best_key], 2
    )
    record["arithmetic_bound_ratio"] = 3.1

    out = REPO / "BACKWARD_GAP.json"
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(json.dumps(record, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
