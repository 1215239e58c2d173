"""Measure design-tiled multi-start throughput on the flagship problem.

Compares, on real TPU hardware:

- the r2 production path: ``verlet_ckpt`` + vmap (XLA lays the batch
  across lanes; 2.83 ms/design fwd+grad at B=128 on v5e), vs
- the design-tiled fused kernel (``verlet_pallas`` + the custom_vmap
  tiling rule, ops/pallas/tiling.py): B2=5 flagship designs side by side
  in the 128 lanes x B1=8 along the leading dim = 40 designs per kernel
  run, whole trajectory fused in VMEM.

Gradients use the vjp-of-vmap order (the only order the custom_vmap rule
supports — and what parallel/multistart.py uses).

Usage: python tools/bench_tiled_multistart.py [--sizes 40,120,240]
Writes TILED_MULTISTART.json and prints it.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


def _perturbed(design, B):
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        * (1 + 1e-3 * jnp.arange(B).reshape((B,) + (1,) * x.ndim)),
        design,
    )


def _measure_fn(fn, args, n_reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_reps):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n_reps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="40,120,240")
    parser.add_argument("--skip-ckpt", action="store_true")
    args = parser.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from bench import build_flagship

    record = {"device": str(jax.devices()[0])}

    # Baseline half: verlet_ckpt vmap at the SAME batch sizes, so the
    # artifact carries both sides of the _AUTO_MAX_TILED_BATCH crossover
    # (solver/dynamics.py) — plus the r2 production B=128 number.
    if not args.skip_ckpt:
        from bench import _measure_batched

        per_batch, dps = _measure_batched(128)
        record["ckpt_vmap_B128"] = {
            "seconds_per_batch": round(per_batch, 4),
            "designs_per_second": round(dps, 1),
        }
        print("ckpt vmap B=128:", record["ckpt_vmap_B128"], flush=True)

        opt_c, design_c = build_flagship(method="verlet_ckpt")
        obj_c = opt_c.objective_fn
        record["ckpt"] = {}
        for B in sizes:
            designs = _perturbed(design_c, B)

            @jax.jit
            def ckpt_vg(ds):
                vals, pullback = jax.vjp(jax.vmap(obj_c), ds)
                (grads,) = pullback(jnp.ones_like(vals))
                return vals, grads

            @jax.jit
            def ckpt_fwd(ds):
                return jax.vmap(obj_c)(ds)

            fwd_s = _measure_fn(ckpt_fwd, (designs,))
            vg_s = _measure_fn(ckpt_vg, (designs,))
            entry = {
                "fwd_seconds_per_batch": round(fwd_s, 4),
                "fwd_designs_per_second": round(B / fwd_s, 1),
                "fwd_grad_seconds_per_batch": round(vg_s, 4),
                "fwd_grad_designs_per_second": round(B / vg_s, 1),
            }
            record["ckpt"][str(B)] = entry
            print(f"ckpt B={B}:", entry, flush=True)

    # Tiled fused kernel.
    optimization, design = build_flagship(method="verlet_pallas")
    obj = optimization.objective_fn

    record["tiled"] = {}
    for B in sizes:
        designs = _perturbed(design, B)

        @jax.jit
        def batched_vg(ds):
            vals, pullback = jax.vjp(jax.vmap(obj), ds)
            (grads,) = pullback(jnp.ones_like(vals))
            return vals, grads

        @jax.jit
        def batched_fwd(ds):
            return jax.vmap(obj)(ds)

        try:
            fwd_s = _measure_fn(batched_fwd, (designs,))
            vg_s = _measure_fn(batched_vg, (designs,))
        except Exception as error:  # pragma: no cover
            sys.stderr.write(f"tiled B={B} failed: {error}\n")
            continue
        entry = {
            "fwd_seconds_per_batch": round(fwd_s, 4),
            "fwd_designs_per_second": round(B / fwd_s, 1),
            "fwd_grad_seconds_per_batch": round(vg_s, 4),
            "fwd_grad_designs_per_second": round(B / vg_s, 1),
        }
        record["tiled"][str(B)] = entry
        print(f"tiled B={B}:", entry, flush=True)

    out_path = REPO / "TILED_MULTISTART.json"
    out_path.write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
