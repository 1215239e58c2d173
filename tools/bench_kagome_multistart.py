"""Measure kagome multi-start batching strategies on real TPU.

VERDICT r3 weak #2: kagome populations had no measured fast batched
route — the design-tiling rule is quads-only, and no artifact said how
bad a plain vmap of the 6-plane Pallas kernel is. This tool measures, at
B in {32, 128} on the 12x10-cell kagome focusing workload (the
tpu_parity_check config, reference problems/kagome_focusing.py as the
population-restart workload):

  - vmap of verlet_pallas (batch_tiling="off"): the strategy auto must
    avoid,
  - vmap of verlet_ckpt: the XLA-scan forward (lane-packs the batch),
  - method="auto": must match the ckpt numbers (the routing installed in
    solver/dynamics.py's kagome branch).

Writes KAGOME_MULTISTART.json; bench.py carries the headline
kagome designs/s line. Usage: python tools/bench_kagome_multistart.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


def build(method, **solver_kwargs):
    from difflexmm_tpu.models.kagome_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    problem = ForwardProblem(
        n1_cells=12, n2_cells=10, cell_size=1.0,
        cell_angle=jnp.pi / 3, bond_length=0.05,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3,
        density=1.0, damping=0.02,
        amplitude=0.1, loading_rate=2.0, input_delay=0.0,
        n_excited_blocks=3, simulation_time=4.0,
        n_timepoints=60, n_substeps=10, method=method,
        n_blocks_clamped_corner=1,
        **solver_kwargs,
    )
    opt = OptimizationProblem(problem, target_size=(2, 2))
    opt.setup_objective()
    design = problem.geometry.zero_design()
    return opt, design


def perturbed(design, B):
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        + 1e-3 * jnp.arange(B).reshape((B,) + (1,) * x.ndim),
        design,
    )


def measure(opt, design, B, n_reps=3):
    obj = opt.objective_fn
    designs = perturbed(design, B)

    @jax.jit
    def batched_vg(ds):
        vals, pullback = jax.vjp(jax.vmap(obj), ds)
        (grads,) = pullback(jnp.ones_like(vals))
        return vals, grads

    out = batched_vg(designs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_reps):
        jax.block_until_ready(batched_vg(designs))
    per_batch = (time.perf_counter() - t0) / n_reps
    return {
        "fwd_grad_seconds_per_batch": round(per_batch, 4),
        "fwd_grad_designs_per_second": round(B / per_batch, 1),
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="32,128")
    ap.add_argument("--skip-pallas-vmap", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    record = {
        "device": str(jax.devices()[0]),
        "workload": "kagome focusing 12x10 cells (240 blocks), 60 tp, n_substeps=10",
    }
    strategies = {}
    if not args.skip_pallas_vmap:
        # Explicit verlet_pallas without a max_batch dict installs no
        # routing (solver/dynamics.py kagome branch), so vmap hits the
        # raw SoA kernel — the strategy being measured.
        strategies["pallas_vmap"] = build("verlet_pallas")
    strategies["ckpt_vmap"] = build("verlet_ckpt")
    strategies["auto"] = build("auto")

    for name, (opt, design) in strategies.items():
        record[name] = {}
        for B in sizes:
            try:
                entry = measure(opt, design, B)
            except Exception as error:  # pragma: no cover
                sys.stderr.write(f"{name} B={B} failed: {error}\n")
                record[name][str(B)] = {"error": str(error)[:200]}
                continue
            record[name][str(B)] = entry
            print(f"{name} B={B}: {entry}", flush=True)

    (REPO / "KAGOME_MULTISTART.json").write_text(
        json.dumps(record, indent=2) + "\n"
    )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
