"""Capture a jax.profiler (Perfetto) trace of the flagship hot paths.

Produces device+host traces for the three production paths — single-design
fwd+grad on the Pallas kernel, the batched multi-start step, and one full
constrained MMA iteration — so kernel/HBM behavior can be inspected in
Perfetto (ui.perfetto.dev) or TensorBoard's profile plugin. Run on the TPU:

    python tools/profile_flagship.py [out_dir]

Writes one trace directory per phase under ``out_dir`` (default
``/tmp/difflexmm_traces``) and prints the wall-clock of each phase.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from difflexmm_tpu.utils.observability import trace


def main(out_dir: str = "/tmp/difflexmm_traces") -> None:
    from bench import build_flagship

    out = Path(out_dir)
    print(f"profiling on {jax.devices()[0]}; traces -> {out}/")

    # Phase 1: single-design fwd+grad, fused Pallas kernel.
    optimization, design = build_flagship(method="verlet_pallas")
    step = jax.jit(jax.value_and_grad(optimization.objective_fn))
    jax.block_until_ready(step(design))  # compile outside the trace
    with trace("single fwd+grad (verlet_pallas)", trace_dir=out / "single"):
        for _ in range(5):
            value, grad = step(design)
        jax.block_until_ready((value, grad))

    # Phase 2: batched multi-start step (XLA lanes backend).
    optimization_b, design_b = build_flagship(method="verlet_ckpt")
    batched = jax.jit(
        jax.vmap(jax.value_and_grad(optimization_b.objective_fn))
    )
    designs = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (128,) + x.shape), design_b
    )
    jax.block_until_ready(batched(designs))
    with trace("B=128 multi-start step (verlet_ckpt)", trace_dir=out / "batched"):
        values, grads = batched(designs)
        jax.block_until_ready(values)

    # Phase 3: one full constrained MMA iteration (objective + ~4,400
    # constraint jacobians + on-device dual solve). NOTE: unlike the other
    # phases this one traces cold, so the timeline includes the constraint
    # jacobians' XLA compilation (~2-3 min through the remote-compile
    # tunnel); the steady-state iteration is ~0.3-0.5 s (bench_end_to_end).
    with trace("constrained MMA iteration", trace_dir=out / "mma"):
        optimization.run_optimization_mma(
            design, n_iterations=1,
            lower_bound=-0.3, upper_bound=0.3,
            min_void_angle=0.0, min_block_angle=0.0, min_edge_length=0.05,
            move_limit=0.08, verbose=False,
        )

    print("done; open a trace with: perfetto or tensorboard --logdir <dir>")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/difflexmm_traces")
