"""Overhead-free forward/adjoint split of the flagship iteration on TPU.

The round-2 parity numbers (PARITY_TPU.json flagship timings) were taken
with one synchronous device->host readback per repetition; through the
axon tunnel that readback costs ~25 ms, comparable to the compute itself,
so the recorded `pallas_bwd_fraction: 0.33` understates the backward's
share of REAL device time. This tool separates the two by pipelining:
dispatch N iterations back-to-back and block once, so the fixed readback
amortizes away.

Feeds the adjoint-kernelization decision (VERDICT r2 weak #3 / next #6):
if the XLA replay+transpose backward dominates the pipelined iteration,
a hand-written Pallas backward kernel has headroom; if the forward kernel
dominates, it does not.

Writes ADJOINT_SPLIT.json. Run on TPU.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


def timed(fn, *args, n=20, warmup=2):
    """Pipelined: dispatch n calls, block once. Returns s/call."""

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / n


def timed_sync(fn, *args, n=5):
    """One block per call (includes the tunnel readback)."""

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    from bench import build_flagship

    record = {"device": str(jax.devices()[0])}
    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": "no TPU"}))
        return 2

    for method in ("verlet_pallas", "verlet_ckpt", "verlet"):
        optimization, design = build_flagship(method=method)
        fwd = jax.jit(optimization.objective_fn)
        vag = jax.jit(jax.value_and_grad(optimization.objective_fn))
        entry = {
            "fwd_pipelined_s": timed(fwd, design),
            "fwd_bwd_pipelined_s": timed(vag, design),
            "fwd_sync_s": timed_sync(fwd, design),
            "fwd_bwd_sync_s": timed_sync(vag, design),
        }
        entry["bwd_pipelined_s"] = (
            entry["fwd_bwd_pipelined_s"] - entry["fwd_pipelined_s"]
        )
        entry["bwd_fraction_pipelined"] = (
            entry["bwd_pipelined_s"] / entry["fwd_bwd_pipelined_s"]
        )
        record[method] = entry
        print(method, json.dumps(entry), flush=True)

    pal = record["verlet_pallas"]
    record["readback_overhead_estimate_s"] = (
        pal["fwd_sync_s"] - pal["fwd_pipelined_s"]
    )
    (REPO / "ADJOINT_SPLIT.json").write_text(json.dumps(record, indent=2))
    print(json.dumps(record, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
