"""Microbenchmark: lanes-batched Pallas energy gradient vs the XLA batched
path (the multistart production backend).

Question (round-2 memory, "candidate next levers"): does laying the
multi-start batch across the 128 VPU lanes inside one Pallas program beat
XLA's own batching of the verlet_ckpt scan? This measures the dominant
per-substep cost — one energy gradient — in three forms at the flagship
plane shape (3, 16, 24) x B=128:

  a) XLA vmap over a leading batch axis (what verlet_ckpt does today),
  b) XLA with the batch on the trailing (lane) axis,
  c) a Pallas kernel with planes (…, n2, n1, B): every elementwise op is a
     dense (sublane, lane) tile, atan2 via the Mosaic polynomial.

Decision rule: c) must beat a) by >=1.5x to justify building the full
lanes-batched trajectory kernel. Writes LANES_MICROBENCH.json.

MEASURED (v5e, 2026-08-17): c) is 35x SLOWER than a) (955 us vs 27 us);
the monolithic batched grad graph also spills ~140 MB of Mosaic registers
(hence grad_split below). The trailing-axis XLA advantage seen here
(15 us vs 27 us) vanishes at the trajectory level (374 vs 374 designs/s)
— it is a dispatch-level artifact. Decision: keep the XLA verlet_ckpt
batched path; see BASELINE.md.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from difflexmm_tpu.ops import mathx
from difflexmm_tpu.ops.pallas.verlet_grid import quad_grid_energy_planes

N1, N2, B = 24, 16, 128


def make_args(key):
    ks = jax.random.split(key, 8)
    U = 0.01 * jax.random.normal(ks[0], (3, N2, N1))
    cnv = 0.1 * jax.random.normal(ks[1], (4, 2, N2, N1)) + jnp.array(
        [[1, 1], [-1, 1], [-1, -1], [1, -1]], dtype=float
    ).reshape(4, 2, 1, 1) * 5.0
    centroids = jnp.stack(
        jnp.meshgrid(15.0 * jnp.arange(N1), 15.0 * jnp.arange(N2))
    )
    ref_h = jnp.broadcast_to(jnp.array([2.0, 0.0])[:, None, None], (2, N2, N1 - 1))
    ref_v = jnp.broadcast_to(jnp.array([0.0, 2.0])[:, None, None], (2, N2 - 1, N1))
    return (U, cnv, centroids, ref_h, ref_v)


def energy(U, cnv, centroids, ref_h, ref_v):
    return quad_grid_energy_planes(
        U, cnv, centroids, ref_h, ref_v,
        120.0, 1.19, 1.5, 120.0, 1.19, 1.5,
        -0.26, -0.17, 1.5,
    )


grad_single = jax.grad(energy)


def energy_strain(U, cnv, centroids, ref_h, ref_v):
    return quad_grid_energy_planes(
        U, cnv, centroids, ref_h, ref_v,
        120.0, 1.19, 1.5, 120.0, 1.19, 1.5,
        -0.26, -0.17, 1.5, use_contact=False,
    )


def energy_contact(U, cnv, centroids, ref_h, ref_v):
    return quad_grid_energy_planes(
        U, cnv, centroids, ref_h, ref_v,
        120.0, 1.19, 1.5, 120.0, 1.19, 1.5,
        -0.26, -0.17, 1.5, include_strain=False,
    )


def grad_split(U, cnv, centroids, ref_h, ref_v):
    """Same gradient as grad_single, as a sum of per-term grads — bounds
    the Mosaic live set (the monolithic batched grad spills ~140 MB of
    registers)."""

    g1 = jax.grad(energy_strain)(U, cnv, centroids, ref_h, ref_v)
    g2 = jax.grad(energy_contact)(U, cnv, centroids, ref_h, ref_v)
    return g1 + g2


def timed(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / n


def main():
    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": "no TPU"}))
        return 2

    key = jax.random.PRNGKey(0)
    U, cnv, centroids, ref_h, ref_v = make_args(key)

    # Per-design jitter so nothing folds away.
    def batch_leading(x):
        return x[None] * (1 + 1e-3 * jnp.arange(B).reshape((B,) + (1,) * x.ndim))

    args_lead = tuple(batch_leading(x) for x in (U, cnv, centroids, ref_h, ref_v))
    args_trail = tuple(jnp.moveaxis(x, 0, -1) for x in args_lead)

    record = {}

    # a) XLA, leading batch axis (production layout).
    xla_lead = jax.jit(jax.vmap(grad_single))
    record["xla_leading_s"] = timed(xla_lead, *args_lead)

    # b) XLA, trailing (lane) batch axis.
    xla_trail = jax.jit(
        jax.vmap(grad_single, in_axes=(-1, -1, -1, -1, -1), out_axes=-1)
    )
    record["xla_trailing_s"] = timed(xla_trail, *args_trail)

    # c) Pallas, planes with B on the lanes. The gradient is computed as a
    # sum of per-term grads (strain, contact) — the monolithic batched
    # grad graph spills ~140 MB of Mosaic registers.
    def kernel(U_ref, cnv_ref, cen_ref, rh_ref, rv_ref, out_ref):
        with mathx.pallas_math():
            g = jax.vmap(
                grad_split, in_axes=(-1, -1, -1, -1, -1), out_axes=-1
            )(U_ref[:], cnv_ref[:], cen_ref[:], rh_ref[:], rv_ref[:])
        out_ref[:] = g

    pallas_grad = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(args_trail[0].shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    pallas_jit = jax.jit(pallas_grad)
    g_pal = pallas_jit(*args_trail)
    g_ref = xla_trail(*args_trail)
    err = float(
        jnp.max(jnp.abs(g_pal - g_ref)) / jnp.maximum(jnp.max(jnp.abs(g_ref)), 1e-30)
    )
    record["pallas_lanes_s"] = timed(pallas_jit, *args_trail)
    record["pallas_vs_xla_rel_err"] = err
    record["speedup_vs_leading"] = (
        record["xla_leading_s"] / record["pallas_lanes_s"]
    )
    record["speedup_vs_trailing"] = (
        record["xla_trailing_s"] / record["pallas_lanes_s"]
    )

    (REPO / "LANES_MICROBENCH.json").write_text(json.dumps(record, indent=2))
    print(json.dumps(record, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
