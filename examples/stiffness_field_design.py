"""Inverse design of a per-bond stiffness FIELD (fixed geometry).

The reference's problem scripts optimize geometry only, but the library
capability both there and here is "gradients w.r.t. everything in
ControlParams" (reference difflexmm/dynamics.py:60-186 docstring; this
framework: solver/dynamics.py). This example demonstrates the
non-geometric design axis end-to-end: on a FIXED rotated-square quad
lattice, optimize the per-ligament shear stiffness (log-parametrized, so
positivity is built in) to focus pulse energy on a target patch —
a graded-stiffness lens instead of a shape-morphed one.

The per-bond stiffness rides the same fast paths as the geometry design:
the gridded energy splits (n_bonds,) stiffness into horizontal/vertical
bond planes (ops/grid.py:_grid_bond_params) and the fused Pallas kernel
takes them as VMEM-resident plane inputs (ops/pallas/verlet_grid.py fixed
leaves), so value+grad w.r.t. stiffness runs at kernel speed.

Run:

    python examples/stiffness_field_design.py [n_iterations] [out_dir] [n1xn2]
"""

import json
import sys
from pathlib import Path

# Self-bootstrap so `python examples/<name>.py` works from anywhere.
# (Do NOT use PYTHONPATH: the session's TPU-plugin registration breaks
# when PYTHONPATH is set.)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from difflexmm_tpu.geometry import QuadGeometry
from difflexmm_tpu.geometry.polygon import compute_inertia
from difflexmm_tpu.models import base
from difflexmm_tpu.ops.grid import build_quad_grid_energy
from difflexmm_tpu.ops.observables import kinetic_energy
from difflexmm_tpu.solver import setup_dynamic_solver
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
    save_data,
)


def build(n1: int = 24, n2: int = 16, method: str = None):
    """Returns (objective_fn(log_k_shear), n_bonds, geometry info dict)."""

    if method is None:
        method = "verlet_pallas" if jax.default_backend() == "tpu" else "verlet"

    geometry = QuadGeometry(n1_blocks=n1, n2_blocks=n2, spacing=1.0, bond_length=0.1)
    bc_fn, cnv_fn, bond_fn, rbv_fn = geometry.get_parametrization()
    bonds = bond_fn()
    n_bonds = len(bonds)

    # Fixed geometry: the canonical rotated-square initial guess.
    shifts = geometry.get_design_from_rotated_square(0.25)
    centroids = bc_fn(*shifts)
    node_vectors = cnv_fn(*shifts)
    ref_vectors = rbv_fn()

    driven_pairs, drive_mask = base.driven_side_pairs(
        n1, n2, max(2, n2 // 4), "left"
    )
    clamped_pairs = base.clamped_corner_pairs(n1, n2, 2 if n2 >= 10 else 1)
    base.check_disjoint_constrained_pairs(
        driven=driven_pairs, clamped_corners=clamped_pairs
    )
    pairs = np.concatenate([driven_pairs, clamped_pairs])
    drive_vec = jnp.asarray(
        np.concatenate([drive_mask, np.zeros(len(clamped_pairs))])
    )

    def drive_fn(t, amplitude, loading_rate):
        return base.pulse(t, amplitude, loading_rate) * drive_vec

    energy = build_quad_grid_energy(n1, n2, use_contact=True)
    solve = setup_dynamic_solver(
        geometry=geometry,
        energy_fn=energy,
        constrained_block_DOF_pairs=pairs,
        constrained_DOFs_fn=drive_fn,
        damped_blocks=np.arange(geometry.n_blocks),
        method=method,
        n_substeps=10,
        quad_grid=dict(n1=n1, n2=n2, linearized=False, use_contact=True)
        if method in ("verlet_pallas", "verlet_ckpt")
        else None,
    )

    target = base.target_patch_ids(n1, n2, (3, 3) if n2 >= 10 else (2, 2), (0, 0))
    timepoints = jnp.linspace(0.0, 20.0, 100)
    state0 = jnp.zeros((2, geometry.n_blocks, 3))
    inertia = compute_inertia(node_vectors, 1.0)

    k_shear_base = 0.02

    def objective_fn(log_k_shear):
        # Positive by construction; log-parametrization also equalizes the
        # gradient scale across decades of stiffness.
        k_shear = k_shear_base * jnp.exp(log_k_shear)
        cp = ControlParams(
            geometrical_params=GeometricalParams(centroids, node_vectors),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(
                    k_stretch=1.0,
                    k_shear=k_shear,
                    k_rot=1e-3,
                    reference_vector=ref_vectors,
                ),
                density=1.0,
                damping=0.02,
                contact_params=ContactParams(
                    k_contact=1e-3,
                    min_angle=-15 * jnp.pi / 180,
                    cutoff_angle=-10 * jnp.pi / 180,
                ),
            ),
            constraint_params=dict(amplitude=0.2, loading_rate=0.5),
        )
        solution = solve(state0, timepoints, cp)
        return kinetic_energy(solution[:, 1, target, :], inertia[target])

    return objective_fn, n_bonds, dict(
        geometry=geometry, centroids=centroids, node_vectors=node_vectors,
        target=target, method=method,
    )


def main(n_iterations: int = 60, out_dir: str = "out", n1: int = 24, n2: int = 16):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    objective_fn, n_bonds, info = build(n1, n2)
    print(f"{n_bonds} bonds, method={info['method']}")

    log_k = jnp.zeros(n_bonds)  # start uniform at the base stiffness
    optimizer = optax.adam(0.1)
    opt_state = optimizer.init(log_k)
    value_and_grad = jax.jit(jax.value_and_grad(objective_fn))

    history = []
    for it in range(n_iterations):
        value, grad = value_and_grad(log_k)
        # Maximize: ascend the objective.
        updates, opt_state = optimizer.update(
            jax.tree.map(jnp.negative, grad), opt_state
        )
        log_k = optax.apply_updates(log_k, updates)
        # Keep stiffness within two decades of the base value (fabricable).
        log_k = jnp.clip(log_k, -2.3, 2.3)
        history.append(float(value))
        if it % 10 == 0 or it == n_iterations - 1:
            print(f"iter {it:>3}: target KE {history[-1]:.5e}")

    final = float(value_and_grad(log_k)[0])
    summary = dict(
        n_bonds=n_bonds, n_iterations=n_iterations, lattice=[n1, n2],
        initial_objective=history[0], final_objective=final,
        gain=final / history[0],
    )
    save_data(out / "stiffness_design.pkl", dict(log_k_shear=log_k, history=history))
    (out / "stiffness_design.json").write_text(json.dumps(summary, indent=2))
    print(f"target KE {history[0]:.5e} -> {final:.5e} "
          f"({summary['gain']:.1f}x) over {n_iterations} iterations; "
          f"artifacts in {out}/")


if __name__ == "__main__":
    argv = sys.argv[1:4]
    n1, n2 = (int(v) for v in argv[2].split("x")) if len(argv) > 2 else (24, 16)
    main(
        n_iterations=int(argv[0]) if argv else 60,
        out_dir=argv[1] if len(argv) > 1 else "out",
        n1=n1, n2=n2,
    )
