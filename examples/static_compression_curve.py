"""Quasi-static force-displacement curve via the Newton static solver.

Compresses a rotated-square lattice (contact barrier active) through a
displacement ramp and records the boundary reaction force at each load
step — the curve a universal testing machine measures. Each equilibrium is
a warm-started Newton solve (`difflexmm_tpu.solver.statics`); the whole
ramp runs inside one `lax.scan`, and the design gradient of the curve
costs one adjoint solve per load step via the implicit function theorem.

The reference repository can only produce this curve by integrating
heavily damped dynamics to steady state for every load level (reference
problems/hinge_characterization.py:39-132); the same-curve damped-dynamics
route is timed here for comparison.

Run: python examples/static_compression_curve.py  (CPU, ~2 min)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from difflexmm_tpu.geometry import RotatedSquareGeometry
from difflexmm_tpu.ops.assembly import build_strain_energy, combine_block_energies
from difflexmm_tpu.ops.bonds import ligament_energy
from difflexmm_tpu.ops.contact import build_contact_energy
from difflexmm_tpu.solver import setup_dynamic_solver, setup_static_solver
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)

OUT = pathlib.Path(__file__).resolve().parent / "out"
OUT.mkdir(exist_ok=True)

ANGLE = 0.25


def build(n1_cells=4, n2_cells=3, damping=0.0):
    geo = RotatedSquareGeometry(n1_cells, n2_cells, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(ANGLE), cnv(ANGLE)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
            density=1.0,
            damping=damping,
            contact_params=ContactParams(
                k_contact=1.0, min_angle=0.08, cutoff_angle=0.6
            ),
        ),
        constraint_params=dict(squeeze=1.0),
    )
    energy = combine_block_energies(
        build_strain_energy(bonds(), ligament_energy),
        build_contact_energy(bonds()),
    )
    left = np.arange(0, geo.n_blocks, geo.n1_blocks)
    right = np.arange(geo.n1_blocks - 1, geo.n_blocks, geo.n1_blocks)
    pairs = np.concatenate(
        [np.array([[b, d] for b in left for d in range(3)]),
         np.stack([right, np.zeros_like(right)], 1)]
    )
    n_driven = len(right)

    def drive(t, squeeze):
        values = jnp.zeros(len(pairs))
        return values.at[-n_driven:].set(-squeeze * t)

    return geo, energy, cp, pairs, drive, right


def main():
    geo, energy, cp, pairs, drive, right = build()
    solve = setup_static_solver(
        geo, energy, constrained_block_DOF_pairs=pairs, constrained_DOFs_fn=drive
    )

    squeezes = jnp.linspace(0.0, 0.30, 31)

    @jax.jit
    def ramp(cp):
        def step(u_prev, s):
            u = solve(u_prev, s, cp)  # warm start from the previous level
            force = -solve.reactions(u, s, cp)[-len(right):].sum()
            return u, (force, jnp.max(jnp.abs(solve.residual(u, s, cp))))

        _, (forces, residuals) = jax.lax.scan(
            step, jnp.zeros((geo.n_blocks, 3)), squeezes
        )
        return forces, residuals

    t0 = time.time()
    forces, residuals = jax.block_until_ready(ramp(cp))
    t_static = time.time() - t0
    print(f"static ramp: {len(squeezes)} equilibria in {t_static:.2f} s "
          f"(max residual {float(residuals.max()):.2e})")

    # Same endpoint via the damped-dynamics route the reference uses.
    geo_d, energy_d, cp_d, pairs_d, drive_d, _ = build(damping=2.0)
    solver_dyn = setup_dynamic_solver(
        geo_d, energy_d, constrained_block_DOF_pairs=pairs_d,
        constrained_DOFs_fn=lambda t, squeeze: drive_d(jnp.minimum(t / 40.0, 1.0), squeeze),
        damped_blocks=np.arange(geo_d.n_blocks),
        method="verlet", n_substeps=60,
    )
    cp_end = cp_d._replace(constraint_params=dict(squeeze=float(squeezes[-1])))
    t0 = time.time()
    sol = jax.block_until_ready(
        solver_dyn(jnp.zeros((2, geo_d.n_blocks, 3)), jnp.linspace(0, 80.0, 40), cp_end)
    )
    t_dynamic = time.time() - t0
    u_dyn = sol[-1, 0]
    u_static = solve(jnp.zeros((geo.n_blocks, 3)), float(squeezes[-1]), cp)
    drift = float(jnp.max(jnp.abs(u_dyn - u_static)))
    print(f"damped-dynamics endpoint: {t_dynamic:.2f} s, "
          f"|u_dyn - u_static|_inf = {drift:.2e}")
    print(f"speedup at matched endpoint: {t_dynamic / (t_static / len(squeezes)):.0f}x "
          f"per equilibrium")

    # Differentiable: sensitivity of the curve's peak force to the angle.
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(np.asarray(squeezes), np.asarray(forces), marker="o", ms=3)
    ax.set_xlabel("imposed end displacement")
    ax.set_ylabel("boundary reaction force")
    ax.set_title("Static compression curve (contact active)")
    fig.tight_layout()
    path = OUT / "static_compression_curve.png"
    fig.savefig(path, dpi=150)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
