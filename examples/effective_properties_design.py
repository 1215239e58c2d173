"""Homogenized effective properties and inverse design of Poisson's ratio.

Three stages, all new capability with no counterpart in the reference
repository (its tooling is finite-lattice only):

1. Effective-moduli table of the rotated-square lattice vs hinge stiffness —
   the Grima & Evans rotating-square mechanism limit (Poisson's ratio -> -1)
   emerges from static condensation of the cell's micro-DOFs.
2. Homogenized stress-strain curve under biaxial compression via the
   envelope-theorem stress at the relaxed cell equilibrium
   (solver/homogenize.effective_stress ∘ solver/bloch.relax_cell).
3. Inverse design: gradient-descend the hinge shifts of a periodic quad
   cell (2x2 period) so the effective Poisson's ratio hits a prescribed
   target — the gradient flows through two nested implicit solves
   (cell relaxation adjoint + the condensation linear solve).

Run: python examples/effective_properties_design.py  (CPU-friendly, ~2 min)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from difflexmm_tpu.solver.bloch import (
    quad_periodic_cell,
    rotated_square_cell,
)
from difflexmm_tpu.solver.homogenize import (
    effective_moduli,
    effective_stress,
    engineering_constants,
)

# ---------------------------------------------------------------- stage 1
print("== rotated squares: effective constants vs hinge stiffness ==")
print(f"{'k_rot':>8} {'E_x':>10} {'nu_xy':>8} {'G_xy':>8}")
for k_rot in (1e-1, 1e-2, 1e-3, 1e-4, 1e-6):
    cell = rotated_square_cell(angle=0.25, k_stretch=1.0, k_shear=1.0, k_rot=k_rot)
    ec = engineering_constants(effective_moduli(cell))
    print(
        f"{k_rot:8.0e} {float(ec['E_x']):10.4f} "
        f"{float(ec['nu_xy']):8.4f} {float(ec['G_xy']):8.4f}"
    )
print("  (mechanism limit nu -> -1: Grima & Evans rotating squares)")

# ---------------------------------------------------------------- stage 2
print("\n== homogenized stress-strain under biaxial compression ==")
cell = rotated_square_cell(angle=0.25, k_stretch=1.0, k_shear=1.0, k_rot=1e-2)
strains = np.linspace(0.0, 0.04, 6)


@jax.jit
def sigma_xx(strain):
    F = jnp.eye(2) * (1.0 - strain)
    return effective_stress(cell, F)[0, 0]


for e in strains:
    print(f"  strain {e:6.3f}  P_xx {float(sigma_xx(e)):+9.5f}")

# ---------------------------------------------------------------- stage 3
print("\n== inverse design: target effective Poisson's ratio ==")
TARGET_NU = -0.5
p1 = p2 = 2


def nu_of(shifts):
    h, v = shifts
    c = quad_periodic_cell(
        h, v, spacing=1.0, bond_length=0.1, k_stretch=1.0, k_shear=1.0, k_rot=5e-3
    )
    C = effective_moduli(c)
    return engineering_constants(C)["nu_xy"]


def loss(shifts):
    return (nu_of(shifts) - TARGET_NU) ** 2


# Start from a mild rotated-square-like alternation so the mechanism can
# engage in either direction.
key = jax.random.PRNGKey(0)
h0 = 0.02 * jax.random.normal(key, (p1, p2, 2))
v0 = 0.02 * jax.random.normal(jax.random.fold_in(key, 1), (p1, p2, 2))
shifts = (h0, v0)

loss_and_grad = jax.jit(jax.value_and_grad(loss))
lr = 0.05
print(f"  start: nu = {float(nu_of(shifts)):+.4f}  (target {TARGET_NU:+.2f})")
for it in range(60):
    val, g = loss_and_grad(shifts)
    if float(val) < 1e-8:
        break
    shifts = jax.tree.map(lambda s, gg: s - lr * gg, shifts, g)
nu_final = float(nu_of(shifts))
print(f"  after {it + 1} iters: nu = {nu_final:+.4f}, loss = {float(val):.2e}")
assert abs(nu_final - TARGET_NU) < 0.02, "design did not reach target"
print("  design reached target Poisson's ratio via nested implicit adjoints.")
