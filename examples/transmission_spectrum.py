"""Transmission spectrum of a finite lattice vs its Bloch band structure.

Cross-validates the two linear-analysis modules that go beyond the
reference repository (which extracts transmission from time-domain runs
only): the infinite-lattice Bloch gap computed by
:mod:`difflexmm_tpu.solver.bloch` must show up as a transmission dip in the
finite-strip frequency response computed by
:mod:`difflexmm_tpu.solver.frequency` — both built from the same autodiff
energy Hessians, so agreement is a real consistency check, not a tautology.

A rotated-square strip (angle 0.35, stiff ligaments) is force-driven on its
left column over a frequency sweep; the rms right-column amplitude drops by
~9 decades inside the Bloch gap between bands 4 and 5.

Run: python examples/transmission_spectrum.py  (CPU, ~1 min)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from difflexmm_tpu.geometry import RotatedSquareGeometry
from difflexmm_tpu.ops.assembly import build_strain_energy
from difflexmm_tpu.ops.bonds import ligament_energy_linearized
from difflexmm_tpu.solver.bloch import (
    band_structure,
    frequencies,
    reciprocal_basis,
    rotated_square_cell,
)
from difflexmm_tpu.solver.frequency import harmonic_response, transmission
from difflexmm_tpu.utils import (
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)

OUT = pathlib.Path(__file__).resolve().parent / "out"
OUT.mkdir(exist_ok=True)

ANGLE = 0.35
STIFF = dict(k_stretch=1.0, k_shear=1.0, k_rot=1.0)


def bloch_gap():
    """Full-BZ band extrema for the infinite lattice at the same design."""

    cell = rotated_square_cell(ANGLE, **STIFF)
    b = reciprocal_basis(cell.direct_basis)
    frac = jnp.linspace(-0.5, 0.5, 25)
    ks = jnp.stack(jnp.meshgrid(frac, frac), -1).reshape(-1, 2) @ b
    omega = np.asarray(frequencies(band_structure(cell, ks)))
    gaps = [
        (float(omega[:, j].max()), float(omega[:, j + 1].min()))
        for j in range(omega.shape[1] - 1)
        if omega[:, j + 1].min() > omega[:, j].max()
    ]
    return max(gaps, key=lambda g: g[1] - g[0])


def finite_strip_transmission(omegas, n1_cells=8, n2_cells=3, damping=0.05):
    geo = RotatedSquareGeometry(n1_cells, n2_cells, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(ANGLE), cnv(ANGLE)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(
                STIFF["k_stretch"], STIFF["k_shear"], STIFF["k_rot"], rbv()
            ),
            density=1.0,
            damping=damping,
        ),
        constraint_params=dict(),
    )
    energy = build_strain_energy(bonds(), ligament_energy_linearized)
    xs = np.asarray(bc(ANGLE))[:, 0]
    left = np.where(xs < xs.min() + 0.6)[0]
    right = np.where(xs > xs.max() - 0.6)[0]
    forcing = jnp.zeros((geo.n_blocks, 3)).at[jnp.asarray(left), 0].set(1.0)
    u = harmonic_response(
        jnp.zeros((geo.n_blocks, 3)), geo, energy, cp, forcing, omegas,
        damped_blocks=np.arange(geo.n_blocks),
    )
    return transmission(u, input_blocks=left, output_blocks=right)


def main():
    gap_lo, gap_hi = bloch_gap()
    print(f"Bloch gap (infinite lattice): omega in [{gap_lo:.3f}, {gap_hi:.3f}]")

    omegas = jnp.linspace(0.3, 10.0, 80)
    trans = np.asarray(finite_strip_transmission(omegas))

    in_gap = (np.asarray(omegas) > gap_lo) & (np.asarray(omegas) < gap_hi)
    print(f"passband max T = {trans[~in_gap].max():.3e}")
    print(f"in-gap    max T = {trans[in_gap].max():.3e}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.5, 4))
    ax.axvspan(gap_lo, gap_hi, color="0.9", label="Bloch band gap")
    ax.semilogy(np.asarray(omegas), trans, lw=1.4)
    ax.set_xlabel("drive frequency omega")
    ax.set_ylabel("transmission |out| / |in|")
    ax.set_title("Finite-strip transmission vs infinite-lattice gap")
    ax.legend()
    fig.tight_layout()
    path = OUT / "transmission_spectrum.png"
    fig.savefig(path, dpi=150)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
