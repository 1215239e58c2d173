"""Bloch dispersion analysis and gradient-based band-gap design.

Computes band diagrams for the built-in periodic cells (kagome, rotated
squares) along high-symmetry paths, then *designs* a band gap: gradient
ascent on the gap between two chosen bands of the periodic kagome lattice
with the cell shifts as design variables — a capability with no counterpart
in the reference repository (its modal tooling is finite-lattice only,
reference difflexmm/dynamics.py:189-245).

Everything (bond Hessians, the k-sweep of Hermitian eigendecompositions,
and the gradient of the gap through them) runs as a handful of jitted,
batched device computations.

Run: python examples/dispersion_design.py  (CPU-friendly, ~1 min)
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
    band_structure,
    frequencies,
    high_symmetry_path,
    kagome_periodic_cell,
    reciprocal_basis,
    rotated_square_cell,
)

OUT = pathlib.Path(__file__).resolve().parent / "out"
OUT.mkdir(exist_ok=True)


def kagome_path(n=24):
    """Gamma - M - K - Gamma for the default (60-degree) kagome basis."""

    cell = kagome_periodic_cell()
    b = reciprocal_basis(cell.direct_basis)
    gamma = np.zeros(2)
    m = np.asarray(b[0]) / 2
    k_pt = np.asarray(b[0] + b[1]) / 3
    return high_symmetry_path([gamma, m, k_pt, gamma], n)


def plot_bands(dist, omega, ticks, labels, title, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from difflexmm_tpu.plotting import plot_band_structure

    ax = plot_band_structure(
        dist, omega, corner_ticks=ticks, corner_labels=labels
    )
    ax.set_title(title)
    fig = ax.figure
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    print(f"wrote {path}")


def main():
    # 1. Band diagram of the regular kagome and a shifted design.
    ks, dist, ticks = kagome_path()
    labels = ["G", "M", "K", "G"]
    for name, shifts in [
        ("regular", jnp.zeros((3, 2))),
        ("shifted", jnp.array([[0.08, 0.0], [-0.04, 0.07], [-0.04, -0.07]])),
    ]:
        cell = kagome_periodic_cell(shifts=shifts)
        omega = frequencies(band_structure(cell, ks))
        plot_bands(
            dist, omega, ticks, labels,
            f"Kagome bands ({name})", OUT / f"kagome_bands_{name}.png",
        )

    # 2. Rotated squares: the angle tunes every branch.
    s = 1.0
    rs_path = high_symmetry_path(
        [[0.0, 0.0], [np.pi / s, 0.0], [np.pi / s, np.pi / s], [0.0, 0.0]], 24
    )
    for angle in (0.0, 0.35):
        cell = rotated_square_cell(angle, spacing=s, bond_length=0.1,
                                   k_stretch=1.0, k_shear=0.02, k_rot=1e-3)
        omega = frequencies(band_structure(cell, rs_path[0]))
        plot_bands(
            rs_path[1], omega, rs_path[2], ["G", "X", "M", "G"],
            f"Rotated squares, angle={angle}",
            OUT / f"rotated_square_bands_{angle:.2f}.png",
        )

    # 3. Inverse design: the regular kagome's optical bands 2 and 3 overlap
    # (their gap is negative, ~-27 in omega^2 units); open a full gap by
    # gradient ascent on the cell shifts.
    ks_opt = ks[:: max(1, len(ks) // 40)]  # subsample the path for speed
    lo_band, hi_band = 2, 3

    @jax.jit
    @jax.value_and_grad
    def gap(shifts):
        omega_sq = band_structure(kagome_periodic_cell(shifts=shifts), ks_opt)
        # Softmin/softmax keep the objective smooth across band crossings.
        tau = 1.0
        top_of_lo = tau * jax.scipy.special.logsumexp(
            omega_sq[:, lo_band] / tau
        )
        bottom_of_hi = -tau * jax.scipy.special.logsumexp(
            -omega_sq[:, hi_band] / tau
        )
        return bottom_of_hi - top_of_lo

    shifts = jnp.zeros((3, 2))
    lr = 0.004  # normalized-gradient ascent with a bound box
    for it in range(60):
        value, grad = gap(shifts)
        step = grad / (jnp.linalg.norm(grad) + 1e-12)
        shifts = jnp.clip(shifts + lr * step, -0.12, 0.12)
        if it % 10 == 0 or it == 59:
            print(f"iter {it:3d}  gap(omega^2) = {float(value):+.5f}")

    cell = kagome_periodic_cell(shifts=shifts)
    omega = frequencies(band_structure(cell, ks))
    plot_bands(
        dist, omega, ticks, labels,
        "Kagome bands (gap-optimized)", OUT / "kagome_bands_optimized.png",
    )
    final_gap = float(gap(shifts)[0])
    print(f"optimized shifts:\n{np.asarray(shifts)}")
    print(f"final smooth gap (omega^2 units): {final_gap:+.5f}")

    # 4. Strain tuning: dispersion about the RELAXED precompressed state.
    # relax_cell solves the cell-periodic equilibrium under the applied
    # deformation gradient (the auxetic counter-rotation), so the bands are
    # those of the actually-deformed lattice, not a naive affine map.
    from difflexmm_tpu.solver.bloch import relax_cell

    rs_cell = rotated_square_cell(0.25, spacing=s, bond_length=0.1,
                                  k_stretch=1.0, k_shear=0.3, k_rot=0.05)
    for strain in (0.0, 0.05, 0.10):
        F = (1.0 - strain) * jnp.eye(2)
        u = relax_cell(rs_cell, affine=F)
        assert bool(jnp.all(jnp.isfinite(u))), "cell relaxation stalled"
        omega = frequencies(
            band_structure(rs_cell, rs_path[0], displacement=u, affine=F)
        )
        plot_bands(
            rs_path[1], omega, rs_path[2], ["G", "X", "M", "G"],
            f"Rotated squares under {strain:.0%} biaxial compression "
            f"(rot {float(u[0, 2]):+.3f})",
            OUT / f"rotated_square_bands_strain_{strain:.2f}.png",
        )
        print(f"strain {strain:.0%}: mechanism rotation "
              f"{float(u[0, 2]):+.4f} rad, "
              f"top band max {float(omega.max()):.4f}")


if __name__ == "__main__":
    main()
