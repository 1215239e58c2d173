"""Minimal end-to-end forward simulation: a force pulse on a rotated-square
lattice, saved to a SolutionData pickle and rendered to an animation.

Equivalent workflow to the reference demo script (scripts/pulse_RS.py),
built on the TPU-native solver. Run:

    python examples/pulse_rotated_squares.py [out_dir]
"""

import sys
from pathlib import Path

# Self-bootstrap so `python examples/<name>.py` works from anywhere.
# (Do NOT use PYTHONPATH: the session's TPU-plugin registration breaks
# when PYTHONPATH is set.)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from difflexmm_tpu.geometry import RotatedSquareGeometry
from difflexmm_tpu.ops import build_strain_energy, ligament_energy
from difflexmm_tpu.solver import setup_dynamic_solver
from difflexmm_tpu.utils import (
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
    SolutionData,
    save_data,
)


def main(out_dir: str = "out") -> Path:
    geometry = RotatedSquareGeometry(n1_cells=10, n2_cells=5, spacing=1.0)
    bc, cnv, bonds, rbv = geometry.get_parametrization()
    angle = 0.25

    # Force pulse in +x on the two middle blocks of the left edge.
    rows = jnp.array([geometry.n2_blocks // 2 - 1, geometry.n2_blocks // 2])
    loaded_pairs = jnp.stack(
        [rows * geometry.n1_blocks, jnp.zeros_like(rows)], axis=1
    )

    def loading(state, t, amplitude, rate):
        return amplitude * jnp.where(
            (t > 0) & (t < 1 / rate), jnp.sin(jnp.pi * rate * t) ** 2, 0.0
        )

    solve = setup_dynamic_solver(
        geometry=geometry,
        energy_fn=build_strain_energy(bonds(), ligament_energy),
        loaded_block_DOF_pairs=loaded_pairs,
        loading_fn=loading,
        damped_blocks=jnp.arange(geometry.n_blocks),
        method="verlet",
        n_substeps=16,
    )

    control_params = ControlParams(
        geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.02, 1e-3, rbv()),
            density=1.0,
            damping=0.02,
        ),
        loading_params=dict(amplitude=0.5, rate=0.5),
    )

    timepoints = jnp.linspace(0.0, 20.0, 100)
    state0 = jnp.zeros((2, geometry.n_blocks, 3))
    fields = solve(state0, timepoints, control_params)

    out = Path(out_dir)
    solution = SolutionData(
        block_centroids=bc(angle),
        centroid_node_vectors=cnv(angle),
        bond_connectivity=bonds(),
        timepoints=timepoints,
        fields=fields,
    )
    save_data(out / "pulse_rotated_squares.pkl", solution)
    print(f"max displacement: {float(jnp.abs(fields[:, 0]).max()):.4f}")
    print(f"solution saved to {out / 'pulse_rotated_squares.pkl'}")
    return out / "pulse_rotated_squares.pkl"


if __name__ == "__main__":
    main(*sys.argv[1:2])
