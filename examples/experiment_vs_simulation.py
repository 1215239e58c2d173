"""Experiment-vs-simulation comparison via space-time cross-correlation.

Mirrors the reference's exp/* notebooks: track block motion from a
high-speed video, drive the simulation with the measured boundary motion,
and score agreement with ``compute_space_time_xcorr``. This example builds
a synthetic "experiment" (a simulation with perturbed stiffness) so it runs
without lab data; swap ``make_experiment`` for ``tracking.track_video`` +
``blocks_motion_from_marker_paths`` on real footage.

    python examples/experiment_vs_simulation.py
"""

import sys
from pathlib import Path

# Self-bootstrap so `python examples/<name>.py` works from anywhere.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from difflexmm_tpu.models.reference_design import ForwardProblem
from difflexmm_tpu.objectives import compute_space_time_xcorr
from difflexmm_tpu.ops.mathx import interp_uniform


def make_problem(k_shear):
    return ForwardProblem(
        n1_cells=6, n2_cells=3, spacing=1.0, bond_length=0.1,
        initial_angle=0.25,
        k_stretch=1.0, k_shear=k_shear, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.2, loading_rate=0.5, input_delay=0.0,
        n_excited_blocks=2, loaded_side="left",
        simulation_time=12.0, n_timepoints=60, n_substeps=16,
        method="verlet",
    )


def space_time_field(solution) -> jnp.ndarray:
    """(space, time) field: |u| of every block over time."""

    return jnp.linalg.norm(solution.fields[:, 0, :, :2], axis=-1).T


def main() -> None:
    experiment = make_problem(k_shear=0.02)
    experiment.setup()
    exp_solution = experiment.solve()
    exp_field = space_time_field(exp_solution)

    for k_shear in (0.02, 0.05, 0.2):
        sim = make_problem(k_shear=k_shear)
        sim.setup()
        sim_field = space_time_field(sim.solve())
        # Note: xcorr is normalized by the experiment's autocorrelation peak
        # (reference convention), so it equals exactly 1 only for identical
        # fields; the relative L2 error is the symmetric discrepancy.
        xcorr, delay = compute_space_time_xcorr(exp_field, sim_field)
        rel_err = float(
            jnp.linalg.norm(sim_field - exp_field) / jnp.linalg.norm(exp_field)
        )
        print(f"k_shear={k_shear:5.2f}: space-time xcorr={float(xcorr):.4f} "
              f"delay={int(delay)} rel_L2_err={rel_err:.4f}")

    # Stage 2 — the real exp/* workflow: re-drive the simulation with the
    # MEASURED boundary motion (here, the tracked x-history of a driven
    # block) played back through the gather-free uniform-grid interpolation
    # (mathx.interp_uniform — the Pallas-kernel-compatible form, so the
    # same drive runs on method="verlet_pallas"/"verlet_ckpt" on TPU).
    t = jnp.asarray(exp_solution.timepoints)
    measured = exp_solution.fields[:, 0, experiment.driven_blocks_ids[0], 0]
    t0, dt = float(t[0]), float(t[1] - t[0])

    def playback(tt):
        return interp_uniform(tt, t0, dt, measured)

    replay = make_problem(k_shear=0.02)
    if jax.default_backend() == "tpu":
        replay.method = "verlet_pallas"
    replay.setup(excited_blocks_fn=playback)
    replay_field = space_time_field(replay.solve())
    xcorr, delay = compute_space_time_xcorr(exp_field, replay_field)
    print(f"measured-drive playback ({replay.method}): "
          f"xcorr={float(xcorr):.4f} delay={int(delay)}")

    # Stage 3 — k-omega analysis, the other standard lab comparison: both
    # fields through objectives.spectral_dispersion (2D FFT of a row's ux
    # history); matched models overlap in the transform plane too.
    from difflexmm_tpu.objectives import spectral_dispersion

    n1b = 2 * experiment.n1_cells
    mid_row = jnp.arange(n1b) + (experiment.n2_cells) * n1b  # middle block row
    dt_s = float(t[1] - t[0])
    _, _, amp_exp = spectral_dispersion(
        exp_solution.fields[:, 0, mid_row, 0], dt=dt_s, dx=1.0
    )
    overlaps = {}
    for k_shear in (0.02, 0.2):
        sim2 = make_problem(k_shear=k_shear)
        sim2.setup()
        _, _, amp_sim = spectral_dispersion(
            sim2.solve().fields[:, 0, mid_row, 0], dt=dt_s, dx=1.0
        )
        overlaps[k_shear] = float(
            jnp.sum(amp_exp * amp_sim)
            / (jnp.linalg.norm(amp_exp) * jnp.linalg.norm(amp_sim))
        )
        print(f"k-omega spectral overlap (k_shear={k_shear}): "
              f"{overlaps[k_shear]:.4f}")
    assert overlaps[0.02] > 0.99 > overlaps[0.2]


if __name__ == "__main__":
    main()
