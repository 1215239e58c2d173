"""Spatial domain decomposition of a lattice over the device mesh.

The scenario/candidate axes (`parallel/scenarios.py`, `parallel/multistart.py`)
scale the number of *simulations*; this module scales the *size of one
simulation*: block state rows shard across a 1D ``"domain"`` mesh axis, so a
lattice whose trajectory storage ``(T, 2, n_blocks, 3)`` exceeds one chip's
HBM spreads across the slice. The reference has no equivalent — its pmap
covers loading scenarios only
(/root/reference/problems/quads_kinetic_energy_static_tuning.py:473-537) and a
single simulation is confined to one device.

TPU-first design: NO manual halo code. The gridded energies (ops/grid.py,
ops/kagome_grid.py) are already pure shifted-slice programs on ``(n2, n1)``
planes, which is exactly the form XLA's SPMD partitioner (GSPMD) knows how to
partition: annotating the state sharding ``P(None, "domain", None)`` (rows of
the n2-major block axis) makes the compiler insert the one-row
collective-permute halo exchanges for the ``[:-1]``/``[1:]`` bond and contact
slices, ride them over ICI, and keep every other op local. Gradients need no
extra work either — the transpose of a halo exchange is a halo exchange, and
GSPMD partitions the backward pass the same way.

Use the XLA backends (``method="verlet"``/``"verlet_ckpt"``) under domain
sharding: a Pallas kernel is a single-device program, so the fused
``verlet_pallas`` path cannot be auto-partitioned (it would need in-kernel
remote DMAs; the XLA scan path is the multi-chip one by design).

Divisibility contract: ``n2 % n_devices == 0`` so shard boundaries align with
grid rows and every halo is exactly one row (fail-loud otherwise).
"""

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from difflexmm_tpu.parallel.mesh import make_mesh

DOMAIN_AXIS = "domain"


def domain_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1D mesh over the ``"domain"`` axis (lattice rows shard across it)."""

    return make_mesh(n_devices, axis_names=(DOMAIN_AXIS,))


def domain_state_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a ``(2, n_blocks, 3)`` state: block axis over rows."""

    return NamedSharding(mesh, P(None, DOMAIN_AXIS, None))


def domain_trajectory_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a ``(T, 2, n_blocks, 3)`` trajectory."""

    return NamedSharding(mesh, P(None, None, DOMAIN_AXIS, None))


def _validate(mesh: Mesh, n1: int, n2: int) -> None:
    n_dev = mesh.devices.size
    if tuple(mesh.axis_names) != (DOMAIN_AXIS,):
        raise ValueError(
            f"domain sharding expects a 1D ('{DOMAIN_AXIS}',) mesh, got "
            f"axes {mesh.axis_names}"
        )
    if n2 % n_dev != 0:
        raise ValueError(
            f"n2={n2} rows must divide evenly over {n_dev} devices so shard "
            f"boundaries align with grid rows (one-row halos); pad the "
            f"lattice or choose a different device count"
        )


def domain_shard_solver(
    solve_fn: Callable,
    mesh: Mesh,
    *,
    n1: int,
    n2: int,
    jit: bool = True,
) -> Callable:
    """Wrap ``solve_dynamics(state0, timepoints, control_params)`` so the
    block axis shards over the mesh's ``"domain"`` axis.

    ``control_params`` stays replicated (design arrays are tiny next to the
    trajectory; GSPMD slices them locally where the energy consumes them).
    Returns a function with the same signature whose output trajectory is
    sharded ``(T, 2, n_blocks_shard, 3)`` per device — keep reductions (e.g.
    objectives) inside jit so the gather never materializes on one chip.
    """

    _validate(mesh, n1, n2)
    state_sh = domain_state_sharding(mesh)
    replicated = NamedSharding(mesh, P())

    def sharded_solve(state0, timepoints, control_params):
        state0 = jax.lax.with_sharding_constraint(state0, state_sh)
        return solve_fn(state0, timepoints, control_params)

    if not jit:
        return sharded_solve
    return jax.jit(
        sharded_solve,
        in_shardings=(state_sh, replicated, replicated),
        out_shardings=domain_trajectory_sharding(mesh),
    )
