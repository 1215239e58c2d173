"""Device mesh construction helpers.

The framework's multi-chip axes are *embarrassing* ones — loading scenarios,
design candidates (multi-start), parameter sweeps — so the canonical mesh is
1D over a "scenario" axis (optionally 2D scenario x candidate). Collectives
are psum-reductions of weighted objectives and their gradients over ICI;
there is no tensor/pipeline parallelism because a single simulation fits
comfortably on one chip (reference: SURVEY.md section 2.5). (For lattices
that DON'T fit one chip, `parallel/domain.py` shards the block rows of a
single simulation instead.)

Scaling beyond one host: call :func:`init_distributed` once at program
start on every host of the fleet, then build the mesh exactly as on one
host — after ``jax.distributed.initialize`` the ``jax.devices()`` list
spans all hosts, so :func:`make_mesh` returns a global mesh and the same
``shard_map`` objectives run unchanged. The cross-host (DCN) traffic is
only the psum of scalar objectives and design-sized gradients — a few KB
per iteration for the flagship's 1,616 design variables — so sweep
throughput scales essentially linearly with hosts; every simulation stays
on its own chip and all heavy traffic stays on ICI.
"""

import os
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


SCENARIO_AXIS = "scenario"
CANDIDATE_AXIS = "candidate"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-host fleet (idempotent); returns ``jax.process_count()``.

    On TPU pods all three arguments auto-detect from the environment; on
    other platforms (or CPU rehearsal fleets) pass them explicitly. Safe to
    call unconditionally: if the distributed runtime is already up (or this
    is a deliberately single-process run and no coordinator is given), it
    is a no-op. Call BEFORE the first device query — device lists are
    cached at backend initialization.
    """

    if _distributed_client_up():
        return jax.process_count()
    kwargs = {
        name: value
        for name, value in (
            ("coordinator_address", coordinator_address),
            ("num_processes", num_processes),
            ("process_id", process_id),
        )
        if value is not None
    }
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as err:
        # Two benign shapes: a repeated call ("already initialized"), and
        # an argless call AFTER the backend came up in a plain
        # single-process session (jax refuses to initialize late). Both
        # no-op; anything else — including a too-late call on a host that
        # looks like part of a fleet — re-raises.
        if "already" in str(err).lower() or _distributed_client_up():
            pass
        elif not kwargs and not _fleet_markers():
            pass
        else:
            raise
    except ValueError:
        # Nothing to auto-detect and no explicit coordinator. If this
        # process shows signs of BEING part of a fleet (cluster env
        # markers), degrading to single-process would be a silent
        # split-brain — one host sweeping alone while the rest hang in
        # collectives. Fail loudly there; otherwise it's a plain
        # single-process run and we proceed with the local devices.
        if kwargs:
            raise
        if _fleet_markers():
            raise RuntimeError(
                "jax.distributed auto-detection failed but cluster "
                f"environment markers are present ({_fleet_markers()}); "
                "refusing to fall back to single-process (split-brain "
                "risk). Pass coordinator_address/num_processes/process_id "
                "explicitly."
            )
    return jax.process_count()


def _fleet_markers() -> list:
    """Env-var evidence that this process belongs to a multi-host fleet."""

    markers = [
        name
        for name in (
            "SLURM_JOB_ID",
            "OMPI_COMM_WORLD_SIZE",
            "PMI_SIZE",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "CLOUD_TPU_TASK_ID",
        )
        if os.environ.get(name)
    ]
    # A single-hostname TPU_WORKER_HOSTNAMES is just a single-host
    # attachment (this testbed sets it); only a multi-host list marks a
    # fleet.
    if "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""):
        markers.append("TPU_WORKER_HOSTNAMES")
    return markers


def _distributed_client_up() -> bool:
    """True iff jax's distributed runtime is already initialized.

    Best-effort introspection (the state object is internal; a jax upgrade
    that moves it degrades this to False, in which case re-entry relies on
    the RuntimeError message check above)."""

    try:
        from jax._src.distributed import global_state

        return global_state.client is not None
    except Exception:
        return False


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (SCENARIO_AXIS,),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Create a device mesh over the first ``n_devices`` devices.

    Args:
        n_devices: number of devices (default: all available).
        axis_names: mesh axis names; default 1D scenario axis.
        shape: mesh shape; default puts all devices on the first axis.
    """

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"Requested {n_devices} devices but only {len(devices)} available."
        )
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices[:n_devices]).reshape(shape)
    return Mesh(dev_array, axis_names)


def scenario_sharding(mesh: Mesh, axis_name: str = SCENARIO_AXIS) -> NamedSharding:
    """Sharding placing the leading (scenario) axis across the mesh."""

    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (e.g. for shared design variables)."""

    return NamedSharding(mesh, P())
