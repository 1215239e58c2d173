"""Device mesh construction helpers.

The framework's multi-chip axes are *embarrassing* ones — loading scenarios,
design candidates (multi-start), parameter sweeps — so the canonical mesh is
1D over a "scenario" axis (optionally 2D scenario x candidate). Collectives
are psum-reductions of weighted objectives and their gradients over ICI;
there is no tensor/pipeline parallelism because a single simulation fits
comfortably on one chip (reference: SURVEY.md section 2.5).
"""

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


SCENARIO_AXIS = "scenario"
CANDIDATE_AXIS = "candidate"


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
