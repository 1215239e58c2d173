"""Parameter pytrees and solution containers.

These containers thread every differentiable quantity through the solver so
that ``jax.grad`` can differentiate a simulation with respect to geometry,
stiffness, damping, loading, and initial conditions alike.

API parity: mirrors the parameter surface of the reference implementation
(``difflexmm/utils.py:9-163`` in bertoldi-collab/DifFlexMM) — same field
names and shapes — while the internals of this framework are TPU-native.
All containers are NamedTuples, hence automatically JAX pytrees.
"""

from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional, Union

import pickle

import jax.numpy as jnp
import numpy as np


class SolutionData(NamedTuple):
    """Dynamic solution bundled with the geometry that produced it.

    Attrs:
        block_centroids: (n_blocks, 2) reference centroids.
        centroid_node_vectors: (n_blocks, n_npb, 2) centroid-to-node vectors.
        bond_connectivity: (n_bonds, 2) node index pairs.
        timepoints: (n_timepoints,) output times.
        fields: (n_timepoints, 2, n_blocks, 3) displacement/velocity history.
    """

    block_centroids: Any
    centroid_node_vectors: Any
    bond_connectivity: Any
    timepoints: Any
    fields: Any


class EigenmodeData(NamedTuple):
    """Modal solution bundled with the geometry that produced it.

    Attrs:
        block_centroids: (n_blocks, 2) reference centroids.
        centroid_node_vectors: (n_blocks, n_npb, 2) centroid-to-node vectors.
        eigenvalues: (n_modes,) squared angular frequencies.
        fields: (n_modes, n_blocks, 3) mode shapes.
    """

    block_centroids: Any
    centroid_node_vectors: Any
    eigenvalues: Any
    fields: Any


SolutionType = Union[SolutionData, EigenmodeData]


class GeometricalParams(NamedTuple):
    """Differentiable geometry data consumed by the energy assembly.

    Attrs:
        block_centroids: (n_blocks, 2).
        centroid_node_vectors: (n_blocks, n_npb, 2).
    """

    block_centroids: Any
    centroid_node_vectors: Any


class LigamentParams(NamedTuple):
    """Finite-length elastic ligament bond parameters.

    Attrs:
        k_stretch, k_shear, k_rot: scalar or (n_bonds,) stiffnesses.
        reference_vector: (n_bonds, 2) reference bond vectors.
    """

    k_stretch: Any
    k_shear: Any
    k_rot: Any
    reference_vector: Any


class StretchingTorsionalSpringParams(NamedTuple):
    """Zero-length stretching + torsional spring bond parameters."""

    k_stretch: Any
    k_rot: Any


BondParams = Union[LigamentParams, StretchingTorsionalSpringParams]


class ContactParams(NamedTuple):
    """Parameters of the C^1 barrier contact energy.

    If distance-based contact is used, ``min_angle``/``cutoff_angle`` are
    interpreted as distances.
    """

    min_angle: Any
    cutoff_angle: Any
    k_contact: Any


class MagneticParams(NamedTuple):
    """Magnetic dipole parameters (extension point; see ops.magnetic)."""

    dipole_angles: Any
    dipole_strengths: Any


class MechanicalParams(NamedTuple):
    """Mechanical parameters of the system.

    Attrs:
        bond_params: bond stiffness pytree.
        density: scalar or (n_blocks,) mass density.
        inertia: optional (n_blocks, 3); computed from polygons if None.
        damping: scalar or (n_damped_blocks, 3) viscous damping coefficients.
        contact_params: optional ContactParams.
    """

    bond_params: BondParams
    density: Any
    inertia: Optional[Any] = None
    damping: Any = 0.0
    contact_params: Optional[ContactParams] = None


class ControlParams(NamedTuple):
    """Top-level parameter pytree threaded through the dynamic solver.

    Everything inside is differentiable; gradients of any simulation output
    with respect to any leaf are available via ``jax.grad``.
    """

    geometrical_params: GeometricalParams
    mechanical_params: MechanicalParams
    magnetic_params: Optional[MagneticParams] = None
    loading_params: Dict = dict()
    constraint_params: Dict = dict()


def save_data(path_or_filename: Union[str, Path], data: object) -> None:
    """Persist any (pytree-of-arrays) object via pickle, creating parents."""

    path = Path(path_or_filename)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)


class _CompatUnpickler(pickle.Unpickler):
    """Unpickler that also accepts archives written by the reference
    implementation: its containers live under the ``difflexmm.*`` module
    tree (reference difflexmm/utils.py:9-163) with the same class and
    field names as this package's, so a pickle of ``difflexmm.utils.
    SolutionData`` maps onto our :class:`SolutionData` directly. Lets a
    user switching frameworks load their existing result archives."""

    def find_class(self, module: str, name: str):
        if module == "difflexmm" or module.startswith("difflexmm."):
            replacement = globals().get(name)
            if replacement is not None:
                return replacement
            # Unknown reference class (e.g. a problems/ dataclass): retry
            # under this package's models tree before giving up.
            try:
                import importlib

                mapped = importlib.import_module(
                    module.replace("difflexmm", "difflexmm_tpu", 1)
                )
                return getattr(mapped, name)
            except (ImportError, AttributeError):
                pass
        return super().find_class(module, name)


def load_data(path_or_filename: Union[str, Path]):
    """Load an object saved with :func:`save_data` — or by the reference
    implementation (``difflexmm.*`` classes are remapped onto this
    package's same-named containers).

    Arrays inside known solution containers are cast back to jnp arrays.
    """

    with open(path_or_filename, "rb") as f:
        data = _CompatUnpickler(f).load()

    if isinstance(data, (SolutionData, EigenmodeData)):
        cls = type(data)
        return cls(*(jnp.asarray(a) if isinstance(a, np.ndarray) else a for a in data))
    return data


def is_scalar(x) -> bool:
    """True if ``x`` is a 0-d value (shape ``()``)."""

    return jnp.shape(x) == ()
