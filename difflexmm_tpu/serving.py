"""Ahead-of-time export for production serving.

The reference deploys nothing — every run re-traces and re-compiles the
Python pipeline in-process. On TPU the natural production shape is
different: trace + lower ONCE, serialize the StableHLO artifact, and serve
it from a process that needs only ``jax``/``jaxlib`` (no framework code, no
problem setup, no retracing). This module wraps :mod:`jax.export` for that
workflow:

- :func:`export_fn` — lower a jitted framework function (an objective, a
  ``value_and_grad``, a full ``solve``) for one or more target platforms.
  Default: the current backend. Pass ``platforms=("tpu", "cpu")`` for an
  artifact built on a CPU dev box that runs unchanged on the serving TPU
  — valid for the XLA backends (``verlet``/``verlet_ckpt``/``rk4``);
  programs containing fused Pallas kernels (``verlet_pallas``) lower for
  TPU only, so export those with ``platforms=("tpu",)``.
- :func:`save_exported` / :func:`load_exported` — byte-stable round trip
  to disk. Loading returns a plain callable on jax arrays; the original
  pytree structure of inputs/outputs (including the framework's NamedTuple
  containers, registered below) is preserved by the artifact itself.

Serving artifacts are versioned by jax's calling convention; a mismatch
fails loudly at deserialization rather than silently miscomputing.
"""

from pathlib import Path
from typing import Callable, Optional, Sequence, Union

import jax
from jax import export as jax_export

from difflexmm_tpu.utils import types as _types

# NamedTuple pytree containers must be registered once per process before
# they can cross the serialization boundary (jax.export serializes the
# in/out treedefs along with the StableHLO).
_REGISTERED = False


def _register_containers() -> None:
    global _REGISTERED
    if _REGISTERED:
        return
    for cls in (
        _types.SolutionData,
        _types.EigenmodeData,
        _types.GeometricalParams,
        _types.LigamentParams,
        _types.StretchingTorsionalSpringParams,
        _types.ContactParams,
        _types.MagneticParams,
        _types.MechanicalParams,
        _types.ControlParams,
    ):
        try:
            jax_export.register_namedtuple_serialization(
                cls, serialized_name=f"difflexmm_tpu.{cls.__name__}"
            )
        except ValueError:
            # Already registered (idempotent under re-import / reload).
            pass
    _REGISTERED = True


def export_fn(
    fn: Callable,
    *example_args,
    platforms: Optional[Sequence[str]] = None,
    static_argnums: Sequence[int] = (),
):
    """Lower ``fn`` at ``example_args`` into a serializable artifact.

    Args:
        fn: any jit-compatible framework function (already-jitted is fine).
        example_args: concrete arrays/pytrees fixing input shapes+dtypes.
        platforms: lowering targets; default = the current backend only.
            Multi-platform (e.g. ``("tpu", "cpu")``) works for pure-XLA
            programs; Pallas-kernel programs are TPU-only.
        static_argnums: forwarded to ``jax.jit`` for non-array arguments.

    Returns:
        A ``jax.export.Exported``; call it via ``.call(*args)``, inspect
        ``.in_avals`` / ``.platforms``, serialize with
        :func:`save_exported`.
    """

    _register_containers()
    if isinstance(fn, jax.stages.Wrapped):
        if static_argnums:
            raise ValueError(
                "static_argnums cannot be applied to an already-jitted "
                "function (it would be silently ignored); pass the plain "
                "function, or bake static_argnums into your own jax.jit."
            )
        jitted = fn
    else:
        jitted = jax.jit(fn, static_argnums=tuple(static_argnums))
    return jax_export.export(
        jitted, platforms=tuple(platforms) if platforms is not None else None
    )(*example_args)


def save_exported(exported, path: Union[str, Path]) -> Path:
    """Write the serialized artifact to ``path`` (atomic rename)."""

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(exported.serialize())
    tmp.replace(path)
    return path


def load_exported(path: Union[str, Path]) -> Callable:
    """Load an artifact; returns a callable with the exported signature.

    The callable runs under the current default backend, which must be one
    of the artifact's lowering platforms. The ``Exported`` object itself is
    available as the ``.exported`` attribute for introspection.
    """

    _register_containers()
    exported = jax_export.deserialize(Path(path).read_bytes())

    def call(*args):
        return exported.call(*args)

    call.exported = exported
    return call


def export_objective_and_grad(
    objective_fn: Callable,
    example_design,
    platforms: Optional[Sequence[str]] = None,
):
    """Convenience: export ``value_and_grad(objective_fn)`` at a design.

    This is the one function an optimization-serving host needs: the
    returned artifact maps ``design -> (objective, d objective/d design)``
    with the whole dynamic simulation and its adjoint baked into a single
    compiled program.
    """

    return export_fn(
        jax.value_and_grad(objective_fn), example_design, platforms=platforms
    )
