"""AOT export / serving round trips (difflexmm_tpu/serving.py).

The serving contract: lower once, serialize, and run the artifact from a
process that holds no framework code — values and gradients must match the
live-traced pipeline to ULP-level accuracy (same XLA program; the AOT
loader may pick marginally different codegen flags than the live jit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difflexmm_tpu import serving
from difflexmm_tpu.models.quads_focusing import ForwardProblem, OptimizationProblem
from difflexmm_tpu.utils.types import SolutionData


@pytest.fixture(scope="module")
def tiny_focusing():
    problem = ForwardProblem(
        n1_blocks=4, n2_blocks=3, spacing=1.0, bond_length=0.1,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=0.02,
        amplitude=0.1, loading_rate=0.5, input_delay=0.0,
        n_excited_blocks=1, loaded_side="left",
        n_blocks_clamped_corner=1,  # clamps clear of the driven row on 4x3
        simulation_time=2.0, n_timepoints=5, n_substeps=4,
        method="verlet",
    )
    optimization = OptimizationProblem(problem, target_size=(1, 1))
    optimization.setup_objective()
    design = problem.geometry.get_design_from_rotated_square(0.2)
    return optimization, design


def test_export_objective_and_grad_roundtrip(tiny_focusing, tmp_path):
    optimization, design = tiny_focusing

    exported = serving.export_objective_and_grad(
        optimization.objective_fn, design, platforms=("cpu",)
    )
    path = serving.save_exported(exported, tmp_path / "objective.jaxex")
    served = serving.load_exported(path)

    value_direct, grad_direct = jax.value_and_grad(optimization.objective_fn)(design)
    value_served, grad_served = served(design)

    # Same program, same platform — but the AOT loader may compile with
    # slightly different codegen preferences than the live jit (observed:
    # XLA:CPU AOT "prefer-no-scatter/gather" flags), so require ULP-level
    # agreement rather than bitwise.
    np.testing.assert_allclose(
        np.asarray(value_served), np.asarray(value_direct), rtol=1e-12
    )
    for g_s, g_d in zip(
        jax.tree.leaves(grad_served), jax.tree.leaves(grad_direct)
    ):
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_d), rtol=1e-10, atol=1e-14
        )


def test_export_preserves_namedtuple_outputs(tiny_focusing, tmp_path):
    optimization, design = tiny_focusing
    problem = optimization.forward_problem

    exported = serving.export_fn(problem.solve, design, platforms=("cpu",))
    path = serving.save_exported(exported, tmp_path / "solve.jaxex")
    served = serving.load_exported(path)

    out = served(design)
    assert isinstance(out, SolutionData)
    ref = problem.solve(design)
    np.testing.assert_allclose(
        np.asarray(out.fields), np.asarray(ref.fields), rtol=1e-12, atol=1e-15
    )


def test_export_artifact_metadata(tiny_focusing, tmp_path):
    optimization, design = tiny_focusing

    exported = serving.export_fn(
        optimization.objective_fn, design, platforms=("cpu", "tpu")
    )
    path = serving.save_exported(exported, tmp_path / "multi.jaxex")
    served = serving.load_exported(path)
    # Multi-platform artifact records both lowering targets and still runs
    # on the current (CPU) backend.
    assert set(served.exported.platforms) == {"cpu", "tpu"}
    value = served(design)
    np.testing.assert_allclose(
        float(value), float(optimization.objective_fn(design)), rtol=1e-12
    )


def test_export_shape_mismatch_fails_loudly(tiny_focusing, tmp_path):
    optimization, design = tiny_focusing

    exported = serving.export_fn(optimization.objective_fn, design, platforms=("cpu",))
    served = serving.load_exported(
        serving.save_exported(exported, tmp_path / "obj.jaxex")
    )
    bad = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), design)
    with pytest.raises(Exception):
        served(bad)
