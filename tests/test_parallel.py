"""Sharding tests on the 8-virtual-device CPU mesh."""

from pathlib import Path

import jax
import pytest
import jax.numpy as jnp
import optax

from difflexmm_tpu.parallel import (
    make_mesh,
    multistart_map,
    scenario_parallel_objective,
)


def test_mesh_has_eight_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_scenario_parallel_objective_matches_serial():
    mesh = make_mesh()

    def per_scenario(design, amplitude):
        return jnp.sum((design * amplitude) ** 2)

    design = jnp.arange(4.0)
    amps = jnp.linspace(0.5, 2.0, 8)
    weights = jnp.linspace(1.0, 2.0, 8)

    objective = scenario_parallel_objective(per_scenario, mesh)
    sharded_val = objective(design, amps, weights)
    serial_val = jnp.sum(
        weights * jax.vmap(lambda a: per_scenario(design, a))(amps)
    )
    assert jnp.allclose(sharded_val, serial_val)

    g_sharded = jax.grad(objective)(design, amps, weights)
    g_serial = jax.grad(
        lambda d: jnp.sum(weights * jax.vmap(lambda a: per_scenario(d, a))(amps))
    )(design)
    assert jnp.allclose(g_sharded, g_serial)


@pytest.mark.slow
def test_scenario_objective_with_simulation():
    """Grad-through-shard_map on a real (tiny) dynamic simulation."""

    from difflexmm_tpu.geometry import RotatedSquareGeometry
    from difflexmm_tpu.ops import build_strain_energy, ligament_energy
    from difflexmm_tpu.solver import setup_dynamic_solver
    from difflexmm_tpu.utils import (
        ControlParams,
        GeometricalParams,
        LigamentParams,
        MechanicalParams,
    )

    geometry = RotatedSquareGeometry(n1_cells=2, n2_cells=1)
    bc, cnv, bonds, rbv = geometry.get_parametrization()
    energy = build_strain_energy(bonds(), ligament_energy)
    solve = setup_dynamic_solver(
        geometry=geometry,
        energy_fn=energy,
        loaded_block_DOF_pairs=jnp.array([[geometry.n1_blocks - 1, 0]]),
        loading_fn=lambda state, t, amplitude: amplitude * jnp.sin(t),
        constrained_block_DOF_pairs=jnp.array([[0, 0], [0, 1]]),
        damped_blocks=jnp.arange(geometry.n_blocks),
        n_substeps=8,
    )
    timepoints = jnp.linspace(0.0, 2.0, 6)
    state0 = jnp.zeros((2, geometry.n_blocks, 3))

    def per_scenario(angle, amplitude):
        cp = ControlParams(
            geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(1.0, 0.02, 1e-3, rbv()),
                density=1.0,
                damping=0.05,
            ),
            loading_params=dict(amplitude=amplitude),
        )
        sol = solve(state0, timepoints, cp)
        return jnp.sum(sol[:, 1] ** 2)

    mesh = make_mesh()
    amps = jnp.linspace(0.1, 0.8, 8)
    weights = jnp.ones(8) / 8
    objective = scenario_parallel_objective(per_scenario, mesh)

    val, grad = jax.jit(jax.value_and_grad(objective))(
        jnp.asarray(0.15), amps, weights
    )
    serial = jnp.sum(weights * jax.vmap(lambda a: per_scenario(0.15, a))(amps))
    assert jnp.allclose(val, serial, rtol=1e-12)
    assert jnp.isfinite(grad) and grad != 0


def test_multistart_map_and_update():
    """A full sharded multi-start optimization step (design per device)."""

    mesh = make_mesh()
    opt = optax.adam(1e-2)

    def loss(x):
        return jnp.sum((x - 3.0) ** 2)

    def step(carry):
        x, opt_state = carry
        g = jax.grad(loss)(x)
        updates, opt_state = opt.update(g, opt_state, x)
        return optax.apply_updates(x, updates), opt_state

    xs = jnp.linspace(-1, 1, 8)[:, None] * jnp.ones((8, 4))
    opt_states = jax.vmap(opt.init)(xs)
    stepper = multistart_map(step, mesh)
    new_xs, _ = jax.jit(stepper)((xs, opt_states))
    assert new_xs.shape == xs.shape
    # Every candidate moved toward the optimum
    assert jnp.all(jnp.abs(new_xs - 3.0) < jnp.abs(xs - 3.0))


def test_init_distributed_single_process_and_idempotent():
    """A one-process 'fleet' must initialize, report process_count == 1,
    build the same mesh as the plain path, and tolerate re-entry. Runs in a
    subprocess: jax.distributed.initialize mutates process-global state."""

    import subprocess
    import sys as _sys

    script = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {repo!r})
from difflexmm_tpu.parallel import init_distributed, make_mesh

n = init_distributed("localhost:12355", num_processes=1, process_id=0)
assert n == 1, n
assert init_distributed("localhost:12355", num_processes=1, process_id=0) == 1
mesh = make_mesh()
assert mesh.devices.size == len(jax.devices())
print("DISTRIBUTED_OK")
""".format(repo=str(Path(__file__).resolve().parents[1]))
    result = subprocess.run(
        [_sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300,
    )
    assert "DISTRIBUTED_OK" in result.stdout, (result.stdout, result.stderr)


def test_init_distributed_plain_run_is_noop():
    """No coordinator and nothing to auto-detect -> proceed single-process
    (must not raise in an already-running session)."""

    from difflexmm_tpu.parallel import init_distributed

    assert init_distributed() == jax.process_count()
