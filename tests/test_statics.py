"""Static-equilibrium solver oracles.

Gold checks: zero load -> zero displacement; driven DOFs held exactly;
converged residual; equilibrium matches the long-time limit of heavily
damped dynamics; implicit-adjoint design gradients match finite
differences; reactions satisfy global force balance; contact-regularized
precompression stays finite.
"""

import numpy as np
import jax
import jax.numpy as jnp

from difflexmm_tpu.geometry import RotatedSquareGeometry
from difflexmm_tpu.ops.assembly import build_strain_energy
from difflexmm_tpu.ops.bonds import ligament_energy, ligament_energy_linearized
from difflexmm_tpu.solver import setup_dynamic_solver, setup_static_solver
from difflexmm_tpu.utils import (
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _lattice(n1=3, n2=2, angle=0.2, damping=0.0, k_shear=0.3, k_rot=0.05):
    geo = RotatedSquareGeometry(n1, n2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, k_shear, k_rot, rbv()),
            density=1.0,
            damping=damping,
        ),
        constraint_params=dict(),
    )
    energy = build_strain_energy(bonds(), ligament_energy)
    return geo, energy, cp


def _clamp_left(geo):
    """Clamp all DOFs of the left column of blocks (row-major block ids)."""

    return np.array(
        [[b, d] for b in range(0, geo.n_blocks, geo.n1_blocks) for d in range(3)]
    )


def test_zero_load_zero_displacement():
    geo, energy, cp = _lattice()
    solve = setup_static_solver(
        geo, energy, constrained_block_DOF_pairs=_clamp_left(geo)
    )
    u = solve(jnp.zeros((geo.n_blocks, 3)), 0.0, cp)
    np.testing.assert_allclose(np.asarray(u), 0.0, atol=1e-14)


def test_driven_dofs_held_and_residual_converged():
    geo, energy, cp = _lattice()
    # Drive the x DOF of the right column; clamp the left column.
    right = np.arange(geo.n1_blocks - 1, geo.n_blocks, geo.n1_blocks)
    pairs = np.concatenate(
        [_clamp_left(geo), np.stack([right, np.zeros_like(right)], 1)]
    )

    def drive(t, amplitude):
        values = np.zeros(len(pairs))
        return jnp.asarray(values).at[-len(right):].set(amplitude * t)

    cp = cp._replace(constraint_params=dict(amplitude=0.07))
    solve = setup_static_solver(
        geo, energy, constrained_block_DOF_pairs=pairs, constrained_DOFs_fn=drive
    )
    u = solve(jnp.zeros((geo.n_blocks, 3)), 1.0, cp)
    np.testing.assert_allclose(np.asarray(u[right, 0]), 0.07, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(u[::geo.n1_blocks, :]), 0.0, atol=1e-14)
    r = solve.residual(u, 1.0, cp)
    assert float(jnp.max(jnp.abs(r))) < 1e-10
    # The pull stretches the lattice: interior blocks moved.
    assert float(jnp.abs(u[1:, 0]).max()) > 1e-3


def test_matches_damped_dynamics_steady_state():
    """The Newton equilibrium equals where heavily damped dynamics settles
    (the reference's only quasi-static mechanism, hinge_characterization
    ramps, reference problems/hinge_characterization.py:39-132)."""

    # Stiff lattice (omega_1 ~ 0.21); damping ~ 0.17 is near-critical for the
    # slowest mode, so the dynamics settles in a few mode-1 periods instead
    # of creeping (heavier damping makes soft modes overdamped and SLOW).
    geo, energy, cp = _lattice(k_shear=1.0, k_rot=1.0, damping=0.17)
    pairs = _clamp_left(geo)
    force = 0.01
    loaded = np.array([[geo.n_blocks - 1, 1]])

    solve_static = setup_static_solver(
        geo, energy,
        loaded_block_DOF_pairs=loaded,
        loading_fn=lambda state, t, **kw: force,
        constrained_block_DOF_pairs=pairs,
    )
    u_static = solve_static(jnp.zeros((geo.n_blocks, 3)), 0.0, cp)

    solve_dynamic = setup_dynamic_solver(
        geo, energy,
        loaded_block_DOF_pairs=loaded,
        loading_fn=lambda state, t, **kw: force,
        constrained_block_DOF_pairs=pairs,
        damped_blocks=np.arange(geo.n_blocks),
        method="verlet",
        n_substeps=20,  # dt ~ 0.08 < 2 / omega_max ~ 0.13
    )
    sol = solve_dynamic(
        jnp.zeros((2, geo.n_blocks, 3)), jnp.linspace(0.0, 60.0, 40), cp
    )
    u_dynamic = sol[-1, 0]
    np.testing.assert_allclose(
        np.asarray(u_dynamic), np.asarray(u_static), atol=2e-5
    )


def test_implicit_gradient_matches_finite_differences():
    geo = RotatedSquareGeometry(3, 2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    energy = build_strain_energy(bonds(), ligament_energy)
    pairs = np.array([[b, d] for b in range(0, geo.n_blocks, geo.n1_blocks)
                      for d in range(3)])
    loaded = np.array([[geo.n_blocks - 1, 0], [geo.n_blocks - 1, 1]])
    solve = setup_static_solver(
        geo, energy,
        loaded_block_DOF_pairs=loaded,
        loading_fn=lambda state, t, **kw: 0.03,
        constrained_block_DOF_pairs=pairs,
    )

    def objective(angle):
        cp = ControlParams(
            geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
                density=1.0,
                damping=0.0,
            ),
            constraint_params=dict(),
        )
        u = solve(jnp.zeros((geo.n_blocks, 3)), 0.0, cp)
        return jnp.sum(u[:, :2] ** 2)

    angle0 = 0.2
    value, grad = jax.value_and_grad(objective)(angle0)
    eps = 1e-6
    fd = (float(objective(angle0 + eps)) - float(objective(angle0 - eps))) / (
        2 * eps
    )
    assert np.isfinite(float(value)) and float(value) > 0
    np.testing.assert_allclose(float(grad), fd, rtol=1e-6)


def test_gradient_through_drive_parameter():
    """Implicit adjoint also covers parameters entering through the driven
    constraints (constraint_params), not only the energy."""

    geo, energy, cp = _lattice()
    right = np.arange(geo.n1_blocks - 1, geo.n_blocks, geo.n1_blocks)
    pairs = np.concatenate(
        [_clamp_left(geo), np.stack([right, np.zeros_like(right)], 1)]
    )

    def drive(t, amplitude):
        values = jnp.zeros(len(pairs))
        return values.at[-len(right):].set(amplitude)

    solve = setup_static_solver(
        geo, energy, constrained_block_DOF_pairs=pairs, constrained_DOFs_fn=drive
    )

    def stored_energy(amplitude):
        cp_a = cp._replace(constraint_params=dict(amplitude=amplitude))
        u = solve(jnp.zeros((geo.n_blocks, 3)), 0.0, cp_a)
        return energy(u, cp_a)

    a0 = 0.05
    grad = jax.grad(stored_energy)(a0)
    eps = 1e-6
    fd = (float(stored_energy(a0 + eps)) - float(stored_energy(a0 - eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(float(grad), fd, rtol=1e-6)
    assert abs(fd) > 1e-8


def test_reactions_balance_applied_force():
    """Global equilibrium: the forces the clamps apply to the structure sum
    to MINUS the applied external force (x and y separately)."""

    geo, energy, cp = _lattice()
    pairs = _clamp_left(geo)
    force = 0.015
    loaded = np.array([[geo.n_blocks - 1, 0]])
    solve = setup_static_solver(
        geo, energy,
        loaded_block_DOF_pairs=loaded,
        loading_fn=lambda state, t, **kw: force,
        constrained_block_DOF_pairs=pairs,
    )
    u = solve(jnp.zeros((geo.n_blocks, 3)), 0.0, cp)
    reactions = np.asarray(solve.reactions(u, 0.0, cp))
    dofs = pairs[:, 1]
    # The clamps push back with the negated applied x force.
    np.testing.assert_allclose(reactions[dofs == 0].sum(), -force, rtol=1e-8)
    np.testing.assert_allclose(reactions[dofs == 1].sum(), 0.0, atol=1e-10)


def test_hinge_characterization_static_path():
    """method="static" on the characterization model reproduces the slow-
    rate damped-dynamics force-displacement curve (rate-independent limit)
    and keeps the stiffness gradient path differentiable."""

    from difflexmm_tpu.models.hinge_characterization import ForwardProblem

    def make(method, loading_rate=0.01):
        return ForwardProblem(
            n1_cells=2, n2_cells=2, spacing=1.0, bond_length=0.1,
            initial_angle=0.2,
            k_stretch=1.0, k_shear=0.02, k_rot=1e-3, density=1.0, damping=1.0,
            loading_type="tension", amplitude=0.05, loading_rate=loading_rate,
            n_timepoints=8,
            # Keep dt fixed as the ramp lengthens (stability bound).
            n_substeps=int(64 * 0.01 / loading_rate),
            method=method,
        )

    static = make("static")
    static.setup()
    k = (1.0, 0.02, 1e-3)

    sol_s, cp_s = static.solve(k)
    curve_s = np.asarray(static.force_displacement(sol_s, cp_s))

    # The static curve is the rate->0 limit of the damped dynamics: the
    # force-curve error must shrink ~linearly with the loading rate
    # (viscous lag is first order in rate).
    errs = []
    for rate in (0.01, 0.0025):
        dynamic = make("verlet", loading_rate=rate)
        dynamic.setup()
        sol_d, cp_d = dynamic.solve(k)
        curve_d = np.asarray(dynamic.force_displacement(sol_d, cp_d))
        np.testing.assert_allclose(curve_s[0], curve_d[0], rtol=1e-12)
        errs.append(np.abs(curve_d[1] - curve_s[1]).max())
    scale = np.abs(curve_s[1, -1])
    assert errs[1] < 0.4 * errs[0]  # 4x slower ramp -> ~4x closer
    assert errs[1] < 0.1 * scale

    # Stiffness gradient flows through the scanned Newton equilibria.
    def loss(k_stretch):
        sol, cp = static.solve((k_stretch, 0.02, 1e-3))
        return jnp.sum(static.force_displacement(sol, cp)[1] ** 2)

    grad = jax.grad(loss)(1.0)
    assert np.isfinite(float(grad)) and abs(float(grad)) > 0


def test_contact_precompression_finite():
    """Compression with the contact barrier active: Newton with NaN-safe
    backtracking converges to a finite equilibrium."""

    from difflexmm_tpu.ops.assembly import combine_block_energies
    from difflexmm_tpu.ops.contact import build_contact_energy
    from difflexmm_tpu.utils import ContactParams

    geo = RotatedSquareGeometry(3, 2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    angle = 0.3
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
            density=1.0,
            damping=0.0,
            contact_params=ContactParams(
                k_contact=1.0, min_angle=0.1, cutoff_angle=0.5
            ),
        ),
        constraint_params=dict(),
    )
    energy = combine_block_energies(
        build_strain_energy(bonds(), ligament_energy_linearized),
        build_contact_energy(bonds()),
    )
    right = np.arange(geo.n1_blocks - 1, geo.n_blocks, geo.n1_blocks)
    pairs = np.concatenate(
        [np.array([[b, d] for b in range(0, geo.n_blocks, geo.n1_blocks)
                   for d in range(3)]),
         np.stack([right, np.zeros_like(right)], 1)]
    )

    def drive(t, squeeze):
        values = jnp.zeros(len(pairs))
        return values.at[-len(right):].set(-squeeze)

    cp = cp._replace(constraint_params=dict(squeeze=0.12))
    solve = setup_static_solver(
        geo, energy, constrained_block_DOF_pairs=pairs, constrained_DOFs_fn=drive
    )
    u = solve(jnp.zeros((geo.n_blocks, 3)), 1.0, cp)
    assert np.all(np.isfinite(np.asarray(u)))
    r = solve.residual(u, 1.0, cp)
    assert float(jnp.max(jnp.abs(r))) < 1e-8
    # Compression actually rotated the interior blocks (the RS mechanism).
    assert float(jnp.abs(u[:, 2]).max()) > 1e-3


def test_stalled_newton_returns_nan_not_initial_guess():
    """A driven displacement that collapses a bond to zero length at the
    initial guess makes the first residual NaN; the solver must poison the
    output (nan_on_failure) rather than silently return the guess."""

    geo, energy, cp = _lattice()
    right = np.arange(geo.n1_blocks - 1, geo.n_blocks, geo.n1_blocks)
    pairs = np.concatenate(
        [_clamp_left(geo), np.stack([right, np.zeros_like(right)], 1)]
    )

    def drive(t, amplitude):
        return jnp.zeros(len(pairs)).at[-len(right):].set(-amplitude * t)

    solve = setup_static_solver(
        geo, energy, constrained_block_DOF_pairs=pairs,
        constrained_DOFs_fn=drive,
    )
    # bond_length = 0.1: amplitude 0.1 zeroes the right-column bonds at the
    # zero initial guess -> NaN residual -> stalled Newton.
    cp = cp._replace(constraint_params=dict(amplitude=0.1))
    u = solve(jnp.zeros((geo.n_blocks, 3)), 1.0, cp)
    assert bool(jnp.all(jnp.isnan(u[np.setdiff1d(np.arange(geo.n_blocks),
                                                 np.arange(0, geo.n_blocks,
                                                           geo.n1_blocks))])))

    # Opt-out keeps the old behavior (returns the guess, caller checks
    # solve.residual themselves).
    solve_raw = setup_static_solver(
        geo, energy, constrained_block_DOF_pairs=pairs,
        constrained_DOFs_fn=drive, nan_on_failure=False,
    )
    u_raw = solve_raw(jnp.zeros((geo.n_blocks, 3)), 1.0, cp)
    assert bool(jnp.all(jnp.isfinite(u_raw)))


def test_gradient_with_flat_initial_guess():
    """The custom-vjp guess cotangent must match the GUESS's aval: a flat
    (3*n_blocks,) guess (any reshapeable form is accepted forward) used
    under jax.grad previously crashed with a bwd shape mismatch."""

    geo = RotatedSquareGeometry(3, 2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    energy = build_strain_energy(bonds(), ligament_energy)
    pairs = np.array([[b, d] for b in range(0, geo.n_blocks, geo.n1_blocks)
                      for d in range(3)])
    loaded = np.array([[geo.n_blocks - 1, 0]])
    solve = setup_static_solver(
        geo, energy,
        loaded_block_DOF_pairs=loaded,
        loading_fn=lambda state, t, **kw: 0.02,
        constrained_block_DOF_pairs=pairs,
    )

    def objective(angle):
        cp = ControlParams(
            geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
            mechanical_params=MechanicalParams(
                bond_params=LigamentParams(1.0, 0.3, 0.05, rbv()),
                density=1.0,
                damping=0.0,
            ),
            constraint_params=dict(),
        )
        u = solve(jnp.zeros(3 * geo.n_blocks), 0.0, cp)  # FLAT guess
        return jnp.sum(u[:, :2] ** 2)

    value, grad = jax.value_and_grad(objective)(0.2)
    assert np.isfinite(float(value)) and np.isfinite(float(grad))
    assert abs(float(grad)) > 0
