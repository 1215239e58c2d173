"""Energy layer tests: frame invariance, linearized consistency, contact."""

import jax
import jax.numpy as jnp

from difflexmm_tpu.ops import (
    block_to_node_kinematics,
    build_contact_energy,
    contact_energy,
    ligament_energy,
    ligament_energy_linearized,
    ligament_strains,
    ligament_strains_linearized,
    simple_spring_energy,
    strain_energy_bond,
    stretching_torsional_spring_energy,
)
from difflexmm_tpu.utils import (
    ContactParams,
    ControlParams,
    GeometricalParams,
    LigamentParams,
    MechanicalParams,
)


def _rigid_rotation_node_DOFs(node_positions, angle):
    """DOFs of nodes under a rigid rotation about the origin."""

    c, s = jnp.cos(angle), jnp.sin(angle)
    rotated = jnp.stack(
        [
            c * node_positions[:, 0] - s * node_positions[:, 1],
            s * node_positions[:, 0] + c * node_positions[:, 1],
        ],
        axis=-1,
    )
    disp = rotated - node_positions
    return jnp.concatenate([disp, jnp.full((len(node_positions), 1), angle)], axis=1)


def test_frame_invariance_ligament_energy():
    """Nonlinear ligament energy is exactly zero under rigid rotation.

    Oracle parity: reference tests/test_difflexmm.py:149-176 (< 1e-30 in f64).
    """

    bonds = jnp.array([[0, 1], [1, 2]])
    ref_vectors = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    positions = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    total_energy = strain_energy_bond(bonds, ligament_energy)

    energies = jax.vmap(
        lambda a: total_energy(
            _rigid_rotation_node_DOFs(positions, a), reference_vector=ref_vectors
        )
    )(jnp.linspace(-jnp.pi, jnp.pi, 50))
    assert jnp.all(energies < 1e-30)


def test_linearized_matches_nonlinear_for_small_strains():
    key = jax.random.PRNGKey(0)
    d1 = 1e-6 * jax.random.normal(key, (8, 3))
    d2 = 1e-6 * jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    ref = jnp.tile(jnp.array([0.3, 0.1]), (8, 1))

    e_lin = ligament_energy_linearized((d1, d2), ref, 2.0, 1.0, 0.5)
    e_nl = ligament_energy((d1, d2), ref, 2.0, 1.0, 0.5)
    assert jnp.allclose(e_lin, e_nl, rtol=1e-4)

    s_lin = ligament_strains_linearized(d1, d2, ref)
    s_nl = ligament_strains(d1, d2, ref)
    for a, b in zip(s_lin, s_nl):
        assert jnp.allclose(a, b, atol=1e-9)


def test_simple_and_torsional_springs():
    d1 = jnp.zeros((1, 3))
    d2 = jnp.array([[0.1, 0.0, 0.2]])
    ref = jnp.array([[1.0, 0.0]])
    # Stretch by 0.1 along the bond: E = k (dl)^2 / 2
    assert jnp.allclose(simple_spring_energy((d1, d2), ref, k_stretch=3.0), 3.0 * 0.01 / 2)
    e = stretching_torsional_spring_energy((d1, d2), k_stretch=2.0, k_rot=4.0)
    assert jnp.allclose(e, 2.0 * 0.01 / 2 + 4.0 * 0.04 / 2)


def test_contact_barrier_shape():
    cutoff = jnp.array(0.1)
    k = 10.0
    # Beyond cutoff: zero
    assert contact_energy(jnp.array([0.2]), 0.0, cutoff, k) == 0.0
    # C1 at cutoff: value and slope vanish
    eps = 1e-7
    e_near = contact_energy(jnp.array([0.1 - eps]), 0.0, cutoff, k)
    assert e_near < 1e-10
    # Monotone increasing as angle decreases toward the asymptote
    angles = jnp.linspace(0.001, 0.099, 50)
    e = contact_energy(angles, 0.0, cutoff, k)
    assert jnp.all(jnp.diff(e) < 0)
    # Huge near the asymptote
    assert contact_energy(jnp.array([1e-6]), 0.0, cutoff, k) > 1e3
    # Gradient is finite everywhere (no nan from inactive branch)
    g = jax.grad(lambda a: jnp.sum(contact_energy(a, 0.0, cutoff, k)))(
        jnp.array([-0.05, 0.05, 0.2])
    )
    assert jnp.all(jnp.isfinite(g))


def test_contact_energy_angle_vs_distance_build():
    from difflexmm_tpu.geometry import RotatedSquareGeometry

    geo = RotatedSquareGeometry(n1_cells=2, n2_cells=2, spacing=1.0, bond_length=0.1)
    bc, cnv, bonds, rbv = geo.get_parametrization()
    angle = 0.2
    cp = ControlParams(
        geometrical_params=GeometricalParams(bc(angle), cnv(angle)),
        mechanical_params=MechanicalParams(
            bond_params=LigamentParams(1.0, 1.0, 1.0, rbv()),
            density=1.0,
            contact_params=ContactParams(
                min_angle=0.0, cutoff_angle=2 * jnp.pi / 180, k_contact=1.0
            ),
        ),
    )
    u = jnp.zeros((geo.n_blocks, 3))
    for angle_based in (True, False):
        fn = build_contact_energy(bonds(), angle_based=angle_based)
        e = fn(u, cp)
        assert jnp.isfinite(e)
        g = jax.grad(fn)(u, cp)
        assert jnp.all(jnp.isfinite(g))


def test_kinematics_rigid_rotation_preserves_shape():
    cnv = jnp.array([[[0.5, 0.0], [0.0, 0.5], [-0.5, 0.0], [0.0, -0.5]]])
    theta = 0.7
    u = jnp.array([[0.3, -0.2, theta]])
    node_DOFs = block_to_node_kinematics(u, cnv)
    new_pos = cnv + node_DOFs[..., :2]
    # Distances from centroid preserved
    assert jnp.allclose(
        jnp.linalg.norm(new_pos - jnp.array([0.3, -0.2]), axis=-1), 0.5
    )
    assert jnp.allclose(node_DOFs[..., 2], theta)


def test_interp_uniform_matches_jnp_interp():
    """mathx.interp_uniform (the gather-free playback interpolation for
    Pallas drives) == jnp.interp on uniform grids, incl. end clamping and
    gradients."""

    from difflexmm_tpu.ops.mathx import interp_uniform

    t0, dt, n = 0.3, 0.07, 41
    ts = t0 + dt * jnp.arange(n)
    samples = jnp.sin(3 * ts) + 0.2 * ts
    queries = jnp.concatenate([
        jnp.linspace(-0.5, 3.6, 23), ts[:5], jnp.array([t0, t0 + dt * (n - 1)])
    ])
    assert jnp.allclose(
        interp_uniform(queries, t0, dt, samples),
        jnp.interp(queries, ts, samples), atol=1e-12,
    )
    g = jax.grad(lambda t: interp_uniform(t, t0, dt, samples))(1.234)
    fd = (jnp.interp(1.2341, ts, samples) - jnp.interp(1.2339, ts, samples)) / 2e-4
    assert jnp.allclose(g, fd, rtol=1e-6)
