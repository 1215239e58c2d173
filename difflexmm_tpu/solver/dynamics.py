"""Differentiable dynamic solver for rigid-block metamaterial networks.

``setup_dynamic_solver`` composes constrained kinematics, energy, loading,
and damping into an ODE right-hand side on the *dense masked* state
(2, n_blocks, 3), then integrates it with the checkpointed fixed-step
machinery of :mod:`difflexmm_tpu.solver.integrate` (or odeint for parity).

Differences from the reference (difflexmm/dynamics.py:20-186), by design:

- No free-DOF index reduction: the state stays (2, n_blocks, 3) with a
  free-DOF mask. Forces on constrained DOFs are masked; their displacement
  history is injected from the drive function.
- Velocity of driven DOFs is reconstructed with one ``jax.jvp`` of the drive
  function in time — the sparse identity structure of the constraint map
  replaces the reference's dense kinematics Jacobian
  (difflexmm/dynamics.py:130-136).
- Gradients flow through a discrete checkpointed adjoint of the scan, not
  odeint's continuous adjoint.
"""

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from jax import lax

from difflexmm_tpu.geometry.polygon import compute_inertia
from difflexmm_tpu.ops.assembly import constrain_energy
from difflexmm_tpu.ops.kinematics import build_constrained_kinematics
from difflexmm_tpu.ops.loading import (
    build_damping_coefficients,
    build_loading,
    build_viscous_damping,
)
from difflexmm_tpu.solver.integrate import integrate
from difflexmm_tpu.utils.types import ControlParams

_EMPTY_PAIRS = np.zeros((0, 2), dtype=np.int64)

#: Solver methods that consume the gridded fast path (models pass
#: quad_grid/kagome_grid through when ``method in FAST_METHODS``).
FAST_METHODS = ("verlet_pallas", "verlet_ckpt", "auto")

# Measured crossover of the design-tiled Pallas kernel vs the XLA-scan
# forward under vmap (TILED_MULTISTART.json holds BOTH halves, v5e,
# flagship 24x16/200tp): tiled wins fwd+grad up to B ~ 100 (277 vs 112
# designs/s at B=40); the lane-packed XLA scan wins beyond (329 vs 295
# at B >= 120; fwd-only 1731 vs 1505 at B=240). ``auto`` routes vmapped
# populations larger than this to "verlet_ckpt".
_AUTO_MAX_TILED_BATCH = 96

# Kagome analogue (r5): the kagome design-tiled kernel packs B2 = 128//n1
# designs along the cell-lane axis with seam-masked boundary-2
# bonds/contacts. Measured crossover vs the lane-packed verlet_ckpt scan
# (KAGOME_MULTISTART.json tiled_crossover_probe, 12x10 cells on v5e):
# tiled wins fwd+grad at B <= 64 (360 vs 284 designs/s at B=32, 665 vs
# 631 at B=64), ckpt wins past it (947 vs 759 at B=96) — the kagome B1
# is VMEM-capped at 3 (_KAGOME_MAX_SUBLANES), so lane packing overtakes
# earlier than the quads rule's 96.
_AUTO_MAX_TILED_BATCH_KAGOME = 64

# Kagome sublane cap for choose_tiling's B1 (quads use tiling._MAX_SUBLANES
# = 64): the 6-channel kagome interval body holds ~1.5x the quad residues,
# and scoped VMEM charges padded (B1*n2 sublane x 128-lane) tiles — at the
# 12x10-cell bench B1*n2 = 40 sublanes measured 16.15 MB against the 16 MB
# v5e cap (B1*n2 = 60 overflows by 3.2 MB). 30 sublanes fits with margin.
_KAGOME_MAX_SUBLANES = 30


def resolve_method(
    quad_grid=None,
    kagome_grid=None,
    pallas_interpret: bool = False,
    backend: Optional[str] = None,
) -> str:
    """Resolve ``method="auto"`` to a concrete solver backend.

    Measured selection rules (CLAUDE.md / TILED_MULTISTART.json): on TPU
    with a gridded lattice, the fused Pallas interval kernel is the best
    single-design backend, and its design-tiling vmap rule covers small
    populations — so "auto" picks ``"verlet_pallas"`` (large vmapped
    populations are re-routed to ``"verlet_ckpt"`` at trace time by the
    batching rule, where the batch size is known). Without a grid, or off
    TPU, the XLA ``"verlet"`` scan is the drop-in equivalent.
    ``pallas_interpret=True`` forces the Pallas path regardless of backend
    (interpreter-mode testing).
    """

    if quad_grid is None and kagome_grid is None:
        return "verlet"
    if pallas_interpret:
        return "verlet_pallas"
    if backend is None:
        backend = jax.default_backend()
    return "verlet_pallas" if backend == "tpu" else "verlet"


def build_RHS(energy_fn: Callable, loading_fn: Callable, free_mask: jnp.ndarray):
    """RHS of the dynamic problem on the dense masked state.

    Args:
        energy_fn: constrained energy ``E(free_DOFs, t, control_params)``.
        loading_fn: total external force ``(state, t, loading_params,
            damping) -> (n_blocks, 3)``.
        free_mask: (n_blocks, 3) 1/0 mask of free DOFs.

    Returns:
        ``rhs(state, t, control_params, inertia)`` with state (2, nb, 3).
    """

    potential_force = jax.grad(
        lambda u, t, cp: -energy_fn(u, t, cp), argnums=0
    )

    def rhs(state: jnp.ndarray, t, control_params: ControlParams, inertia):
        displacement, velocity = state[0], state[1]
        f = potential_force(displacement, t, control_params)
        f = f + loading_fn(
            state,
            t,
            control_params.loading_params,
            control_params.mechanical_params.damping,
        )
        acceleration = f / inertia * free_mask
        return jnp.stack([velocity * free_mask, acceleration])

    return rhs


def _dense_guard_travel(v, a, dt, guard):
    """Guard risk metric on the dense (n_blocks, 3) state layout.

    Max predicted rotational travel in one substep, plus the translational
    contribution scaled by the guard length (see
    ops/pallas/core.resolve_guard for the semantics)."""

    travel = jnp.max(jnp.abs(v[..., 2]) * dt + (0.5 * dt * dt) * jnp.abs(a[..., 2]))
    if guard["length_scale"] is not None:
        trans = jnp.max(
            jnp.abs(v[..., :2]) * dt + (0.5 * dt * dt) * jnp.abs(a[..., :2])
        )
        travel = travel + trans / guard["length_scale"]
    return travel


def _dense_gap_fn(bond_connectivity):
    """Barrier gap (min void angle - cutoff) on the dense (n_blocks, 3)
    layout, for the guard's proximity term: the general gather-based
    contact geometry (fine in XLA — only Mosaic kernels must stay
    gather-free). +inf when contact is absent or disabled (k_contact=0):
    no barrier to be near, only the hard stability term fires."""

    from difflexmm_tpu.ops.contact import void_angles
    from difflexmm_tpu.ops.kinematics import current_node_positions

    def gap_fn(u, control_params):
        cpar = control_params.mechanical_params.contact_params
        if cpar is None:
            return jnp.asarray(jnp.inf, u.dtype)
        gp = control_params.geometrical_params
        nodes = current_node_positions(
            u, gp.block_centroids, gp.centroid_node_vectors
        )
        gap = (
            jnp.min(void_angles(nodes, bond_connectivity))
            - cpar.cutoff_angle
        )
        return jnp.where(
            cpar.k_contact > 0, gap, jnp.asarray(jnp.inf, u.dtype)
        )

    return gap_fn


def _integrate_verlet(
    force_fn: Callable,
    damping_coeffs_fn: Callable,
    free_mask: jnp.ndarray,
    y0: jnp.ndarray,
    timepoints: jnp.ndarray,
    control_params: ControlParams,
    inertia: jnp.ndarray,
    n_substeps: int,
    checkpoint: bool,
    guard=None,
    gap_fn=None,
) -> jnp.ndarray:
    """Velocity-Verlet with exact implicit treatment of diagonal damping.

    One force evaluation per step (vs four for RK4), second-order accurate,
    symplectic on the conservative part. The viscous term -c*v is linear and
    diagonal, so the velocity update solves it exactly elementwise:
        v1 (1 + dt c / 2m) = v + dt/2 (a0 + F1/m).
    This is the default hot path on TPU: per-step op count is what bounds
    wall-clock at these problem sizes, not FLOPs.

    ``guard``: resolved reactive-substep spec (ops/pallas/core.resolve_guard)
    — substeps whose predicted rotational travel exceeds the threshold are
    re-run as micro-steps, the fixed-step replacement for the reference's
    adaptive dt at contact-barrier force spikes.
    """

    from difflexmm_tpu.ops.pallas.core import (
        make_guarded_stepper,
        make_risk_predicate,
    )

    c = damping_coeffs_fn(control_params.mechanical_params.damping)
    lp = control_params.loading_params
    inv_m = free_mask / inertia  # folds the free-DOF mask into every accel

    def accel(u, v, t):
        f = force_fn(u, v, t, control_params, lp)
        return (f - c * v) * inv_m

    def one_step(carry, t_start, dt):
        u, v, a = carry
        t1 = t_start + dt
        u1 = u + dt * v + (0.5 * dt * dt) * a
        f1 = force_fn(u1, v + dt * a, t1, control_params, lp)
        v_hat = v + 0.5 * dt * (a + f1 * inv_m)
        v1 = v_hat / (1.0 + 0.5 * dt * c / inertia)
        v1 = v1 * free_mask
        a1 = (f1 - c * v1) * inv_m
        return u1, v1, a1

    if guard is None:
        stepper = one_step
    else:
        stepper = make_guarded_stepper(
            one_step,
            make_risk_predicate(
                guard,
                lambda v, a, dt: _dense_guard_travel(v, a, dt, guard),
                None
                if gap_fn is None
                else (lambda u: gap_fn(u, control_params)),
            ),
            guard,
        )

    def step(carry, t_dt):
        t, dt = t_dt
        return stepper(carry, t, dt), None

    def interval(carry, bounds):
        t0, t1 = bounds
        dt = (t1 - t0) / n_substeps
        ts = t0 + dt * jnp.arange(n_substeps)
        carry, _ = lax.scan(step, carry, (ts, jnp.full(n_substeps, dt)))
        return carry, jnp.stack([carry[0], carry[1]])

    seg = jax.checkpoint(interval) if checkpoint else interval
    u0, v0 = y0[0], y0[1]
    a0 = accel(u0, v0, timepoints[0])
    _, ys = lax.scan(seg, (u0, v0, a0), (timepoints[:-1], timepoints[1:]))
    return jnp.concatenate([y0[None], ys])


def _lazy_fallback(setup_kwargs, method):
    """Lazily built sibling solver for population rerouting.

    The build runs INSIDE the custom_vmap rule, i.e. within whatever
    trace the user's solve call sits in; under jit every jnp op in the
    setup would be staged as a tracer and the setup's np conversions
    would raise TracerArrayConversionError — so the build is forced
    eager. Returns (builder, cache) — the cache dict is exposed on the
    dispatching solve for test introspection.
    """

    cache = {}

    def build():
        if "solve" not in cache:
            with jax.ensure_compile_time_eval():
                cache["solve"] = setup_dynamic_solver(
                    method=method, batch_tiling="off", **setup_kwargs
                )
        return cache["solve"]

    return build, cache


def _make_batch_dispatcher(plain_solve, wrapped):
    """Route to a ``jax.custom_batching`` wrapped solve ONLY when called
    under an ambient jax.vmap (argument leaves are batch tracers).

    jax.custom_batching supports vmap-then-grad but not plain grad /
    vmap-of-grad, so an unconditional wrap would break single-design
    optimization; this dispatch keeps every non-vmapped call (and
    vmap-of-grad over the differentiated arguments only, whose leaves are
    AD tracers wrapping batch tracers) on the plain solve with its exact
    current semantics.

    A MIXED vmap-of-grad — some leaves batched raw (plain batch tracers,
    e.g. a swept damping) while others are in-flight derivatives (AD
    tracers, the design under grad) — cannot go through custom_vmap
    ("Linearization failed to produce known values..."). It IS supported
    by the plain solve (per-candidate parity 7e-10, pinned in
    tests/test_tiled_batching.py), so it is detected here and dispatched
    there with a one-time performance warning naming the faster
    vjp-of-vmap pattern.
    """

    import warnings

    try:
        # Private-API seam (pinned by tests/test_tiled_batching.py): used
        # only to DETECT an ambient vmap at call time, so the fail-safe on
        # a JAX upgrade is "no routing", never wrong math.
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # pragma: no cover - fail-safe on JAX upgrade
        BatchTracer = ()
    try:
        # Same seam, for detecting an in-flight grad/jvp mixed with an
        # ambient vmap (the one composition custom_vmap cannot take).
        # grad leaves are JVPTracer (jvp) or LinearizeTracer (vjp
        # linearization) depending on the JAX version/path.
        from jax._src.interpreters import ad as _ad

        ADTracers = tuple(
            t for t in (
                getattr(_ad, "JVPTracer", None),
                getattr(_ad, "LinearizeTracer", None),
            )
            if t is not None
        )
    except ImportError:  # pragma: no cover - fail-safe on JAX upgrade
        ADTracers = ()

    warned = []

    def _dispatching_solve(state0, timepoints, control_params):
        leaves = jax.tree.leaves((state0, timepoints, control_params))
        if BatchTracer and any(
            isinstance(leaf, BatchTracer) for leaf in leaves
        ):
            if ADTracers and any(
                isinstance(leaf, ADTracers) for leaf in leaves
            ):
                if not warned:
                    warned.append(True)
                    warnings.warn(
                        "vmap-of-grad with additional non-differentiated "
                        "batched arguments bypasses the batched-population "
                        "fast path (it cannot go through custom_vmap) and "
                        "runs a plain vmap instead. For population "
                        "gradients, ONE jax.vjp of the vmapped objective "
                        "is the fast order (see parallel/multistart."
                        "population_value_and_grad).",
                        stacklevel=2,
                    )
                return plain_solve(state0, timepoints, control_params)
            return wrapped(state0, timepoints, control_params)
        return plain_solve(state0, timepoints, control_params)

    return _dispatching_solve


def _resolve_inertia(control_params: ControlParams) -> jnp.ndarray:
    mp = control_params.mechanical_params
    if mp.inertia is None:
        return compute_inertia(
            control_params.geometrical_params.centroid_node_vectors, mp.density
        )
    return mp.inertia


def setup_dynamic_solver(
    geometry,
    energy_fn: Callable,
    loaded_block_DOF_pairs=None,
    loading_fn: Optional[Callable] = None,
    constrained_block_DOF_pairs=_EMPTY_PAIRS,
    constrained_DOFs_fn: Callable = lambda t, **kwargs: 0.0,
    damped_blocks=None,
    rtol: float = 1e-8,
    atol: float = 1e-8,
    method: str = "rk4",
    n_substeps: int = 64,
    checkpoint: bool = True,
    quad_grid: Optional[dict] = None,
    kagome_grid: Optional[dict] = None,
    pallas_interpret: bool = False,
    pallas_chunk: Optional[int] = None,
    batch_tiling="auto",
    guard=None,
):
    """Set up the dynamic solver.

    Returns ``solve_dynamics(state0, timepoints, control_params)`` mapping an
    initial (2, n_blocks, 3) state and (T,) timepoints to the full
    (T, 2, n_blocks, 3) solution, differentiable with respect to everything
    in ``control_params`` and ``state0``.

    Args beyond the reference's (difflexmm/dynamics.py:60-88):
        method: "rk4" (default), "verlet", "semi_implicit", "odeint",
            "verlet_pallas" (fused Pallas interval kernel; quad/kagome
            grids), "verlet_ckpt" (same interval structure and
            stored-boundary-state adjoint as verlet_pallas, but the forward
            is a plain XLA scan — the fastest choice under large vmap
            batches, e.g. multi-start design sweeps, where XLA lays the
            batch across VPU lanes), or "auto" (resolve by the measured
            selection rules — see :func:`resolve_method`: Pallas kernel on
            TPU when a grid is given, XLA verlet otherwise; vmapped
            populations larger than the measured tiling crossover are
            re-routed to the verlet_ckpt forward inside the batching rule,
            where the population size is known).
        n_substeps: fixed integration steps per output interval.
        checkpoint: rematerialized backward pass over intervals.
        quad_grid: for "verlet_pallas" on quad lattices: dict with n1, n2
            and optional linearized/use_contact; the energy is then the
            gridded quad energy (energy_fn is ignored in the hot loop but
            still used for diagnostics).
        kagome_grid: same, for kagome lattices (n1/n2 = cells; two
            triangular blocks per cell; ops/pallas/verlet_kagome.py).
        pallas_interpret: run the Pallas kernel in interpreter mode
            (debugging / CPU test parity).
        pallas_chunk: output intervals per Pallas grid step (default: sized
            from the VMEM budget; see ops/pallas/core.default_chunk). Also
            used by tests to force ragged last chunks at small sizes.
        batch_tiling: "auto" (default), "off", or a dict with optional
            "b1"/"b2" overrides. With "auto" on quad ``verlet_pallas``
            solvers, ``jax.vmap`` over designs (multi-start populations)
            is intercepted by a ``jax.custom_batching`` rule that tiles the
            batch onto ONE super-lattice — B2 designs side by side along
            the kernel's 128 lanes, B1 along an extra leading dim — and
            runs the existing fused kernel on it (ops/pallas/tiling.py).
            Falls back to plain vmap whenever the tiling assumptions don't
            hold (batched timepoints / constraint, loading, or contact
            params). A dict may also set "max_batch": N — populations
            larger than N (and, under method="auto", ALL un-tileable
            batches) reroute to a lazily built "verlet_ckpt" sibling
            solver, i.e. XLA-scan numerics; an explicit "verlet_pallas"
            with "max_batch" keeps Pallas numerics for un-tileable batches
            at or below its cap. NOTE: the rule composes with
            vmap-then-grad (grad of a vmapped objective, or jax.vjp of
            it); vmap-of-grad with extra non-differentiated batched args
            bypasses the fast path (dispatched to a plain vmap with a
            one-time performance warning). Batched optimizers should use
            the vjp-of-vmap order (parallel/multistart.
            population_value_and_grad). Guarded solvers (``guard=...``)
            never design-tile (the guard's risk predicate would couple
            pack-mates); under vmap their lax.cond becomes a per-design
            select — correct, but both branches execute, so prefer
            unguarded population screening plus guarded re-evaluation of
            finalists.
        guard: reactive substep escalation for the fixed-step Verlet
            backends ("verlet", "verlet_ckpt", "verlet_pallas") — the
            fixed-step equivalent of the reference's adaptive dt at contact
            force spikes (reference difflexmm/dynamics.py:166). A dict with
            ``threshold`` (max rotational travel per substep, rad) or
            ``window`` (the contact barrier window; threshold =
            ``fraction * window``, fraction default 0.02), plus optional
            ``proximity``/``proximity_windows`` (gate the travel term on
            barrier proximity — cost-proportional firing; grid backends
            and connectivity-bearing dense geometries only) and
            ``hard``/``hard_fraction`` (unconditional stability
            threshold, forced on with proximity), ``refine``
            (micro-steps per risky substep, default 16),
            ``levels`` (recursion depth, default 1), ``length_scale``
            (count translational motion as travel / length_scale), and
            ``translation`` ("relative": neighbor velocity differences,
            the grid-backend default — bulk motion closes no void; or
            "absolute": any block's |v|, the only mode the dense
            method='verlet' layout supports). See
            ops/pallas/core.resolve_guard. Substeps predicted to cross a
            large fraction of the barrier window re-run as micro-steps, so
            strong-pulse f32 runs survive contact events instead of
            stepping into the barrier's 1/x asymptote (NaN).
    """

    # Captured for the batching rule's large-population fallback solver
    # (built lazily, identical setup but method="verlet_ckpt").
    _setup_kwargs = dict(
        geometry=geometry,
        energy_fn=energy_fn,
        loaded_block_DOF_pairs=loaded_block_DOF_pairs,
        loading_fn=loading_fn,
        constrained_block_DOF_pairs=constrained_block_DOF_pairs,
        constrained_DOFs_fn=constrained_DOFs_fn,
        damped_blocks=damped_blocks,
        rtol=rtol,
        atol=atol,
        n_substeps=n_substeps,
        checkpoint=checkpoint,
        quad_grid=quad_grid,
        kagome_grid=kagome_grid,
        pallas_interpret=pallas_interpret,
        pallas_chunk=pallas_chunk,
        guard=guard,
    )
    was_auto = method == "auto"
    if was_auto:
        method = resolve_method(quad_grid, kagome_grid, pallas_interpret)

    if guard is not None and method not in (
        "verlet", "verlet_pallas", "verlet_ckpt"
    ):
        raise ValueError(
            f"guard is only supported by the fixed-step Verlet backends "
            f"('verlet', 'verlet_pallas', 'verlet_ckpt'), not method="
            f"{method!r}. The odeint backend is already adaptive; for rk4/"
            "semi_implicit use method='verlet'."
        )
    if guard is not None and method == "verlet":
        from difflexmm_tpu.ops.pallas.core import resolve_guard

        # The dense (n_blocks, 3) layout has no connectivity to difference
        # against (gathers), so its translational risk term is absolute.
        _dense_guard = resolve_guard(
            guard, theta_channels=(2,), default_translation="absolute"
        )
        if _dense_guard["translation"] == "relative":
            raise ValueError(
                "guard translation='relative' needs the grid plane layout; "
                "method='verlet' (dense) supports only 'absolute' (or use "
                "'verlet_pallas'/'verlet_ckpt')."
            )
        _dense_gap = None
        if _dense_guard.get("proximity") is not None:
            bond_conn = getattr(geometry, "bond_connectivity", None)
            if bond_conn is None:
                raise ValueError(
                    "guard 'proximity' with method='verlet' needs a "
                    "geometry object with bond connectivity (got a bare "
                    "n_blocks int); use the grid backends or drop the "
                    "proximity gate."
                )
            _dense_gap = _dense_gap_fn(
                jnp.asarray(bond_conn() if callable(bond_conn) else bond_conn)
            )

    n_blocks = geometry if isinstance(geometry, int) else geometry.n_blocks

    kinematics = build_constrained_kinematics(
        n_blocks,
        constrained_block_DOF_pairs=constrained_block_DOF_pairs,
        constrained_DOFs_fn=constrained_DOFs_fn,
    )
    dof_set = kinematics.dof_set
    constrained_energy = constrain_energy(energy_fn, kinematics)

    if loaded_block_DOF_pairs is not None and loading_fn is not None:
        _loading = build_loading(n_blocks, loaded_block_DOF_pairs, loading_fn)
    else:
        def _loading(state, t, loading_params):
            return 0.0

    if damped_blocks is not None:
        _damping = build_viscous_damping(n_blocks, damped_blocks)
    else:
        def _damping(state, t, damping):
            return 0.0

    def loading_total(state, t, loading_params, damping):
        return _loading(state, t, loading_params) + _damping(state, t, damping)

    rhs = build_RHS(constrained_energy, loading_total, dof_set.free_mask)

    if method == "verlet":
        potential_force = jax.grad(
            lambda u, t, cp: -constrained_energy(u, t, cp), argnums=0
        )

        def verlet_force(u, v, t, control_params, loading_params):
            f = potential_force(u, t, control_params)
            return f + _loading((u, v), t, loading_params)

        if damped_blocks is not None:
            damping_coeffs = build_damping_coefficients(n_blocks, damped_blocks)
        else:
            def damping_coeffs(damping):
                return jnp.zeros((n_blocks, 3))

    def _drive_values(t, constraint_params):
        return jnp.broadcast_to(
            jnp.asarray(constrained_DOFs_fn(t, **constraint_params), dtype=float),
            (dof_set.n_constrained,),
        )

    if method in ("verlet_pallas", "verlet_ckpt"):
        grid = kagome_grid if kagome_grid is not None else quad_grid
        if grid is None:
            raise ValueError(
                f"method={method!r} requires quad_grid={{'n1':..., "
                "'n2':...}} or kagome_grid={'n1':..., 'n2':...}."
            )
        has_pallas_loading = (
            loaded_block_DOF_pairs is not None and loading_fn is not None
        )
        is_kagome = kagome_grid is not None
        if is_kagome:
            from difflexmm_tpu.ops.pallas.core import normalize_arrays
            from difflexmm_tpu.ops.pallas.verlet_kagome import (
                build_pallas_kagome_trajectory as _build_trajectory,
                centroids_to_planes as _centroids_to_planes,
                cnv_to_planes as _cnv_to_planes,
                fields_from_planes as _fields_from_planes,
                scatter_matrix_planes as _scatter_matrix,
                split_bond_planes as _split_bonds,
                split_ref_planes as _split_refs,
                to_planes as _to_planes,
            )
        else:
            from difflexmm_tpu.ops.grid import split_grid_bond_data
            from difflexmm_tpu.ops.pallas.verlet_grid import (
                build_pallas_verlet_trajectory as _build_trajectory,
                cnv_to_planes as _cnv_to_planes,
                fields_from_planes as _fields_from_planes,
                normalize_arrays,
                scatter_matrix_planes as _scatter_matrix,
                to_planes as _to_planes,
            )

        g_n1, g_n2 = grid["n1"], grid["n2"]
        g_linearized = grid.get("linearized", False)
        g_contact = grid.get("use_contact", True)
        S = _scatter_matrix(
            g_n1, g_n2, dof_set.constrained_blocks, dof_set.constrained_dofs
        )
        if has_pallas_loading:
            _load_pairs = np.asarray(
                loaded_block_DOF_pairs, dtype=np.int64
            ).reshape(-1, 2)
            # build_loading sums duplicate pairs (.at[].add) — mirror that.
            S_load = _scatter_matrix(
                g_n1, g_n2, _load_pairs[:, 0], _load_pairs[:, 1], combine="add"
            )
            _n_loaded = len(_load_pairs)
        if damped_blocks is not None:
            _p_damping_coeffs = build_damping_coefficients(n_blocks, damped_blocks)
        else:
            def _p_damping_coeffs(damping):
                return jnp.zeros((n_blocks, 3))

        _interval_cache = {}

        def _hoist_consts(raw_fn, example_args, dtype):
            """Hoist every closed-over constant of a user closure (e.g. its
            drive scatter vector) into explicit kernel arguments — Pallas
            kernels cannot capture constants — by re-evaluating its jaxpr
            with the consts appended after the user args."""

            closed = jax.make_jaxpr(raw_fn)(
                jnp.zeros((), dtype), *example_args
            )
            n_user_args = 1 + len(example_args)

            # Non-float closure constants would produce float0 cotangents
            # the stored-state adjoint cannot accumulate — fail loudly at
            # setup rather than deep inside the backward pass.
            bad = [
                str(jnp.asarray(c).dtype)
                for c in closed.consts
                if not jnp.issubdtype(jnp.asarray(c).dtype, jnp.floating)
            ]
            if bad:
                raise TypeError(
                    "A drive/loading closure used with the fused Pallas "
                    f"backends captures non-float constants ({bad}); cast "
                    "index/flag arrays to float inside the closure, or use "
                    "method='verlet'."
                )
            # Store consts at the solve dtype, lifted to (1, 1) when rank-0
            # (Mosaic cannot take rank-0 operands); `converted` restores the
            # TRACED shape and dtype before re-evaluating the jaxpr, so the
            # evaluation is always self-consistent with the trace (an f32
            # solve quantizes f64 closure consts to f32 — the requested
            # precision — rather than mixing dtypes mid-jaxpr).
            traced = [(jnp.asarray(c).shape, jnp.asarray(c).dtype)
                      for c in closed.consts]
            consts = tuple(
                jnp.asarray(c, dtype).reshape(
                    (1, 1) if jnp.asarray(c).ndim == 0 else jnp.asarray(c).shape
                )
                for c in closed.consts
            )

            def converted(t, *all_args):
                args = all_args[: n_user_args - 1]
                hoisted = [
                    h.reshape(shape).astype(dt)
                    for h, (shape, dt) in zip(
                        all_args[n_user_args - 1:], traced
                    )
                ]
                (out,) = jax.core.eval_jaxpr(closed.jaxpr, hoisted, t, *args)
                return out

            return converted, consts

        def _pallas_trajectory_for(
            keys, lkeys, n_timepoints, example_drive_args, example_load_args,
            dtype, tiled=False,
        ):
            """Whole-trajectory kernel for a given constraint/loading params
            key set and output-grid length (cache key includes all).

            The cache is also keyed by the ambient abstract mesh: the drive
            closure's jaxpr bakes sharding params (e.g. broadcast_in_dim)
            from the trace it was built under, so a jaxpr traced inside
            shard_map (Manual axes) cannot be re-evaluated in a plain trace
            whose values carry the mesh with Auto axes — JAX raises
            "Mesh for all inputs should be equal" deep in the energy."""

            def _sig(args):
                return tuple(
                    (tuple(jnp.shape(a)), str(jnp.result_type(a)))
                    for a in args
                )

            # Keyed by params names AND their shapes/dtypes plus the solve
            # dtype: the cached jaxpr + dtype-cast consts are only valid
            # for the trace they were built under (an f32 solve followed by
            # an f64 verification solve, or a re-shaped constraint param,
            # must re-trace, not silently reuse f32 consts).
            cache_key = (
                keys, lkeys, n_timepoints, jax.sharding.get_abstract_mesh(),
                str(jnp.dtype(dtype)), _sig(example_drive_args),
                _sig(example_load_args or ()), tiled,
            )
            if cache_key not in _interval_cache:
                def raw_drive(t, *args):
                    # Drive args arrive Pallas-shaped ((1,1) scalars);
                    # flatten before broadcasting to the pair count.
                    values = jnp.asarray(
                        constrained_DOFs_fn(t, **dict(zip(keys, args)))
                    ).reshape(-1)
                    return jnp.broadcast_to(
                        values, (max(dof_set.n_constrained, 1),)
                    )

                drive_conv, drive_consts = _hoist_consts(
                    raw_drive, example_drive_args, dtype
                )

                load_conv, load_consts = None, ()
                if has_pallas_loading:
                    def raw_load(t, *args):
                        # Fused loading is time-dependent only: the user fn
                        # is called with state=None so a state-dependent fn
                        # fails loudly at trace time (use method='verlet').
                        values = jnp.asarray(
                            loading_fn(None, t, **dict(zip(lkeys, args)))
                        ).reshape(-1)
                        return jnp.broadcast_to(values, (_n_loaded,))

                    load_conv, load_consts = _hoist_consts(
                        raw_load, example_load_args, dtype
                    )

                trajectory = _build_trajectory(
                    g_n1, g_n2, n_substeps, n_timepoints, drive_conv,
                    load_values_fn=load_conv,
                    linearized=g_linearized, use_contact=g_contact,
                    interpret=pallas_interpret,
                    chunk=pallas_chunk,
                    guard=guard,
                    # verlet_ckpt: identical math and stored-state adjoint,
                    # but the forward is a plain scan - XLA fills the VPU
                    # lanes under large vmap batches where the SoA kernel's
                    # (n2, n1) tiles are mostly padding.
                    forward_impl="xla" if method == "verlet_ckpt" else "pallas",
                    # Design-tiled batched layout (quads only): an extra
                    # seam-mask fixed leaf; see ops/pallas/tiling.py.
                    **(dict(tiled=True) if tiled else {}),
                )
                _interval_cache[cache_key] = (
                    trajectory, drive_consts, load_consts
                )
            return _interval_cache[cache_key]

        def _contact_scalars(mp):
            contact_on = g_contact and mp.contact_params is not None
            if contact_on:
                return (
                    mp.contact_params.min_angle,
                    mp.contact_params.cutoff_angle,
                    mp.contact_params.k_contact,
                )
            return 0.0, 1.0, 0.0

        if is_kagome:
            def _kagome_fixed_core(control_params, inertia):
                """The 20 per-design kagome fixed leaves (physics planes,
                contact scalars, solver planes), ending at the free-DOF
                mask — everything before the scatter factors. vmap-able
                for the design-tiled batch path (ops/pallas/tiling.py)."""

                mp = control_params.mechanical_params
                gp = control_params.geometrical_params
                cmin, ccut, kc = _contact_scalars(mp)
                bp = mp.bond_params
                ks_i, ks_b1, ks_b2 = _split_bonds(bp.k_stretch, g_n1, g_n2)
                ksh_i, ksh_b1, ksh_b2 = _split_bonds(bp.k_shear, g_n1, g_n2)
                kr_i, kr_b1, kr_b2 = _split_bonds(bp.k_rot, g_n1, g_n2)
                ref_i, ref_b1, ref_b2 = _split_refs(
                    bp.reference_vector, g_n1, g_n2
                )
                return (
                    _cnv_to_planes(gp.centroid_node_vectors, g_n1, g_n2),
                    _centroids_to_planes(gp.block_centroids, g_n1, g_n2),
                    ref_i, ref_b1, ref_b2,
                    ks_i, ksh_i, kr_i,
                    ks_b1, ksh_b1, kr_b1,
                    ks_b2, ksh_b2, kr_b2,
                    jnp.asarray(cmin, float), jnp.asarray(ccut, float),
                    jnp.asarray(kc, float),
                    _to_planes(inertia, g_n1, g_n2),
                    _to_planes(_p_damping_coeffs(mp.damping), g_n1, g_n2),
                    _to_planes(dof_set.free_mask, g_n1, g_n2),
                )
        else:
            def _quad_fixed_core(control_params, inertia):
                """The 16 per-design quad fixed leaves (physics + solver
                planes), ending at the free-DOF mask — everything before
                the scatter factors. vmap-able for the design-tiled batch
                path (ops/pallas/tiling.py)."""

                mp = control_params.mechanical_params
                gp = control_params.geometrical_params
                cmin, ccut, kc = _contact_scalars(mp)
                (ref_h, ref_v, ks_h, ks_v, ksh_h, ksh_v, kr_h, kr_v) = (
                    split_grid_bond_data(mp.bond_params, g_n1, g_n2)
                )

                def ref_planes(ref, shape):
                    ref = jnp.asarray(ref)
                    if ref.ndim == 1:  # one shared (2,) reference vector
                        return jnp.broadcast_to(
                            ref[:, None, None], (2,) + shape
                        )
                    return jnp.moveaxis(ref, -1, 0)  # (n2,n?,2) -> (2,n2,n?)

                return (
                    _cnv_to_planes(gp.centroid_node_vectors, g_n1, g_n2),
                    _to_planes(gp.block_centroids, g_n1, g_n2),
                    ref_planes(ref_h, (g_n2, g_n1 - 1)),
                    ref_planes(ref_v, (g_n2 - 1, g_n1)),
                    ks_h, ksh_h, kr_h, ks_v, ksh_v, kr_v,
                    jnp.asarray(cmin, float), jnp.asarray(ccut, float),
                    jnp.asarray(kc, float),
                    _to_planes(inertia, g_n1, g_n2),
                    _to_planes(_p_damping_coeffs(mp.damping), g_n1, g_n2),
                    _to_planes(dof_set.free_mask, g_n1, g_n2),
                )

        def _pallas_arrays(control_params, inertia, dtype):
            keys = tuple(sorted(control_params.constraint_params.keys()))
            drive_args = [control_params.constraint_params[k] for k in keys]
            loading_params = control_params.loading_params or {}
            lkeys = tuple(sorted(loading_params.keys()))
            load_args = (
                [loading_params[k] for k in lkeys] if has_pallas_loading else None
            )

            if is_kagome:
                fixed = _kagome_fixed_core(control_params, inertia) + S
            else:
                fixed = _quad_fixed_core(control_params, inertia) + S
            if has_pallas_loading:
                fixed = fixed + S_load
            return keys, lkeys, normalize_arrays(
                fixed, drive_args, dtype, load_args=load_args
            )

    def solve_dynamics(
        state0: jnp.ndarray, timepoints: jnp.ndarray, control_params: ControlParams
    ) -> jnp.ndarray:
        """Integrate the dynamics; output (T, 2, n_blocks, 3)."""

        inertia = _resolve_inertia(control_params)
        y0 = jnp.asarray(state0) * dof_set.free_mask

        if method in ("verlet_pallas", "verlet_ckpt"):
            # One dtype everywhere: the drive jaxpr is traced at y0.dtype,
            # so t fed to it outside the kernel must match too.
            timepoints = jnp.asarray(timepoints).astype(y0.dtype)
            keys, lkeys, arrays = _pallas_arrays(
                control_params, inertia, y0.dtype
            )
            if has_pallas_loading:
                example_drive, example_load = arrays[-2], arrays[-1]
            else:
                example_drive, example_load = arrays[-1], ()
            trajectory, drive_consts, load_consts = _pallas_trajectory_for(
                keys, lkeys, len(timepoints), example_drive, example_load,
                y0.dtype,
            )
            if has_pallas_loading:
                arrays = arrays[:-2] + (
                    arrays[-2] + drive_consts,
                    arrays[-1] + load_consts,
                )
            else:
                arrays = arrays[:-1] + (arrays[-1] + drive_consts,)
            U0 = _to_planes(y0[0], g_n1, g_n2)
            V0 = _to_planes(y0[1], g_n1, g_n2)
            # Fixed leaves end with (inertia, damping, mask, S_chan, S_row,
            # S_col[, L_chan, L_row, L_col]); the trailing elements are the
            # drive (and load) tuples.
            off = 6 if has_pallas_loading else 2
            inertia_p = arrays[-5 - off]
            damping_c = arrays[-4 - off]
            mask_p = arrays[-3 - off]
            inv_m = mask_p / inertia_p
            F0 = trajectory.force_fn(U0, timepoints[0], arrays)
            A0 = (F0 - damping_c * V0) * inv_m

            outU, outV, _ = trajectory((U0, V0, A0), timepoints, arrays)
            out = jnp.stack([outU, outV], axis=1)  # (T-1, 2, C, n2, n1)
            out = _fields_from_planes(out, n_blocks)  # (T-1, 2, nb, 3)
            ys = jnp.concatenate([y0[None], out])
        elif method == "verlet":
            ys = _integrate_verlet(
                verlet_force,
                damping_coeffs,
                dof_set.free_mask,
                y0,
                timepoints,
                control_params,
                inertia,
                n_substeps,
                checkpoint,
                guard=_dense_guard if guard is not None else None,
                gap_fn=_dense_gap if guard is not None else None,
            )
        else:
            ys = integrate(
                rhs,
                y0,
                timepoints,
                args=(control_params, inertia),
                method=method,
                n_substeps=n_substeps,
                checkpoint=checkpoint,
                rtol=rtol,
                atol=atol,
            )  # (T, 2, nb, 3)

        if dof_set.n_constrained == 0:
            return ys

        # Driven displacements and their exact time derivatives, batched
        # over the output times with one jvp each.
        cparams = control_params.constraint_params

        def drive_and_rate(t):
            return jax.jvp(
                lambda tt: _drive_values(tt, cparams), (t,), (jnp.ones_like(t),)
            )

        c_vals, c_rates = jax.vmap(drive_and_rate)(timepoints)  # (T, k) each

        u = ys[:, 0].at[:, dof_set.constrained_blocks, dof_set.constrained_dofs].set(
            c_vals
        )
        v = ys[:, 1].at[:, dof_set.constrained_blocks, dof_set.constrained_dofs].set(
            c_rates
        )
        return jnp.stack([u, v], axis=1)

    if (
        method == "verlet_pallas"
        and quad_grid is not None
        and kagome_grid is None
        and batch_tiling != "off"
    ):
        from jax import custom_batching

        from difflexmm_tpu.ops.pallas import tiling as _tilemod

        _plain_solve = solve_dynamics
        _tile_cfg = batch_tiling if isinstance(batch_tiling, dict) else {}
        # Populations larger than this leave the tiled kernel for a plain
        # vmap of the XLA-scan forward ("verlet_ckpt"), which wins at scale
        # (lane packing across the batch — TILED_MULTISTART.json). Enabled
        # by default under method="auto"; opt-in via
        # batch_tiling={"max_batch": N} for explicit "verlet_pallas".
        _max_tiled_batch = _tile_cfg.get(
            "max_batch", _AUTO_MAX_TILED_BATCH if was_auto else None
        )
        _fallback_solve, _fallback_cache = _lazy_fallback(
            _setup_kwargs, _tile_cfg.get("fallback_method", "verlet_ckpt")
        )

        def _tiled_solve(state0, s0_batched, timepoints, cp, cp_bools, B):
            """One vmapped solve as ONE (or a few) super-lattice kernel
            runs; see ops/pallas/tiling.py for the layout."""

            state0 = jnp.asarray(state0)
            dtype = state0.dtype
            timepoints = jnp.asarray(timepoints).astype(dtype)
            b1, b2, n_tiles = _tilemod.choose_tiling(
                B, g_n1, g_n2, _tile_cfg.get("b1"), _tile_cfg.get("b2")
            )
            Bp = b1 * b2 * n_tiles

            def prep(x, batched):
                x = jnp.asarray(x)
                if batched:
                    return _tilemod.pad_batch(x, Bp)
                return jnp.broadcast_to(x[None], (Bp,) + x.shape)

            gp_b = jax.tree.map(
                prep, cp.geometrical_params, cp_bools.geometrical_params
            )
            mp_b = jax.tree.map(
                prep, cp.mechanical_params, cp_bools.mechanical_params
            )
            y0_b = prep(state0 * dof_set.free_mask, s0_batched)

            def fixed_core(gp, mp):
                cp1 = cp._replace(
                    geometrical_params=gp, mechanical_params=mp
                )
                return _quad_fixed_core(cp1, _resolve_inertia(cp1))

            (cnv, cen, ref_h, ref_v, ks_h, ksh_h, kr_h,
             ks_v, ksh_v, kr_v, cmin, ccut, kc, inert, damp, mask) = (
                jax.vmap(fixed_core)(gp_b, mp_b)
            )

            h_shape = (g_n2, g_n1 - 1)
            v_shape = (g_n2 - 1, g_n1)

            def full(x, shape):
                # Scalar stiffness arrives (Bp,) / (Bp, 1, 1); expand to a
                # per-bond plane so the seam-masked tiling applies to it.
                while x.ndim < 1 + len(shape):
                    x = x[..., None]
                return jnp.broadcast_to(x, (Bp,) + shape)

            def tp(x):
                return _tilemod.tile_planes(x, b1, b2)

            def th(x, pad_value=0.0):
                return _tilemod.tile_h_planes(x, b1, b2, pad_value)

            # Order must match _quad_energy_of(tiled=True): 13 physics
            # leaves, the h seam contact mask, then the solver tail.
            fixed_tiled = (
                tp(cnv), tp(cen),
                # Seam reference vectors are (1, 0): a zero reference would
                # make the ligament's 1/l0^2 terms 0/0 even at k = 0.
                jnp.stack(
                    [th(ref_h[:, 0], 1.0), th(ref_h[:, 1], 0.0)], axis=1
                ),
                tp(ref_v),
                th(full(ks_h, h_shape)), th(full(ksh_h, h_shape)),
                th(full(kr_h, h_shape)),
                tp(full(ks_v, v_shape)), tp(full(ksh_v, v_shape)),
                tp(full(kr_v, v_shape)),
                cmin[0], ccut[0], kc[0],
                _tilemod.h_seam_mask(g_n1, b2, dtype),
                tp(inert), tp(damp), tp(mask),
                S[0], S[1], _tilemod.tile_scatter_cols(S[2], b2),
            )
            # Which fixed leaves carry the leading n_tiles axis (the rest
            # are shared across tiles and broadcast by vmap).
            tiled_flags = [True] * 10 + [False] * 4 + [True] * 3 + [False] * 3
            if has_pallas_loading:
                fixed_tiled = fixed_tiled + (
                    S_load[0], S_load[1],
                    _tilemod.tile_scatter_cols(S_load[2], b2),
                )
                tiled_flags += [False] * 3

            keys = tuple(sorted(cp.constraint_params.keys()))
            drive_args = [cp.constraint_params[k] for k in keys]
            loading_params = cp.loading_params or {}
            lkeys = tuple(sorted(loading_params.keys()))
            load_args = (
                [loading_params[k] for k in lkeys]
                if has_pallas_loading else None
            )
            arrays = normalize_arrays(
                fixed_tiled, drive_args, dtype, load_args=load_args
            )
            if has_pallas_loading:
                example_drive, example_load = arrays[-2], arrays[-1]
            else:
                example_drive, example_load = arrays[-1], ()
            trajectory, drive_consts, load_consts = _pallas_trajectory_for(
                keys, lkeys, len(timepoints), example_drive, example_load,
                dtype, tiled=True,
            )
            if has_pallas_loading:
                arrays = arrays[:-2] + (
                    arrays[-2] + drive_consts, arrays[-1] + load_consts
                )
                arr_axes = tuple(
                    0 if f else None for f in tiled_flags
                ) + (None, None)
            else:
                arrays = arrays[:-1] + (arrays[-1] + drive_consts,)
                arr_axes = tuple(
                    0 if f else None for f in tiled_flags
                ) + (None,)

            U0 = tp(jax.vmap(lambda y: _to_planes(y, g_n1, g_n2))(y0_b[:, 0]))
            V0 = tp(jax.vmap(lambda y: _to_planes(y, g_n1, g_n2))(y0_b[:, 1]))

            off = 6 if has_pallas_loading else 2

            def run_one(U0_t, V0_t, arrs):
                inertia_p = arrs[-5 - off]
                damping_c = arrs[-4 - off]
                mask_p = arrs[-3 - off]
                inv_m = mask_p / inertia_p
                F0 = trajectory.force_fn(U0_t, timepoints[0], arrs)
                A0 = (F0 - damping_c * V0_t) * inv_m
                return trajectory((U0_t, V0_t, A0), timepoints, arrs)

            outU, outV, _ = jax.vmap(run_one, in_axes=(0, 0, arr_axes))(
                U0, V0, arrays
            )

            def to_fields(x):
                x = _tilemod.untile_planes(x, b1, b2)  # (Bp, T-1, 3, n2, n1)
                return jnp.moveaxis(x, 2, -1).reshape(
                    Bp, x.shape[1], n_blocks, 3
                )

            ys = jnp.concatenate(
                [
                    y0_b[:, None],
                    jnp.stack([to_fields(outU), to_fields(outV)], axis=2),
                ],
                axis=1,
            )  # (Bp, T, 2, nb, 3)

            if dof_set.n_constrained:
                cparams = cp.constraint_params

                def drive_and_rate(t):
                    return jax.jvp(
                        lambda tt: _drive_values(tt, cparams), (t,),
                        (jnp.ones_like(t),),
                    )

                c_vals, c_rates = jax.vmap(drive_and_rate)(timepoints)
                u = ys[:, :, 0].at[
                    :, :,
                    dof_set.constrained_blocks, dof_set.constrained_dofs,
                ].set(c_vals[None])
                v = ys[:, :, 1].at[
                    :, :,
                    dof_set.constrained_blocks, dof_set.constrained_dofs,
                ].set(c_rates[None])
                ys = jnp.stack([u, v], axis=2)
            return ys[:B]

        _wrapped = custom_batching.custom_vmap(_plain_solve)

        @_wrapped.def_vmap
        def _tiled_vmap_rule(
            axis_size, in_batched, state0, timepoints, control_params
        ):
            s0_b, t_b, cp_bools = in_batched

            def _any(tree):
                return any(bool(x) for x in jax.tree.leaves(tree))

            # A guarded solver must NOT design-tile: the guard's risk
            # predicate max-reduces travel over the whole super-lattice,
            # so one spiking design would refine every pack-mate's
            # integration — vmap(solve)[j] would depend on pack
            # composition. Guarded populations run plain vmap (lax.cond
            # becomes a per-design select — correct, both branches
            # execute) or the rerouted sibling.
            eligible = guard is None and not (
                _any(t_b)
                or _any(cp_bools.constraint_params)
                or _any(cp_bools.loading_params)
                or _any(cp_bools.mechanical_params.contact_params)
            )
            oversized = (
                _max_tiled_batch is not None and axis_size > _max_tiled_batch
            )
            if not eligible or oversized:
                axes = jax.tree.map(lambda b: 0 if b else None, in_batched)
                # Oversized populations (and, under method="auto", all
                # un-tileable batches) run the XLA-scan forward — faster
                # than a plain vmap of the Pallas kernel at any measured
                # batch size. An EXPLICIT "verlet_pallas" with
                # batch_tiling={"max_batch": N} keeps Pallas numerics for
                # small un-tileable batches (scenario sweeps) and only
                # switches backend past its own cap.
                reroute = _max_tiled_batch is not None and (
                    oversized or was_auto
                )
                target = _fallback_solve() if reroute else _plain_solve
                out = jax.vmap(target, in_axes=tuple(axes))(
                    state0, timepoints, control_params
                )
                return out, True
            return (
                _tiled_solve(
                    state0, bool(s0_b), timepoints, control_params,
                    cp_bools, axis_size,
                ),
                True,
            )

        solve_dynamics = _make_batch_dispatcher(_plain_solve, _wrapped)
        solve_dynamics._tiling_fallback_cache = _fallback_cache

    elif (
        method == "verlet_pallas"
        and kagome_grid is not None
        and batch_tiling != "off"
    ):
        # Kagome design tiling (r5): the same super-lattice trick as the
        # quads rule above, on CELL planes — B2 = 128 // n1 designs side
        # by side along the lane axis, B1 along a leading dim. Only the
        # boundary-2 bond family (cell (j, i) <-> (j, i+1)) crosses lane
        # seams: seam bonds get zero stiffness + a safe (1, 0) reference
        # and the boundary-2 contact pairs are zeroed through the seam
        # mask leaf (verlet_kagome.kagome_grid_energy_planes
        # b2_contact_mask). Populations past the measured crossover (or
        # un-tileable ones under method="auto") reroute to the lazily
        # built verlet_ckpt sibling, whose lane-packed XLA scan wins at
        # scale (KAGOME_MULTISTART.json).
        from jax import custom_batching

        from difflexmm_tpu.ops.pallas import tiling as _tilemod

        _plain_solve = solve_dynamics
        _tile_cfg = batch_tiling if isinstance(batch_tiling, dict) else {}
        _max_tiled_batch = _tile_cfg.get(
            "max_batch",
            _AUTO_MAX_TILED_BATCH_KAGOME if was_auto else None,
        )
        _fallback_solve, _fallback_cache = _lazy_fallback(
            _setup_kwargs, _tile_cfg.get("fallback_method", "verlet_ckpt")
        )

        def _kagome_tiled_solve(
            state0, s0_batched, timepoints, cp, cp_bools, B
        ):
            state0 = jnp.asarray(state0)
            dtype = state0.dtype
            timepoints = jnp.asarray(timepoints).astype(dtype)
            b1_cfg = _tile_cfg.get("b1")
            if b1_cfg is None:
                b1_cfg = max(1, _KAGOME_MAX_SUBLANES // g_n2)
            b1, b2, n_tiles = _tilemod.choose_tiling(
                B, g_n1, g_n2, b1_cfg, _tile_cfg.get("b2")
            )
            Bp = b1 * b2 * n_tiles

            def prep(x, batched):
                x = jnp.asarray(x)
                if batched:
                    return _tilemod.pad_batch(x, Bp)
                return jnp.broadcast_to(x[None], (Bp,) + x.shape)

            gp_b = jax.tree.map(
                prep, cp.geometrical_params, cp_bools.geometrical_params
            )
            mp_b = jax.tree.map(
                prep, cp.mechanical_params, cp_bools.mechanical_params
            )
            y0_b = prep(state0 * dof_set.free_mask, s0_batched)

            def fixed_core(gp, mp):
                cp1 = cp._replace(
                    geometrical_params=gp, mechanical_params=mp
                )
                return _kagome_fixed_core(cp1, _resolve_inertia(cp1))

            (cnv, cen, ref_i, ref_b1, ref_b2,
             ks_i, ksh_i, kr_i, ks_b1, ksh_b1, kr_b1,
             ks_b2, ksh_b2, kr_b2,
             cmin, ccut, kc, inert, damp, mask) = (
                jax.vmap(fixed_core)(gp_b, mp_b)
            )

            i_shape = (g_n2, g_n1)
            b1_shape = (g_n2 - 1, g_n1)
            b2_shape = (g_n2, g_n1 - 1)

            def full(x, shape):
                while x.ndim < 1 + len(shape):
                    x = x[..., None]
                return jnp.broadcast_to(x, (Bp,) + shape)

            def tp(x):
                return _tilemod.tile_planes(x, b1, b2)

            def th(x, pad_value=0.0):
                return _tilemod.tile_h_planes(x, b1, b2, pad_value)

            # Order must match _kagome_energy_of(tiled=True): 14 physics
            # leaves, 3 contact scalars, the boundary-2 seam contact
            # mask, then the solver tail.
            fixed_tiled = (
                tp(cnv), tp(cen),
                tp(ref_i), tp(ref_b1),
                # Seam reference vectors are (1, 0): a zero reference
                # would make the ligament's 1/l0^2 terms 0/0 at k = 0.
                jnp.stack(
                    [th(ref_b2[:, 0], 1.0), th(ref_b2[:, 1], 0.0)], axis=1
                ),
                tp(full(ks_i, i_shape)), tp(full(ksh_i, i_shape)),
                tp(full(kr_i, i_shape)),
                tp(full(ks_b1, b1_shape)), tp(full(ksh_b1, b1_shape)),
                tp(full(kr_b1, b1_shape)),
                th(full(ks_b2, b2_shape)), th(full(ksh_b2, b2_shape)),
                th(full(kr_b2, b2_shape)),
                cmin[0], ccut[0], kc[0],
                _tilemod.h_seam_mask(g_n1, b2, dtype),
                tp(inert), tp(damp), tp(mask),
                S[0], S[1], _tilemod.tile_scatter_cols(S[2], b2),
            )
            tiled_flags = (
                [True] * 14 + [False] * 4 + [True] * 3 + [False] * 3
            )
            if has_pallas_loading:
                fixed_tiled = fixed_tiled + (
                    S_load[0], S_load[1],
                    _tilemod.tile_scatter_cols(S_load[2], b2),
                )
                tiled_flags += [False] * 3

            keys = tuple(sorted(cp.constraint_params.keys()))
            drive_args = [cp.constraint_params[k] for k in keys]
            loading_params = cp.loading_params or {}
            lkeys = tuple(sorted(loading_params.keys()))
            load_args = (
                [loading_params[k] for k in lkeys]
                if has_pallas_loading else None
            )
            arrays = normalize_arrays(
                fixed_tiled, drive_args, dtype, load_args=load_args
            )
            if has_pallas_loading:
                example_drive, example_load = arrays[-2], arrays[-1]
            else:
                example_drive, example_load = arrays[-1], ()
            trajectory, drive_consts, load_consts = _pallas_trajectory_for(
                keys, lkeys, len(timepoints), example_drive, example_load,
                dtype, tiled=True,
            )
            if has_pallas_loading:
                arrays = arrays[:-2] + (
                    arrays[-2] + drive_consts, arrays[-1] + load_consts
                )
                arr_axes = tuple(
                    0 if f else None for f in tiled_flags
                ) + (None, None)
            else:
                arrays = arrays[:-1] + (arrays[-1] + drive_consts,)
                arr_axes = tuple(
                    0 if f else None for f in tiled_flags
                ) + (None,)

            U0 = tp(jax.vmap(lambda y: _to_planes(y, g_n1, g_n2))(y0_b[:, 0]))
            V0 = tp(jax.vmap(lambda y: _to_planes(y, g_n1, g_n2))(y0_b[:, 1]))

            off = 6 if has_pallas_loading else 2

            def run_one(U0_t, V0_t, arrs):
                inertia_p = arrs[-5 - off]
                damping_c = arrs[-4 - off]
                mask_p = arrs[-3 - off]
                inv_m = mask_p / inertia_p
                F0 = trajectory.force_fn(U0_t, timepoints[0], arrs)
                A0 = (F0 - damping_c * V0_t) * inv_m
                return trajectory((U0_t, V0_t, A0), timepoints, arrs)

            outU, outV, _ = jax.vmap(run_one, in_axes=(0, 0, arr_axes))(
                U0, V0, arrays
            )

            def to_fields(x):
                x = _tilemod.untile_planes(x, b1, b2)  # (Bp, T-1, 6, n2, n1)
                T1 = x.shape[1]
                x = x.reshape(Bp, T1, 2, 3, g_n2, g_n1)
                x = jnp.transpose(x, (0, 1, 4, 5, 2, 3))
                return x.reshape(Bp, T1, n_blocks, 3)

            ys = jnp.concatenate(
                [
                    y0_b[:, None],
                    jnp.stack([to_fields(outU), to_fields(outV)], axis=2),
                ],
                axis=1,
            )  # (Bp, T, 2, nb, 3)

            if dof_set.n_constrained:
                cparams = cp.constraint_params

                def drive_and_rate(t):
                    return jax.jvp(
                        lambda tt: _drive_values(tt, cparams), (t,),
                        (jnp.ones_like(t),),
                    )

                c_vals, c_rates = jax.vmap(drive_and_rate)(timepoints)
                u = ys[:, :, 0].at[
                    :, :,
                    dof_set.constrained_blocks, dof_set.constrained_dofs,
                ].set(c_vals[None])
                v = ys[:, :, 1].at[
                    :, :,
                    dof_set.constrained_blocks, dof_set.constrained_dofs,
                ].set(c_rates[None])
                ys = jnp.stack([u, v], axis=2)
            return ys[:B]

        _kwrapped = custom_batching.custom_vmap(_plain_solve)

        @_kwrapped.def_vmap
        def _kagome_vmap_rule(
            axis_size, in_batched, state0, timepoints, control_params
        ):
            s0_b, t_b, cp_bools = in_batched

            def _any(tree):
                return any(bool(x) for x in jax.tree.leaves(tree))

            eligible = guard is None and not (
                _any(t_b)
                or _any(cp_bools.constraint_params)
                or _any(cp_bools.loading_params)
                or _any(cp_bools.mechanical_params.contact_params)
            )
            oversized = (
                _max_tiled_batch is not None and axis_size > _max_tiled_batch
            )
            if not eligible or oversized:
                axes = jax.tree.map(lambda b: 0 if b else None, in_batched)
                reroute = _max_tiled_batch is not None and (
                    oversized or was_auto
                )
                target = _fallback_solve() if reroute else _plain_solve
                out = jax.vmap(target, in_axes=tuple(axes))(
                    state0, timepoints, control_params
                )
                return out, True
            return (
                _kagome_tiled_solve(
                    state0, bool(s0_b), timepoints, control_params,
                    cp_bools, axis_size,
                ),
                True,
            )

        solve_dynamics = _make_batch_dispatcher(_plain_solve, _kwrapped)
        solve_dynamics._tiling_fallback_cache = _fallback_cache

    solve_dynamics.dof_set = dof_set
    solve_dynamics.rhs = rhs
    solve_dynamics.constrained_energy = constrained_energy
    return solve_dynamics
