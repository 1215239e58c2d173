"""Hinge characterization: identify ligament stiffnesses (k_stretch,
k_shear, k_rot) from force-displacement curves of quasi-static tension and
shear tests, by least squares through the differentiable solver.

Mirrors the reference's hinge-characterization notebook flow (reference
problems/hinge_characterization.py:563-721: displacement-controlled ramps,
reaction forces from grad(E) on the constrained DOFs, resampled target
curves, bounded gradient descent). Here the "experimental" curves are
generated from known ground-truth stiffnesses plus noise, so the fit is
verifiable end-to-end. Replace `synthetic_targets` with tracked data from
``difflexmm_tpu.tracking`` to fit a real sample. Run:

    python examples/hinge_characterization_fit.py [n_iterations] [out_dir]
"""

import sys
from pathlib import Path

# Self-bootstrap (no PYTHONPATH: it breaks the session's TPU plugin).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from difflexmm_tpu.models.hinge_characterization import (
    ForwardProblem,
    OptimizationProblem,
)
from difflexmm_tpu.utils import save_data


TRUE_K = (1.0, 0.018, 1.2e-3)


def make_problem(loading_type: str) -> ForwardProblem:
    return ForwardProblem(
        n1_cells=3, n2_cells=3, spacing=1.0, bond_length=0.1,
        initial_angle=0.22,
        k_stretch=1.0, k_shear=0.02, k_rot=1e-3,  # placeholders; fit below
        density=1.0, damping=1.0,
        loading_type=loading_type,
        amplitude=0.05, loading_rate=0.01,
        n_timepoints=25, n_substeps=48, method="verlet",
    )


def synthetic_targets(problems, noise: float = 0.01, seed: int = 0):
    """Force-displacement curves from the ground-truth stiffnesses with
    multiplicative measurement noise (stand-in for tracked experiments)."""

    rng = np.random.default_rng(seed)
    targets = {}
    for problem in problems:
        u, f = problem.force_displacement(*problem.solve(TRUE_K))
        f_noisy = jnp.asarray(
            np.asarray(f) * (1 + noise * rng.standard_normal(np.shape(f)))
        )
        targets[problem.loading_type] = jnp.stack(
            [u, f_noisy, noise * jnp.abs(f_noisy)]
        )
    return targets


def main(n_iterations: int = 30, out_dir: str = "out/hinge_fit") -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    problems = [make_problem("tension"), make_problem("shear")]
    for problem in problems:
        problem.setup()
    targets = synthetic_targets(problems)

    optimization = OptimizationProblem(problems, targets)
    optimization.setup_objective()

    # The three stiffnesses span 3 decades, so uniform-step GD (the
    # reference's naive_GD) crawls on k_rot. Fitting log-stiffnesses with
    # Adam makes the steps scale-free — objective_fn is an ordinary
    # differentiable function, so any optax optimizer drops in.
    import optax

    guess = (1.4, 0.03, 2e-3)  # deliberately off
    log_k = jnp.log(jnp.asarray(guess))
    objective_log = jax.jit(
        jax.value_and_grad(
            lambda lk: optimization.objective_fn(tuple(jnp.exp(lk)))
        )
    )
    opt = optax.adam(0.1)
    opt_state = opt.init(log_k)
    for _ in range(n_iterations):
        value, grad = objective_log(log_k)
        optimization.objective_values.append(float(value))
        optimization.design_values.append(tuple(jnp.exp(log_k)))
        updates, opt_state = opt.update(grad, opt_state)
        log_k = optax.apply_updates(log_k, updates)
    fitted = tuple(jnp.exp(log_k))
    optimization.fitted_responses = optimization.compute_fitted_responses(fitted)

    print("        k_stretch   k_shear     k_rot")
    print(f"true:   {TRUE_K[0]:<11.4g} {TRUE_K[1]:<11.4g} {TRUE_K[2]:.4g}")
    print(f"guess:  {guess[0]:<11.4g} {guess[1]:<11.4g} {guess[2]:.4g}")
    print(f"fitted: {float(fitted[0]):<11.4g} {float(fitted[1]):<11.4g} "
          f"{float(fitted[2]):.4g}")
    print(f"squared error: {optimization.objective_values[0]:.3e} -> "
          f"{optimization.objective_values[-1]:.3e}")

    save_data(out / "fit.pkl", optimization.to_dict())
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(problems), figsize=(10, 4))
        for ax, problem in zip(np.atleast_1d(axes), problems):
            u_t, f_t, _ = targets[problem.loading_type]
            u_f, f_f = optimization.fitted_responses[problem.loading_type]
            ax.plot(u_t, f_t, "o", ms=3, alpha=0.5, label="experiment")
            ax.plot(u_f, f_f, "-", label="fitted")
            ax.set(title=problem.loading_type, xlabel="displacement",
                   ylabel="reaction force")
            ax.legend()
        fig.tight_layout()
        fig.savefig(out / "force_displacement_fit.png", dpi=150)
        print(f"plot: {out / 'force_displacement_fit.png'}")
    except Exception as error:
        print(f"plot skipped ({error})")


if __name__ == "__main__":
    argv = sys.argv[1:3]
    main(
        n_iterations=int(argv[0]) if argv else 30,
        out_dir=argv[1] if len(argv) > 1 else "out/hinge_fit",
    )
