"""Math primitives with Pallas-lowerable substitutes.

Mosaic (Pallas TPU) has no ``atan2`` lowering; the physics needs it for the
nonlinear shear strain and the contact void angles. ``arctan2`` here
dispatches to ``jnp.arctan2`` normally and to a minimax-polynomial
implementation inside Pallas kernel traces (activated by the
``pallas_math`` context manager, used by the fused Verlet kernel).

The polynomial is the classic 8-term arctan approximation on [-1, 1]
(Abramowitz & Stegun 4.4.49 class, |error| < 2e-8 — below f32 resolution),
extended to the full plane with the standard quadrant reduction. Its AD
derivatives are the exact derivatives of the approximation, consistent to
the same tolerance.
"""

from contextlib import contextmanager

import jax.numpy as jnp


def _atan_unit(z):
    """arctan on |z| <= 1 via an odd minimax polynomial (f32 accuracy)."""

    z2 = z * z
    p = -0.0040540580
    p = p * z2 + 0.0218612288
    p = p * z2 - 0.0559098861
    p = p * z2 + 0.0964200441
    p = p * z2 - 0.1390853351
    p = p * z2 + 0.1994653599
    p = p * z2 - 0.3332985605
    p = p * z2 + 0.9999993329
    return z * p


def poly_arctan2(y, x):
    """Branch-free polynomial atan2 with standard quadrant reduction."""

    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    big = jnp.maximum(abs_x, abs_y)
    small = jnp.minimum(abs_x, abs_y)
    z = small / jnp.where(big > 0, big, 1.0)
    base = _atan_unit(z)
    # angle of (|x|, |y|) in the first quadrant
    first = jnp.where(abs_y > abs_x, jnp.pi / 2 - base, base)
    # reflect by quadrant
    angle = jnp.where(x >= 0, first, jnp.pi - first)
    return jnp.where(y >= 0, angle, -angle)


def interp_uniform(t, t0, dt, samples):
    """Linear interpolation of uniformly sampled data, gather-free.

    ``jnp.interp`` lowers to searchsorted + take (a gather), which Mosaic
    cannot compile — so experiment-playback drives inside the fused Pallas
    kernels use this instead: the interpolation weights are the linear hat
    functions ``max(0, 1 - |x - j|)`` evaluated on an index ramp, and the
    result is their dot with the sample vector (pure elementwise ops + one
    reduction, O(N) per evaluation). Out-of-range times clamp to the end
    samples, matching ``jnp.interp``'s default.

    Args:
        t: scalar (or any-shape) query time.
        t0, dt: the uniform sample grid ``t0 + dt * arange(N)``.
        samples: (N,) sampled values.
    """

    samples = jnp.asarray(samples)
    n = samples.shape[0]
    x = jnp.asarray(jnp.clip((t - t0) / dt, 0.0, n - 1.0))
    # Integer iota then cast: Mosaic's tpu.iota only produces integers.
    ramp = jnp.arange(n).astype(samples.dtype)
    weights = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - ramp))
    return jnp.sum(weights * samples, axis=-1)


_IMPL = {"arctan2": jnp.arctan2}


def arctan2(y, x):
    """Dispatchable arctan2 (jnp by default; polynomial under pallas_math)."""

    return _IMPL["arctan2"](y, x)


@contextmanager
def pallas_math():
    """Trace-time switch to Pallas-lowerable math substitutes."""

    previous = _IMPL["arctan2"]
    _IMPL["arctan2"] = poly_arctan2
    try:
        yield
    finally:
        _IMPL["arctan2"] = previous
