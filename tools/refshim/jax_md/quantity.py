"""jax-md ``quantity.force`` shim: force = -grad(energy) w.r.t. first arg."""

import jax


def force(energy_fn):
    grad_fn = jax.grad(energy_fn)

    def force_fn(R, *args, **kwargs):
        return -grad_fn(R, *args, **kwargs)

    return force_fn
