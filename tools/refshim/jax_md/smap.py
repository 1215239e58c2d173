"""jax-md ``smap.bond`` shim (public API semantics, bond_types=None path).

jax-md's ``smap.bond(fn, displacement_or_metric, static_bonds, ...)`` returns
a function ``mapped(R, **kwargs)`` that (1) gathers the two endpoint rows of
``R`` for every bond in ``static_bonds``, (2) maps the displacement/metric
function over bonds, and (3) sums ``fn`` over the result with the kwargs
passed through (with ``static_bond_types=None`` parameters are forwarded
unchanged; the reference's bond-energy functions broadcast per-bond arrays
internally — see reference difflexmm/energy.py:120-197).
"""

import jax.numpy as jnp
from jax import vmap


def bond(fn, displacement_or_metric, static_bonds=None, static_bond_types=None,
         **static_kwargs):
    if static_bond_types is not None:
        raise NotImplementedError(
            "shim supports the static_bond_types=None path only "
            "(the only one the reference uses)")
    bonds = jnp.asarray(static_bonds)

    def mapped(R, **dynamic_kwargs):
        kwargs = {**static_kwargs, **dynamic_kwargs}
        Ra = R[bonds[:, 0]]
        Rb = R[bonds[:, 1]]
        d = vmap(displacement_or_metric)(Ra, Rb)
        # jax-md uses util.high_precision_sum here; the reference always runs
        # float64, where jnp.sum is identical.
        return jnp.sum(fn(d, **kwargs))

    return mapped
