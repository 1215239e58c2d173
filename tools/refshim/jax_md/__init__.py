"""Minimal jax-md API shim for running the reference implementation.

The reference (``/root/reference``) depends on jax-md 0.2.5 for exactly two
symbols: ``smap.bond`` (reference difflexmm/energy.py:190-197) and
``quantity.force`` (reference difflexmm/dynamics.py:11,31). jax-md is not
installed in this image, so this package provides just those two functions
with jax-md's public semantics, letting the *unmodified* reference code run
for baseline measurement (BASELINE.md protocol). This shim is measurement
tooling only — the difflexmm_tpu framework itself has no jax-md dependency.
"""

from . import quantity, smap  # noqa: F401
