"""Design-tiled batching for the fused Pallas Verlet kernels.

Motivation. The SoA kernel's planes are (C, n2, n1); Mosaic pads the lane
(minor) dim to 128, so a 24-wide flagship lattice wastes 81% of every
vector op. Batched design sweeps (multi-start populations, restricted-space
candidates) run B INDEPENDENT lattices — so instead of a new batched
kernel, tile the designs onto ONE super-lattice and run the existing
kernel unchanged:

    per-design plane (C, n2, n1)  ->  tiled plane (C, B1, n2, B2 * n1)

- ``B2`` designs sit side by side along the lane axis (B2 = 128 // n1
  fills the lanes: 24-wide designs pack 5-up into 120/128 lanes);
- ``B1`` designs stack along an extra leading dim (Mosaic tiles only the
  trailing (n2, B2*n1) pair, so the leading dim just makes every
  elementwise op bigger — amortizing the per-op issue latency that bounds
  the single-design kernel);
- populations larger than B1*B2 vmap over a leading tile axis (the Pallas
  batching rule prepends it to the kernel grid).

Physics isolation between tiles:

- Vertical bonds/contacts never cross designs: the B1 copies live in a
  separate (untiled) leading dim, and lane columns belong to exactly one
  design.
- Horizontal bonds DO cross the B2 lane seams. Seam bonds get zero
  stiffness and a safe (1, 0) reference vector (a zero reference would
  make the ligament's 1/l0^2 terms 0/0 = NaN even at zero stiffness), and
  seam contact pairs are zeroed through ``h_seam_mask`` (an extra fixed
  leaf consumed by quad_grid_energy_planes' ``h_contact_mask``). The
  barrier itself is clamp-guarded, so masked seam "voids" at arbitrary
  angles contribute exactly zero energy and zero gradient.

Everything here is XLA-side data preparation (reshape/transpose/pad) —
the kernels never see the tiling, and the stored-boundary-state adjoint
works unchanged on the tiled shapes. Wiring into ``jax.vmap`` is a
``jax.custom_batching.custom_vmap`` rule installed by
``solver/dynamics.py`` (tiling is transparent to callers: a vmapped solve
gets tiled automatically when eligible, and falls back to plain vmap
otherwise). Gradient note: custom_vmap composes with vmap-then-grad
(grad of a vmapped objective) but NOT vmap-of-grad — batched drivers must
use the vjp-of-vmap order (see parallel/multistart.py).
"""

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

# Conservative cap on B1 * n2 (the sublane extent of every tiled plane):
# the interval body's grad-of-energy holds ~20 plane-sized residuals live,
# and scoped VMEM charges padded (sublane x 128-lane) tiles. Measured on
# v5e at the 24x16 flagship: B1=8 (128 sublanes) overflows the 16 MB
# scoped-vmem stack by 1.9 MB; B1=4 fits.
_MAX_SUBLANES = 64


def choose_tiling(
    batch: int,
    n1: int,
    n2: int,
    b1: Optional[int] = None,
    b2: Optional[int] = None,
) -> Tuple[int, int, int]:
    """Pick (B1, B2, n_tiles) for a population of ``batch`` designs.

    B2 fills the 128 lanes with side-by-side designs; B1 stacks more along
    the leading dim up to the VMEM-motivated sublane cap; the rest becomes
    a vmapped tile axis. Explicit ``b1``/``b2`` override the heuristics.
    """

    if b2 is None:
        b2 = max(1, 128 // n1)
    b2 = max(1, min(b2, batch))
    if b1 is None:
        b1 = max(1, _MAX_SUBLANES // n2)
    b1 = max(1, min(b1, -(-batch // b2)))
    per_tile = b1 * b2
    n_tiles = -(-batch // per_tile)
    return b1, b2, n_tiles


def tile_planes(x: jnp.ndarray, b1: int, b2: int) -> jnp.ndarray:
    """(T*B1*B2, *lead, M, N) per-design planes -> (T, *lead, B1, M, B2*N).

    Design order is tile-major, then B1, then B2 (the exact inverse of
    ``untile_planes``).
    """

    total = x.shape[0]
    t = total // (b1 * b2)
    lead = x.shape[1:-2]
    m, n = x.shape[-2:]
    x = x.reshape((t, b1, b2) + lead + (m, n))
    x = jnp.moveaxis(x, 2, -2)  # (t, b1, *lead, m, b2, n)
    x = x.reshape((t, b1) + lead + (m, b2 * n))
    return jnp.moveaxis(x, 1, 1 + len(lead))  # (t, *lead, b1, m, b2*n)


def untile_planes(y: jnp.ndarray, b1: int, b2: int) -> jnp.ndarray:
    """(T, *lead, B1, M, B2*N) -> (T*B1*B2, *lead, M, N); inverse of
    ``tile_planes``."""

    t = y.shape[0]
    lead = y.shape[1:-3]
    m = y.shape[-2]
    n = y.shape[-1] // b2
    y = jnp.moveaxis(y, 1 + len(lead), 1)  # (t, b1, *lead, m, b2*n)
    y = y.reshape((t, b1) + lead + (m, b2, n))
    y = jnp.moveaxis(y, -2, 2)  # (t, b1, b2, *lead, m, n)
    return y.reshape((t * b1 * b2,) + lead + (m, n))


def tile_h_planes(
    x: jnp.ndarray, b1: int, b2: int, pad_value: float = 0.0
) -> jnp.ndarray:
    """Per-design horizontal-bond planes (T*B1*B2, *lead, n2, n1-1) ->
    (T, *lead, B1, n2, B2*n1 - 1), inserting ``pad_value`` at the seam
    columns between adjacent designs."""

    pad = jnp.full(x.shape[:-1] + (1,), pad_value, x.dtype)
    t = tile_planes(jnp.concatenate([x, pad], axis=-1), b1, b2)
    return t[..., :-1]


def h_seam_mask(n1: int, b2: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, B2*n1 - 1) mask: 0 at horizontal pairs crossing a design seam.

    Pair column i' couples block column i' to i'+1; it crosses a seam iff
    i'+1 is a multiple of n1.
    """

    cols = np.arange(b2 * n1 - 1)
    mask = ((cols + 1) % n1 != 0).astype(np.float32)
    return jnp.asarray(mask[None, :], dtype)


def tile_scatter_cols(s_col: jnp.ndarray, b2: int) -> jnp.ndarray:
    """(k, n1) one-hot column factor -> (k, B2*n1) periodic factor hitting
    the same column inside every design tile (shared drive/loading values
    are scattered to all B2 copies by the same two matmuls)."""

    return jnp.concatenate([s_col] * b2, axis=1)


def pad_batch(x: jnp.ndarray, total: int) -> jnp.ndarray:
    """Pad a leading batch axis to ``total`` by repeating the last element
    (keeps the padded physics finite; padded outputs are sliced away and
    their cotangents are zero)."""

    b = x.shape[0]
    if b == total:
        return x
    reps = jnp.broadcast_to(x[-1:], (total - b,) + x.shape[1:])
    return jnp.concatenate([x, reps], axis=0)
