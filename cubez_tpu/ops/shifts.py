"""Zero-filled shift primitives for stencil/recurrence ops.

``shift(x, axis, d)`` returns an array of the same shape where
``out[idx] = x[idx + d]`` along ``axis`` and zero where ``idx + d`` is out of
range.  Implemented as pad+slice so XLA lowers it to a cheap slice (and, under
SPMD sharding, to a collective-permute halo exchange on the mesh axis).

Zero fill is safe for every consumer in this framework: out-of-range reads
only ever land on masked (non-updated) nodes or on PCR's zero-padded
coefficient ends (cz_solver.f90:919-929 zero-extends exactly like this).
"""

from __future__ import annotations

import jax.numpy as jnp


def shift(x: jnp.ndarray, axis: int, d: int) -> jnp.ndarray:
    """out[i] = x[i + d] along `axis`, zero-filled at the edges."""
    if d == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if d > 0:
        pad[axis] = (0, d)
        xp = jnp.pad(x, pad)
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(d, d + x.shape[axis])
    else:
        pad[axis] = (-d, 0)
        xp = jnp.pad(x, pad)
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, x.shape[axis])
    return xp[tuple(idx)]


def nbr6(x: jnp.ndarray):
    """The six face neighbors of every node, zero beyond the array edge.

    Returns (xm, xp, ym, yp, zm, zp) for layout (K, I, J):
      xm = x[i-1], xp = x[i+1]  (axis 1)
      ym = x[j-1], yp = x[j+1]  (axis 2)
      zm = x[k-1], zp = x[k+1]  (axis 0)
    """
    xp = shift(x, 1, +1)
    xm = shift(x, 1, -1)
    yp = shift(x, 2, +1)
    ym = shift(x, 2, -1)
    zp = shift(x, 0, +1)
    zm = shift(x, 0, -1)
    return xm, xp, ym, yp, zm, zp
