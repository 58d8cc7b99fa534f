"""1D tridiagonal solvers: Thomas (TDMA) and pointwise PCR.

Mirrors the reference's standalone kernels used by example/tri
(tdma, src/cz_cpp/tdma.cpp:25-69; obsolete.f90:40-166; cz_pcr.cpp:42-96).
The Thomas scan is the sequential ground truth for unit tests; batched PCR in
``ops/pcr.py`` is the production path.

Systems are  a[i] x[i-1] + b[i] x[i] + c[i] x[i+1] = d[i]  with a[0]=c[n-1]=0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tdma(a, b, c, d):
    """Thomas algorithm via lax.scan; supports batched trailing dims.

    Args are shape (n, ...); returns x of the same shape.
    """
    def fwd(carry, abcd):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = abcd
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(d[0])
    (_, _), (cp, dp) = jax.lax.scan(
        fwd, (zeros, zeros), (a, b, c, d)
    )

    def bwd(x_next, cpdp):
        cpi, dpi = cpdp
        x = dpi - cpi * x_next
        return x, x

    _, x_rev = jax.lax.scan(bwd, zeros, (cp, dp), reverse=True)
    return x_rev


def tdma_unit_offdiag(d, n=None):
    """Solve the PCR test system with b=1, a=c=-1/6 interior (the line system
    of pcr, cz_solver.f90:555-579) via Thomas — test oracle."""
    nn = d.shape[0]
    a = jnp.full((nn,) + (1,) * (d.ndim - 1), -1.0 / 6.0, d.dtype)
    c = jnp.full_like(a, -1.0 / 6.0)
    b = jnp.ones_like(a)
    a = a.at[0].set(0.0)
    c = c.at[-1].set(0.0)
    bcast = jnp.broadcast_to
    shp = d.shape
    return tdma(bcast(a, shp), bcast(b, shp), bcast(c, shp), d)


def num_stage(n: int) -> int:
    """Smallest pn with 2**pn > n (getNumStage, cz.h:293-300)."""
    pn = 1
    while (1 << pn) <= n:
        pn += 1
    return pn


def _shift_k(x, dd):
    """out[i] = x[i + dd] along axis 0, zero-filled at the ends."""
    if dd == 0:
        return x
    zshape = (abs(dd),) + x.shape[1:]
    z = jnp.zeros(zshape, x.dtype)
    if dd > 0:
        return jnp.concatenate([x[dd:], z], axis=0)
    return jnp.concatenate([z, x[:dd]], axis=0)


def pcr_1d(a, c, d, pn=None):
    """Parallel cyclic reduction for unit-diagonal tridiagonal systems
    (b == 1), the normalized form every CubeZ line solve uses; supports
    batched trailing dims.

    Runs stages p = 1..pn-1 with zero-extension semantics
    (pcr_eda, cz_solver.f90:883-1045), then inverts the remaining 2x2 pairs
    (k, k+2^(pn-1)) directly (cz_solver.f90:996-1013).
    """
    n = a.shape[0]
    if pn is None:
        pn = num_stage(n)

    for p in range(1, pn):
        s = 2 ** (p - 1)
        al, cl, dl = _shift_k(a, -s), _shift_k(c, -s), _shift_k(d, -s)
        ar, cr, dr = _shift_k(a, s), _shift_k(c, s), _shift_k(d, s)
        e = 1.0 / (1.0 - a * cl - c * ar)
        a, c, d = -e * a * al, -e * c * cr, e * (d - a * dl - c * dr)

    s = 2 ** (pn - 1)
    pad = ((0, 2 * s - n),) + ((0, 0),) * (d.ndim - 1)
    d_hi = jnp.pad(d, pad)[s : 2 * s]
    a_hi = jnp.pad(a, pad)[s : 2 * s]
    c_lo = c[:s]
    d_lo = d[:s]
    jj = 1.0 / (1.0 - a_hi * c_lo)
    x_lo = (d_lo - c_lo * d_hi) * jj
    x_hi = (d_hi - a_hi * d_lo) * jj
    return jnp.concatenate([x_lo, x_hi], axis=0)[:n]
