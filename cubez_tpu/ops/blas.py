"""Grid BLAS ops for BiCGSTAB (reference src/cz_f90/cz_blas.f90).

All ops act densely over (K, I, J) arrays; operations the reference restricts
to the inner index range are masked with the inner mask instead.  Work vectors
(r, r0, p, p_, q, s, s_, t_) are kept identically zero on the boundary shell,
which makes masked-dense and inner-loop semantics equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp

from .stencil import DD, nbr_sum


def dot1(p, msk):
    """sum p^2 over inner nodes (blas_dot1, cz_blas.f90:320-373)."""
    return jnp.sum(p * p * msk)


def dot2(p, q, msk):
    """sum p*q over inner nodes (blas_dot2, cz_blas.f90:386-437)."""
    return jnp.sum(p * q * msk)


def triad(x, y, a, msk):
    """z = a*x + y on inner nodes (blas_triad, cz_blas.f90:255-308)."""
    return (jnp.asarray(a, x.dtype) * x + y) * msk


def bicg_1(p, r, q, beta, omega, msk):
    """p = r + beta*(p - omega*q) (blas_bicg_1, cz_blas.f90:452-502)."""
    beta = jnp.asarray(beta, p.dtype)
    omega = jnp.asarray(omega, p.dtype)
    return (r + beta * (p - omega * q)) * msk


def bicg_2(z, x, y, a, b, msk):
    """z += a*x + b*y on inner nodes (blas_bicg_2, cz_blas.f90:517-566)."""
    a = jnp.asarray(a, z.dtype)
    b = jnp.asarray(b, z.dtype)
    return z + (a * x + b * y) * msk


def calc_ax(p, msk):
    """A x for the constant-coefficient 7-point operator:
    ap = sum(neighbors) - 6 p  (blas_calc_ax, cz_blas.f90:579-644), masked."""
    return (nbr_sum(p) - jnp.asarray(DD, p.dtype) * p) * msk


def calc_rk(p, b, msk):
    """r = b - A p (blas_calc_rk, cz_blas.f90:658-723), masked."""
    return (b - (nbr_sum(p) - jnp.asarray(DD, p.dtype) * p)) * msk
