"""Dense/fast-diagonalization line solvers — the MXU-native alternative to
PCR for the K-direction tridiagonal solves.

TPU rationale: a PCR stage is log2(n) rounds of sublane rotates (VPU data
movement); the MXU solves the same system as one dense matmul.  For the
constant-coefficient operator every inner line shares the SAME tridiagonal
T = tridiag(-1/6, 1, -1/6) (a(kst)=0/c(ked)=0 ends and the Dirichlet fold
into d are exactly the reference's line system, cz_solver.f90:566-579), so

    x = T^-1 d        -- one (n, n) x (n, J) matmul per line plane.

For the variable-coefficient (MAF) operator the line matrix separates as

    T(i,j) = D + lambda(i,j) I,
    D      = tridiag(-wzm_k, 2 c3_k, -wzp_k),   wzm/wzp from the K metric
    lambda = 2 (c1_i + c2_j)                     (cz_maf.f90:519-572 scaled
                                                  by 2(c1+c2+c3) = 1/dw)

so one eigendecomposition D = V diag(mu) V^-1 (computed once per solve, in
float64, on the host) solves every line in the cube:

    x = V [ (V^-1 d) / (mu + lambda(i,j)) ]     -- two matmuls + a scale.

This is the classical fast-diagonalization method for separable elliptic
operators, mapped onto the MXU.  D is symmetrized by a diagonal similarity
(possible whenever wzm_{k+1} * wzp_k > 0, true for monotone grids), so the
eigenbasis is orthogonal and the f32 solve error stays at roundoff
(measured ~1e-6 relative; see tests/test_fastdiag.py).
"""

from __future__ import annotations

import numpy as np

R6 = 1.0 / 6.0


def const_line_inverse(n: int, dtype=np.float32) -> np.ndarray:
    """(n, n) inverse of tridiag(-1/6, 1, -1/6), computed in float64."""
    T = (
        np.eye(n)
        + np.diag(np.full(n - 1, -R6), 1)
        + np.diag(np.full(n - 1, -R6), -1)
    )
    return np.linalg.inv(T).astype(dtype)


def maf_line_coeffs(mc, n: int):
    """(wzm, wzp, diag2c3, lam_i, lam_j) float64 1-D tables for the inner
    K range (k = 1..n on the 0-based grid) from a MafCoeffs bundle."""
    c3 = np.asarray(mc.c3, np.float64).reshape(-1)[1 : n + 1]
    c9 = np.asarray(mc.c9, np.float64).reshape(-1)[1 : n + 1]
    wzm = c3 - 0.5 * c9
    wzp = c3 + 0.5 * c9
    c1 = np.asarray(mc.c1, np.float64).reshape(-1)
    c2 = np.asarray(mc.c2, np.float64).reshape(-1)
    return wzm, wzp, 2.0 * c3, 2.0 * c1, 2.0 * c2


def tridiag_eig(lo, dg, up):
    """Eigendecomposition (V, Vinv, mu) of tridiag(lo, dg, up), float64.

    ``lo``: (n-1,) entries at row k, col k-1; ``up``: row k, col k+1.
    Symmetrized via diagonal similarity when the off-diagonal products
    are positive — s_k / s_{k-1} = sqrt(lo_k / up_{k-1}), B = S^-1 D S
    symmetric — so the eigenbasis is orthogonal (the stable path);
    general eig fallback otherwise (still real for M-matrices).  Shared
    by the 1D MAF line solver and the 3D direct solver
    (solvers/direct.py)."""
    lo = np.asarray(lo, np.float64)
    up = np.asarray(up, np.float64)
    dg = np.asarray(dg, np.float64)
    prod = lo * up
    if np.all(prod > 0):
        ratio = np.sqrt(lo / up)
        s = np.concatenate([[1.0], np.cumprod(ratio)])
        off = np.sign(up) * np.sqrt(prod)
        B = np.diag(dg) + np.diag(off, 1) + np.diag(off, -1)
        mu, Q = np.linalg.eigh(B)
        V = s[:, None] * Q
        Vinv = Q.T / s[None, :]
    else:
        D = np.diag(dg) + np.diag(lo, -1) + np.diag(up, 1)
        mu, V = np.linalg.eig(D)
        mu, V = mu.real, V.real
        Vinv = np.linalg.inv(V)
    return V, Vinv, mu


def maf_line_diag(mc, n: int, dtype=np.float32):
    """Eigendecomposition tables (V, Vinv, mu) of D for the MAF line system.

    D rows: [-wzm_k, 2 c3_k, -wzp_k] with the first sub- and last
    super-diagonal absent (a(kst)=0 / c(ked)=0, cz_maf.f90:552-572).
    """
    wzm, wzp, d2c3, _li, _lj = maf_line_coeffs(mc, n)
    V, Vinv, mu = tridiag_eig(-wzm[1:], d2c3, -wzp[:-1])
    return V.astype(dtype), Vinv.astype(dtype), mu.astype(dtype)


def maf_lambda_table(mc, ni: int, nj: int, dtype=np.float32) -> np.ndarray:
    """(ni, nj) table of lambda(i, j) = 2 (c1_i + c2_j)."""
    c1 = np.asarray(mc.c1, np.float64).reshape(-1)[:ni]
    c2 = np.asarray(mc.c2, np.float64).reshape(-1)[:nj]
    return (2.0 * (c1[:, None] + c2[None, :])).astype(dtype)
