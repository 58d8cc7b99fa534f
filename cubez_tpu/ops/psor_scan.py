"""Fast lexicographic point-SOR via diagonal-plane affine scans.

The reference's psor (cz_solver.f90:207-269) is serial Gauss-Seidel in
(j, i, k) order.  Its data-dependency DAG admits the classic hyperplane
ordering (i+j+k = const), but updating one masked hyperplane per step does
O(N^3) work for O(N^2) updates — O(N^4) per sweep, ~67 Mcells/s at 128^3
(the round-3 implementation, kept in ops/stencil.py::psor_sweep for bitwise
reference).  This module restores O(N^3) per sweep with two observations:

1. **K-lines are affine recurrences.**  Within a line (i, j), the GS update
   is x(k) = a(k) * x(k-1) + u(k) where every u(k) term is known before the
   line starts (transverse neighbors at i-1/j-1 are NEW, i+1/j+1 and k+1 are
   OLD) — a first-order linear recurrence, solved in log2(K) steps by
   ``jax.lax.associative_scan`` over composed affine maps.  For the constant
   operator a = omega/6; for MAF a(k) = omega * wzm(k)/dd(k)
   (cz_maf.f90:94-105).

2. **Lines form a 2D wavefront.**  Line (i, j) needs lines (i-1, j) and
   (i, j-1) new, (i+1, j) and (i, j+1) old — so all lines on diagonal
   d = i+j update together, and a sweep is a fori_loop over 2N-3 diagonals
   (vs 3N-4 hyperplanes), each step O(K * N_lines) work.  The field is held
   in a SKEWED layout S[k, i, d] = X[k, i, d-i] for the loop so each
   diagonal is a contiguous (K, I) column slice; skew/unskew are one gather
   each per sweep.

Same dependency order as the serial reference -> same iteration counts; the
affine-scan association changes rounding (like every other solver here vs
the Fortran loops), so histories agree to fp tolerance, not bitwise.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _skew_tables(ni: int, nj: int):
    """(J_idx[i, d], valid[i, d]) for S[k, i, d] = X[k, i, d - i]."""
    D = ni + nj - 1
    ii = np.arange(ni)[:, None]
    dd = np.arange(D)[None, :]
    jj = dd - ii
    valid = (jj >= 0) & (jj < nj)
    return np.clip(jj, 0, nj - 1), valid


def _affine_combine(left, right):
    # x -> a2*(a1*x + u1) + u2 = (a1*a2)*x + (a2*u1 + u2)
    a1, u1 = left
    a2, u2 = right
    return a1 * a2, a2 * u1 + u2


def make_psor_diag_step(shape_kij, dtype, omega, mc=None):
    """Build ``step(x, b) -> (x_new, sum(dp^2))`` — one full lexicographic
    point-SOR sweep (psor / psor_maf semantics).

    ``mc``: MafCoeffs for the variable-coefficient form (psor_maf,
    cz_maf.f90:23-114); None = constant coefficients (cz_solver.f90:207-269).
    """
    nk, ni, nj = shape_kij
    D = ni + nj - 1
    j_idx_np, valid_np = _skew_tables(ni, nj)
    # inner-point validity of each (i, d) line: 1 <= i <= ni-2, 1 <= j <= nj-2
    line_np = valid_np.copy()
    line_np &= (np.arange(ni)[:, None] >= 1) & (np.arange(ni)[:, None] <= ni - 2)
    jj = j_idx_np
    line_np &= (jj >= 1) & (jj <= nj - 2)

    j_idx = jnp.asarray(j_idx_np)  # (ni, D)
    valid = jnp.asarray(valid_np, dtype=dtype)
    line_ok = jnp.asarray(line_np, dtype=dtype)  # (ni, D)
    j_un = jnp.asarray(
        np.arange(ni)[:, None] + np.arange(nj)[None, :]
    )  # (ni, nj): d = i + j

    om = jnp.asarray(omega, dtype)
    one = jnp.asarray(1.0, dtype)

    if mc is None:
        r6 = jnp.asarray(1.0 / 6.0, dtype)
        a_line = om * r6  # constant recurrence coefficient
    else:
        # skewed per-(i,d) transverse weight tables; K-axis tables stay 1D.
        c1 = jnp.asarray(mc.c1, dtype).reshape(-1)  # (ni,)
        c7 = jnp.asarray(mc.c7, dtype).reshape(-1)
        c2 = jnp.asarray(mc.c2, dtype).reshape(-1)  # (nj,)
        c8 = jnp.asarray(mc.c8, dtype).reshape(-1)
        c3 = jnp.asarray(mc.c3, dtype).reshape(-1)  # (nk,)
        c9 = jnp.asarray(mc.c9, dtype).reshape(-1)
        half = jnp.asarray(0.5, dtype)
        wxp = (c1 + half * c7)[None, :, None]  # (1, ni, 1) -> bcast (k,i,d)
        wxm = (c1 - half * c7)[None, :, None]
        wyp_j = c2 + half * c8  # (nj,)
        wym_j = c2 - half * c8
        wyp = wyp_j[j_idx][None]  # (1, ni, D) skewed
        wym = wym_j[j_idx][None]
        wzp_k = (c3 + half * c9)[:, None]  # (nk, 1): broadcasts over (k, i)
        wzm_k = (c3 - half * c9)[:, None]
        dd = (
            2.0 * (c1[None, :, None] + c2[j_idx][None] + c3[:, None, None])
        ).astype(dtype)  # (nk, ni, D)
        inv_dd = 1.0 / dd
        a_line = None  # varies: built per diagonal

    def step(x, b):
        # ---- skew both fields: S[k, i, d] = X[k, i, d-i] ------------------
        gidx = jnp.broadcast_to(j_idx[None], (nk, ni, D))
        S = jnp.take_along_axis(x, gidx, axis=2) * valid[None]
        Bs = jnp.take_along_axis(b, gidx, axis=2) * valid[None]

        def body(d, carry):
            S, r2 = carry
            xc = jax.lax.dynamic_slice_in_dim(S, d, 1, axis=2)[..., 0]  # (nk, ni)
            xm1 = jax.lax.dynamic_slice_in_dim(S, d - 1, 1, axis=2)[..., 0]
            xp1 = jax.lax.dynamic_slice_in_dim(S, d + 1, 1, axis=2)[..., 0]
            bc = jax.lax.dynamic_slice_in_dim(Bs, d, 1, axis=2)[..., 0]
            lm = jax.lax.dynamic_slice_in_dim(line_ok, d, 1, axis=1)[:, 0]  # (ni,)

            # transverse neighbors in skewed coords:
            #   (i-1, j)   -> column d-1, row i-1     (NEW)
            #   (i, j-1)   -> column d-1, row i       (NEW)
            #   (i+1, j)   -> column d+1, row i+1     (OLD)
            #   (i, j+1)   -> column d+1, row i       (OLD)
            xm1_im1 = jnp.pad(xm1[:, :-1], ((0, 0), (1, 0)))
            xp1_ip1 = jnp.pad(xp1[:, 1:], ((0, 0), (0, 1)))

            if mc is None:
                T = xm1_im1 + xm1 + xp1_ip1 + xp1
                src = T - bc + jnp.pad(xc[1:], ((0, 1), (0, 0)))  # + x_old(k+1)
                u = (one - om) * xc + om * r6 * src
                a = jnp.full_like(u, a_line)
            else:
                wyp_d = jax.lax.dynamic_slice_in_dim(wyp, d, 1, axis=2)[..., 0]
                wym_d = jax.lax.dynamic_slice_in_dim(wym, d, 1, axis=2)[..., 0]
                idd = jax.lax.dynamic_slice_in_dim(inv_dd, d, 1, axis=2)[..., 0]
                T = (
                    wxm[..., 0] * xm1_im1
                    + wym_d * xm1
                    + wxp[..., 0] * xp1_ip1
                    + wyp_d * xp1
                )
                # MAF takes rp + b (cz_maf.f90:101) — note the + sign
                src = T + bc + wzp_k * jnp.pad(xc[1:], ((0, 1), (0, 0)))
                u = (one - om) * xc + om * idd * src
                a = om * wzm_k * idd

            # affine recurrence x(k) = a(k) x(k-1) + u(k) over inner k;
            # x(0) is the Dirichlet value, seeded as (a=0, u=x(0)) so the
            # prefix scan threads it through every x(k)
            a = a.at[0].set(0.0)
            u = u.at[0].set(xc[0])
            _, xnew = jax.lax.associative_scan(_affine_combine, (a, u), axis=0)
            # rows outside the inner K range keep their (boundary) values
            kin = (jnp.arange(nk) >= 1) & (jnp.arange(nk) <= nk - 2)
            upd = kin[:, None].astype(dtype) * lm[None, :]
            dp = (xnew - xc) * upd
            xcol = xc + dp
            S = jax.lax.dynamic_update_slice_in_dim(
                S, xcol[..., None], d, axis=2
            )
            return S, r2 + jnp.sum(dp * dp)

        S, r2 = jax.lax.fori_loop(
            2, ni + nj - 4 + 1, body, (S, jnp.zeros((), dtype))
        )

        # ---- unskew: X[k, i, j] = S[k, i, i+j] ----------------------------
        uidx = jnp.broadcast_to(j_un[None], (nk, ni, nj))
        x_new = jnp.take_along_axis(S, uidx, axis=2)
        return x_new, r2

    return step
