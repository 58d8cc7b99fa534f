"""3D fast-diagonalization DIRECT solver — a deliberate EXTENSION.

The cube operator is a separable Kronecker sum for BOTH coefficient
families this platform supports:

  constant (cz_blas.f90:579-644 convention, A x = sum(nbr) - 6 x):
      -A = Dz (+) Dx (+) Dy,        D = tridiag(-1, 2, -1) per axis
  MAF (cz_maf.f90:519-572 convention, dd x - rp = b):
       M = Dz (+) Dx (+) Dy,        Dz = tridiag(-wzm, 2 c3, -wzp), etc.
  ((+) = Kronecker sum over the inner grid; Dirichlet data folds into the
  RHS through the residual, exactly like the line solvers' boundary fold,
  cz_solver.f90:578-579.)

Diagonalizing each axis once (host, float64; symmetrized by the same
diagonal similarity as ops/fastdiag.py, so the eigenbasis is orthogonal
and the f32 apply stays at roundoff) solves the WHOLE cube directly:

    e = Vz Vx Vy [ (Vy^-1 Vx^-1 Vz^-1 r) / (mu_z + mu_x + mu_y) ]

— six dense (n x n) x (n x m) contractions, i.e. pure MXU work (~3 GFLOP
at 128^3, a few hundred microseconds on one v5e chip), where the
reference's fastest solver needs 1356 tridiagonal sweeps.  This is the
classical fast Poisson / fast-diagonalization method (the 3D extension
of the MXU line solves in pallas_kernels/lines.py), an algorithm class
the reference does not have.

Exposed as solver names ``fd`` / ``fd_maf``.  One "iteration" of the
driver = one direct solve applied as iterative refinement
(x += M^-1 (b - M x)), so f32 roundoff converges in 1-2 iterations at
eps = 1e-5 with unchanged history/eps semantics.  The stopping metric is
the omega=1 Jacobi-equivalent update, directly comparable to mg's
(solvers/multigrid.py docstring).

Sharded cost (measured, SCALING.md "Distributed fd"): under auto-SPMD
GSPMD executes the three contractions by ALL-GATHERING — compiled-HLO
inventory on the 8-device mesh shows 3 all-gathers + 6 all-reduces
totalling ~1.75x the global field received per device per solve (14.7 +
14.0 MB at 128^3 vs the 8.4 MB field).  Cheap in absolute terms for a
one-shot direct solve at bench scale, but the per-device traffic grows
with the GLOBAL N^3: the weak-scaling-safe formulation is 3 shard-LOCAL
contractions + 2 all-to-all transposes (N^3/P per device per transpose,
the standard distributed-FFT pattern) — deferred until multi-chip
hardware exists to measure it on, and the sharded entry point stays
correct either way (GSPMD falls back to gathering).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..ops.blas import calc_rk
from ..ops.fastdiag import tridiag_eig


def _axis_tables(grid: Grid, mc):
    """Per-axis (V, Vinv, mu) for (K, I, J) inner extents, float64.

    Constant: D = tridiag(-1, 2, -1) (so M = -A).  MAF: the per-axis
    tridiagonals of the separable metric operator (the K-axis one is
    exactly ops/fastdiag.maf_line_diag's D; the I/J axes follow the same
    construction from c1/c7 and c2/c8)."""
    nk, ni, nj = grid.nk - 2, grid.ni - 2, grid.nj - 2
    if mc is None:
        out = []
        for n in (nk, ni, nj):
            V, Vi, mu = tridiag_eig(
                np.full(n - 1, -1.0), np.full(n, 2.0), np.full(n - 1, -1.0)
            )
            out.append((V, Vi, mu))
        return out

    def w(c_lo, c_hi, n, axis):
        c = np.asarray(c_lo, np.float64).reshape(-1)
        g = np.asarray(c_hi, np.float64).reshape(-1)
        # separability contract: each coefficient is a per-axis 1D table
        # (n+2 nodes).  A full 3D field broadcasts fine through the
        # ITERATIVE MAF solvers, but reshape(-1) here would slice
        # garbage — reject it loudly instead
        if c.size != n + 2 or g.size != n + 2:
            raise ValueError(
                f"fd_maf needs per-axis 1D metric tables; axis {axis} "
                f"coefficient has {c.size} entries, expected {n + 2} — "
                f"a non-separable MafCoeffs cannot be fast-diagonalized"
            )
        c, g = c[1 : n + 1], g[1 : n + 1]
        wm = c - 0.5 * g  # weight toward index-1 neighbor
        wp = c + 0.5 * g  # weight toward index+1 neighbor
        return tridiag_eig(-wm[1:], 2.0 * c, -wp[:-1])

    return [
        w(mc.c3, mc.c9, nk, "K"),
        w(mc.c1, mc.c7, ni, "I"),
        w(mc.c2, mc.c8, nj, "J"),
    ]


def make_fd_step(problem, maf: bool = False):
    """Build ``step(x, b) -> (x_new, r2)``: one direct solve applied as
    iterative refinement, plus the Jacobi-equivalent stopping update."""
    g = problem.grid
    mc = problem.mc if maf else None
    if maf and mc is None:
        raise ValueError("fd_maf requested but Problem has no MafCoeffs")

    dt = g.dtype
    hp = jax.lax.Precision.HIGHEST
    (Vz, Vzi, muz), (Vx, Vxi, mux), (Vy, Vyi, muy) = _axis_tables(g, mc)
    Vz, Vzi = jnp.asarray(Vz, dt), jnp.asarray(Vzi, dt)
    Vx, Vxi = jnp.asarray(Vx, dt), jnp.asarray(Vxi, dt)
    Vy, Vyi = jnp.asarray(Vy, dt), jnp.asarray(Vyi, dt)
    # per-axis eigenvalues only — the (nk,ni,nj) denominator table is
    # formed INSIDE the trace from these 1D vectors: a materialized 3D
    # closure constant is N^3 * 4 bytes of wasted HBM and, through the
    # remote-compile tunnel, blows the request-size limit at 512^3
    # (HTTP 413)
    muz_ = jnp.asarray(muz, dt)
    mux_ = jnp.asarray(mux, dt)
    muy_ = jnp.asarray(muy, dt)

    def minv(r):
        """M^-1 r on the inner grid via the three-axis eigenbasis:
        forward-transform each axis into mode space (V^-1), divide by the
        eigenvalue sums, back-transform (V)."""
        u = jnp.einsum("ak,kij->aij", Vzi, r, precision=hp)
        u = jnp.einsum("ci,aij->acj", Vxi, u, precision=hp)
        u = jnp.einsum("dj,acj->acd", Vyi, u, precision=hp)
        u = u / (
            muz_[:, None, None] + mux_[None, :, None] + muy_[None, None, :]
        )
        u = jnp.einsum("jd,acd->acj", Vy, u, precision=hp)
        u = jnp.einsum("ic,acj->aij", Vx, u, precision=hp)
        return jnp.einsum("ka,aij->kij", Vz, u, precision=hp)

    inner = (slice(1, -1),) * 3
    r6 = jnp.asarray(1.0 / 6.0, dt)

    def tmask(shape):
        """Inner mask built IN-TRACE from iotas (like the fused kernels):
        closing over problem.msk would embed an N^3 constant in the
        executable — wasted HBM and, through the remote-compile tunnel,
        an HTTP 413 at 512^3 (same reason the eigenvalue denominators
        are formed in-trace above)."""
        ms = []
        for ax, n in enumerate(shape):
            v = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
            ms.append((v >= 1) & (v <= n - 2))
        return (ms[0] & ms[1] & ms[2]).astype(dt)

    if maf:
        def residual(x, b):
            return (b - (mc.dd * x - mc.nbr_weighted(x))) * tmask(x.shape)
    else:
        def residual(x, b):
            return calc_rk(x, b, tmask(x.shape))

    # r = b - M_sign A x; error equation: const A e = r with A = -M, so
    # e = -M^-1 r; MAF M e = r directly
    sgn = jnp.asarray(1.0 if maf else -1.0, dt)

    def step(x, b):
        r = residual(x, b)
        e = sgn * minv(r[inner])
        x = x.at[inner].add(e)
        rn = residual(x, b)
        rn = rn / mc.dd if maf else rn * r6
        return x, jnp.sum(rn * rn)

    # every iteration is a full direct solve (converges in 1-2): check
    # each one, like the wavefront solvers
    step.check_every_default = 1
    return step
