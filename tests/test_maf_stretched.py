"""End-to-end MAF on a genuinely stretched grid.

The reference's MAF kernels accept arbitrary tensor-product coordinates but
its driver only ever fills uniform ones (cz_Evaluate.cpp:342-363), so the
variable-coefficient path is never *discretization-tested* upstream.  These
tests pin it here: a manufactured solution u = sin(pi x) sin(pi y) sin(pi z)
on tanh/sine-stretched coordinates, solved through every MAF solver family,
must converge with the discretization's h^2 order between two grid sizes.

This exercises the WHOLE pipeline at once: metric tables (ops/maf.py from
cz_maf.f90:68-101), point sweeps, variable-tridiagonal line construction +
PCR/fast-diagonalization (cz_maf.f90:519-572), pivot scaling + MAF Krylov
(cz_blas.f90:738-1039), the coarsened-coordinate mg/fmg hierarchy, and the
fd direct solver's separable eigendecomposition.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cubez_tpu import Problem, solve

# (solver, omega, RHS sign family, solve kwargs) — family documents the
# reference's internal sign inconsistency (see Problem.manufactured_stretched:
# point sweeps + mg/fmg/fd solve -L x = b, line solvers + BiCGSTAB solve
# L x = b; both replicated faithfully).
CASES = [
    ("sor2sma_maf", 1.5, "relax", {}),
    ("pcr_rb_maf", 1.5, "krylov", {}),
    ("pbicgstab_maf", 1.1, "krylov", {"precond": "sor2sma_maf"}),
    ("mg_maf", 1.0, "relax", {}),
    ("fmg_maf", 1.0, "relax", {}),
    ("fd_maf", 1.0, "relax", {}),
]

# h^2 between 24^3 and 48^3 means err ratio (47/23)^2 ~= 4.18; allow slack
# for the stretch-dependent error-constant variation between the two grids.
RATIO_LO, RATIO_HI = 3.4, 5.0


def _err(prob, u, r):
    return float(jnp.max(jnp.abs(r.x - u) * prob.msk))


@pytest.mark.parametrize("name,omega,family,kw", CASES)
def test_maf_stretched_h2_convergence(name, omega, family, kw):
    errs = {}
    for n in (24, 48):
        prob, u = Problem.manufactured_stretched(
            n, dtype=jnp.float64, family=family
        )
        r = solve(prob, name, omega=omega, itr_max=40000, eps=1e-9,
                  impl="jnp", **kw)
        assert r.res < 1e-8, f"{name} n={n} did not converge: res={r.res}"
        errs[n] = _err(prob, u, r)
    ratio = errs[24] / errs[48]
    assert RATIO_LO < ratio < RATIO_HI, (
        f"{name}: err 24^3 {errs[24]:.3e} / 48^3 {errs[48]:.3e} "
        f"ratio {ratio:.2f} not h^2"
    )
    # absolute sanity: the 48^3 discretization error of this stretch family
    assert errs[48] < 7e-4, f"{name}: err {errs[48]:.3e} too large at 48^3"


def test_fd_maf_is_exact_discrete_solve_on_stretched_grid():
    """fd_maf solves the stretched-coefficient system in ONE shot to
    roundoff-level residual — the algebraic error is zero, so its err_max
    IS the discretization error (same value every iterative solver above
    converges to)."""
    prob, u = Problem.manufactured_stretched(24, dtype=jnp.float64)
    r_fd = solve(prob, "fd_maf", omega=1.0, itr_max=2, eps=1e-9, impl="jnp")
    assert r_fd.iters == 1
    assert r_fd.res < 1e-13
    r_it = solve(prob, "sor2sma_maf", omega=1.5, itr_max=40000, eps=1e-11,
                 impl="jnp")
    assert abs(_err(prob, u, r_fd) - _err(prob, u, r_it)) < 1e-7


def test_maf_rhs_sign_conventions_documented():
    """The latent reference quirk, pinned: feeding the point-sweep family
    the LINE family's RHS sign converges to -u (and vice versa) — invisible
    on the b == 0 benchmark, decisive on any real source term."""
    prob, u = Problem.manufactured_stretched(
        16, dtype=jnp.float64, family="krylov"
    )
    r = solve(prob, "sor2sma_maf", omega=1.5, itr_max=40000, eps=1e-9,
              impl="jnp")
    err_neg = float(jnp.max(jnp.abs(r.x + u) * prob.msk))  # vs -u
    err_pos = float(jnp.max(jnp.abs(r.x - u) * prob.msk))  # vs +u
    assert err_neg < 1e-2 < err_pos
