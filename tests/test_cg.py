"""Conjugate-Gradient extension tests (solvers/cg.py).

CG is beyond the reference (whose Krylov solver is BiCGSTAB,
cz_Poisson.cpp:332-504) — these tests pin convergence to the analytic
solution, the preconditioner's iteration-count win, the symmetry guards,
and the rho-breakdown semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from cubez_tpu import Problem, max_error, solve

N = 32


def test_cg_converges_to_analytic():
    prob = Problem.poisson_cube(N, dtype=jnp.float32)
    r = solve(prob, "cg", omega=0.8, itr_max=2000, eps=1e-5)
    assert 0 < r.iters < 2000
    assert r.res < 1e-5
    assert max_error(prob.grid, r.x) < 1e-2
    # monotone-ish decrease overall (CG residual norm is not strictly
    # monotone, but first-to-last must fall by orders of magnitude)
    h = np.asarray(r.history)
    assert h[-1] < h[0] * 1e-2


def test_cg_jacobi_precond_cuts_iterations():
    prob = Problem.poisson_cube(N, dtype=jnp.float32)
    plain = solve(prob, "cg", omega=0.8, itr_max=2000, eps=1e-5)
    pre = solve(prob, "cg", omega=0.8, itr_max=2000, eps=1e-5,
                precond="jacobi")
    assert pre.res < 1e-5
    assert pre.iters < plain.iters
    assert max_error(prob.grid, pre.x) < 1e-2


def test_cg_matches_bicgstab_solution():
    prob = Problem.poisson_cube(N, dtype=jnp.float32)
    rc = solve(prob, "cg", omega=0.8, itr_max=2000, eps=1e-6)
    rb = solve(prob, "pbicgstab", omega=1.1, itr_max=2000, eps=1e-6,
               precond="sor2sma")
    # both converge to the same discrete solution within the tolerance
    d = np.abs(np.asarray(rc.x) - np.asarray(rb.x)).max()
    assert d < 5e-4


def test_cg_rejects_nonsymmetric_precond_and_maf():
    prob = Problem.poisson_cube(N, dtype=jnp.float32)
    with pytest.raises(ValueError, match="symmetric"):
        solve(prob, "cg", omega=1.5, itr_max=10, precond="sor2sma")
    prob_maf = Problem.poisson_cube(N, dtype=jnp.float32, maf=True)
    with pytest.raises(ValueError, match="constant-coefficient"):
        solve(prob_maf, "cg", omega=0.8, itr_max=10)


def test_cg_solve_dist_matches_serial():
    import jax

    from cubez_tpu.parallel import make_mesh, solve_dist

    prob = Problem.poisson_cube(N, dtype=jnp.float32)
    cm = make_mesh(prob.grid.shape_kij, devices=jax.devices()[:4])
    rs = solve(prob, "cg", omega=0.8, itr_max=2000, eps=1e-5,
               precond="jacobi")
    rd = solve_dist(prob, cm, "cg", omega=0.8, itr_max=2000, eps=1e-5,
                    precond="jacobi")
    assert rd.res < 1e-5
    # auto-SPMD keeps the math identical up to reduction order
    assert abs(rd.iters - rs.iters) <= 1
    assert max_error(prob.grid, rd.x) < 1e-2


def test_cg_breakdown_leaves_x_untouched():
    # b = 0 and x0 = 0 inner: r = 0, rho = 0 -> immediate breakdown,
    # iters reported 0 and x returned unchanged (the BiCGSTAB semantics,
    # cz_Poisson.cpp:379-383, carried over)
    prob = Problem.poisson_cube(N, dtype=jnp.float32)
    import dataclasses

    x0 = jnp.zeros_like(prob.x0)
    p0 = dataclasses.replace(prob, x0=x0, rhs=jnp.zeros_like(prob.rhs))
    r = solve(p0, "cg", omega=0.8, itr_max=50)
    assert r.iters == 0
    assert np.array_equal(np.asarray(r.x), np.asarray(x0))
