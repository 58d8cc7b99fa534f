"""Fused Pallas line-PCR kernels vs the XLA line-solver path (interpret
mode on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubez_tpu import Problem, solve
from cubez_tpu.pallas_kernels import pcr as fpcr
from cubez_tpu.solvers.steps import make_step


@pytest.mark.parametrize("kind", ["pcr", "pcr_rb"])
@pytest.mark.parametrize("it", [4, 16])
def test_fused_pcr_matches_xla(kind, it):
    prob = Problem.poisson_cube(16, dtype=jnp.float32)
    shape = prob.grid.shape_kij
    # the fused 'pcr' kernel is the line-Jacobi full-plane pass, whose
    # solver name is pcr_j_esa (plain 'pcr' is serial line-Gauss-Seidel)
    ref = jax.jit(make_step(prob, "pcr_j_esa" if kind == "pcr" else kind,
                            omega=1.1))
    xr, r2r = ref(prob.x0, prob.rhs)
    f = jax.jit(
        fpcr.make_fused_pcr_step(
            kind, shape, jnp.float32, omega=1.1, it=it, interpret=True
        )
    )
    xf, r2f = f(fpcr.pad_i1(prob.x0), fpcr.pad_i1(prob.rhs))
    assert float(jnp.max(jnp.abs(fpcr.unpad_i1(xf, prob.grid.shape_kij) - xr))) < 2e-6
    assert abs(float(r2f) - float(r2r)) < 1e-5 * max(1.0, float(r2r))


def test_fused_pcr_noncubic_and_b_zero():
    prob = Problem.poisson_cube((12, 16, 20), dtype=jnp.float32)
    shape = prob.grid.shape_kij  # (20, 12, 16)
    ref = jax.jit(make_step(prob, "pcr_j_esa", omega=1.0))
    xr, _ = ref(prob.x0, prob.rhs)
    f = jax.jit(
        fpcr.make_fused_pcr_step(
            "pcr", shape, jnp.float32, omega=1.0, it=4, b_is_zero=True,
            interpret=True,
        )
    )
    xf, _ = f(fpcr.pad_i1(prob.x0), fpcr.pad_i1(prob.rhs))
    assert float(jnp.max(jnp.abs(fpcr.unpad_i1(xf, prob.grid.shape_kij) - xr))) < 2e-6


def test_solve_api_pcr_rb_pallas_converges_identically():
    prob = Problem.poisson_cube(16, dtype=jnp.float32)
    r_j = solve(prob, "pcr_rb", omega=1.5, itr_max=200, impl="jnp")
    r_p = solve(prob, "pcr_rb", omega=1.5, itr_max=200, impl="pallas")
    assert r_p.iters == r_j.iters
    np.testing.assert_allclose(r_p.history, r_j.history, rtol=1e-3)
    assert float(jnp.max(jnp.abs(r_p.x - r_j.x))) < 1e-5


def test_build_tables_solves_line():
    """Table-driven PCR (the kernel's math) solves the unit-offdiag system."""
    from cubez_tpu.ops.tdma import num_stage, tdma_unit_offdiag

    n = 14
    pn = num_stage(n)
    tab = np.asarray(fpcr.build_tables(n, jnp.float64))
    rng = np.random.default_rng(3)
    d = rng.normal(size=n)
    ref = np.asarray(tdma_unit_offdiag(jnp.asarray(d)))

    dd = d.copy()
    for p in range(pn - 1):
        s = 2**p
        a, c, e = tab[3 * p], tab[3 * p + 1], tab[3 * p + 2]
        dl = np.roll(dd, -s)
        dr = np.roll(dd, s)
        dd = e * (dd - a * dr - c * dl)
    s = 2 ** (pn - 1)
    fin = 3 * (pn - 1)
    c_lo, a_hi, jj = tab[fin], tab[fin + 1], tab[fin + 2]
    d_hi = np.roll(dd, -s)
    x_lo = (dd - c_lo * d_hi) * jj
    x_hi = (d_hi - a_hi * dd) * jj
    x = np.concatenate([x_lo[:s], x_hi[: n - s]])
    np.testing.assert_allclose(x, ref, atol=1e-10)


def _maf_line_jacobi_step(prob):
    """jnp MAF line-Jacobi reference (the pcr_j_esa form with variable
    coefficients — no CLI name maps to it, so build it inline)."""
    from cubez_tpu.ops import pcr as pcr_ops

    g = prob.grid
    kst, ked = 1, g.nk - 2
    pn = pcr_ops.num_stage(ked - kst + 1)
    msk_in = prob.msk[kst : ked + 1]

    def step(x, b):
        a, c, d = pcr_ops.build_line_system_maf(x, b, prob.msk, prob.mc,
                                                kst, ked)
        sol = pcr_ops.pcr_reduce_var(a, c, d, pn)
        dp = (sol - x[kst : ked + 1]) * msk_in
        return x.at[kst : ked + 1].add(dp), jnp.sum(dp * dp)

    return step


@pytest.mark.parametrize("kind,alias", [("pcr", None), ("pcr_rb", "pcr_rb_maf")])
def test_fused_pcr_maf_matches_xla(kind, alias):
    prob = Problem.poisson_cube(16, dtype=jnp.float32, maf=True)
    shape = prob.grid.shape_kij
    ref = jax.jit(
        _maf_line_jacobi_step(prob) if alias is None
        else make_step(prob, alias, omega=1.0)
    )
    xr, r2r = ref(prob.x0, prob.rhs)
    f = jax.jit(
        fpcr.make_fused_pcr_step(
            kind, shape, jnp.float32, omega=1.0, it=4, mc=prob.mc,
            interpret=True,
        )
    )
    xf, r2f = f(fpcr.to_line_layout(prob.x0), fpcr.to_line_layout(prob.rhs))
    assert float(jnp.max(jnp.abs(fpcr.from_line_layout(xf, shape) - xr))) < 3e-6
    assert abs(float(r2f) - float(r2r)) < 1e-4 * max(1.0, float(r2r))


def test_solve_api_pcr_rb_maf_pallas():
    prob = Problem.poisson_cube(16, dtype=jnp.float32, maf=True)
    rj = solve(prob, "pcr_rb_maf", omega=1.5, itr_max=300, impl="jnp")
    rp = solve(prob, "pcr_rb_maf", omega=1.5, itr_max=300, impl="pallas")
    assert rj.iters == rp.iters
    assert rj.res < 1e-5
