"""MXU (matmul / fast-diagonalization) line-solver kernels vs the jnp
reference steps — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubez_tpu import Problem
from cubez_tpu.ops import fastdiag
from cubez_tpu.pallas_kernels import lines
from cubez_tpu.solvers.steps import make_step


def thomas(a, c, d):
    n = len(d)
    b = np.ones(n)
    cp, dp = np.zeros(n), np.zeros(n)
    cp[0], dp[0] = c[0] / b[0], d[0] / b[0]
    for k in range(1, n):
        m = b[k] - a[k] * cp[k - 1]
        cp[k] = c[k] / m
        dp[k] = (d[k] - a[k] * dp[k - 1]) / m
    x = np.zeros(n)
    x[-1] = dp[-1]
    for k in range(n - 2, -1, -1):
        x[k] = dp[k] - cp[k] * x[k + 1]
    return x


def test_const_line_inverse_vs_thomas():
    n = 30
    Ti = fastdiag.const_line_inverse(n, np.float64)
    rng = np.random.default_rng(0)
    d = rng.standard_normal(n)
    a = np.full(n, -1 / 6.0)
    c = np.full(n, -1 / 6.0)
    a[0] = c[-1] = 0.0
    np.testing.assert_allclose(Ti @ d, thomas(a, c, d), rtol=1e-12)


def test_maf_fastdiag_vs_thomas():
    n = 30
    prob = Problem.poisson_cube((16, 16, n + 2), maf=True)
    mc = prob.mc
    V, Vi, mu = fastdiag.maf_line_diag(mc, n, np.float64)
    wzm, wzp, d2c3, li, lj = fastdiag.maf_line_coeffs(mc, n)
    lam = 2.0 * (np.asarray(mc.c1, np.float64).reshape(-1)[5]
                 + np.asarray(mc.c2, np.float64).reshape(-1)[7])
    rng = np.random.default_rng(1)
    d = rng.standard_normal(n)
    a = np.concatenate([[0.0], -wzm[1:]])
    c = np.concatenate([-wzp[:-1], [0.0]])
    # diag = 2 c3 + lam
    x_ref = thomas_var(a, d2c3 + lam, c, d)
    x_fd = V @ ((Vi @ d) / (mu + lam))
    np.testing.assert_allclose(x_fd, x_ref, rtol=1e-10, atol=1e-12)


def thomas_var(a, b, c, d):
    n = len(d)
    cp, dp = np.zeros(n), np.zeros(n)
    cp[0], dp[0] = c[0] / b[0], d[0] / b[0]
    for k in range(1, n):
        m = b[k] - a[k] * cp[k - 1]
        cp[k] = c[k] / m
        dp[k] = (d[k] - a[k] * dp[k - 1]) / m
    x = np.zeros(n)
    x[-1] = dp[-1]
    for k in range(n - 2, -1, -1):
        x[k] = dp[k] - cp[k] * x[k + 1]
    return x


@pytest.mark.parametrize("maf", [False, True])
def test_line_jacobi_kernel_matches_jnp(maf):
    n = 32
    prob = Problem.poisson_cube(n, maf=maf)
    name = "pcr_j_esa" if not maf else None
    if maf:
        # jnp MAF line-Jacobi: one full-plane pass (kind 'pcr' with mc)
        from cubez_tpu.ops import pcr as pcr_ops

        g = prob.grid
        kst, ked = 1, g.nk - 2
        pn = pcr_ops.num_stage(ked - kst + 1)
        msk_in = prob.msk[kst : ked + 1]

        def ref_step(x, b):
            a, c, d = pcr_ops.build_line_system_maf(x, b, prob.msk, prob.mc,
                                                    kst, ked)
            sol = pcr_ops.pcr_reduce_var(a, c, d, pn)
            dp = (sol - x[kst : ked + 1]) * jnp.asarray(1.0, x.dtype) * msk_in
            return x.at[kst : ked + 1].add(dp), jnp.sum(dp * dp)
    else:
        ref_step = make_step(prob, "pcr_j_esa", 1.0)

    step = lines.make_line_step(
        "pcr_j", prob.grid.shape_kij, omega=1.0,
        mc=prob.mc if maf else None, b_is_zero=False, interpret=True,
    )
    assert step is not None
    xp = lines.to_line4_layout(prob.x0)
    bp = lines.to_line4_layout(prob.rhs)
    x_ref, b_cur = prob.x0, prob.rhs
    for _ in range(2):
        xp, r2f = step(xp, bp)
        x_ref, r2r = ref_step(x_ref, b_cur)
    xf = lines.from_line4_layout(xp, prob.grid.shape_kij)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(x_ref), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(float(r2f), float(r2r), rtol=2e-4)


@pytest.mark.parametrize("maf", [False, True])
def test_line_rb_kernel_matches_jnp(maf):
    n = 32
    prob = Problem.poisson_cube(n, maf=maf)
    ref_step = make_step(prob, "pcr_rb_maf" if maf else "pcr_rb", 1.5)
    step = lines.make_line_step(
        "pcr_rb", prob.grid.shape_kij, omega=1.5,
        mc=prob.mc if maf else None, b_is_zero=False, interpret=True,
    )
    assert step is not None
    xp = lines.to_line4_layout(prob.x0)
    bp = lines.to_line4_layout(prob.rhs)
    x_ref = prob.x0
    for _ in range(2):
        xp, r2f = step(xp, bp)
        x_ref, r2r = ref_step(x_ref, prob.rhs)
    xf = lines.from_line4_layout(xp, prob.grid.shape_kij)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(x_ref), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(float(r2f), float(r2r), rtol=2e-4)


def test_maf_fastdiag_stretched_grid():
    """Genuinely variable coefficients (tanh-stretched coordinates): the
    fast-diagonalization line solve must match a Thomas solve of the same
    variable tridiagonal for every lambda(i,j) in the table."""
    from cubez_tpu.ops.maf import MafCoeffs

    n = 30
    t = np.linspace(0.0, 1.0, n + 2)
    stretch = lambda u: 0.5 * (1 + np.tanh(2.5 * (2 * u - 1)) / np.tanh(2.5))
    xc = jnp.asarray(stretch(t))
    yc = jnp.asarray(t**1.5)
    zc = jnp.asarray(stretch(t) * 0.7 + 0.3 * t)
    mc = MafCoeffs.from_coords(xc, yc, zc)

    V, Vi, mu = fastdiag.maf_line_diag(mc, n, np.float64)
    wzm, wzp, d2c3, _li, _lj = fastdiag.maf_line_coeffs(mc, n)
    lam_tab = fastdiag.maf_lambda_table(mc, n + 2, n + 2, np.float64)
    rng = np.random.default_rng(3)
    a = np.concatenate([[0.0], -wzm[1:]])
    c = np.concatenate([-wzp[:-1], [0.0]])
    for (i, j) in [(1, 1), (7, 23), (15, 2)]:
        lam = lam_tab[i, j]
        d = rng.standard_normal(n)
        x_ref = thomas_var(a, d2c3 + lam, c, d)
        x_fd = V @ ((Vi @ d) / (mu + lam))
        np.testing.assert_allclose(x_fd, x_ref, rtol=1e-9, atol=1e-11)


def test_tile1_rb_layout_refused():
    """Tile size 1 in the 4-row-halo (red-black) slab layouts would let
    in_dma(t+2) — started during tile t+1 — overlap out_dma(t)'s in-place
    write range, outside the hazard fence.  The builders must refuse it
    (return None -> caller falls back) rather than emit a racy kernel."""
    from cubez_tpu.pallas_kernels import rblines
    from cubez_tpu.pallas_kernels.dist_sweeps import make_block_sweep

    shape = (18, 16, 16)  # (K, I, J)
    assert lines.make_line_step(
        "pcr_rb", shape, omega=1.5, it=1, interpret=True) is None
    # the 2-row-halo Jacobi layout is safe at it=1 and must still build
    assert lines.make_line_step(
        "pcr_j", shape, omega=1.0, it=1, interpret=True) is not None
    assert rblines.make_rbl_step(
        (18, 16, 32), omega=1.5, it2=1, interpret=True) is None
    assert make_block_sweep(
        "sor2sma", (16, 16, 16), (16, 16, 16), omega=1.5, kt=1,
        interpret=True) is None
    # per-color (2-row-halo) block sweep is safe at kt=1
    assert make_block_sweep(
        "sor2sma", (16, 16, 16), (16, 16, 16), omega=1.5, kt=1, color=0,
        interpret=True) is not None
