"""Temporally-blocked 2-iteration sor2sma kernel vs two single fused sweeps
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubez_tpu import Problem
from cubez_tpu.pallas_kernels import sweeps, sweeps2x


@pytest.mark.parametrize("n", [16, 32])
def test_pair_matches_two_singles(n):
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    shape = prob.grid.shape_kij
    single = sweeps.make_fused_sweep(
        "sor2sma", shape, omega=1.5, b_is_zero=True, interpret=True
    )
    pair = sweeps2x.make_fused_sweep2x(shape, omega=1.5, interpret=True)
    assert single is not None and pair is not None

    xp_s = sweeps.pad_k2(prob.x0)
    xp_p = xp_s
    bp = sweeps.pad_k2(prob.rhs)
    for _ in range(2):  # 2 pair calls = 4 single sweeps
        xp_s, r1 = single(xp_s, bp)
        xp_s, r2 = single(xp_s, bp)
        xp_p, rp = pair(xp_p, bp)
        # identical per-row arithmetic -> bitwise-equal fields on the
        # true extents (pads may differ)
        a = sweeps.unpad_k2(xp_p, shape)
        b = sweeps.unpad_k2(xp_s, shape)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # residuals: same values, different partial-sum grouping
        np.testing.assert_allclose(float(rp[0]), float(r1), rtol=1e-5)
        np.testing.assert_allclose(float(rp[1]), float(r2), rtol=1e-5)


@pytest.mark.parametrize("n_it,kt", [(3, 8), (3, 16), (4, 16), (6, 16)])
def test_nx_matches_n_singles(n_it, kt):
    """Generalized n-iterations-per-pass packed kernel (sweeps2x.build_nx
    via rbpack.make_packed_sweepnx) against n single packed sweeps:
    bitwise-equal fields, per-iteration residuals to fp tolerance."""
    from cubez_tpu.pallas_kernels import rbpack

    prob = Problem.poisson_cube(16, dtype=jnp.float32)
    shape = prob.grid.shape_kij
    single = rbpack.make_packed_sweep(
        shape, omega=1.5, b_is_zero=True, interpret=True
    )
    nx = rbpack.make_packed_sweepnx(
        shape, omega=1.5, n=n_it, kt=kt, interpret=True
    )
    assert single is not None and nx is not None
    xp_s = single.pad(prob.x0)
    bp = single.pad(prob.rhs)
    xp_n = xp_s
    for _ in range(2):
        rs = []
        for _ in range(n_it):
            xp_s, r = single(xp_s, bp)
            rs.append(float(r))
        xp_n, rn = nx(xp_n, bp)
        np.testing.assert_array_equal(
            np.asarray(nx.unpad(xp_n)), np.asarray(single.unpad(xp_s))
        )
        np.testing.assert_allclose(np.asarray(rn), rs, rtol=1e-5)


@pytest.mark.parametrize("n", [3, 4, 6])
def test_nx_maf_stretched_tables(n):
    """MAF nx on a genuinely tanh-stretched grid (k-varying c3/c9): pins
    the resident per-k table's row alignment across the lagged windows —
    a bug there is invisible on the uniform cube where the tables are
    constant in k.  n=4/6 exercise the 16-row guard band (windows reach
    k0_mid = -2n-1 >= -13 on tile 0)."""
    from cubez_tpu.pallas_kernels import rbpack

    prob, _u = Problem.manufactured_stretched(16, dtype=jnp.float32)
    shape = prob.grid.shape_kij
    mc = prob.mc
    single = rbpack.make_packed_sweep(
        shape, omega=1.5, mc=mc, b_is_zero=True, interpret=True
    )
    tri = rbpack.make_packed_sweepnx(
        shape, omega=1.5, n=n, mc=mc, interpret=True
    )
    assert single is not None and tri is not None
    # a rough start so every window does real work
    ramp = jnp.linspace(0.0, 1.0, shape[0], dtype=prob.x0.dtype)[
        :, None, None
    ]
    xp_s = single.pad(prob.x0 + 0.3 * ramp * prob.grid.inner_mask)
    bp = single.pad(jnp.zeros_like(prob.rhs))
    xp_t = xp_s
    rs = []
    for _ in range(n):
        xp_s, r = single(xp_s, bp)
        rs.append(float(r))
    xp_t, rt = tri(xp_t, bp)
    np.testing.assert_array_equal(
        np.asarray(tri.unpad(xp_t)), np.asarray(single.unpad(xp_s))
    )
    np.testing.assert_allclose(np.asarray(rt), rs, rtol=1e-5)


def test_pair_convergence_equivalence():
    # a solve driven by pair steps must follow the same residual history
    n = 24
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    shape = prob.grid.shape_kij
    single = sweeps.make_fused_sweep(
        "sor2sma", shape, omega=1.5, b_is_zero=True, interpret=True
    )
    pair = sweeps2x.make_fused_sweep2x(shape, omega=1.5, interpret=True)
    xp = sweeps.pad_k2(prob.x0)
    bp = sweeps.pad_k2(prob.rhs)
    hist_s, hist_p = [], []
    xs = xp
    for _ in range(10):
        xs, r = single(xs, bp)
        hist_s.append(float(r))
    xpp = xp
    for _ in range(5):
        xpp, rp = pair(xpp, bp)
        hist_p += [float(rp[0]), float(rp[1])]
    np.testing.assert_allclose(hist_p, hist_s, rtol=1e-5)
