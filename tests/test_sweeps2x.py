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
