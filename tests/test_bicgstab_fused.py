"""BiCGSTAB with the fused-Pallas preconditioner (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cubez_tpu import Problem, solve


@pytest.mark.parametrize("precond", ["sor2sma", "pcr_rb"])
def test_fused_precond_matches_jnp(precond):
    prob = Problem.poisson_cube(32)
    rj = solve(prob, "pbicgstab", omega=1.5, itr_max=100, precond=precond, impl="jnp")
    rp = solve(
        prob, "pbicgstab", omega=1.5, itr_max=100, precond=precond, impl="pallas"
    )
    assert rj.res < 1e-5 and rp.res < 1e-5
    assert rj.iters == rp.iters
    # histories agree to f32 roundoff except the final (converged, ~0) entry
    np.testing.assert_allclose(rp.history[:-1], rj.history[:-1], rtol=1e-3)


def test_breakdown_leaves_x_untouched():
    """|rho| < FLT_MIN must stop BEFORE the iteration updates any state
    (cz_Poisson.cpp:379-383: itr = 0; break).  Starting from the exact
    discrete solution makes r = b - A x0 identically zero, so rho = 0 on the
    very first iteration."""
    import dataclasses

    from cubez_tpu.ops import blas

    prob = Problem.poisson_cube(16)
    x0 = prob.x0
    b = blas.calc_ax(x0, prob.msk) + prob.rhs * (1.0 - prob.msk)
    prob2 = dataclasses.replace(prob, rhs=b)
    res = solve(prob2, "pbicgstab", omega=1.1, itr_max=50, precond="none")
    assert res.iters == 0  # reference reports itr = 0 on breakdown
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(x0))
