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
