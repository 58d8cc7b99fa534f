"""Fused Pallas sweep kernels vs the XLA reference path.

Runs the TPU kernels in interpreter mode on the CPU test backend (conftest
pins JAX_PLATFORMS=cpu); real-hardware validation happens in bench.py.
"""

import jax
import jax.numpy as jnp
import pytest

from cubez_tpu import Problem
from cubez_tpu.pallas_kernels import sweeps as fused
from cubez_tpu.solvers.steps import make_step


def _mk(n):
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    return prob, prob.grid.shape_kij


@pytest.mark.parametrize("kind", ["jacobi", "sor2sma"])
@pytest.mark.parametrize("kt", [4, 8])
def test_fused_matches_xla(kind, kt):
    prob, shape = _mk((12, 10, 16))
    step_ref = jax.jit(make_step(prob, kind, omega=1.5))
    step_f = fused.make_fused_sweep(
        kind, shape, jnp.float32, omega=1.5, kt=kt, interpret=True
    )
    step_f = jax.jit(step_f)

    xr, r2r = step_ref(prob.x0, prob.rhs)
    xf, r2f = step_f(fused.pad_k2(prob.x0), fused.pad_k2(prob.rhs))
    assert float(jnp.max(jnp.abs(fused.unpad_k2(xf, shape) - xr))) < 1e-6
    assert abs(float(r2f) - float(r2r)) < 1e-5 * max(1.0, float(r2r))


@pytest.mark.parametrize("kind", ["jacobi", "sor2sma"])
def test_fused_b_is_zero(kind):
    prob, shape = _mk(14)
    step_ref = jax.jit(make_step(prob, kind, omega=1.2))
    step_f = jax.jit(
        fused.make_fused_sweep(
            kind, shape, jnp.float32, omega=1.2, b_is_zero=True, interpret=True
        )
    )
    xr, _ = step_ref(prob.x0, prob.rhs)
    xf, _ = step_f(fused.pad_k2(prob.x0), fused.pad_k2(prob.rhs))
    assert float(jnp.max(jnp.abs(fused.unpad_k2(xf, shape) - xr))) < 1e-6


def test_fused_iterates_without_pad_leakage():
    """Garbage in the K-pad rows must never reach real nodes."""
    prob, shape = _mk(12)
    step_ref = jax.jit(make_step(prob, "sor2sma", omega=1.5))
    step_f = jax.jit(
        fused.make_fused_sweep(
            "sor2sma", shape, jnp.float32, omega=1.5, kt=4, interpret=True
        )
    )
    xp = fused.pad_k2(prob.x0)
    bp = fused.pad_k2(prob.rhs)
    xj = prob.x0
    for _ in range(8):
        xp, _ = step_f(xp, bp)
        xj, _ = step_ref(xj, prob.rhs)
    assert float(jnp.max(jnp.abs(fused.unpad_k2(xp, shape) - xj))) < 1e-5
    assert not bool(jnp.any(jnp.isnan(fused.unpad_k2(xp, shape))))


def test_solve_api_impl_pallas():
    """solve(impl='pallas') converges like solve(impl='jnp')."""
    from cubez_tpu import solve

    prob = Problem.poisson_cube(16, dtype=jnp.float32)
    r_j = solve(prob, "sor2sma", omega=1.5, itr_max=300, impl="jnp")
    r_p = solve(prob, "sor2sma", omega=1.5, itr_max=300, impl="pallas")
    assert r_p.iters == r_j.iters
    assert abs(r_p.res - r_j.res) < 1e-6
    # the pallas path may run to the end of its iteration chunk (driver
    # docs) — up to chunk-1 extra sweeps, and the chunk rounds up to a
    # multiple of iters_per_call (6 for the deepest temporal block), so
    # x differs by a handful of eps-level sweeps
    assert float(jnp.max(jnp.abs(r_p.x - r_j.x))) < 3e-4


def test_choose_kt():
    assert fused.choose_kt((128, 128, 128)) in (16, 32)
    kt = fused.choose_kt((126, 126, 126))
    assert kt is not None and 126 % kt == 0
    assert fused.choose_kt((8, 4096, 4096), max_vmem_bytes=1 << 20) is None
