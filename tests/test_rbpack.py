"""Packed red-black kernel (pallas_kernels/rbpack.py) vs the XLA path.

Interpreter mode on the CPU test backend (conftest pins JAX_PLATFORMS=cpu);
real-hardware validation happens in bench.py / scripts/bench_protocol.py.
"""

import jax
import jax.numpy as jnp
import pytest

from cubez_tpu import Problem, solve
from cubez_tpu.pallas_kernels import rbpack
from cubez_tpu.pallas_kernels import sweeps as fused
from cubez_tpu.solvers.steps import make_step


def _mk(n):
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    return prob, prob.grid.shape_kij


@pytest.mark.parametrize("offset", [0, 1])
def test_pack_roundtrip(offset):
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (12, 10, 20), jnp.float32)
    p = rbpack.pack_rb(x, offset=offset)
    assert p.shape == (16, 2 * 8, 128)  # I2 = 5 -> I2p = 8
    y = rbpack.unpack_rb(p, x.shape, offset=offset)
    assert jnp.array_equal(x, y)


@pytest.mark.parametrize("kt", [4, 8])
def test_packed_matches_xla(kt):
    prob, shape = _mk((12, 10, 16))
    step_ref = jax.jit(make_step(prob, "sor2sma", omega=1.5))
    step_p = rbpack.make_packed_sweep(
        shape, jnp.float32, omega=1.5, kt=kt, interpret=True
    )
    assert step_p is not None
    step_p = jax.jit(step_p)

    xr, r2r = step_ref(prob.x0, prob.rhs)
    xp, r2p = step_p(rbpack.pack_rb(prob.x0), rbpack.pack_rb(prob.rhs))
    assert float(jnp.max(jnp.abs(rbpack.unpack_rb(xp, shape) - xr))) < 1e-6
    assert abs(float(r2p) - float(r2r)) < 1e-5 * max(1.0, float(r2r))


def test_packed_bitwise_matches_interleaved():
    """Same values AND add order as the interleaved fused kernel — the
    field must be bitwise equal after several sweeps."""
    prob, shape = _mk(16)
    step_i = jax.jit(
        fused.make_fused_sweep(
            "sor2sma", shape, jnp.float32, omega=1.5, kt=4, interpret=True
        )
    )
    step_p = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.5, kt=4, interpret=True
        )
    )
    xi, bi = fused.pad_k2(prob.x0), fused.pad_k2(prob.rhs)
    xp, bp = rbpack.pack_rb(prob.x0), rbpack.pack_rb(prob.rhs)
    for _ in range(3):
        xi, _ = step_i(xi, bi)
        xp, _ = step_p(xp, bp)
    assert jnp.array_equal(
        fused.unpad_k2(xi, shape), rbpack.unpack_rb(xp, shape)
    )


def test_packed_b_is_zero():
    prob, shape = _mk(14)
    step_ref = jax.jit(make_step(prob, "sor2sma", omega=1.2))
    step_p = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.2, b_is_zero=True, interpret=True
        )
    )
    xr, _ = step_ref(prob.x0, prob.rhs)
    xp, _ = step_p(rbpack.pack_rb(prob.x0), rbpack.pack_rb(prob.rhs))
    assert float(jnp.max(jnp.abs(rbpack.unpack_rb(xp, shape) - xr))) < 1e-6


def test_packed_offset_matches_interleaved():
    prob, shape = _mk(12)
    step_i = jax.jit(
        fused.make_fused_sweep(
            "sor2sma", shape, jnp.float32, omega=1.5, kt=4, offset=1,
            interpret=True,
        )
    )
    step_p = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.5, kt=4, offset=1, interpret=True
        )
    )
    xi, _ = step_i(fused.pad_k2(prob.x0), fused.pad_k2(prob.rhs))
    xp, _ = step_p(
        rbpack.pack_rb(prob.x0, offset=1), rbpack.pack_rb(prob.rhs, offset=1)
    )
    assert jnp.array_equal(
        fused.unpad_k2(xi, shape), rbpack.unpack_rb(xp, shape, offset=1)
    )


def test_packed_pad_garbage_immunity():
    """NaNs in the pad positions must never reach real nodes."""
    prob, shape = _mk(12)
    step_p = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.5, kt=4, interpret=True
        )
    )
    xp = rbpack.pack_rb(prob.x0)
    bp = rbpack.pack_rb(prob.rhs)
    K, I, J = shape
    I2p = rbpack._dims(shape)[4]
    nan = jnp.float32(jnp.nan)
    # poison K pads, i2 pads of both halves, and J pads
    xp = xp.at[:2].set(nan).at[-2:].set(nan)
    xp = xp.at[:, I // 2 : I2p].set(nan)
    xp = xp.at[:, I2p + I // 2 :].set(nan)
    xp = xp.at[:, :, J:].set(nan)
    y, r2 = step_p(xp, bp)
    out = rbpack.unpack_rb(y, shape)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.isfinite(r2))


def test_packed_pair_bitwise_two_singles():
    """The temporally-blocked packed pair must equal two single packed
    sweeps bitwise (field) and in residuals (roundoff grouping only)."""
    prob, shape = _mk(16)
    one = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.5, kt=8, b_is_zero=True,
            interpret=True,
        )
    )
    two = rbpack.make_packed_sweep2x(
        shape, jnp.float32, omega=1.5, kt=8, interpret=True
    )
    assert two is not None and two.iters_per_call == 2
    two = jax.jit(two)
    xp = rbpack.pack_rb(prob.x0)
    bp = rbpack.pack_rb(prob.rhs)
    key = jax.random.PRNGKey(11)
    xp = xp + 0.1 * jax.random.normal(key, xp.shape, jnp.float32)
    x1, r2a = one(xp, bp)
    x2, r2b = one(x1, bp)
    xpair, r2pair = two(xp, bp)
    assert jnp.array_equal(
        rbpack.unpack_rb(x2, shape), rbpack.unpack_rb(xpair, shape)
    )
    assert abs(float(r2pair[0]) - float(r2a)) < 1e-5 * max(1.0, float(r2a))
    assert abs(float(r2pair[1]) - float(r2b)) < 1e-5 * max(1.0, float(r2b))


@pytest.mark.parametrize("maf", [False, True])
def test_packed_pair_with_rhs_bitwise_two_singles(maf):
    """The pair with a STREAMED RHS (b_is_zero=False — the BiCGSTAB
    preconditioner configuration) equals two single packed sweeps bitwise
    on the true extents (pad rows may decay differently — layout
    contract) and in residuals.  Covers the edge-tile b-slab spans
    (t=0 / interior / drain)."""
    prob = Problem.poisson_cube(24, dtype=jnp.float32, maf=maf)
    shape = prob.grid.shape_kij
    one = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.5, kt=8, b_is_zero=False,
            mc=prob.mc, interpret=True,
        )
    )
    two = rbpack.make_packed_sweep2x(
        shape, jnp.float32, omega=1.5, kt=8, b_is_zero=False, mc=prob.mc,
        interpret=True,
    )
    assert two is not None and two.iters_per_call == 2
    two = jax.jit(two)
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    xp = rbpack.pack_rb(
        prob.x0 + 0.1 * jax.random.normal(k1, shape, jnp.float32)
    )
    bp = rbpack.pack_rb(jax.random.normal(k2, shape, jnp.float32))
    x1, r2a = one(xp, bp)
    x2, r2b = one(x1, bp)
    xpair, r2pair = two(xp, bp)
    assert jnp.array_equal(
        rbpack.unpack_rb(x2, shape), rbpack.unpack_rb(xpair, shape)
    )
    assert abs(float(r2pair[0]) - float(r2a)) < 1e-5 * max(1.0, float(r2a))
    assert abs(float(r2pair[1]) - float(r2b)) < 1e-5 * max(1.0, float(r2b))


@pytest.mark.parametrize("kt", [4, 8])
def test_packed_maf_matches_xla(kt):
    prob = Problem.poisson_cube((12, 10, 16), dtype=jnp.float32, maf=True)
    shape = prob.grid.shape_kij
    step_ref = jax.jit(make_step(prob, "sor2sma_maf", omega=1.2))
    step_p = rbpack.make_packed_sweep(
        shape, jnp.float32, omega=1.2, kt=kt, mc=prob.mc, interpret=True
    )
    assert step_p is not None
    step_p = jax.jit(step_p)

    xr, r2r = step_ref(prob.x0, prob.rhs)
    xp, r2p = step_p(rbpack.pack_rb(prob.x0), rbpack.pack_rb(prob.rhs))
    assert float(jnp.max(jnp.abs(rbpack.unpack_rb(xp, shape) - xr))) < 1e-6
    assert abs(float(r2p) - float(r2r)) < 1e-5 * max(1.0, float(r2r))


def test_packed_maf_bitwise_matches_interleaved():
    """Same values AND op order as the interleaved fused MAF kernel —
    bitwise-equal fields after several sweeps."""
    prob = Problem.poisson_cube(16, dtype=jnp.float32, maf=True)
    shape = prob.grid.shape_kij
    step_i = jax.jit(
        fused.make_fused_sweep(
            "sor2sma", shape, jnp.float32, omega=1.5, kt=4, mc=prob.mc,
            interpret=True,
        )
    )
    step_p = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.5, kt=4, mc=prob.mc, interpret=True
        )
    )
    xi, bi = fused.pad_k2(prob.x0), fused.pad_k2(prob.rhs)
    xp, bp = rbpack.pack_rb(prob.x0), rbpack.pack_rb(prob.rhs)
    for _ in range(3):
        xi, _ = step_i(xi, bi)
        xp, _ = step_p(xp, bp)
    assert jnp.array_equal(
        fused.unpad_k2(xi, shape), rbpack.unpack_rb(xp, shape)
    )


def test_packed_maf_b_is_zero_and_garbage_immunity():
    prob = Problem.poisson_cube(12, dtype=jnp.float32, maf=True)
    shape = prob.grid.shape_kij
    step0 = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.2, kt=4, mc=prob.mc, interpret=True
        )
    )
    stepz = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.2, kt=4, mc=prob.mc, b_is_zero=True,
            interpret=True,
        )
    )
    xp = rbpack.pack_rb(prob.x0)
    bp = rbpack.pack_rb(prob.rhs)
    xa, _ = step0(xp, bp)
    I2p = rbpack._dims(shape)[4]
    nan = jnp.float32(jnp.nan)
    xpn = xp.at[:2].set(nan).at[-2:].set(nan)
    xpn = xpn.at[:, shape[1] // 2 : I2p].set(nan)
    xpn = xpn.at[:, I2p + shape[1] // 2 :].set(nan)
    xpn = xpn.at[:, :, shape[2] :].set(nan)
    y, r2 = stepz(xpn, bp)
    out = rbpack.unpack_rb(y, shape)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.isfinite(r2))
    assert float(jnp.max(jnp.abs(out - rbpack.unpack_rb(xa, shape)))) < 1e-6


def test_packed_maf_pair_bitwise_two_singles():
    """The MAF temporally-blocked packed pair must equal two single packed
    MAF sweeps bitwise (field)."""
    prob = Problem.poisson_cube(16, dtype=jnp.float32, maf=True)
    shape = prob.grid.shape_kij
    one = jax.jit(
        rbpack.make_packed_sweep(
            shape, jnp.float32, omega=1.5, kt=8, mc=prob.mc, b_is_zero=True,
            interpret=True,
        )
    )
    two = rbpack.make_packed_sweep2x(
        shape, jnp.float32, omega=1.5, kt=8, mc=prob.mc, interpret=True
    )
    assert two is not None and two.iters_per_call == 2
    two = jax.jit(two)
    xp = rbpack.pack_rb(prob.x0)
    bp = rbpack.pack_rb(prob.rhs)
    key = jax.random.PRNGKey(7)
    xp = xp + 0.1 * jax.random.normal(key, xp.shape, jnp.float32)
    x1, r2a = one(xp, bp)
    x2, r2b = one(x1, bp)
    xpair, r2pair = two(xp, bp)
    assert jnp.array_equal(
        rbpack.unpack_rb(x2, shape), rbpack.unpack_rb(xpair, shape)
    )
    assert abs(float(r2pair[0]) - float(r2a)) < 1e-5 * max(1.0, float(r2a))
    assert abs(float(r2pair[1]) - float(r2b)) < 1e-5 * max(1.0, float(r2b))


def test_solve_uses_packed_maf_and_matches_jnp():
    prob = Problem.poisson_cube(16, dtype=jnp.float32, maf=True)
    r_jnp = solve(prob, "sor2sma_maf", omega=1.5, itr_max=300, impl="jnp")
    r_pal = solve(prob, "sor2sma_maf", omega=1.5, itr_max=300, impl="pallas")
    assert r_pal.iters == r_jnp.iters
    assert abs(r_pal.res - r_jnp.res) < 1e-6 * max(1.0, r_jnp.res)
    # chunk overshoot: up to chunk-1 extra eps-level sweeps, chunk
    # rounded to a multiple of iters_per_call (see test_pallas_sweeps)
    assert float(jnp.max(jnp.abs(r_pal.x - r_jnp.x))) < 3e-4


def test_solve_uses_packed_and_matches_jnp():
    prob = Problem.poisson_cube(16, dtype=jnp.float32)
    r_jnp = solve(prob, "sor2sma", omega=1.5, itr_max=400, impl="jnp")
    r_pal = solve(prob, "sor2sma", omega=1.5, itr_max=400, impl="pallas")
    assert r_pal.iters == r_jnp.iters
    assert abs(r_pal.res - r_jnp.res) < 1e-6 * max(1.0, r_jnp.res)
    # chunk overshoot: up to chunk-1 extra eps-level sweeps, chunk
    # rounded to a multiple of iters_per_call (see test_pallas_sweeps)
    assert float(jnp.max(jnp.abs(r_pal.x - r_jnp.x))) < 3e-4
