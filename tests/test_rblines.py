"""Packed red-black MXU line kernel (rblines) vs the jnp reference steps
and the unpacked fused line kernel — interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from cubez_tpu import Problem
from cubez_tpu.pallas_kernels import lines, rblines
from cubez_tpu.solvers.steps import make_step


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for shape, off in (((10, 12, 9), 0), ((16, 8, 130), 1)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        st = rblines.pack_rb_lines(x, offset=off)
        back = rblines.unpack_rb_lines(st, shape, offset=off)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("maf", [False, True])
def test_rbl_kernel_matches_jnp(maf):
    n = 32
    prob = Problem.poisson_cube(n, maf=maf)
    ref_step = make_step(prob, "pcr_rb_maf" if maf else "pcr_rb", 1.5)
    step = rblines.make_rbl_step(
        prob.grid.shape_kij, omega=1.5,
        mc=prob.mc if maf else None, b_is_zero=False, interpret=True,
    )
    assert step is not None
    xp = step.pad(prob.x0)
    bp = step.pad(prob.rhs)
    x_ref = prob.x0
    for _ in range(2):
        xp, r2f = step(xp, bp)
        x_ref, r2r = ref_step(x_ref, prob.rhs)
    xf = step.unpad(xp)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(x_ref), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(float(r2f), float(r2r), rtol=2e-4)


def test_rbl_matches_unpacked_lines_kernel():
    """Same update math as the unpacked fused RB line kernel (lines.py) —
    fields agree to roundoff after several sweeps, b_is_zero path."""
    n = 24
    prob = Problem.poisson_cube(n)
    shape = prob.grid.shape_kij
    s_old = lines.make_line_step(
        "pcr_rb", shape, omega=1.5, b_is_zero=True, interpret=True
    )
    s_new = rblines.make_rbl_step(
        shape, omega=1.5, b_is_zero=True, interpret=True
    )
    assert s_old is not None and s_new is not None
    xo = lines.to_line4_layout(prob.x0)
    xn = s_new.pad(prob.x0)
    bo = lines.to_line4_layout(prob.rhs)
    bn = s_new.pad(prob.rhs)
    for _ in range(3):
        xo, r2o = s_old(xo, bo)
        xn, r2n = s_new(xn, bn)
    fo = lines.from_line4_layout(xo, shape)
    fn = s_new.unpad(xn)
    np.testing.assert_allclose(
        np.asarray(fn), np.asarray(fo), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(float(r2n), float(r2o), rtol=2e-4)


def test_rbl_offset_parity():
    """offset=1 flips the color assignment; the two-color serialization
    still converges to the same fixed point (one sweep differs, but masks
    must stay consistent)."""
    n = 16
    prob = Problem.poisson_cube(n)
    step = rblines.make_rbl_step(
        prob.grid.shape_kij, omega=1.5, offset=1, b_is_zero=False,
        interpret=True,
    )
    assert step is not None
    xp = step.pad(prob.x0)
    bp = step.pad(prob.rhs)
    xp, r2 = step(xp, bp)
    x = np.asarray(step.unpad(xp))
    assert np.isfinite(x).all()
    # boundary rows untouched
    x0 = np.asarray(prob.x0)
    np.testing.assert_array_equal(x[0], x0[0])
    np.testing.assert_array_equal(x[-1], x0[-1])
    np.testing.assert_array_equal(x[:, 0, :], x0[:, 0, :])
    np.testing.assert_array_equal(x[:, :, 0], x0[:, :, 0])
