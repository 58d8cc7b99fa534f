"""Tridiagonal micro-tests, mirroring the reference's example/tri suite
(test1..test5: tiny TDMA/PCR systems with checkable answers)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cubez_tpu.ops.tdma import num_stage, pcr_1d, tdma


def np_tridiag_solve(a, b, c, d):
    n = len(d)
    m = np.zeros((n, n))
    for i in range(n):
        m[i, i] = b[i]
        if i > 0:
            m[i, i - 1] = a[i]
        if i < n - 1:
            m[i, i + 1] = c[i]
    return np.linalg.solve(m, d)


def test_num_stage():
    # smallest pn with 2^pn > n (cz.h:293-300)
    assert num_stage(1) == 1
    assert num_stage(2) == 2
    assert num_stage(3) == 2
    assert num_stage(4) == 3
    assert num_stage(62) == 6
    assert num_stage(126) == 7
    assert num_stage(128) == 8


def test_tdma_3x3():
    # example/tri/test1-style tiny system
    a = jnp.array([0.0, 1.0, 2.0])
    b = jnp.array([2.0, 3.0, 4.0])
    c = jnp.array([1.0, 1.0, 0.0])
    d = jnp.array([3.0, 6.0, 10.0])
    x = tdma(a, b, c, d)
    ref = np_tridiag_solve(np.array(a), np.array(b), np.array(c), np.array(d))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-12)


@pytest.mark.parametrize("n", [5, 23, 62, 64, 126, 128])
def test_pcr_matches_tdma(n):
    # unit-diagonal system with a=c=-1/6: the CubeZ line system
    rng = np.random.default_rng(42 + n)
    d = rng.standard_normal(n)
    a = np.full(n, -1 / 6.0)
    c = np.full(n, -1 / 6.0)
    a[0] = 0.0
    c[-1] = 0.0
    ref = np_tridiag_solve(a, np.ones(n), c, d)
    x = pcr_1d(jnp.asarray(a), jnp.asarray(c), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n", [17, 33])
def test_pcr_variable_coefficients(n):
    # diagonally-dominant random unit-diagonal tridiagonal
    rng = np.random.default_rng(7)
    a = rng.uniform(-0.3, 0.0, n)
    c = rng.uniform(-0.3, 0.0, n)
    a[0] = 0.0
    c[-1] = 0.0
    d = rng.standard_normal(n)
    ref = np_tridiag_solve(a, np.ones(n), c, d)
    x = pcr_1d(jnp.asarray(a), jnp.asarray(c), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-9, atol=1e-12)


def test_pcr_batched():
    n, m = 30, 4
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n, m))
    a = np.full((n, 1), -1 / 6.0)
    c = np.full((n, 1), -1 / 6.0)
    a[0] = 0.0
    c[-1] = 0.0
    x = pcr_1d(
        jnp.broadcast_to(jnp.asarray(a), (n, m)),
        jnp.broadcast_to(jnp.asarray(c), (n, m)),
        jnp.asarray(d),
    )
    for col in range(m):
        ref = np_tridiag_solve(a[:, 0], np.ones(n), c[:, 0], d[:, col])
        np.testing.assert_allclose(np.asarray(x)[:, col], ref, rtol=1e-9)
