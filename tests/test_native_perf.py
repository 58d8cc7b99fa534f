"""Native C++ runtime bindings + perf-monitor subsystem."""

import os

import numpy as np
import pytest

from cubez_tpu.parallel.decomp import auto_division as py_auto_division
from cubez_tpu.perf.pmlib import CALC, COMM, PerfMonitor
from cubez_tpu.perf.roofline import pcr_flops_per_pt, sweep_cost
from cubez_tpu.utils import native


def test_native_builds():
    assert native.available(), "native/libczx.so failed to build"


def test_native_division_matches_python():
    for nproc in (1, 2, 3, 4, 8, 12, 16, 64):
        for g in ((128, 128, 128), (64, 128, 256), (32, 8, 500)):
            assert native.auto_division(nproc, g) == py_auto_division(nproc, g)


def test_native_tdma_pcr_oracle():
    rng = np.random.default_rng(42)
    n = 37
    a = np.full(n, -1 / 6.0)
    a[0] = 0.0
    c = np.full(n, -1 / 6.0)
    c[-1] = 0.0
    b = np.ones(n)
    d = rng.normal(size=n)
    x = native.tdma(a, b, c, d)
    A = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
    assert np.allclose(A @ x, d, atol=1e-12)
    assert np.allclose(native.pcr(a, c, d), x, atol=1e-10)

    # batched layout (m systems)
    m = 5
    D = rng.normal(size=(m, n))
    X = native.tdma(
        np.broadcast_to(a, (m, n)), np.broadcast_to(b, (m, n)),
        np.broadcast_to(c, (m, n)), D,
    )
    for s in range(m):
        assert np.allclose(A @ X[s], D[s], atol=1e-12)


def test_sph_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    f = rng.normal(size=(6, 5, 4)).astype(np.float32)
    p = str(tmp_path / "field.sph")
    native.write_sph(p, f, org=(0, 0, 0), pitch=(0.25, 0.25, 0.25), step=3, time=0.5)
    g, org, pitch, step, time = native.read_sph(p)
    assert np.array_equal(g, f)
    assert step == 3 and abs(time - 0.5) < 1e-7
    assert pitch == (0.25, 0.25, 0.25)


def test_history_format(tmp_path):
    p = str(tmp_path / "jacobi.txt")
    native.write_history(p, [0.5, 1.25e-3])
    lines = open(p).read().splitlines()
    assert lines[0] == "Itration      Residual"
    assert lines[1] == "     1,  5.000000e-01"
    assert lines[2] == "     2,  1.250000e-03"


def test_perf_monitor_report(tmp_path):
    pm = PerfMonitor(hbm_gbps=800.0)
    with pm.section("Jacobi_kernel", CALC, flops=1e9, bytes=4e9):
        pass
    with pm.section("Comm_Res_Poisson", COMM):
        pass
    rep = pm.report()
    assert "Jacobi_kernel" in rep and "Comm_Res_Poisson" in rep
    path = str(tmp_path / "profiling.txt")
    pm.write(path)
    assert os.path.exists(path)


def test_roofline_costs():
    f, b = sweep_cost("sor2sma", (128, 128, 128), b_is_zero=True)
    assert f == 18 * 128**3
    assert b == 2 * 128**3 * 4
    # PCR flop model: pn(126) = 7
    assert pcr_flops_per_pt(126) == 6 + 14 * 5 + 74 * 32 / 126 + 6 + 6
    fp, bp = sweep_cost("pcr", (128, 64, 64))
    assert fp > 0 and bp == 3 * 128 * 64 * 64 * 4


def test_profile_solve_serial_sections():
    # measured per-phase profiling: a serial profile has sweep + overhead rows
    import jax.numpy as jnp

    from cubez_tpu import Problem
    from cubez_tpu.perf.profile import profile_solve

    prob = Problem.poisson_cube(16, dtype=jnp.float32)
    pm = profile_solve(prob, "sor2sma", omega=1.5, iters=5)
    rep = pm.report()
    assert "sor2sma_sweep" in rep and "driver_overhead" in rep
    assert pm.sections["sor2sma_sweep"].seconds > 0
    assert pm.sections["sor2sma_sweep"].flops > 0


def test_profile_solve_dist_comm_bytes():
    # a distributed profile must record nonzero COMM bytes
    # (cz_Evaluate.cpp:181-184 accounting)
    import jax
    import jax.numpy as jnp

    from cubez_tpu import Problem
    from cubez_tpu.parallel.mesh import make_mesh
    from cubez_tpu.perf.profile import profile_solve

    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=jax.devices("cpu")[:8], div=(2, 2, 2))
    pm = profile_solve(prob, "sor2sma", omega=1.5, iters=4, cmesh=cm)
    halo = pm.sections["halo_exchange"]
    assert halo.kind == "COMM" and halo.bytes > 0 and halo.seconds > 0
    assert pm.sections["residual_allreduce"].bytes > 0
    assert pm.sections["sor2sma_block_sweep"].flops > 0
