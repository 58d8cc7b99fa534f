"""Distributed fused-Pallas block sweeps (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from cubez_tpu import Problem
from cubez_tpu.parallel import dist_fused
from cubez_tpu.parallel.halo import exchange_halo, pad_zeros, psum_all
from cubez_tpu.parallel.mesh import FIELD_SPEC, make_mesh
from cubez_tpu.solvers import steps as steps_mod


def cpu8():
    d = jax.devices("cpu")
    assert len(d) >= 8
    return d[:8]


def _roundtrip(cm, prob):
    st = dist_fused.to_block_state(cm, prob.x0)
    back = dist_fused.from_block_state(cm, st, prob.grid.shape_kij)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(prob.x0))


def test_block_state_roundtrip():
    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8(), div=(2, 2, 2))
    _roundtrip(cm, prob)


def test_single_block_matches_serial_exactly():
    """div=(1,1,1): the fused block sweep IS the serial sweep."""
    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8()[:1], div=(1, 1, 1))
    step = dist_fused.make_dist_fused_step(prob, cm, "sor2sma", 1.5)
    assert step is not None
    serial = steps_mod.make_step(prob, "sor2sma", 1.5)

    xs = dist_fused.to_block_state(cm, prob.x0)
    bs = dist_fused.to_block_state(cm, prob.rhs)
    x_ref = prob.x0
    for _ in range(4):
        xs, r2d = step(xs, bs)
        x_ref, r2s = serial(x_ref, prob.rhs)
    back = dist_fused.from_block_state(cm, xs, prob.grid.shape_kij)
    assert float(jnp.max(jnp.abs(back - x_ref))) < 1e-6
    np.testing.assert_allclose(float(r2d), float(r2s), rtol=1e-5)


def test_jacobi_8_blocks_matches_jnp_dist():
    """Jacobi has no inter-color coupling: fused == jnp dist path exactly."""
    from cubez_tpu.parallel.dist import make_dist_step
    from cubez_tpu.parallel.mesh import make_mesh

    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8(), div=(2, 2, 2))
    fstep = dist_fused.make_dist_fused_step(prob, cm, "jacobi", 0.8)
    jstep = make_dist_step(prob, cm, "jacobi", 0.8)

    xs = dist_fused.to_block_state(cm, prob.x0)
    bs = dist_fused.to_block_state(cm, prob.rhs)
    xj = cm.shard(prob.x0)
    bj = cm.shard(prob.rhs)
    for _ in range(4):
        xs, r2f = fstep(xs, bs)
        xj, r2j = jstep(xj, bj)
    back = dist_fused.from_block_state(cm, xs, prob.grid.shape_kij)
    assert float(jnp.max(jnp.abs(back - xj))) < 1e-6
    np.testing.assert_allclose(float(r2f), float(r2j), rtol=1e-5)


def _lowsync_rb_step(prob, cm, omega):
    """Reference multi-rank RB-SOR: ONE halo exchange per iteration
    (cz_Poisson.cpp:194-215), colors not re-synced — jnp oracle for the
    fused kernel's semantics."""
    from cubez_tpu.ops import stencil
    from cubez_tpu.parallel.dist import _global_color_masks
    from cubez_tpu.parallel.halo import global_offsets

    g = prob.grid
    dtype = g.dtype
    msk = prob.msk
    om = jnp.asarray(omega, dtype)

    def body(xb, bb, mb):
        xh = exchange_halo(xb)  # once per iteration
        bh = pad_zeros(bb)
        cm0, cm1 = _global_color_masks(xb.shape, dtype)
        r2 = jnp.zeros((), dtype)
        # color 0 on the halo'd block
        dp0 = stencil.jacobi_delta(xh, bh, pad_zeros(mb * cm0), om)
        xh = xh + dp0  # ghosts of dp0 are zero (mask padded with zeros)
        r2 = r2 + psum_all(jnp.sum(dp0 * dp0))
        dp1 = stencil.jacobi_delta(xh, bh, pad_zeros(mb * cm1), om)
        xh = xh + dp1
        r2 = r2 + psum_all(jnp.sum(dp1 * dp1))
        return xh[1:-1, 1:-1, 1:-1], r2

    fn = shard_map(
        body,
        mesh=cm.mesh,
        in_specs=(FIELD_SPEC, FIELD_SPEC, FIELD_SPEC),
        out_specs=(FIELD_SPEC, P()),
    )
    return lambda x, b: fn(x, b, cm.shard(msk))


def test_sor2sma_color_sync_matches_jnp_dist():
    """sync='color' == the per-color-exchange jnp dist path exactly."""
    from cubez_tpu.parallel.dist import make_dist_step

    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8(), div=(2, 2, 2))
    fstep = dist_fused.make_dist_fused_step(prob, cm, "sor2sma", 1.5)
    jstep = make_dist_step(prob, cm, "sor2sma", 1.5)

    xs = dist_fused.to_block_state(cm, prob.x0)
    bs = dist_fused.to_block_state(cm, prob.rhs)
    xj = cm.shard(prob.x0)
    bj = cm.shard(prob.rhs)
    for _ in range(4):
        xs, r2f = fstep(xs, bs)
        xj, r2j = jstep(xj, bj)
    back = dist_fused.from_block_state(cm, xs, prob.grid.shape_kij)
    assert float(jnp.max(jnp.abs(back - xj))) < 1e-6
    np.testing.assert_allclose(float(r2f), float(r2j), rtol=1e-4)


def test_sor2sma_8_blocks_matches_lowsync_oracle():
    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8(), div=(2, 2, 2))
    fstep = dist_fused.make_dist_fused_step(prob, cm, "sor2sma", 1.5, sync="iter")
    ostep = _lowsync_rb_step(prob, cm, 1.5)

    xs = dist_fused.to_block_state(cm, prob.x0)
    bs = dist_fused.to_block_state(cm, prob.rhs)
    xo = cm.shard(prob.x0)
    bo = cm.shard(prob.rhs)
    for _ in range(4):
        xs, r2f = fstep(xs, bs)
        xo, r2o = ostep(xo, bo)
    back = dist_fused.from_block_state(cm, xs, prob.grid.shape_kij)
    assert float(jnp.max(jnp.abs(back - xo))) < 1e-6
    np.testing.assert_allclose(float(r2f), float(r2o), rtol=1e-4)


def test_sor2sma_dist_fused_converges():
    from cubez_tpu import max_error
    from cubez_tpu.solvers.driver import run_iterative

    n = 32
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8(), div=(2, 2, 2))
    step = dist_fused.make_dist_fused_step(prob, cm, "sor2sma", 1.5)
    xs = dist_fused.to_block_state(cm, prob.x0)
    bs = dist_fused.to_block_state(cm, prob.rhs)
    res = run_iterative(step, xs, bs, prob.grid.res_normal, itr_max=2000)
    assert res.res < 1e-5
    back = dist_fused.from_block_state(cm, res.x, prob.grid.shape_kij)
    assert max_error(prob.grid, back) < 2e-3


def test_solve_dist_api():
    from cubez_tpu import max_error
    from cubez_tpu.parallel.api import solve_dist

    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8(), div=(2, 2, 2))
    r = solve_dist(prob, cm, "sor2sma", omega=1.5, itr_max=2000)
    assert r.res < 1e-5
    assert r.x.shape == prob.grid.shape_kij
    assert max_error(prob.grid, r.x) < 5e-3
    # serial-equivalent: same iteration count as the single-device solve
    from cubez_tpu import solve

    rs = solve(prob, "sor2sma", omega=1.5, itr_max=2000, impl="jnp")
    assert r.iters == rs.iters


@pytest.mark.parametrize("kind,om", [("pcr", 1.0), ("pcr_rb", 1.5)])
@pytest.mark.parametrize("div", [(2, 2, 2), (2, 4, 1)])
def test_dist_fused_pcr_matches_jnp_dist(kind, om, div):
    """Fused block line-PCR == the jnp dist line_solve (identity-ghost
    formulation) on every mesh shape, including split K."""
    from cubez_tpu.parallel.dist import make_dist_step

    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    ndev = div[0] * div[1] * div[2]
    cm = make_mesh((n, n, n), devices=cpu8()[:ndev], div=div)
    fstep = dist_fused.make_dist_fused_step(prob, cm, kind, om)
    assert fstep is not None
    # dist_fused kinds are internal ('pcr' = the line-Jacobi block form);
    # the solver NAME for that form is pcr_j_esa
    jstep = make_dist_step(prob, cm, "pcr_j_esa" if kind == "pcr" else kind, om)
    xs = dist_fused.to_line_block_state(cm, prob.x0)
    bs = dist_fused.to_line_block_state(cm, prob.rhs)
    xj = cm.shard(prob.x0)
    bj = cm.shard(prob.rhs)
    for _ in range(4):
        xs, r2f = fstep(xs, bs)
        xj, r2j = jstep(xj, bj)
    back = dist_fused.from_line_block_state(cm, xs, prob.grid.shape_kij)
    assert float(jnp.max(jnp.abs(back - xj))) < 2e-6
    np.testing.assert_allclose(float(r2f), float(r2j), rtol=1e-4, atol=1e-6)


def test_solve_dist_pcr_rb():
    from cubez_tpu import max_error
    from cubez_tpu.parallel.api import solve_dist

    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8(), div=(2, 2, 2))
    r = solve_dist(prob, cm, "pcr_rb", omega=1.5, itr_max=2000)
    assert r.res < 1e-5
    assert max_error(prob.grid, r.x) < 5e-3


def test_dist_fused_maf_pcr_rb_matches_jnp_dist():
    """Fused block MAF line sweep (per-block metric-table slices) == the
    explicit jnp dist MAF line step, including split K."""
    from cubez_tpu.parallel.dist import make_dist_step

    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32, maf=True)
    cm = make_mesh((n, n, n), devices=cpu8(), div=(2, 2, 2))
    fstep = dist_fused.make_dist_fused_step(prob, cm, "pcr_rb", 1.2)
    assert fstep is not None
    jstep = make_dist_step(prob, cm, "pcr_rb_maf", 1.2)
    xs = dist_fused.to_line_block_state(cm, prob.x0)
    bs = dist_fused.to_line_block_state(cm, prob.rhs)
    xj = cm.shard(prob.x0)
    bj = cm.shard(prob.rhs)
    for _ in range(3):
        xs, r2f = fstep(xs, bs)
        xj, r2j = jstep(xj, bj)
    back = dist_fused.from_line_block_state(cm, xs, prob.grid.shape_kij)
    assert float(jnp.max(jnp.abs(back - xj))) < 2e-5
    np.testing.assert_allclose(float(r2f), float(r2j), rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("div", [(2, 2, 2), (1, 2, 4)])
def test_fused_overlap_matches_color_sync(div):
    """Halo/compute overlap on the FUSED path (interior Pallas kernel with
    the shell masked off, ppermutes data-independent, shell recomputed
    from refreshed ghosts) equals the sequential per-color path to <=2
    ulp per iteration (XLA may contract the shell patch's multiply-adds
    differently than the kernel; the operand order is identical)."""
    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    nd = div[0] * div[1] * div[2]
    cm = make_mesh((n, n, n), devices=cpu8()[:nd], div=div)
    ov = dist_fused.make_dist_fused_overlap_step(prob, cm, 1.5,
                                                 b_is_zero=True)
    seq = dist_fused.make_dist_fused_step(prob, cm, "sor2sma", 1.5,
                                          b_is_zero=True, sync="color")
    assert ov is not None and seq is not None
    x1 = dist_fused.to_block_state(cm, prob.x0)
    x2 = dist_fused.to_block_state(cm, prob.x0)
    bs = dist_fused.to_block_state(cm, prob.rhs)
    for _ in range(4):
        x1, r1 = ov(x1, bs)
        x2, r2 = seq(x2, bs)
    b1 = dist_fused.from_block_state(cm, x1, prob.grid.shape_kij)
    b2 = dist_fused.from_block_state(cm, x2, prob.grid.shape_kij)
    assert float(jnp.max(jnp.abs(b1 - b2))) < 3e-7
    np.testing.assert_allclose(float(r1), float(r2), rtol=1e-5)


def test_fused_overlap_single_block_bitwise():
    """With zero ghosts (1-device mesh) the interior+shell composition is
    bitwise the sequential fused sweep."""
    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8()[:1], div=(1, 1, 1))
    ov = dist_fused.make_dist_fused_overlap_step(prob, cm, 1.5,
                                                 b_is_zero=True)
    seq = dist_fused.make_dist_fused_step(prob, cm, "sor2sma", 1.5,
                                          b_is_zero=True, sync="color")
    x1 = dist_fused.to_block_state(cm, prob.x0)
    x2 = dist_fused.to_block_state(cm, prob.x0)
    bs = dist_fused.to_block_state(cm, prob.rhs)
    for _ in range(3):
        x1, _ = ov(x1, bs)
        x2, _ = seq(x2, bs)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


@pytest.mark.slow
def test_solve_dist_overlap_iteration_count_exact():
    """solve_dist(sync='overlap') through the fused overlap step matches
    the serial oracle count (sor2sma 32^3 omega=1.5 -> 199)."""
    from cubez_tpu.parallel.api import solve_dist

    n = 32
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = make_mesh((n, n, n), devices=cpu8(), div=(2, 2, 2))
    r = solve_dist(prob, cm, "sor2sma", omega=1.5, itr_max=2000, eps=1e-5,
                   impl="pallas", sync="overlap")
    assert r.iters == 199, r.iters


class TestDistLineFastdiag:
    """K-unsplit meshes dispatch block-local line solves through the MXU
    fast-diagonalization form (serial lines.py/rblines.py solve per
    block); K-split meshes keep the identity-extended PCR recurrence."""

    def _prob(self, maf):
        return Problem.poisson_cube(32, dtype=jnp.float32, maf=maf)

    @pytest.mark.parametrize("maf", [False, True])
    def test_fastdiag_builder_selects(self, maf):
        from cubez_tpu.pallas_kernels.dist_pcr import make_block_pcr

        prob = self._prob(maf)
        s = make_block_pcr(
            (32, 16, 16), (32, 32, 32), jnp.float32, omega=1.5, color=0,
            maf=maf, mc=prob.mc, solver="fastdiag", interpret=True,
        )
        assert s is not None and s.solver == "fastdiag"
        # K-split block extents must refuse the fastdiag form
        s2 = make_block_pcr(
            (16, 16, 16), (32, 32, 32), jnp.float32, omega=1.5, color=0,
            maf=maf, mc=prob.mc, solver="fastdiag", interpret=True,
        )
        assert s2 is None

    @pytest.mark.parametrize("maf", [False, True])
    def test_fastdiag_sweep_matches_pcr_sweep(self, maf):
        """One fastdiag color sweep == the PCR-stage sweep on the same
        K-unsplit block state (same system, different solve algorithm —
        agreement to solver roundoff)."""
        from cubez_tpu.parallel import dist_fused

        prob = self._prob(maf)
        cm = make_mesh((32, 32, 32), devices=cpu8(), div=(1, 2, 4))
        # force both forms by building two steps: the dispatch picks
        # fastdiag on this mesh; a (2,2,2)-style PCR form is built by
        # calling make_block_pcr directly inside the jnp reference below
        step_fd = dist_fused.make_dist_fused_step(
            prob, cm, "pcr_rb", 1.5, sync="color"
        )
        from cubez_tpu.parallel.dist import make_dist_step

        step_ref = make_dist_step(prob, cm, "pcr_rb_maf" if maf else
                                  "pcr_rb", 1.5)
        xs = dist_fused.to_line_block_state(cm, prob.x0)
        bs = dist_fused.to_line_block_state(cm, prob.rhs)
        xj, bj = cm.shard(prob.x0), cm.shard(prob.rhs)
        for _ in range(2):
            xs, r2f = step_fd(xs, bs)
            xj, r2j = step_ref(xj, bj)
        back = dist_fused.from_line_block_state(
            cm, xs, prob.grid.shape_kij
        )
        assert float(jnp.max(jnp.abs(back - xj))) < 5e-6
        np.testing.assert_allclose(float(r2f), float(r2j), rtol=1e-4)

    @pytest.mark.slow
    @pytest.mark.parametrize("maf", [False, True])
    def test_fastdiag_count_equals_serial(self, maf):
        """To-tolerance dist line solve on a K-unsplit mesh reproduces
        the SERIAL count exactly (lines are global, reference
        cz_solver.f90:497-662 semantics per block)."""
        from cubez_tpu import solve
        from cubez_tpu.parallel.api import solve_dist

        prob = self._prob(maf)
        name = "pcr_rb_maf" if maf else "pcr_rb"
        rs = solve(prob, name, omega=1.5, itr_max=2000, impl="jnp")
        cm = make_mesh((32, 32, 32), devices=cpu8(), div=(1, 2, 4))
        rd = solve_dist(prob, cm, name, omega=1.5, itr_max=2000,
                        impl="pallas")
        assert rd.iters == rs.iters, (rd.iters, rs.iters)

    @pytest.mark.parametrize("maf", [False, True])
    @pytest.mark.parametrize("div", [(1, 4, 1), (2, 2, 1)])
    def test_ghostless_lanes_on_y_unsplit_mesh(self, maf, div):
        """Y-unsplit meshes drop the J ghost lanes from the line layout
        (gj=0: wall columns in-state, ljp = the 128-multiple of lj itself
        — half the lane extent of 128-lane blocks).  Sweeps must match
        the jnp dist step on both the fastdiag (K-unsplit) and PCR
        (K-split) dispatches."""
        from cubez_tpu.parallel import dist_fused
        from cubez_tpu.parallel.dist import make_dist_step

        prob = self._prob(maf)
        nd = div[0] * div[1] * div[2]
        cm = make_mesh((32, 32, 32), devices=cpu8()[:nd], div=div)
        step = dist_fused.make_dist_fused_step(
            prob, cm, "pcr_rb", 1.5, sync="color"
        )
        assert step is not None
        step_ref = make_dist_step(prob, cm, "pcr_rb_maf" if maf else
                                  "pcr_rb", 1.5)
        xs = dist_fused.to_line_block_state(cm, prob.x0)
        bs = dist_fused.to_line_block_state(cm, prob.rhs)
        # the state really is ghost-lane-free: 32 J cells pad to 128
        # lanes (gj=1 would pad 34 -> 128 too; pin via roundtrip instead)
        back0 = dist_fused.from_line_block_state(
            cm, xs, prob.grid.shape_kij
        )
        np.testing.assert_array_equal(np.asarray(back0),
                                      np.asarray(prob.x0))
        xj, bj = cm.shard(prob.x0), cm.shard(prob.rhs)
        for _ in range(2):
            xs, r2f = step(xs, bs)
            xj, r2j = step_ref(xj, bj)
        back = dist_fused.from_line_block_state(
            cm, xs, prob.grid.shape_kij
        )
        assert float(jnp.max(jnp.abs(back - xj))) < 5e-6
        np.testing.assert_allclose(float(r2f), float(r2j), rtol=1e-4)
