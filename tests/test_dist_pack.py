"""Production distributed sor2sma: packed-RB blocks + temporal blocking.

The load-bearing claim (parallel/dist_pack.py): with ghost depth 2n per
split axis and deep-halo redundant compute, owned cells after one
n-iteration window are BITWISE the serial packed kernel's n iterations —
the reference's same-kernel-per-rank property (cz_Poisson.cpp:194-215)
with serial-exact semantics on any mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubez_tpu import Problem
from cubez_tpu.parallel import dist_pack
from cubez_tpu.parallel.mesh import make_mesh
from cubez_tpu.pallas_kernels import rbpack
from cubez_tpu.solvers import steps as steps_mod


def cpu8():
    d = jax.devices("cpu")
    assert len(d) >= 8
    return d[:8]


def _mesh(n, div):
    nd = div[0] * div[1] * div[2]
    return make_mesh((n, n, n), devices=cpu8()[:nd], div=div)


@pytest.mark.parametrize("div", [(2, 2, 2), (2, 4, 1), (1, 2, 1)])
def test_packed_state_roundtrip(div):
    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = _mesh(n, div)
    hs = tuple(4 if d > 1 else 0 for d in div)
    st = dist_pack.to_packed_state(cm, prob.x0, hs)
    back = dist_pack.from_packed_state(cm, st, prob.grid.shape_kij, hs)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(prob.x0))


@pytest.mark.parametrize("div", [(2, 2, 2), (2, 4, 1), (1, 1, 1)])
def test_dist_packed_bitwise_vs_serial_packed(div):
    """Owned cells == serial packed window chain, bitwise, on any mesh."""
    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = _mesh(n, div)
    step = dist_pack.make_dist_packed_step(prob, cm, 1.5, n=2)
    assert step is not None
    snx = rbpack.make_packed_sweepnx(
        prob.grid.shape_kij, jnp.float32, omega=1.5, n=2, interpret=True
    )
    assert snx is not None
    xp, bp = snx.pad(prob.x0), snx.pad(prob.rhs)
    xs = dist_pack.to_packed_state(cm, prob.x0, step.hs)
    bs = dist_pack.to_packed_state(cm, prob.rhs, step.hs)
    for _ in range(3):
        xp, _ = snx(xp, bp)
        xs, _ = step(xs, bs)
    xser = np.asarray(snx.unpad(xp))
    xdist = np.asarray(
        dist_pack.from_packed_state(cm, xs, prob.grid.shape_kij, step.hs)
    )
    np.testing.assert_array_equal(xdist, xser)


def test_dist_packed_residuals_match_serial():
    """Owned-cell residual vector (psum of per-block partials) matches the
    serial per-iteration sums to roundoff."""
    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = _mesh(n, (2, 2, 2))
    step = dist_pack.make_dist_packed_step(prob, cm, 1.5, n=2)
    serial = steps_mod.make_step(prob, "sor2sma", 1.5)
    xs = dist_pack.to_packed_state(cm, prob.x0, step.hs)
    bs = dist_pack.to_packed_state(cm, prob.rhs, step.hs)
    x, refs = prob.x0, []
    for _ in range(4):
        x, r2 = serial(x, prob.rhs)
        refs.append(float(r2))
    got = []
    for _ in range(2):
        xs, r2v = step(xs, bs)
        got.extend(np.asarray(r2v).tolist())
    np.testing.assert_allclose(got, refs, rtol=2e-5)


@pytest.mark.slow
def test_dist_packed_odd_window_bitwise():
    """Odd window depth (n=5, the 256^3-zx production choice: measured
    165.6 us/iter vs n=4's 172.5, scripts/exp_dist_n6.py): owned cells
    bitwise the serial n=5 chain.  Needs block dims >= hs=10, so 32^3
    split z only."""
    n = 32
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = _mesh(n, (2, 1, 1))
    step = dist_pack.make_dist_packed_step(prob, cm, 1.5, n=5)
    assert step is not None and step.iters_per_call == 5
    snx = rbpack.make_packed_sweepnx(
        prob.grid.shape_kij, jnp.float32, omega=1.5, n=5, interpret=True
    )
    assert snx is not None
    xp, bp = snx.pad(prob.x0), snx.pad(prob.rhs)
    xs = dist_pack.to_packed_state(cm, prob.x0, step.hs)
    bs = dist_pack.to_packed_state(cm, prob.rhs, step.hs)
    for _ in range(2):
        xp, _ = snx(xp, bp)
        xs, _ = step(xs, bs)
    xser = np.asarray(snx.unpad(xp))
    xdist = np.asarray(
        dist_pack.from_packed_state(cm, xs, prob.grid.shape_kij, step.hs)
    )
    np.testing.assert_array_equal(xdist, xser)


def test_dist_packed_rejects_thin_blocks():
    """Exchange sources must be owned cells: depth-4 slabs cannot come from
    2-row blocks."""
    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = _mesh(n, (8, 1, 1))
    assert dist_pack.make_dist_packed_step(prob, cm, 1.5, n=2) is None


def test_explicit_pack_request_raises_when_unavailable():
    """sync='pack' must not silently downgrade to the per-color cadence
    (different trajectories than the bitwise-serial contract); only
    sync='auto' falls back."""
    from cubez_tpu.parallel.api import solve_dist

    n = 16
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = _mesh(n, (8, 1, 1))  # 2-row blocks: no packed tiling
    with pytest.raises(ValueError, match="pack"):
        solve_dist(prob, cm, "sor2sma", omega=1.5, itr_max=4,
                   impl="pallas", sync="pack")
    # ineligible configuration (jnp impl) raises too
    with pytest.raises(ValueError, match="pack"):
        solve_dist(prob, _mesh(n, (2, 2, 2)), "sor2sma", omega=1.5,
                   itr_max=4, impl="jnp", sync="pack")


def test_maf_serial_dispatch_stays_on_pair():
    """The serial MAF production form is the packed pair (measured: the
    6x chain regresses to 39.2 us/iter vs the pair's 24.9 at 128^3,
    BENCH_RESULTS) — the deepest-fit chain dispatch is const-only."""
    from cubez_tpu.solvers.fused_cache import get_fused_step

    prob = Problem.poisson_cube(32, dtype=jnp.float32, maf=True)
    step = get_fused_step("sor2sma", prob.grid, 1.5, prob.mc, True,
                          b_is_zero=True)
    assert step is not None and step.iters_per_call == 2


@pytest.mark.slow
@pytest.mark.parametrize("div", [(2, 2, 2), (2, 4, 1)])
def test_solve_dist_pack_iteration_count_exact(div):
    """solve_dist(sync='pack') reproduces the serial oracle count exactly
    (tests/ref_histories: sor2sma 32^3 omega=1.5 -> 199)."""
    from cubez_tpu.parallel.api import solve_dist

    n = 32
    prob = Problem.poisson_cube(n, dtype=jnp.float32)
    cm = _mesh(n, div)
    r = solve_dist(prob, cm, "sor2sma", omega=1.5, itr_max=2000, eps=1e-5,
                   impl="pallas", sync="pack")
    assert r.iters == 199, r.iters


@pytest.mark.parametrize("div", [(2, 2, 2), (1, 2, 4)])
def test_dist_packed_maf_stretched_bitwise(div):
    """MAF dist-packed on genuinely tanh-stretched metrics (k/i/j-varying
    tables): pins the per-block dynamic table slicing in all three axes —
    invisible on the uniform cube where the tables are constant."""
    import dataclasses

    prob0, _u = Problem.manufactured_stretched(16, dtype=jnp.float32)
    # zero-RHS configuration (the pack path's contract); rough start so
    # every window does real work
    ramp = jnp.linspace(0.0, 1.0, 16, dtype=jnp.float32)[:, None, None]
    prob = dataclasses.replace(
        prob0,
        x0=prob0.x0 + 0.3 * ramp * prob0.grid.inner_mask,
        rhs=jnp.zeros_like(prob0.rhs),
        rhs_inner_zero=True,
    )
    cm = _mesh(16, div)
    step = dist_pack.make_dist_packed_step(prob, cm, 1.2, n=2)
    assert step is not None
    snx = rbpack.make_packed_sweepnx(
        prob.grid.shape_kij, jnp.float32, omega=1.2, n=2, mc=prob.mc,
        interpret=True,
    )
    assert snx is not None
    xp, bp = snx.pad(prob.x0), snx.pad(prob.rhs)
    xs = dist_pack.to_packed_state(cm, prob.x0, step.hs)
    bs = dist_pack.to_packed_state(cm, prob.rhs, step.hs)
    for _ in range(2):
        xp, _ = snx(xp, bp)
        xs, _ = step(xs, bs)
    xser = np.asarray(snx.unpad(xp))
    xdist = np.asarray(
        dist_pack.from_packed_state(cm, xs, prob.grid.shape_kij, step.hs)
    )
    np.testing.assert_array_equal(xdist, xser)


@pytest.mark.slow
def test_solve_dist_pack_maf_iteration_count_exact():
    """solve_dist(sor2sma_maf, sync='pack') == the serial oracle count."""
    from cubez_tpu.parallel.api import solve_dist

    prob = Problem.poisson_cube(32, dtype=jnp.float32, maf=True)
    cm = _mesh(32, (2, 2, 2))
    r = solve_dist(prob, cm, "sor2sma_maf", omega=1.5, itr_max=2000,
                   eps=1e-5, impl="pallas", sync="pack")
    assert r.iters == 199, r.iters
