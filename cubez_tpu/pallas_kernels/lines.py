"""Fused MXU line-relaxation kernels: the matmul/fast-diagonalization
successor to the PCR kernels in pcr.py.

A line sweep solves, for every (i, j), a K-direction tridiagonal system and
relaxes x toward the solution (reference pcr family, cz_solver.f90:497-878).
pcr.py expresses the solve as log2(n) PCR stages of sublane rotates — VPU
data movement.  Here the solve is dense linear algebra on the MXU
(ops/fastdiag.py): one matmul per i-row for the constant-coefficient
operator (x = T^-1 d), two for the variable-coefficient MAF operator
(x = V ((V^-1 d) / (mu + lambda(i,j)))).  At 128^3 the matmul form turns
~40 sublane rotates per point into ~2n MXU flops per point, which the MXU
absorbs below the HBM floor.

Two sweep kinds:

* ``pcr_j``  — line-Jacobi full-plane pass (reference pcr_j_esa,
  cz_solver.f90:1473-1676): every line solved from the pre-sweep field.
* ``pcr_rb`` — BOTH red-black colors in a single pass (reference pcr_rb,
  cz_solver.f90:497-662, two colors serialized): color-1 lines see color-0
  updates.  Fusing the colors into one kernel invocation halves the HBM
  traffic vs. pcr.py's two per-color invocations: color 0 is computed on an
  I-extended slab (it+2 rows) so color 1's transverse neighbors are already
  updated in VMEM — the same overlap trick as the fused sor2sma sweep
  (sweeps.py).

Layout: (I+4, Kp, Jp) — I leading with halo 2 (DMA slabs of it+4 rows), K
on sublanes (full lines resident), J on lanes.  The K boundary rows k=0 and
k=K-1 carry the Dirichlet values and fold into the line RHS ends
(cz_solver.f90:578-579); K tile-padding sublanes are masked everywhere.

Precision (measured, do not revisit): the matmuls MUST run at
lax.Precision.HIGHEST.  T^-1 of the Laplacian line has condition O(n^2)
(~6.7e3 at n=126), which amplifies any operand quantization: DEFAULT (bf16)
gives 7.6e-3 solution error, and a manual 3-pass bf16 hi/lo split (the
Precision.HIGH scheme, which Pallas cannot lower) still measures 1.7e-3
relative error at n=14 — growing with n^2, it stalls convergence well above
eps.  Only the 6-pass true-f32 product keeps the fused solve exact enough;
the MXU cost is already below the HBM floor at these shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import fastdiag
from .sweeps import _round_up

R6 = 1.0 / 6.0


def to_line4_layout(x):
    """(K, I, J) cube -> (I+4, Kp, Jp) line state (I-halo 2 for the fused
    red-black slabs; K/J padded to the (8, 128) tile)."""
    K, I, J = x.shape[-3], x.shape[-2], x.shape[-1]
    t = x.transpose(1, 0, 2)
    return jnp.pad(
        t, ((2, 2), (0, _round_up(K, 8) - K), (0, _round_up(J, 128) - J))
    )


def from_line4_layout(xp, shape):
    K, I, J = shape
    return xp[2:-2, :K, :J].transpose(1, 0, 2)


def _roll_j(x, shift):
    if shift < 0:
        shift += x.shape[2]
    return pltpu.roll(x, shift=shift, axis=2)


def _mxu_matmul(m, d, dtype):
    # Precision.HIGHEST: the MXU's default f32 path truncates the operands
    # to bf16 (measured 7.6e-3 solution error on v5e); HIGHEST selects the
    # multi-pass true-f32 product
    return jax.lax.dot_general(
        m, d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(dtype)


def batched_solve_const(m1, d, Jp, dtype):
    """x = T^-1 d over a (rows, Kp, Jp) stack: all rows concatenate into ONE
    weight-stationary (Kp, rows*Jp) MXU operand so T^-1 loads into the MXU
    once per tile instead of once per row (HIGHEST is a multi-pass product —
    per-matmul weight reloads dominate at Jp=128).  Shared by the line
    kernels here and in rblines.py."""
    rows = d.shape[0]
    D = jnp.concatenate([d[r] for r in range(rows)], axis=1)
    X = _mxu_matmul(m1, D, dtype)
    return jnp.stack([X[:, r * Jp : (r + 1) * Jp] for r in range(rows)])


def batched_solve_maf(m1, m2, mu2d, lam_rows, d, Jp, dtype):
    """Fast-diagonalization x = V((V^-1 d)/(mu+lambda)) over a (rows, Kp,
    Jp) stack, batched like batched_solve_const.  ``mu2d`` is the (Kp, Jp)
    eigenvalue column; ``lam_rows[r]`` the (1, Jp) per-line shift."""
    rows = d.shape[0]
    D = jnp.concatenate([d[r] for r in range(rows)], axis=1)
    W = _mxu_matmul(m2, D, dtype)
    L = jnp.concatenate([mu2d + lam_rows[r] for r in range(rows)], axis=1)
    X = _mxu_matmul(m1, W / L, dtype)
    return jnp.stack([X[:, r * Jp : (r + 1) * Jp] for r in range(rows)])


def choose_it(shape, itemsize=4, max_vmem_bytes=64 << 20, it_cap=32):
    """Largest divisor of I (<= it_cap) fitting the VMEM model:
    2*(it+4) input + 2*(it+2) b + 2*it out + ~8*it temporaries rows of
    (Kp, Jp)."""
    K, I, J = shape
    row = _round_up(K, 8) * _round_up(J, 128) * itemsize
    best = None
    for it in range(1, min(I, it_cap) + 1):
        if I % it:
            continue
        if (2 * (it + 4) + 2 * (it + 2) + 2 * it + 8 * it) * row <= max_vmem_bytes:
            best = it
    return best


def _line_kernel(
    xp_ref, bp_ref, m1_ref, m2_ref, mu_ref, lam_ref, tij_ref, tj_ref,
    out_ref, r2_ref,
    xs, bs, outs, in_sems, b_sems, out_sems,
    *, kind, K, I, J, Kp, Jp, it, omega, offset, b_is_zero, maf,
    wzm0, wzpn, batch,
):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    two = jnp.asarray(2, t.dtype)
    slot = jax.lax.rem(t, two)
    nslot = jax.lax.rem(t + 1, two)
    dtype = xs.dtype
    rb = kind == "pcr_rb"
    x_halo = 4 if rb else 2
    x_off = 0 if rb else 1  # slab start in the (I+4)-padded array
    b_rows = it + 2 if rb else it
    b_off = 1 if rb else 2

    def in_dma(s, idx):
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(idx * it + x_off, it + x_halo)], xs.at[s],
            in_sems.at[s],
        )

    def b_dma(s, idx):
        return pltpu.make_async_copy(
            bp_ref.at[pl.ds(idx * it + b_off, b_rows)], bs.at[s], b_sems.at[s]
        )

    def out_dma(s, idx):
        return pltpu.make_async_copy(
            outs.at[s], out_ref.at[pl.ds(idx * it + 2, it)], out_sems.at[s]
        )

    # In-place pipeline (the state output aliases the state input): the
    # I-slab of tile t+1 overlaps out_dma(t)'s write range by up to 2 rows
    # (pre-update halo rows), so in_dma(t+1) must COMPLETE before out_dma(t)
    # starts — its wait sits just before the output stage below, after this
    # tile's compute has covered the transfer.  Each slab is therefore
    # already resident when its invocation begins (only tile 0 waits here).
    @pl.when(t == 0)
    def _():
        in_dma(0, 0).start()
        in_dma(0, 0).wait()
        if not b_is_zero:
            b_dma(0, 0).start()

    @pl.when(t + 1 < T)
    def _():
        in_dma(nslot, t + 1).start()
        if not b_is_zero:
            b_dma(nslot, t + 1).start()

    if not b_is_zero:
        b_dma(slot, t).wait()

    xv = xs[slot]  # (it + x_halo, Kp, Jp)
    zero = jnp.zeros((), dtype)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, Kp, 1), 1)
    inner_k = (kidx >= 1) & (kidx <= K - 2)

    def line_masks(rows, gi0):
        gi = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, Jp), 0) + jnp.asarray(
            gi0, jnp.int32
        )
        gj = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, Jp), 2)
        inner = (gi >= 1) & (gi <= I - 2) & (gj >= 1) & (gj <= J - 2)
        par = jax.lax.rem(
            gi + gj + jnp.asarray(offset, jnp.int32), jnp.asarray(2, jnp.int32)
        )
        return inner, par

    if maf:
        mu = mu_ref[:][None]  # (1, Kp, Jp)

        def solve(d, lam_rows):
            # x = V ((V^-1 d) / (mu + lambda));  d (rows, Kp, Jp)
            if batch:
                return batched_solve_maf(
                    m1_ref[:], m2_ref[:], mu[0], lam_rows, d, Jp, dtype
                )
            out = []
            for r in range(d.shape[0]):
                w = _mxu_matmul(m2_ref[:], d[r], dtype)
                w = w / (mu[0] + lam_rows[r])
                out.append(_mxu_matmul(m1_ref[:], w, dtype))
            return jnp.stack(out)

        def build_d(xslab, brows, trow0):
            # unscaled MAF line RHS: metric-weighted transverse + BC folds
            # (cz_maf.f90:519-572 without the 1/dw normalization);
            # trow0 = first padded-table row of xslab[1:-1]
            xc = xslab[1:-1]
            ti = tij_ref[pl.ds(trow0, xc.shape[0])]  # (rows, 2, Jp): c1, c7
            c1 = ti[:, 0:1, :]
            c7 = ti[:, 1:2, :]
            c2 = tj_ref[0][None]
            c8 = tj_ref[1][None]
            half = jnp.asarray(0.5, dtype)
            d = (
                (c1 + half * c7) * xslab[2:]
                + (c1 - half * c7) * xslab[:-2]
                + (c2 + half * c8) * _roll_j(xc, -1)
                + (c2 - half * c8) * _roll_j(xc, 1)
            )
            if brows is not None:
                d = d - brows
            d = d + jnp.where(
                kidx == 1, jnp.asarray(wzm0, dtype) * xc[:, 0:1, :], zero
            )
            d = d + jnp.where(
                kidx == K - 2, jnp.asarray(wzpn, dtype) * xc[:, K - 1 : K, :],
                zero,
            )
            return d

    else:

        def solve(d, lam_rows):
            Ti = m1_ref[:]  # (Kp, Kp) padded T^-1
            if batch:  # one weight-stationary matmul for all rows
                return batched_solve_const(Ti, d, Jp, dtype)
            return jnp.stack(
                [_mxu_matmul(Ti, d[r], dtype) for r in range(d.shape[0])]
            )

        def build_d(xslab, brows, trow0):
            xc = xslab[1:-1]
            trans = (
                xslab[2:] + xslab[:-2] + _roll_j(xc, -1) + _roll_j(xc, 1)
            )
            r6 = jnp.asarray(R6, dtype)
            d = trans * r6 if brows is None else (trans - brows) * r6
            d = d + jnp.where(kidx == 1, xc[:, 0:1, :] * r6, zero)
            d = d + jnp.where(kidx == K - 2, xc[:, K - 1 : K, :] * r6, zero)
            return d

    i0 = t * it  # global i of the first OWNED row
    om = jnp.asarray(omega, dtype)
    bv = None if b_is_zero else bs[slot]

    def lam_slice(rows, roff):
        if not maf:
            return [None] * rows
        lr = lam_ref[pl.ds(t * it + roff + 2, rows)]  # (rows, 1, Jp)
        return [lr[r] for r in range(rows)]

    if rb:
        # color 0 on the extended slab (rows i0-1 .. i0+it), masked to inner
        inner_e, par_e = line_masks(it + 2, i0 - 1)
        d0 = build_d(xv, bv, t * it + 1)
        d0 = jnp.where(inner_e & inner_k, d0, zero)
        sol0 = solve(d0, lam_slice(it + 2, -1))
        xe = xv[1:-1]
        upd0 = inner_e & (par_e == 0) & inner_k
        dp0 = jnp.where(upd0, (sol0 - xe) * om, zero)
        xm = xe + dp0  # color-0-updated extended slab

        # color 1 on the owned rows, neighbors from xm
        inner_o, par_o = line_masks(it, i0)
        bmid = None if b_is_zero else bv[1:-1]
        d1 = build_d(xm, bmid, t * it + 2)
        d1 = jnp.where(inner_o & inner_k, d1, zero)
        sol1 = solve(d1, lam_slice(it, 0))
        xo = xm[1:-1]
        upd1 = inner_o & (par_o == 1) & inner_k
        dp1 = jnp.where(upd1, (sol1 - xo) * om, zero)
        x_new = xo + dp1

        dpc = dp0[1:-1].astype(jnp.float32)
        dpf = dp1.astype(jnp.float32)
        r2 = jnp.sum(dpc * dpc) + jnp.sum(dpf * dpf)
    else:
        inner_o, _par = line_masks(it, i0)
        d = build_d(xv, bv, t * it + 2)
        d = jnp.where(inner_o & inner_k, d, zero)
        sol = solve(d, lam_slice(it, 0))
        xo = xv[1:-1]
        upd = inner_o & inner_k
        dp = jnp.where(upd, (sol - xo) * om, zero)
        x_new = xo + dp
        dpf = dp.astype(jnp.float32)
        r2 = jnp.sum(dpf * dpf)

    # aliasing hazard fence: the next tile's input rows (which overlap this
    # tile's output range by <= 2 pre-update halo rows) must be in VMEM
    # before the in-place write begins
    @pl.when(t + 1 < T)
    def _():
        in_dma(nslot, t + 1).wait()

    @pl.when(t >= 2)
    def _():
        out_dma(slot, t - 2).wait()

    outs[slot] = x_new
    out_dma(slot, t).start()
    r2_ref[t, 0] = r2

    @pl.when(t == T - 1)
    def _():
        out_dma(slot, t).wait()

    @pl.when((t == T - 1) & (t >= 1))
    def _():
        out_dma(nslot, t - 1).wait()


def make_line_step(
    kind: str,
    shape,
    dtype=jnp.float32,
    *,
    omega: float,
    offset: int = 0,
    it: int | None = None,
    b_is_zero: bool = False,
    batch: bool = True,
    mc=None,
    vmem_limit_bytes: int = 100 << 20,
    interpret: bool = False,
):
    """Build ``step(xp, bp) -> (xp_new, r2)`` on (I+4, Kp, Jp) line state
    (see to_line4_layout).  kind: 'pcr_j' (line-Jacobi full plane) or
    'pcr_rb' (both colors fused in one pass).  ``mc`` switches to the MAF
    fast-diagonalization solve.  None if no viable I tiling."""
    K, I, J = shape
    n = K - 2
    if n < 2:
        return None
    Kp, Jp = _round_up(K, 8), _round_up(J, 128)
    itemsize = jnp.dtype(dtype).itemsize
    if it is None:
        it = choose_it((Kp, I, Jp), itemsize)
    if it is None or I % it:
        return None
    if kind == "pcr_rb" and it < 2:
        # the rb slab extends 2 rows each side (x_halo=4, x_off=0): at it=1
        # in_dma(t+2) — started during tile t+1 — overlaps out_dma(t)'s
        # in-place write range, which the hazard fence does not cover
        return None
    T = I // it
    maf = mc is not None
    npdt = np.dtype(dtype)

    def padKp(m):  # (n, n) -> (Kp, Kp) with the inner block at [1:K-1]
        out = np.zeros((Kp, Kp), np.float64)
        out[1 : K - 1, 1 : K - 1] = m
        return jnp.asarray(out.astype(npdt))

    dummy = jnp.zeros((1, 8, 128), dtype)
    dummy2 = jnp.zeros((8, 128), dtype)
    wzm0 = wzpn = 0.0
    if maf:
        V, Vi, mu = fastdiag.maf_line_diag(mc, n, np.float64)
        m1 = padKp(V)
        m2 = padKp(Vi)
        mu_np = np.ones((Kp, Jp), np.float64)  # pad rows 1.0: mu+lam > 0
        mu_np[1 : K - 1, :] = mu[:, None]
        mu_t = jnp.asarray(mu_np.astype(npdt))
        lam = fastdiag.maf_lambda_table(mc, I, J, np.float64)
        lam_np = np.ones((I + 4, 1, Jp), np.float64)
        lam_np[2 : I + 2, 0, :J] = lam
        lam_t = jnp.asarray(lam_np.astype(npdt))
        wzm, wzp, _d2, _li, _lj = fastdiag.maf_line_coeffs(mc, n)
        wzm0, wzpn = float(wzm[0]), float(wzp[-1])

        def lanei(v, m):
            return np.broadcast_to(
                np.asarray(v, npdt).reshape(-1)[:m, None], (m, Jp)
            )

        tij_np = np.zeros((I + 4, 2, Jp), npdt)
        tij_np[2 : I + 2, 0, :] = lanei(mc.c1, I)
        tij_np[2 : I + 2, 1, :] = lanei(mc.c7, I)
        tij = jnp.asarray(tij_np)
        tj_np = np.zeros((2, 1, Jp), npdt)
        tj_np[0, 0, :J] = np.asarray(mc.c2, npdt).reshape(-1)[:J]
        tj_np[1, 0, :J] = np.asarray(mc.c8, npdt).reshape(-1)[:J]
        tj = jnp.asarray(tj_np)
    else:
        m1 = padKp(fastdiag.const_line_inverse(n, np.float64))
        m2 = dummy2
        mu_t = dummy2
        lam_t = dummy
        tij = dummy
        tj = dummy

    kern = functools.partial(
        _line_kernel,
        kind=kind,
        K=K,
        I=I,
        J=J,
        Kp=Kp,
        Jp=Jp,
        it=it,
        omega=float(omega),
        offset=int(offset),
        b_is_zero=bool(b_is_zero),
        maf=maf,
        wzm0=wzm0,
        wzpn=wzpn,
        batch=bool(batch),
    )

    x_halo = 4 if kind == "pcr_rb" else 2
    b_rows = it + 2 if kind == "pcr_rb" else it
    nmm = (2 * it + 2) if kind == "pcr_rb" else it  # matmuls per tile
    nmm *= 2 if maf else 1
    flops = int(2 * Kp * Kp * Jp) * nmm * T + 20 * K * I * J
    passes = 2 if b_is_zero else 3
    call = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((I + 4, Kp, Jp), dtype),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, it + x_halo, Kp, Jp), dtype),
            pltpu.VMEM((2, b_rows if not b_is_zero else 1, Kp, Jp), dtype),
            pltpu.VMEM((2, it, Kp, Jp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=passes * K * I * J * itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        # In-place update: safe because in_dma(t+1) is awaited before
        # out_dma(t) starts (see the hazard fence in _line_kernel), so the
        # <= 2 overlapping halo rows are read pre-update, exactly as in the
        # two-buffer version.  Measured on v5e (sweeps.py note): ~1.6x
        # faster HBM streaming + VMEM residency up to ~2x larger grids.
        input_output_aliases={0: 0},
        interpret=interpret,
    )

    def step(xp, bp):
        out, r2 = call(xp, bp, m1, m2, mu_t, lam_t, tij, tj)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return out, jnp.sum(r2.astype(acc))

    step.it = it
    return step
