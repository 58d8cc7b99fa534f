"""Packed red-black MXU line kernel: dense per-color line solves.

The fused RB line kernel in lines.py solves EVERY line of the plane densely
for each color and masks half the updates away, so each red-black iteration
pays two full-plane fast-diagonalization solves — 2x the MXU work its
line-Jacobi sibling needs.  A line's red-black color (i+j+offset) % 2 is
constant along K, so whole lines can be packed by color exactly like the
point sweeps in rbpack.py: fold the (i, j) checkerboard along I.

Layout ("rbl"; update math of reference pcr_rb, cz_solver.f90:497-662 /
cz_maf.f90:442-668)
---------------------------------------------------------------------------
For each j exactly one of the rows {2*i2, 2*i2+1} is red:

    R[i2, k, j] = x[k, 2*i2 + s0(j), j],   s0 = (j + offset) % 2
    B[i2, k, j] = x[k, 2*i2 + 1 - s0(j), j]

State is (2, I2+4, Kp, Jp): color-major, I2 = I/2 rows padded by 2, K on
sublanes (whole lines resident), J on lanes.  Every lane is a real line of
its color — each color's solve is a dense (Kp, rows*Jp) matmul over HALF
the plane, so one RB iteration costs ONE full-plane solve (plus tile-halo
rows), not two.

Neighbor access (same derivation as rbpack.py, transposed to line layout):
  * J-neighbors (j+-1): the other color at the SAME i2 row — lane rolls.
  * I-neighbors (i+-1): the other color at rows {i2-1+s0, i2+s0} — the
    unshifted row plus one row-shifted view, selected by the lane parity
    s0(j); row shifts on the leading slab axis are free slices.
  * K: inside the line (handled by the tridiagonal solve).

Color 1 sees color-0 UPDATED values (reference color serialization): color
0 is computed on an I-extended slab so color 1's transverse neighbors are
already updated in VMEM — the rbpack/lines overlap trick.

The solve, precision rules (Precision.HIGHEST), BC folds and MAF
fast-diagonalization tables are identical to lines.py; only the plane
packing differs.  Like lines.py the state output aliases the state input
(in-place), with the in-DMA-before-out-DMA hazard fence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import fastdiag
from .lines import R6, _roll_j, batched_solve_const, batched_solve_maf
from .sweeps import _round_up


def _dims(shape):
    K, I, J = shape
    return K, I, J, I // 2, _round_up(K, 8), _round_up(J, 128)


def pack_rb_lines(x, offset: int = 0):
    """(K, I, J) cube -> (2, I2+4, Kp, Jp) color-packed line state."""
    K, I, J, I2, Kp, Jp = _dims(x.shape)
    if I % 2:
        raise ValueError("rbl layout needs even I")
    t = jnp.pad(
        x.transpose(1, 0, 2), ((0, 0), (0, Kp - K), (0, Jp - J))
    )  # (I, Kp, Jp)
    xe = t[0::2]
    xo = t[1::2]
    j = jnp.arange(Jp, dtype=jnp.int32)[None, None, :]
    red_even = (j + offset) % 2 == 0  # s0 == 0: red on even i rows
    R = jnp.where(red_even, xe, xo)
    B = jnp.where(red_even, xo, xe)
    st = jnp.stack([R, B])
    return jnp.pad(st, ((0, 0), (2, 2), (0, 0), (0, 0)))


def unpack_rb_lines(st, shape, offset: int = 0):
    """Inverse of :func:`pack_rb_lines`."""
    K, I, J, I2, Kp, Jp = _dims(shape)
    R = st[0, 2:-2]
    B = st[1, 2:-2]
    j = jnp.arange(Jp, dtype=jnp.int32)[None, None, :]
    red_even = (j + offset) % 2 == 0
    xe = jnp.where(red_even, R, B)
    xo = jnp.where(red_even, B, R)
    t = jnp.stack([xe, xo], axis=1).reshape(I, Kp, Jp)
    return t[:, :K, :J].transpose(1, 0, 2)


def choose_it2(shape, itemsize=4, max_vmem_bytes=64 << 20, it_cap=32):
    """Largest divisor of I2 (<= it_cap) fitting the VMEM model: two
    double-buffered 2-color (it2+4)-row in slabs + b + out + temporaries."""
    K, I, J = shape
    I2 = I // 2
    row = _round_up(K, 8) * _round_up(J, 128) * itemsize
    best = None
    for it2 in range(1, min(I2, it_cap) + 1):
        if I2 % it2:
            continue
        rows = 2 * 2 * (it2 + 4) * 2 + 2 * 2 * it2 + 16 * it2
        if rows * row <= max_vmem_bytes:
            best = it2
    return best


def _rbl_kernel(
    xp_ref, bp_ref, m1_ref, m2_ref, mu_ref, lam0_ref, lam1_ref,
    t0_ref, t1_ref, tj_ref,
    out_ref, r2_ref,
    xs, bs, outs, in_sems, b_sems, out_sems,
    *, K, I, J, I2, Kp, Jp, it2, omega, offset, b_is_zero, maf,
    wzm0, wzpn,
):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    two = jnp.asarray(2, t.dtype)
    slot = jax.lax.rem(t, two)
    nslot = jax.lax.rem(t + 1, two)
    dtype = xs.dtype

    def in_dma(s, idx):
        return pltpu.make_async_copy(
            xp_ref.at[:, pl.ds(idx * it2, it2 + 4)], xs.at[s], in_sems.at[s]
        )

    def b_dma(s, idx):
        return pltpu.make_async_copy(
            bp_ref.at[:, pl.ds(idx * it2 + 1, it2 + 2)], bs.at[s],
            b_sems.at[s],
        )

    def out_dma(s, idx):
        return pltpu.make_async_copy(
            outs.at[s], out_ref.at[:, pl.ds(idx * it2 + 2, it2)],
            out_sems.at[s],
        )

    # in-place pipeline: tile t+1's input rows overlap out_dma(t)'s write
    # range by up to 2 pre-update halo rows, so the next tile's in-DMA is
    # awaited before this tile's in-place out-DMA starts (hazard fence
    # below) — only tile 0 waits here (see lines.py)
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

    xv = xs[slot]  # (2, it2+4, Kp, Jp)
    Rv = xv[0]
    Bv = xv[1]
    zero = jnp.zeros((), dtype)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, Kp, 1), 1)
    jv = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Jp), 2)
    sel1 = jax.lax.rem(jv + jnp.asarray(offset, jnp.int32),
                       jnp.asarray(2, jnp.int32)) == 1  # s0(j) == 1
    ok_j = (jv >= 1) & (jv <= J - 2)
    inner_k = (kidx >= 1) & (kidx <= K - 2)

    def line_masks(rows, g0, color):
        """Inner mask for ``rows`` packed rows starting at global i2 ``g0``.
        Physical i = 2*i2 + s0 (color 0) or 2*i2 + 1 - s0 (color 1)."""
        gi2 = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + (
            jnp.asarray(g0, jnp.int32)
        )
        in_rows = (gi2 >= 0) & (gi2 < I2)
        if color == 0:
            not_lo = (gi2 > 0) | sel1
            not_hi = (gi2 < I2 - 1) | ~sel1
        else:
            not_lo = (gi2 > 0) | ~sel1
            not_hi = (gi2 < I2 - 1) | sel1
        return in_rows & not_lo & not_hi & ok_j

    if maf:
        mu = mu_ref[:][None]  # (1, Kp, Jp)

        def solve(d, lam_rows):
            # x = V ((V^-1 d) / (mu + lambda)); all rows batched into one
            # (Kp, rows*Jp) MXU operand (shared helper in lines.py)
            return batched_solve_maf(
                m1_ref[:], m2_ref[:], mu[0], lam_rows, d, Jp, dtype
            )

        def build_d(oc, om, op, own_c, brows, tab_ref, trow0, color):
            # metric-weighted transverse + BC folds (cz_maf.f90:519-572);
            # I-neighbors from the OTHER color per the lane parity
            rows = oc.shape[0]
            tv = tab_ref[pl.ds(trow0, rows)]  # (rows, 2, Jp): c1, c7
            c1 = tv[:, 0:1, :]
            c7 = tv[:, 1:2, :]
            c2 = tj_ref[0][None]
            c8 = tj_ref[1][None]
            half = jnp.asarray(0.5, dtype)
            if color == 0:
                xip = jnp.where(sel1, op, oc)  # x[i+1]
                xim = jnp.where(sel1, oc, om)  # x[i-1]
            else:
                xip = jnp.where(sel1, oc, op)
                xim = jnp.where(sel1, om, oc)
            d = (
                (c1 + half * c7) * xip
                + (c1 - half * c7) * xim
                + (c2 + half * c8) * _roll_j(oc, -1)
                + (c2 - half * c8) * _roll_j(oc, 1)
            )
            if brows is not None:
                d = d - brows
            d = d + jnp.where(
                kidx == 1, jnp.asarray(wzm0, dtype) * own_c[:, 0:1, :], zero
            )
            d = d + jnp.where(
                kidx == K - 2,
                jnp.asarray(wzpn, dtype) * own_c[:, K - 1 : K, :], zero,
            )
            return d

    else:

        def solve(d, lam_rows):
            return batched_solve_const(m1_ref[:], d, Jp, dtype)

        def build_d(oc, om, op, own_c, brows, tab_ref, trow0, color):
            if color == 0:
                ssi = oc + jnp.where(sel1, op, om)
            else:
                ssi = oc + jnp.where(sel1, om, op)
            trans = ssi + _roll_j(oc, -1) + _roll_j(oc, 1)
            r6 = jnp.asarray(R6, dtype)
            d = trans * r6 if brows is None else (trans - brows) * r6
            d = d + jnp.where(kidx == 1, own_c[:, 0:1, :] * r6, zero)
            d = d + jnp.where(kidx == K - 2, own_c[:, K - 1 : K, :] * r6, zero)
            return d

    g0 = t * it2  # global i2 of the first OWNED row
    om_ = jnp.asarray(omega, dtype)
    bv = None if b_is_zero else bs[slot]  # (2, it2+2, Kp, Jp)

    def lam_slice(ref, rows, roff):
        if not maf:
            return [None] * rows
        lr = ref[pl.ds(t * it2 + roff + 2, rows)]  # (rows, 1, Jp)
        return [lr[r] for r in range(rows)]

    # color 0 on the extended rows [g0-1, g0+it2+1), neighbors from B
    Rc = Rv[1:-1]                      # (it2+2, ...)
    d0 = build_d(Bv[1:-1], Bv[:-2], Bv[2:], Rc,
                 None if b_is_zero else bv[0], t0_ref, t * it2 + 1, 0)
    m0 = line_masks(it2 + 2, g0 - 1, 0) & inner_k
    d0 = jnp.where(m0, d0, zero)
    sol0 = solve(d0, lam_slice(lam0_ref, it2 + 2, -1))
    dp0 = jnp.where(m0, (sol0 - Rc) * om_, zero)
    Rn = Rc + dp0                      # color-0-updated extended rows

    # color 1 on the owned rows, I/J-neighbors from the updated Rn
    Bc = Bv[2:-2]                      # (it2, ...)
    b1 = None if b_is_zero else bv[1][1:-1]
    d1 = build_d(Rn[1:-1], Rn[:-2], Rn[2:], Bc, b1, t1_ref, t * it2 + 2, 1)
    m1m = line_masks(it2, g0, 1) & inner_k
    d1 = jnp.where(m1m, d1, zero)
    sol1 = solve(d1, lam_slice(lam1_ref, it2, 0))
    dp1 = jnp.where(m1m, (sol1 - Bc) * om_, zero)
    Bn = Bc + dp1

    dpc = dp0[1:-1].astype(jnp.float32)
    dpf = dp1.astype(jnp.float32)
    r2 = jnp.sum(dpc * dpc) + jnp.sum(dpf * dpf)

    # aliasing hazard fence (see lines.py)
    @pl.when(t + 1 < T)
    def _():
        in_dma(nslot, t + 1).wait()

    @pl.when(t >= 2)
    def _():
        out_dma(slot, t - 2).wait()

    # single dynamic-index store (mixed dynamic+static-index stores do not
    # lower on Mosaic)
    outs[slot] = jnp.stack([Rn[1:-1], Bn])
    out_dma(slot, t).start()
    r2_ref[t, 0] = r2

    @pl.when(t == T - 1)
    def _():
        out_dma(slot, t).wait()

    @pl.when((t == T - 1) & (t >= 1))
    def _():
        out_dma(nslot, t - 1).wait()


def make_rbl_step(
    shape,
    dtype=jnp.float32,
    *,
    omega: float,
    offset: int = 0,
    it2: int | None = None,
    b_is_zero: bool = False,
    mc=None,
    vmem_limit_bytes: int = 100 << 20,
    interpret: bool = False,
):
    """Build ``step(xp, bp) -> (xp_new, r2)`` on (2, I2+4, Kp, Jp) packed
    line state (see pack_rb_lines).  Both red-black colors in one pass with
    dense per-color solves.  ``mc`` switches to the MAF fast-diagonalization
    solve.  None if the layout does not apply (odd I) or no viable tiling."""
    K, I, J = shape
    n = K - 2
    if n < 2 or I % 2:
        return None
    K, I, J, I2, Kp, Jp = _dims(shape)
    itemsize = jnp.dtype(dtype).itemsize
    if it2 is None:
        it2 = choose_it2(shape, itemsize)
    if it2 is None or I2 % it2:
        return None
    if it2 < 2:
        # the slab extends 2 rows each side: at it2=1 in_dma(t+2) — started
        # during tile t+1 — overlaps out_dma(t)'s in-place write range,
        # which the hazard fence does not cover
        return None
    T = I2 // it2
    maf = mc is not None
    npdt = np.dtype(dtype)

    def padKp(m):
        out = np.zeros((Kp, Kp), np.float64)
        out[1 : K - 1, 1 : K - 1] = m
        return jnp.asarray(out.astype(npdt))

    # physical i of packed row (i2, j) per color, as (I2, Jp) index tables
    i2g = np.arange(I2)[:, None]
    s0 = (np.arange(Jp) + offset) % 2
    phys0 = 2 * i2g + s0[None, :]          # color 0
    phys1 = 2 * i2g + 1 - s0[None, :]      # color 1

    dummy = jnp.zeros((1, 8, 128), dtype)
    dummy2 = jnp.zeros((8, 128), dtype)
    wzm0 = wzpn = 0.0
    if maf:
        V, Vi, mu = fastdiag.maf_line_diag(mc, n, np.float64)
        m1 = padKp(V)
        m2 = padKp(Vi)
        mu_np = np.ones((Kp, Jp), np.float64)
        mu_np[1 : K - 1, :] = mu[:, None]
        mu_t = jnp.asarray(mu_np.astype(npdt))
        lam = fastdiag.maf_lambda_table(mc, I, J, np.float64)  # (I, J)
        lamJ = np.ones((I, Jp), np.float64)
        lamJ[:, :J] = lam

        def pack_lam(phys):
            out = np.ones((I2 + 4, 1, Jp), np.float64)
            out[2 : I2 + 2, 0, :] = lamJ[phys, np.arange(Jp)[None, :]]
            return jnp.asarray(out.astype(npdt))

        lam0_t = pack_lam(phys0)
        lam1_t = pack_lam(phys1)
        wzm, wzp, _d2, _li, _lj = fastdiag.maf_line_coeffs(mc, n)
        wzm0, wzpn = float(wzm[0]), float(wzp[-1])

        c1v = np.asarray(mc.c1, np.float64).reshape(-1)[:I]
        c7v = np.asarray(mc.c7, np.float64).reshape(-1)[:I]

        def pack_tab(phys):
            out = np.zeros((I2 + 4, 2, Jp), npdt)
            out[2 : I2 + 2, 0, :] = c1v[phys]
            out[2 : I2 + 2, 1, :] = c7v[phys]
            return jnp.asarray(out)

        t0 = pack_tab(phys0)
        t1 = pack_tab(phys1)
        tj_np = np.zeros((2, 1, Jp), npdt)
        tj_np[0, 0, :J] = np.asarray(mc.c2, npdt).reshape(-1)[:J]
        tj_np[1, 0, :J] = np.asarray(mc.c8, npdt).reshape(-1)[:J]
        tj = jnp.asarray(tj_np)
    else:
        m1 = padKp(fastdiag.const_line_inverse(n, np.float64))
        m2 = dummy2
        mu_t = dummy2
        lam0_t = lam1_t = dummy
        t0 = t1 = dummy
        tj = dummy

    kern = functools.partial(
        _rbl_kernel,
        K=K, I=I, J=J, I2=I2, Kp=Kp, Jp=Jp, it2=it2,
        omega=float(omega), offset=int(offset),
        b_is_zero=bool(b_is_zero), maf=maf, wzm0=wzm0, wzpn=wzpn,
    )

    nmm = (2 * it2 + 2) * (2 if maf else 1)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, I2 + 4, Kp, Jp), dtype),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, it2 + 4, Kp, Jp), dtype),
            pltpu.VMEM((2, 2, (it2 + 2) if not b_is_zero else 1, Kp, Jp),
                       dtype),
            pltpu.VMEM((2, 2, it2, Kp, Jp), dtype),
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
        # in-place: safe via the hazard fence (see lines.py note)
        input_output_aliases={0: 0},
        interpret=interpret,
    )

    def step(xp, bp):
        out, r2 = call(xp, bp, m1, m2, mu_t, lam0_t, lam1_t, t0, t1, tj)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return out, jnp.sum(r2.astype(acc))

    step.it2 = it2
    step.pad = functools.partial(pack_rb_lines, offset=offset)
    step.unpad = functools.partial(
        unpack_rb_lines, shape=shape, offset=offset
    )
    return step
