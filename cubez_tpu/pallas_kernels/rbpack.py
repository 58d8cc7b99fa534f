"""Packed red-black SOR sweep: dense per-color compute, no masked waste.

The interleaved fused kernel (sweeps.py) computes a FULL-grid update for
each color and throws half of it away under the color mask — measured on
v5e the sweep is VPU-bound (jacobi's single dense pass: ~16 us/iter at
128^3; sor2sma's two: ~29 us), so that masked waste is the whole gap to the
HBM roofline.  This kernel stores the two colors **densely**: the
checkerboard is folded along I, so each color is a (K, I/2, J) array with
the full 128-lane J axis — every VPU op contributes.

Layout ("rbpack"; same update math as psor2sma_core, cz_solver.f90:404-493)
---------------------------------------------------------------------------
Color-0 ("red") points satisfy (i+j+k+offset+1) % 2 == 0, i.e. for each
(k, j) exactly one of the two rows {2*i2, 2*i2+1} is red:

    R[k, i2, j] = x[k, 2*i2 + sR(k,j), j],   sR = (k+j+offset+1) % 2
    B[k, i2, j] = x[k, 2*i2 + sB(k,j), j],   sB = 1 - sR

R and B are stored concatenated along the row axis — packed shape
(K+4, 2*I2p, Jp) with the same K-pad-by-2 scheme as sweeps.py — so the DMA
pipeline is identical to the interleaved kernel's (one slab in, one out).

Neighbor access becomes *cheap* in this layout (derivation):
  * K-neighbors (k±1):  the packing parity flips with k AND with color, so
    they cancel — plain row slices B[k±1, i2, j].
  * J-neighbors (j±1):  parity flips with j and with color — lane rolls
    B[k, i2, j±1].
  * I-neighbors (i±1):  x[i-1] + x[i+1] = B[i2] + B[i2 - 1 + 2*sR], i.e.
    the unshifted row plus ONE of the two sublane rolls, picked by the
    (k+j) parity pattern — 2 rolls + 1 select instead of free, the only
    extra cost of the packing.

Per point the arithmetic (values and add order) is identical to
sweeps._masked_delta, so field results are bitwise-equal to the interleaved
kernel; only the residual partial-sum grouping differs (roundoff-level).

MAF (variable-coefficient) support: the metric tables are separable
(c1/c7 per-i, c2/c8 per-j, c3/c9 per-k; ops/maf.py), so the fold only
mixes the I tables: packed row i2 holds physical i = 2*i2 + s(k, j), and
s is exactly the ``sel_m1`` parity mask the constant kernel already
computes.  Splitting each I table into even/odd-i halves and selecting
per point with that mask recovers the interleaved math bitwise
(cz_maf.f90:442-668 semantics via sweeps._masked_delta_maf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweeps import R6, _roll, _round_up, choose_kt


def _dims(shape):
    K, I, J = shape
    I2 = I // 2
    return K, I, J, I2, _round_up(I2, 8), _round_up(J, 128)


def pack_rb(a, offset: int = 0):
    """(K, I, J) field -> packed (K+4, 2*I2p, Jp) red/black pair.

    Red half at rows [0, I2p), black at [I2p, 2*I2p).  K is padded by 2 on
    each side and I2/J are rounded up to the (8, 128) tile; pad positions
    start zero and may decay to garbage — every kernel consumer masks on
    true bounds (the sweeps.py contract).  Apply to x AND b (same
    permutation).  I must be even.
    """
    K, I, J, I2, I2p, Jp = _dims(a.shape)
    if I % 2:
        raise ValueError("rbpack needs even I")
    ap = jnp.pad(a, ((2, 2), (0, 0), (0, Jp - J)))
    xe = ap[:, 0::2, :]
    xo = ap[:, 1::2, :]
    k = jnp.arange(K + 4, dtype=jnp.int32)[:, None, None] - 2
    j = jnp.arange(Jp, dtype=jnp.int32)[None, None, :]
    red_even = (k + j + offset + 1) % 2 == 0  # sR == 0: red on even i rows
    R = jnp.where(red_even, xe, xo)
    B = jnp.where(red_even, xo, xe)
    padi = ((0, 0), (0, I2p - I2), (0, 0))
    return jnp.concatenate([jnp.pad(R, padi), jnp.pad(B, padi)], axis=1)


def unpack_rb(p, shape, offset: int = 0):
    """Inverse of :func:`pack_rb` (true-extent rows/lanes only)."""
    K, I, J, I2, I2p, Jp = _dims(shape)
    R = p[2:-2, :I2, :J]
    B = p[2:-2, I2p : I2p + I2, :J]
    k = jnp.arange(K, dtype=jnp.int32)[:, None, None]
    j = jnp.arange(J, dtype=jnp.int32)[None, None, :]
    red_even = (k + j + offset + 1) % 2 == 0
    xe = jnp.where(red_even, R, B)
    xo = jnp.where(red_even, B, R)
    return jnp.stack([xe, xo], axis=2).reshape(K, I, J)


def _parity_masks(rows, k_start, offset, K, I2, J, I2p, Jp, color):
    """(mask, sel_m1) for one color's dense update rows.

    mask: (rows, I2p, Jp) — inner-domain nodes of this color;
    sel_m1: (rows, 1, Jp) bool — True where the I-neighbor pair needs the
    roll(-1) (downward) sublane shift, i.e. s == 1 for this color.
    s_red = (k+j+offset+1) % 2, s_black = (k+j+offset) % 2; constants keep
    the lax.rem argument non-negative (k_start >= -19, offset >= 0 — the
    deepest window of the n-iterations-per-pass pipeline runs at
    k0_mid = -2n-1, so this covers n <= 9; the builders enforce it).
    """
    two = jnp.asarray(2, jnp.int32)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + jnp.asarray(
        k_start, jnp.int32
    )
    j1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Jp), 2)
    add = (offset + 21) if color == 0 else (offset + 20)
    s = jax.lax.rem(k1 + j1 + add, two)  # (rows, 1, Jp)
    sel_m1 = s == 1
    i2 = jax.lax.broadcasted_iota(jnp.int32, (1, I2p, 1), 1)
    jv = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Jp), 2)
    ok_k = (k1 >= 1) & (k1 <= K - 2)
    ok_j = (jv >= 1) & (jv <= J - 2)
    # physical i = 2*i2 + s: exclude i == 0 (i2==0, s==0), i == I-1
    # (i2==I2-1, s==1) and the i2 tile-padding rows
    not_lo = (i2 > 0) | sel_m1
    not_hi = (i2 < I2 - 1) | ~sel_m1
    mask = ok_k & ok_j & (i2 < I2) & not_lo & not_hi
    return mask, sel_m1


def _pair_update(center, other, b, mask, sel_m1, omega, dtype):
    """Dense one-color update: ``other`` spans rows+1 halo each side of
    ``center``'s rows.  Values and add order match sweeps._masked_delta
    (ssk + ssi + ssj; x[i-1]+x[i+1] commuted — bitwise equal in IEEE)."""
    oc = other[1:-1]
    ssk = other[:-2] + other[2:]
    ssi = oc + jnp.where(sel_m1, _roll(oc, -1, 1), _roll(oc, 1, 1))
    ssj = _roll(oc, 1, 2) + _roll(oc, -1, 2)
    ss = ssk + ssi + ssj
    if b is None:
        upd = (ss * R6 - center) * omega
    else:
        upd = ((ss - b) * R6 - center) * omega
    dp = jnp.where(mask, upd, jnp.zeros((), dtype))
    return center + dp, dp


def _pair_update_maf(center, other, b, mask, sel_m1, ti, wz, omega, dtype):
    """Dense one-color MAF update (sweeps._masked_delta_maf math, bitwise).

    ti: (8, I2p, Jp) resident tables [wxpE, wxpO, wxmE, wxmO, C12E, C12O,
    wyp, wym] where *E/*O are the even/odd-physical-i halves of the I
    weights (wxp = c1+c7/2, wxm = c1-c7/2), C12* = c1* + c2 (f32-rounded
    like the interleaved kernel's c1+c2), wyp/wym = c2 +- c8/2.
    wz: (rows, 3, Jp) k-rows [wzm, wzp, c3] aligned with ``center``.
    Term order matches _masked_delta_maf exactly: k-, k+, i+, i-, j+, j-.
    """
    oc = other[1:-1]
    wzm = wz[:, 0:1, :]
    wzp = wz[:, 1:2, :]
    c3 = wz[:, 2:3, :]
    wxpE, wxpO = ti[0][None], ti[1][None]
    wxmE, wxmO = ti[2][None], ti[3][None]
    c12E, c12O = ti[4][None], ti[5][None]
    wyp, wym = ti[6][None], ti[7][None]
    # physical i = 2*i2 + s; sel_m1 == (s == 1).  x(i+1) sits at oc[i2]
    # for s=0 / oc[i2+1] for s=1, x(i-1) at oc[i2-1] / oc[i2].  Neighbor
    # values and weights are selected BEFORE the multiply so the six
    # product terms form the same multiply-accumulate chain as the
    # interleaved kernel (same FMA contraction -> bitwise-equal fields).
    x_ip = jnp.where(sel_m1, _roll(oc, -1, 1), oc)
    x_im = jnp.where(sel_m1, oc, _roll(oc, 1, 1))
    wxp = jnp.where(sel_m1, wxpO, wxpE)
    wxm = jnp.where(sel_m1, wxmO, wxmE)
    rp = (
        wzm * other[:-2]
        + wzp * other[2:]
        + wxp * x_ip
        + wxm * x_im
        + wyp * _roll(oc, -1, 2)
        + wym * _roll(oc, 1, 2)
    )
    if b is not None:
        rp = rp + b
    dd = 2.0 * (jnp.where(sel_m1, c12O, c12E) + c3)
    dp = jnp.where(mask, (rp / dd - center) * omega, jnp.zeros((), dtype))
    return center + dp, dp


def _packed_kernel(
    xp_ref, bp_ref, ti_ref, tkp_ref, out_ref, r2_ref,
    xs, bs, tks, outs, in_sems, b_sems, tk_sems, out_sems,
    *, K, I2, J, I2p, Jp, kt, omega, offset, b_is_zero, maf
):
    """Same double-buffered K-slab pipeline as sweeps._sweep_kernel (slab
    head carried in VMEM between tiles; 2-deep output pipeline).  Under
    ``maf`` the (8, I2p, Jp) I/J tables sit resident in VMEM (ti_ref) and
    the per-k rows [wzm, wzp, c3] stream alongside b (tkp_ref)."""
    t = pl.program_id(0)
    T = pl.num_programs(0)
    two = jnp.asarray(2, t.dtype)
    slot = jax.lax.rem(t, two)
    nslot = jax.lax.rem(t + 1, two)
    dtype = xs.dtype
    halo = 4

    def in_full_dma(s, idx):
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(idx * kt, kt + halo)], xs.at[s], in_sems.at[s]
        )

    def in_dma(s, idx):
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(idx * kt + halo, kt)],
            xs.at[s, pl.ds(halo, kt)],
            in_sems.at[s],
        )

    def b_dma(s, idx):
        return pltpu.make_async_copy(
            bp_ref.at[pl.ds(idx * kt + 1, kt + 2)], bs.at[s], b_sems.at[s]
        )

    def tk_dma(s, idx):
        return pltpu.make_async_copy(
            tkp_ref.at[pl.ds(idx * kt + 1, kt + 2)], tks.at[s], tk_sems.at[s]
        )

    def out_dma(s, idx):
        return pltpu.make_async_copy(
            outs.at[s], out_ref.at[pl.ds(idx * kt + 2, kt)], out_sems.at[s]
        )

    @pl.when(t == 0)
    def _():
        in_full_dma(0, 0).start()
        if not b_is_zero:
            b_dma(0, 0).start()
        if maf:
            tk_dma(0, 0).start()

    @pl.when((t + 1 < T) & (t > 0))
    def _():
        if not b_is_zero:
            b_dma(nslot, t + 1).start()
        if maf:
            tk_dma(nslot, t + 1).start()

    @pl.when(t == 0)
    def _():
        in_full_dma(0, 0).wait()

    @pl.when(t > 0)
    def _():
        in_dma(slot, t).wait()

    @pl.when((t > 0) & (slot == 0))
    def _():
        xs[0, 0:halo] = xs[1, kt : kt + halo]

    @pl.when((t > 0) & (slot == 1))
    def _():
        xs[1, 0:halo] = xs[0, kt : kt + halo]

    @pl.when(t + 1 < T)
    def _():
        in_dma(nslot, t + 1).start()

    if T > 1:

        @pl.when(t == 0)
        def _():
            if not b_is_zero:
                b_dma(nslot, 1).start()
            if maf:
                tk_dma(nslot, 1).start()

    if not b_is_zero:
        b_dma(slot, t).wait()
    if maf:
        tk_dma(slot, t).wait()

    xv = xs[slot]  # (kt+4, 2*I2p, Jp), global K rows [k0-2, k0+kt+2)
    Rv = xv[:, 0:I2p]
    Bv = xv[:, I2p : 2 * I2p]
    k0 = t * kt

    # red pass on extended rows [k0-1, k0+kt] (kt+2) — the halo rows feed
    # the black pass's K-neighbors, exactly like sweeps.py's color 0
    mR, selR = _parity_masks(kt + 2, k0 - 1, offset, K, I2, J, I2p, Jp, 0)
    if b_is_zero:
        bR = bB = None
    else:
        bv = bs[slot]  # rows [k0-1, k0+kt]
        bR = bv[:, 0:I2p]
        bB = bv[1:-1, I2p : 2 * I2p]
    mB, selB = _parity_masks(kt, k0, offset, K, I2, J, I2p, Jp, 1)
    if maf:
        ti = ti_ref[:]
        wz = tks[slot]  # k rows [k0-1, k0+kt], [wzm, wzp, c3]
        Rn, dpR = _pair_update_maf(
            Rv[1:-1], Bv, bR, mR, selR, ti, wz, omega, dtype
        )
        Bn, dpB = _pair_update_maf(
            Bv[2:-2], Rn, bB, mB, selB, ti, wz[1:-1], omega, dtype
        )
    else:
        Rn, dpR = _pair_update(Rv[1:-1], Bv, bR, mR, selR, omega, dtype)
        # black pass on rows [k0, k0+kt) with the updated red as neighbors
        Bn, dpB = _pair_update(Bv[2:-2], Rn, bB, mB, selB, omega, dtype)

    dpc = dpR[1:-1].astype(jnp.float32)
    dbf = dpB.astype(jnp.float32)
    r2 = jnp.sum(dpc * dpc) + jnp.sum(dbf * dbf)

    @pl.when(t >= 2)
    def _():
        out_dma(slot, t - 2).wait()

    outs[slot, :, 0:I2p] = Rn[1:-1]
    outs[slot, :, I2p : 2 * I2p] = Bn
    out_dma(slot, t).start()
    r2_ref[t, 0] = r2

    @pl.when(t == T - 1)
    def _():
        out_dma(slot, t).wait()

    @pl.when((t == T - 1) & (t >= 1))
    def _():
        out_dma(nslot, t - 1).wait()


def _rb_pair_packed(xv, k0_mid, bv, *, K, I2, J, I2p, Jp, offset, omega,
                    dtype):
    """One full RB iteration on a packed slab for the 2x pipeline
    (sweeps2x._sweep2x_kernel contract): colors on the middle rows
    (``xv[1:-1]``, first middle row true K index ``k0_mid``); returns
    (center rows ``xv[2:-2]`` updated, r2_red_center, r2_black).
    ``bv``: packed RHS rows aligned with the middle rows (kt+2 of them),
    or None for the zero-RHS problem."""
    rows = xv.shape[0]
    Rv = xv[:, 0:I2p]
    Bv = xv[:, I2p : 2 * I2p]
    if bv is None:
        bR = bB = None
    else:
        bR = bv[:, 0:I2p]
        bB = bv[1:-1, I2p : 2 * I2p]
    mR, selR = _parity_masks(rows - 2, k0_mid, offset, K, I2, J, I2p, Jp, 0)
    Rn, dpR = _pair_update(Rv[1:-1], Bv, bR, mR, selR, omega, dtype)
    mB, selB = _parity_masks(rows - 4, k0_mid + 1, offset, K, I2, J, I2p, Jp, 1)
    Bn, dpB = _pair_update(Bv[2:-2], Rn, bB, mB, selB, omega, dtype)
    dpc = dpR[1:-1].astype(jnp.float32)
    dbf = dpB.astype(jnp.float32)
    return (
        jnp.concatenate([Rn[1:-1], Bn], axis=1),
        jnp.sum(dpc * dpc),
        jnp.sum(dbf * dbf),
    )


def _rb_pair_packed_maf(
    xv, k0_mid, bv, ti_ref, tk_ref,
    *, K, I2, J, I2p, Jp, offset, omega, dtype
):
    """MAF variant of :func:`_rb_pair_packed` for the 2x pipeline: the
    per-k weight rows live in a resident (K + kt + 32, 4, Jp) table
    (true k = g at row g + 16, so the lag-window's negative k0_mid stays
    in range down to -16, admitting n <= 7 window chains).  The table carries full Jp lanes: a 1-lane slice would
    make the weight*neighbor products broadcast in sublanes AND lanes at
    once, which Mosaic rejects ("Broadcast in both sublanes and lanes" —
    only ever worked in interpret mode); with full lanes the multiply
    broadcasts along sublanes only, like the streaming kernel's wz."""
    rows = xv.shape[0]
    Rv = xv[:, 0:I2p]
    Bv = xv[:, I2p : 2 * I2p]
    if bv is None:
        bR = bB = None
    else:
        bR = bv[:, 0:I2p]
        bB = bv[1:-1, I2p : 2 * I2p]
    ti = ti_ref[:]
    wz = tk_ref[pl.ds(k0_mid + 16, rows - 2), :, :]  # (rows-2, 4, Jp)
    mR, selR = _parity_masks(rows - 2, k0_mid, offset, K, I2, J, I2p, Jp, 0)
    Rn, dpR = _pair_update_maf(
        Rv[1:-1], Bv, bR, mR, selR, ti, wz, omega, dtype
    )
    mB, selB = _parity_masks(rows - 4, k0_mid + 1, offset, K, I2, J, I2p, Jp, 1)
    Bn, dpB = _pair_update_maf(
        Bv[2:-2], Rn, bB, mB, selB, ti, wz[1:-1], omega, dtype
    )
    dpc = dpR[1:-1].astype(jnp.float32)
    dbf = dpB.astype(jnp.float32)
    return (
        jnp.concatenate([Rn[1:-1], Bn], axis=1),
        jnp.sum(dpc * dpc),
        jnp.sum(dbf * dbf),
    )


def make_packed_sweep2x(
    shape,
    dtype=jnp.float32,
    *,
    omega: float,
    offset: int = 0,
    kt: int | None = None,
    mc=None,
    b_is_zero: bool = True,
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
):
    """Two full packed RB iterations per HBM pass (rbpack layout).

    The packed single sweep is HBM-bound (the dense color compute fits
    under the streaming), so temporal blocking pays here where it did not
    for the VPU-bound interleaved kernel (sweeps2x): per PAIR of
    iterations, one read + one write of the packed field.  Field values
    are bitwise-equal to two single packed sweeps; r2 is a (2,) vector of
    the two iterations' residual sums.  ``b_is_zero=False`` streams the
    packed RHS alongside (one extra read per PAIR vs per iteration for
    the single sweep — the BiCGSTAB preconditioner's configuration).
    ``mc`` switches to the MAF update (metric tables resident in VMEM).
    """
    from . import sweeps2x

    K, I, J = shape
    if I % 2:
        return None
    _, _, _, I2, I2p, Jp = _dims(shape)
    IPP = 2 * I2p
    itemsize = jnp.dtype(dtype).itemsize
    has_b = not b_is_zero
    # resident MAF tables: (8, I2p, Jp) ti + (K + kt + 16, 4, Jp) tk
    # (kt <= kt_cap = 32 at sizing time)
    table_bytes = (
        (8 * I2p + 4 * (K + 64)) * Jp * itemsize if mc is not None else 0
    )
    if kt is None:
        kt = choose_kt(
            (K, IPP, Jp), itemsize, halo=16 if has_b else 8, kt_cap=32,
            max_vmem_bytes=min(64 << 20, vmem_limit_bytes or (64 << 20))
            - table_bytes,
        )
        if (
            (kt is None or kt < 8) and K % 8 == 0
            # an explicit caller limit is honored strictly; only the
            # default (None) gets the raised kt=8 second pass
            and vmem_limit_bytes is None
        ):
            # Large grids: two iterations per HBM pass is worth the whole
            # VMEM budget (measured 512^3 on v5e: 131 vs 79 Gcells/s for
            # the single packed sweep).  kt=8 scratch is 2*(kt+4) x0 +
            # 2*(kt+4) x1 + 2*kt out rows [+ 2*(kt+6) b slabs] plus
            # pair-update temporaries (~6*(kt+2) rows); admit it when that
            # fits a raised limit.  real DMA scratch is (6*kt+16) rows
            # ((8*kt+28) with b); Mosaic's pair-update temporaries fit
            # inside the raised 116 MB limit on top of it (measured at
            # 512^3: kt=8 compiles and runs at 131 Gcells/s)
            row = IPP * Jp * itemsize
            dma_rows = (8 * 8 + 28) if has_b else (6 * 8 + 16)
            if dma_rows * row <= (80 << 20):
                kt = 8
                vmem_limit_bytes = 116 << 20
    if kt is None or K % kt or kt < 8:
        return None
    if vmem_limit_bytes is None:
        vmem_limit_bytes = 100 << 20

    tables, pair_fn, flops1 = _pair_setup(shape, dtype, omega, offset, kt, mc)
    call = sweeps2x.build_2x(
        pair_fn, K, IPP, Jp, kt, dtype,
        flops=2 * flops1,
        vmem_limit_bytes=vmem_limit_bytes, interpret=interpret,
        tables=tables, has_b=has_b,
    )

    def pair_step(xp, bp):
        out, r2 = call(xp, bp) if has_b else call(xp)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        r2 = r2.astype(acc)
        return out, jnp.stack(
            [jnp.sum(r2[:, 0] + r2[:, 1]), jnp.sum(r2[:, 2] + r2[:, 3])]
        )

    pair_step.kt = kt
    pair_step.iters_per_call = 2
    pair_step.pad = functools.partial(pack_rb, offset=offset)
    pair_step.unpad = functools.partial(unpack_rb, shape=shape, offset=offset)
    return pair_step


def _pair_setup(shape, dtype, omega, offset, kt, mc):
    """(tables, pair_fn, flops_per_iteration) shared by the 2x and nx
    temporally-blocked builders: the dense one-RB-iteration closure over
    a slab, the resident MAF metric tables — the per-k tk table carries
    a 16-row guard band so window k0_mid >= -16 stays in range
    (_rb_pair_packed_maf; admits MAF blocking up to n <= 7) — and the
    per-iteration flop model (cz_solver.f90:438 / cz_maf.f90:334)."""
    import numpy as np

    K, I, J = shape
    _, _, _, I2, I2p, Jp = _dims(shape)
    kw = dict(K=K, I2=I2, J=J, I2p=I2p, Jp=Jp, offset=int(offset),
              omega=float(omega), dtype=dtype)
    if mc is None:
        return (), functools.partial(_rb_pair_packed, **kw), 18 * K * I * J
    ti, _ = _maf_tables(mc, shape, dtype)
    npdt = np.dtype(dtype)
    half = npdt.type(0.5)
    c3 = np.asarray(mc.c3, npdt).reshape(-1)[:K]
    c9 = np.asarray(mc.c9, npdt).reshape(-1)[:K]
    tk = np.ones((K + kt + 32, 4, Jp), npdt)
    tk[16 : 16 + K, 0, :] = (c3 - half * c9)[:, None]
    tk[16 : 16 + K, 1, :] = (c3 + half * c9)[:, None]
    tk[16 : 16 + K, 2, :] = c3[:, None]
    return (
        (ti, jnp.asarray(tk)),
        functools.partial(_rb_pair_packed_maf, **kw),
        33 * K * I * J,
    )


def make_packed_sweepnx(
    shape,
    dtype=jnp.float32,
    *,
    omega: float,
    n: int = 3,
    offset: int = 0,
    kt: int | None = None,
    mc=None,
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
):
    """``n`` full packed RB iterations per HBM pass (zero-RHS only).

    Generalizes :func:`make_packed_sweep2x` through sweeps2x.build_nx: the
    kernel keeps ``n-1`` lagged iteration windows resident in VMEM while
    the K-slab pipeline streams the cube once, so per PASS it does one
    read + one write of the packed field for ``n`` iterations.  Field
    values are bitwise-equal to ``n`` single packed sweeps; r2 is an
    (n,) vector of the iterations' residual sums.  Returns None when the
    layout or a viable K tiling does not exist (callers fall back to the
    2x pair / single sweep).  ``n`` is capped at 7 with ``mc``: the
    resident per-k MAF table's 16-row guard band covers k0_mid >= -16
    (_rb_pair_packed_maf), and window w runs at k0_mid = -2w - 1 on
    tile 0.
    """
    from . import sweeps2x

    K, I, J = shape
    # n <= 9: the parity-mask constants cover k_start >= -19
    # (_parity_masks); MAF additionally n <= 7 (tk guard band, _pair_setup)
    if I % 2 or n < 2 or n > 9 or (mc is not None and n > 7):
        return None
    _, _, _, I2, I2p, Jp = _dims(shape)
    IPP = 2 * I2p
    itemsize = jnp.dtype(dtype).itemsize
    table_bytes = (
        (8 * I2p + 4 * (K + 64)) * Jp * itemsize if mc is not None else 0
    )
    if kt is None:
        # scratch: (n+1) double-buffered (kt+4)-row slabs/windows + 2*kt
        # out rows; ~4*(kt+2) rows of Mosaic pair-update temporaries
        # (the choose_kt model, sweeps.py) on top.  Two passes: the
        # standard 64 MB budget, then a raised one (the 2x builder's
        # large-grid reasoning) — measured v5e 256^3 n=4 at the raised
        # kt=16: 145 Gcells/s, vs 133 for the kt=8 the standard budget
        # would force on n=3
        row = IPP * Jp * itemsize
        kt = None
        # an explicit caller limit is honored strictly (sizing budget AND
        # compile limit); only the default (None) gets the raised second
        # sizing pass up to 120 MB (measured v5e 256^3 n=4 wins, above)
        if vmem_limit_bytes is None:
            budgets = [(64 << 20, 100 << 20), (96 << 20, 120 << 20)]
        else:
            budgets = [
                (min(64 << 20, vmem_limit_bytes), vmem_limit_bytes)
            ]
        for budget, limit in budgets:
            for cand in range(max(8, 2 * n + 2), min(K, 32) + 1):
                if K % cand:
                    continue
                rows = 2 * (n + 1) * (cand + 4) + 2 * cand + 4 * (cand + 2)
                if rows * row <= budget - table_bytes:
                    kt = cand
            if kt is not None:
                vmem_limit_bytes = limit
                break
    if vmem_limit_bytes is None:
        vmem_limit_bytes = 100 << 20  # explicit-kt call under the default
    if kt is None or K % kt or kt < max(8, 2 * n + 2):
        return None

    tables, pair_fn, flops1 = _pair_setup(shape, dtype, omega, offset, kt, mc)
    call = sweeps2x.build_nx(
        pair_fn, K, IPP, Jp, kt, dtype, n,
        flops=n * flops1,
        vmem_limit_bytes=vmem_limit_bytes, interpret=interpret,
        tables=tables,
    )

    def nx_step(xp, bp):
        del bp  # zero-RHS configuration
        out, r2 = call(xp)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        r2 = r2.astype(acc)
        return out, jnp.stack(
            [jnp.sum(r2[:, 2 * i] + r2[:, 2 * i + 1]) for i in range(n)]
        )

    nx_step.kt = kt
    nx_step.iters_per_call = n
    nx_step.pad = functools.partial(pack_rb, offset=offset)
    nx_step.unpad = functools.partial(unpack_rb, shape=shape, offset=offset)
    return nx_step


def _maf_tables(mc, shape, dtype):
    """Host-side packed MAF tables: (8, I2p, Jp) resident ti and
    (K+4, 4, Jp) streamed per-k rows (see _pair_update_maf).  All weight
    arithmetic is done in ``dtype`` so the values round exactly like the
    interleaved kernel's runtime computation (bitwise parity)."""
    import numpy as np

    K, I, J, I2, I2p, Jp = _dims(shape)
    npdt = np.dtype(dtype)
    half = npdt.type(0.5)

    def vec(v, n, npad):
        out = np.ones(npad, npdt)
        out[:n] = np.asarray(v, npdt).reshape(-1)[:n]
        return out

    c1 = vec(mc.c1, I, 2 * I2p)
    c7 = vec(mc.c7, I, 2 * I2p)
    c2 = vec(mc.c2, J, Jp)
    c8 = vec(mc.c8, J, Jp)
    wxp = c1 + half * c7
    wxm = c1 - half * c7

    def bi(v):  # (I2p,) -> (I2p, Jp)
        return np.broadcast_to(v[:, None], (I2p, Jp))

    def bj(v):  # (Jp,) -> (I2p, Jp)
        return np.broadcast_to(v[None, :], (I2p, Jp))

    ti = np.stack(
        [
            bi(wxp[0::2]),
            bi(wxp[1::2]),
            bi(wxm[0::2]),
            bi(wxm[1::2]),
            c1[0::2][:, None] + c2[None, :],
            c1[1::2][:, None] + c2[None, :],
            bj(c2 + half * c8),
            bj(c2 - half * c8),
        ]
    )
    c3 = np.asarray(mc.c3, npdt).reshape(-1)[:K]
    c9 = np.asarray(mc.c9, npdt).reshape(-1)[:K]
    tkp = np.ones((K + 4, 4, Jp), npdt)  # pad rows 1.0: dd stays finite
    tkp[2:-2, 0, :] = (c3 - half * c9)[:, None]
    tkp[2:-2, 1, :] = (c3 + half * c9)[:, None]
    tkp[2:-2, 2, :] = c3[:, None]
    return jnp.asarray(ti), jnp.asarray(tkp)


def make_packed_sweep(
    shape,
    dtype=jnp.float32,
    *,
    omega: float,
    offset: int = 0,
    kt: int | None = None,
    b_is_zero: bool = False,
    mc=None,
    vmem_limit_bytes: int = 100 << 20,
    interpret: bool = False,
):
    """Build ``step(xp, bp) -> (xp_new, r2)`` over rbpack-layout arrays.

    Returns None when the layout does not apply (odd I) or no viable K
    tiling exists.  ``step.pad`` / ``step.unpad`` convert (K, I, J) fields
    to/from the packed layout; apply ``pad`` to x and b alike.  ``mc``
    (a MafCoeffs) switches to the variable-coefficient MAF update.
    """
    K, I, J = shape
    if I % 2:
        return None
    _, _, _, I2, I2p, Jp = _dims(shape)
    IPP = 2 * I2p
    itemsize = jnp.dtype(dtype).itemsize
    maf = mc is not None
    if maf:
        ti, tkp = _maf_tables(mc, shape, dtype)
        table_bytes = 8 * I2p * Jp * itemsize
    else:
        ti = jnp.zeros((1, 8, 128), dtype)
        tkp = jnp.zeros((1, 8, 128), dtype)
        table_bytes = 0
    if kt is None:
        kt = choose_kt(
            (K, IPP, Jp), itemsize, halo=4,
            max_vmem_bytes=(64 << 20) - table_bytes,
        )
    if kt is None or K % kt:
        return None
    T = K // kt

    kern = functools.partial(
        _packed_kernel,
        K=K,
        I2=I2,
        J=J,
        I2p=I2p,
        Jp=Jp,
        kt=kt,
        omega=float(omega),
        offset=int(offset),
        b_is_zero=bool(b_is_zero),
        maf=maf,
    )

    bytes_touched = (2 if b_is_zero else 3) * K * IPP * Jp * itemsize
    flops = (33 if maf else 18) * K * I * J

    call = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K + 4, IPP, Jp), dtype),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kt + 4, IPP, Jp), dtype),
            pltpu.VMEM((2, (kt + 2) if not b_is_zero else 1, IPP, Jp), dtype),
            pltpu.VMEM((2, (kt + 2) if maf else 1, 4, Jp), dtype),
            pltpu.VMEM((2, kt, IPP, Jp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_touched, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        # In-place update (see sweeps.py): writes trail reads by >= 2 rows,
        # every row is read exactly once before its write.  Measured ~1.6x
        # faster HBM streaming + VMEM residency up to ~2x larger grids.
        input_output_aliases={0: 0},
        interpret=interpret,
    )

    def step(xp, bp):
        out, r2 = call(xp, bp, ti, tkp)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return out, jnp.sum(r2.astype(acc))

    step.kt = kt
    step.pad = functools.partial(pack_rb, offset=offset)
    step.unpad = functools.partial(unpack_rb, shape=shape, offset=offset)
    return step
