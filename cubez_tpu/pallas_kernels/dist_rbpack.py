"""Distributed packed red-black SOR: the PRODUCTION kernel per mesh block.

The serial production sor2sma path is the packed-RB layout (rbpack.py)
run through the n-iterations-per-HBM-pass window chain (sweeps2x.py).
This module runs that SAME kernel family per device block — the
reference's every-rank-runs-the-serial-kernel property
(cz_Poisson.cpp:194-215 calls the identical psor2sma_core_ the 1-rank
build runs) — and adds the communication-avoiding schedule the reference
lacks:

    exchange ghost depth h = 2n on each SPLIT mesh axis
    -> ONE pallas call: n full red-black iterations over the extended
       block (deep-halo redundant compute in the h-wide overlap ring)
    -> psum of the owned-cell residuals.

Correctness of the deep halo (why owned cells are EXACT):
a red-black iteration consumes two halo layers (red reads time-m
neighbors, black reads the red updates), so after m window iterations
the cells holding exactly the serial values extend to distance
h - 2m outside the owned box.  With h = 2n the owned cells (distance 0)
are bitwise the serial n-iteration result — stale values creeping in
from the never-updated outermost layer cannot reach them, and the next
exchange rewrites the whole ring from the neighbors' (exact) owned
cells.  No shrinking masks are needed; wrong intermediate values in the
outer ring are dead values.

Per-axis ghost depth — the TPU-shaped cost model:
an UNSPLIT mesh axis needs no ghosts at all (the block spans the whole
axis; physical boundaries are handled by the masks exactly as in the
serial kernel), so the extension is applied per axis: (hz, hx, hy),
each 0 or 2n.  This matters because the three axes price very
differently on TPU: K rows are unpadded (cost 2h/lk), the I fold lands
on sublanes (8-granularity — near free), but J lands on LANES, where
any extension rounds up to the next 128 multiple (a 256-lane block pays
1.5x HBM and VPU for ANY hy > 0).  Mesh divisions for this path should
therefore split Z and X and leave Y whole — see
parallel/decomp.py::auto_division_packed.  A 1x1x1 mesh degenerates to
exactly the serial layout and kernel.

Packed-layout ghost exchange with NO repacking:
with even block extents (lk, li, lj) every block's global origin is even
on each axis, so extended-local parity == global parity and all blocks
share one pack_rb permutation.  K-slabs and J-lane-slabs of the packed
array therefore transfer verbatim; and because h = 2n is even and owned
ranges start at even extended indices, the I (fold) axis moves whole
pair-rows — also verbatim slices, taken from both the R and B halves.
The exchange itself lives in parallel/dist_pack.py (it needs the mesh
axis names); this module owns the layout and the kernel.

Masks: updates clip to (extended-array interior) AND (global inner,
via the block's traced offsets in SMEM — the physical Dirichlet planes
never update, exactly like the serial kernels); the residual uses a
STATIC owned-box mask so redundantly computed ring cells are never
double-counted across blocks.  Because the depths and block extents are
even, the owned box covers whole packed pair-rows — one color-
independent mask serves both colors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .rbpack import _pair_update, _pair_update_maf, pack_rb, unpack_rb
from .sweeps import _round_up


def ext_dims(block_shape, hs):
    """Extended per-block dims for depths ``hs = (hz, hx, hy)``:
    (Ke, Ie, Je, I2e, I2ep, Jep)."""
    lk, li, lj = block_shape
    hz, hx, hy = hs
    Ke, Ie, Je = lk + 2 * hz, li + 2 * hx, lj + 2 * hy
    I2e = Ie // 2
    return Ke, Ie, Je, I2e, _round_up(I2e, 8), _round_up(Je, 128)


def pack_ext_block(xb, hs, offset: int = 0):
    """Owned (lk, li, lj) block -> extended packed (Ke+4, 2*I2ep, Jep)
    with zero ghosts (the exchange fills them before every window)."""
    hz, hx, hy = hs
    ext = jnp.pad(xb, ((hz, hz), (hx, hx), (hy, hy)))
    return pack_rb(ext, offset=offset)


def unpack_ext_block(xp, block_shape, hs, offset: int = 0):
    """Inverse of :func:`pack_ext_block` (owned cells only)."""
    hz, hx, hy = hs
    ext_shape = tuple(s + 2 * g for s, g in zip(block_shape, hs))
    ext = unpack_rb(xp, ext_shape, offset=offset)
    lk, li, lj = block_shape
    return ext[hz : hz + lk, hx : hx + li, hy : hy + lj]


def _dist_parity_masks(rows, k_start, offset, hs, block_shape, gshape,
                       offs_ref, I2e, Je, I2ep, Jep, color):
    """(update_mask, sel_m1) for one color's dense rows of the EXTENDED
    block, rows of extended-K index starting at ``k_start``.

    update_mask: extended-array interior (full 7-pt neighborhood present)
    AND global inner (physical boundary planes and out-of-domain ring
    excluded — global coords from the SMEM offsets, the block's owned
    origin).  sel_m1 as in rbpack._parity_masks, extended-local frame
    (== global frame: even origins, even depths).  Constants keep
    lax.rem args non-negative down to k_start >= -19 (n <= 9)."""
    lk, li, lj = block_shape
    hz, hx, hy = hs
    Ke, Ie = lk + 2 * hz, li + 2 * hx
    Kg, Ig, Jg = gshape
    k0g = offs_ref[0, 0]
    i0g = offs_ref[0, 1]
    j0g = offs_ref[0, 2]
    two = jnp.asarray(2, jnp.int32)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + jnp.asarray(
        k_start, jnp.int32
    )
    j1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Jep), 2)
    add = (offset + 21) if color == 0 else (offset + 20)
    s = jax.lax.rem(k1 + j1 + add, two)  # (rows, 1, Jep)
    sel_m1 = s == 1
    i2 = jax.lax.broadcasted_iota(jnp.int32, (1, I2ep, 1), 1)
    # physical extended-local i of this color's packed cell
    ii = 2 * i2 + s  # (rows, I2ep, Jep)
    gk = k1 + (k0g - hz)
    gi = ii + (i0g - hx)
    gj = j1 + (j0g - hy)
    ok_k = (k1 >= 1) & (k1 <= Ke - 2) & (gk >= 1) & (gk <= Kg - 2)
    ok_i = (ii >= 1) & (ii <= Ie - 2) & (i2 < I2e) & (gi >= 1) & (gi <= Ig - 2)
    ok_j = (j1 >= 1) & (j1 <= Je - 2) & (gj >= 1) & (gj <= Jg - 2)
    return ok_k & ok_i & ok_j, sel_m1


def _owned_mask(rows, k_start, hs, block_shape, I2ep, Jep):
    """Static owned-box mask for the residual (extended rows starting at
    ``k_start``).  Depths and block extents are even, so the owned box is
    whole packed pair-rows — valid for BOTH colors."""
    lk, li, lj = block_shape
    hz, hx, hy = hs
    k1 = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + jnp.asarray(
        k_start, jnp.int32
    )
    ok = (k1 >= hz) & (k1 <= hz + lk - 1)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (1, I2ep, 1), 1)
    oi = (i2 >= hx // 2) & (i2 < (hx + li) // 2)
    j1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Jep), 2)
    oj = (j1 >= hy) & (j1 <= hy + lj - 1)
    return ok & oi & oj


def _dist_rb_pair_packed(
    xv, k0_mid, bv, offs_ref,
    *, hs, block_shape, gshape, I2e, Je, I2ep, Jep, offset, omega, dtype
):
    """One full RB iteration on an extended packed slab (the sweeps2x
    window-chain contract, rbpack._rb_pair_packed with dist masks).
    Residual partials come from OWNED cells only."""
    del bv  # zero-RHS configuration
    rows = xv.shape[0]
    Rv = xv[:, 0:I2ep]
    Bv = xv[:, I2ep : 2 * I2ep]
    kw = dict(hs=hs, block_shape=block_shape, gshape=gshape, I2e=I2e, Je=Je,
              I2ep=I2ep, Jep=Jep)
    mR, selR = _dist_parity_masks(
        rows - 2, k0_mid, offset, offs_ref=offs_ref, color=0, **kw
    )
    Rn, dpR = _pair_update(Rv[1:-1], Bv, None, mR, selR, omega, dtype)
    mB, selB = _dist_parity_masks(
        rows - 4, k0_mid + 1, offset, offs_ref=offs_ref, color=1, **kw
    )
    Bn, dpB = _pair_update(Bv[2:-2], Rn, None, mB, selB, omega, dtype)
    own = _owned_mask(rows - 4, k0_mid + 1, hs, block_shape, I2ep, Jep)
    z = jnp.zeros((), jnp.float32)
    dpc = jnp.where(own, dpR[1:-1].astype(jnp.float32), z)
    dbf = jnp.where(own, dpB.astype(jnp.float32), z)
    return (
        jnp.concatenate([Rn[1:-1], Bn], axis=1),
        jnp.sum(dpc * dpc),
        jnp.sum(dbf * dbf),
    )


def _dist_rb_pair_packed_maf(
    xv, k0_mid, bv, offs_ref, ti_ref, tk_ref,
    *, hs, block_shape, gshape, I2e, Je, I2ep, Jep, offset, omega, dtype
):
    """MAF variant of :func:`_dist_rb_pair_packed`: per-block metric
    tables arrive as dynamic VMEM operands (sliced from replicated
    global tables in the shard_map body — block offsets are traced
    there).  ti: (8, I2ep, Jep) resident even/odd-split I/J weights in
    extended-local coordinates (rbpack._pair_update_maf layout);
    tk: (Ke + kt + 32, 4, Jep) per-k rows [wzm, wzp, c3] with the
    16-row guard band (extended row r holds el_k = r - 16, admitting
    window k0_mid >= -16, i.e. n <= 7)."""
    del bv  # zero-RHS configuration
    rows = xv.shape[0]
    Rv = xv[:, 0:I2ep]
    Bv = xv[:, I2ep : 2 * I2ep]
    kw = dict(hs=hs, block_shape=block_shape, gshape=gshape, I2e=I2e, Je=Je,
              I2ep=I2ep, Jep=Jep)
    ti = ti_ref[:]
    wz = tk_ref[pl.ds(k0_mid + 16, rows - 2), :, :]
    mR, selR = _dist_parity_masks(
        rows - 2, k0_mid, offset, offs_ref=offs_ref, color=0, **kw
    )
    Rn, dpR = _pair_update_maf(
        Rv[1:-1], Bv, None, mR, selR, ti, wz, omega, dtype
    )
    mB, selB = _dist_parity_masks(
        rows - 4, k0_mid + 1, offset, offs_ref=offs_ref, color=1, **kw
    )
    Bn, dpB = _pair_update_maf(
        Bv[2:-2], Rn, None, mB, selB, ti, wz[1:-1], omega, dtype
    )
    own = _owned_mask(rows - 4, k0_mid + 1, hs, block_shape, I2ep, Jep)
    z = jnp.zeros((), jnp.float32)
    dpc = jnp.where(own, dpR[1:-1].astype(jnp.float32), z)
    dbf = jnp.where(own, dpB.astype(jnp.float32), z)
    return (
        jnp.concatenate([Rn[1:-1], Bn], axis=1),
        jnp.sum(dpc * dpc),
        jnp.sum(dbf * dbf),
    )


def _maf_global_tables(mc, gshape, hs, kt, Jep, dtype):
    """Host-side GLOBAL metric tables in extended coordinates, from which
    every block dynamic-slices its ti/tk operands (see
    _dist_rb_pair_packed_maf).  Guard entries (out-of-domain ring, tile
    pads, window guard band) are 1.0 — finite dd, and their products
    only ever feed masked updates.

    Conventions (mirroring rbpack._maf_tables, shifted to extended
    frames with even origins/depths so parity folds are uniform):
    * ti_g (8, I2G, JG): row r of the E half holds physical global
      i = 2*(r - hx/2) ... i.e. the block at owned origin i0 slices rows
      [i0/2, i0/2 + I2ep) and lanes [j0, j0 + Jep), giving its
      extended-local (i2, el_j) tables directly.
    * tk_g (QG, 4, Jep): row q holds global k = q - 16 - hz + k0-slice
      origin; the block slices rows [k0, k0 + Ke + kt + 32).
    """
    import numpy as np

    Kg, Ig, Jg = gshape
    hz, hx, hy = hs
    npdt = np.dtype(dtype)
    half = npdt.type(0.5)

    # extended-global I axis: giT = gi + hx in [0, Ig + 2hx), plus slack
    # rows so the LAST block's I2ep tile pad stays in range
    I2G = (Ig + 2 * hx) // 2 + 8
    JG = Jg + 2 * hy + Jep  # lane slack for the last block's tile pad
    c1x = np.ones(2 * I2G, npdt)
    c7x = np.zeros(2 * I2G, npdt)
    c1x[hx : hx + Ig] = np.asarray(mc.c1, npdt).reshape(-1)[:Ig]
    c7x[hx : hx + Ig] = np.asarray(mc.c7, npdt).reshape(-1)[:Ig]
    c2x = np.ones(JG, npdt)
    c8x = np.zeros(JG, npdt)
    c2x[hy : hy + Jg] = np.asarray(mc.c2, npdt).reshape(-1)[:Jg]
    c8x[hy : hy + Jg] = np.asarray(mc.c8, npdt).reshape(-1)[:Jg]
    wxp = c1x + half * c7x
    wxm = c1x - half * c7x

    def bi(v):  # (I2G,) -> (I2G, JG)
        return np.broadcast_to(v[:, None], (I2G, JG))

    def bj(v):  # (JG,) -> (I2G, JG)
        return np.broadcast_to(v[None, :], (I2G, JG))

    ti_g = np.stack(
        [
            bi(wxp[0::2]),
            bi(wxp[1::2]),
            bi(wxm[0::2]),
            bi(wxm[1::2]),
            c1x[0::2][:, None] + c2x[None, :],
            c1x[1::2][:, None] + c2x[None, :],
            bj(c2x + half * c8x),
            bj(c2x - half * c8x),
        ]
    )

    # extended-global K axis with the 16-row guard band: global row q
    # holds gk = q - 16 - hz relative to the slicing convention (block
    # start row = k0); sized so the last block's slice fits exactly
    QG = Kg + 2 * hz + kt + 32
    c3 = np.asarray(mc.c3, npdt).reshape(-1)[:Kg]
    c9 = np.asarray(mc.c9, npdt).reshape(-1)[:Kg]
    tk_g = np.ones((QG, 4, Jep), npdt)
    q0 = 16 + hz  # row of gk = 0
    tk_g[q0 : q0 + Kg, 0, :] = (c3 - half * c9)[:, None]
    tk_g[q0 : q0 + Kg, 1, :] = (c3 + half * c9)[:, None]
    tk_g[q0 : q0 + Kg, 2, :] = c3[:, None]
    return jnp.asarray(ti_g), jnp.asarray(tk_g)


def make_dist_packed_sweepnx(
    block_shape,
    gshape,
    dtype=jnp.float32,
    *,
    omega: float,
    n: int,
    split=(True, True, True),
    offset: int = 0,
    kt: int | None = None,
    mc=None,
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
):
    """Build ``kernel(xp, offs[, ti, tk]) -> (xp_new, r2_vec)``: ``n``
    full packed RB iterations over one extended block (ghost depth 2n on
    each axis whose ``split`` flag is set — unsplit axes carry no
    ghosts), owned residual partials as an (n,) vector.  ``offs`` is the
    (1, 3) int32 owned-origin (k0, i0, j0) — traced, from
    lax.axis_index.  Zero inner RHS, f32 (the headline configuration).
    ``mc`` (a MafCoeffs) switches to the variable-coefficient MAF
    update: the per-block metric tables are dynamic VMEM operands built
    by ``kernel.block_tables(k0, i0, j0)`` (dynamic slices of replicated
    global tables — call it in the shard_map body).  None when the
    layout or a viable K tiling does not exist."""
    from . import sweeps2x

    lk, li, lj = block_shape
    h = 2 * n
    hs = tuple(h if s else 0 for s in split)
    maf = mc is not None
    if (
        n < 2 or n > 9 or (maf and n > 7)  # tk guard band covers n <= 7
        or lk % 2 or li % 2 or lj % 2
        # exchange sources must be owned cells (depth-h slabs per face)
        or any(g > dim for g, dim in zip(hs, block_shape))
    ):
        return None
    Ke, Ie, Je, I2e, I2ep, Jep = ext_dims(block_shape, hs)
    IPP = 2 * I2ep
    itemsize = jnp.dtype(dtype).itemsize

    def _table_bytes(cand):
        if not maf:
            return 0
        return (8 * I2ep + 4 * (Ke + cand + 32)) * Jep * itemsize

    if kt is None:
        row = IPP * Jep * itemsize
        kt = None
        if vmem_limit_bytes is None:
            budgets = [(64 << 20, 100 << 20), (96 << 20, 120 << 20)]
        else:
            budgets = [(min(64 << 20, vmem_limit_bytes), vmem_limit_bytes)]
        for budget, limit in budgets:
            for cand in range(max(8, 2 * n + 2), min(Ke, 32) + 1):
                if Ke % cand:
                    continue
                rows = 2 * (n + 1) * (cand + 4) + 2 * cand + 4 * (cand + 2)
                if rows * row <= budget - _table_bytes(cand):
                    kt = cand
            if kt is not None:
                vmem_limit_bytes = limit
                break
    if vmem_limit_bytes is None:
        vmem_limit_bytes = 100 << 20
    if kt is None or Ke % kt or kt < max(8, 2 * n + 2):
        return None

    common = dict(
        hs=hs, block_shape=tuple(block_shape), gshape=tuple(gshape),
        I2e=I2e, Je=Je, I2ep=I2ep, Jep=Jep,
        offset=int(offset), omega=float(omega), dtype=dtype,
    )
    if maf:
        pair_fn = functools.partial(_dist_rb_pair_packed_maf, **common)
        ti_g, tk_g = _maf_global_tables(mc, gshape, hs, kt, Jep, dtype)
    else:
        pair_fn = functools.partial(_dist_rb_pair_packed, **common)
    call = sweeps2x.build_nx(
        pair_fn, Ke, IPP, Jep, kt, dtype, n,
        # true per-block work includes the redundant ring (the cost model
        # feeds the scheduler); the roofline accounting uses owned cells
        flops=n * (33 if maf else 18) * Ke * Ie * Je,
        vmem_limit_bytes=vmem_limit_bytes, interpret=interpret,
        dyn_smem_shapes=((1, 3),),
        dyn_vmem_count=2 if maf else 0,
    )

    if maf:

        def block_tables(k0, i0, j0):
            z = jnp.zeros((), jnp.int32)
            ti = jax.lax.dynamic_slice(
                ti_g, (z, i0 // 2, j0), (8, I2ep, Jep)
            )
            tk = jax.lax.dynamic_slice(
                tk_g, (k0, z, z), (Ke + kt + 32, 4, Jep)
            )
            return ti, tk

        def kernel(xp, offs, ti, tk):
            out, r2 = call(xp, offs, ti, tk)
            r2 = r2.astype(jnp.float32)
            return out, jnp.stack(
                [jnp.sum(r2[:, 2 * i] + r2[:, 2 * i + 1]) for i in range(n)]
            )

        kernel.block_tables = block_tables
    else:

        def kernel(xp, offs):
            out, r2 = call(xp, offs)
            r2 = r2.astype(jnp.float32)
            return out, jnp.stack(
                [jnp.sum(r2[:, 2 * i] + r2[:, 2 * i + 1]) for i in range(n)]
            )

    kernel.kt = kt
    kernel.hs = hs
    kernel.maf = maf
    kernel.iters_per_call = n
    return kernel
