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

from .rbpack import _pair_update, pack_rb, unpack_rb
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
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
):
    """Build ``kernel(xp, offs) -> (xp_new, r2_vec)``: ``n`` full packed
    RB iterations over one extended block (ghost depth 2n on each axis
    whose ``split`` flag is set — unsplit axes carry no ghosts), owned
    residual partials as an (n,) vector.  ``offs`` is the (1, 3) int32
    owned-origin (k0, i0, j0) — traced, from lax.axis_index.  Zero inner
    RHS, constant coefficients, f32 (the headline configuration).  None
    when the layout or a viable K tiling does not exist."""
    from . import sweeps2x

    lk, li, lj = block_shape
    h = 2 * n
    hs = tuple(h if s else 0 for s in split)
    if (
        n < 2 or n > 9
        or lk % 2 or li % 2 or lj % 2
        # exchange sources must be owned cells (depth-h slabs per face)
        or any(g > dim for g, dim in zip(hs, block_shape))
    ):
        return None
    Ke, Ie, Je, I2e, I2ep, Jep = ext_dims(block_shape, hs)
    IPP = 2 * I2ep
    itemsize = jnp.dtype(dtype).itemsize
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
                if rows * row <= budget:
                    kt = cand
            if kt is not None:
                vmem_limit_bytes = limit
                break
    if vmem_limit_bytes is None:
        vmem_limit_bytes = 100 << 20
    if kt is None or Ke % kt or kt < max(8, 2 * n + 2):
        return None

    pair_fn = functools.partial(
        _dist_rb_pair_packed,
        hs=hs, block_shape=tuple(block_shape), gshape=tuple(gshape),
        I2e=I2e, Je=Je, I2ep=I2ep, Jep=Jep,
        offset=int(offset), omega=float(omega), dtype=dtype,
    )
    call = sweeps2x.build_nx(
        pair_fn, Ke, IPP, Jep, kt, dtype, n,
        # true per-block work includes the redundant ring (the cost model
        # feeds the scheduler); the roofline accounting uses owned cells
        flops=n * 18 * Ke * Ie * Je,
        vmem_limit_bytes=vmem_limit_bytes, interpret=interpret,
        dyn_smem_shapes=((1, 3),),
    )

    def kernel(xp, offs):
        out, r2 = call(xp, offs)
        r2 = r2.astype(jnp.float32)
        return out, jnp.stack(
            [jnp.sum(r2[:, 2 * i] + r2[:, 2 * i + 1]) for i in range(n)]
        )

    kernel.kt = kt
    kernel.hs = hs
    kernel.iters_per_call = n
    return kernel
