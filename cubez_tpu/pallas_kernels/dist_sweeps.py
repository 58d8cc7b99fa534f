"""Block-local fused sweeps for the distributed (shard_map) path.

Each device holds one block of the cube in **ghosted-padded layout**
(lk+4, Ip, Jp): K rows = [dead, ghost, lk locals, ghost, dead], I/J cols =
[ghost, locals..., ghost, tile-alignment dead lanes].  Per iteration the
driver (parallel/dist_fused.py) refreshes the width-1 ghost planes with
``lax.ppermute`` and then calls one of these kernels, which sweeps the
block at speed-of-light exactly like the serial kernels in sweeps.py.

Halo semantics are the reference's multi-rank ones (cz_Poisson.cpp:194-215):
ONE exchange per iteration; the red-black sweep's second color sees color-0
updates inside the block but the *pre-iteration* values in the ghosts
(ghost nodes are never color-0-updated).  That is expressed by masking the
color-0 update with ``is_local`` — a ghost row flows through unchanged into
the color-1 neighbor reads.

Masks are synthesized from the block's global offsets, which arrive as a
(1, 3) SMEM scalar input (offsets are traced: they come from
``lax.axis_index`` inside shard_map).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweeps import _roll, _round_up, R6


def block_layout(block_shape):
    """(lk, li, lj) -> padded per-block state shape (lk+4, Ip, Jp)."""
    lk, li, lj = block_shape
    return (lk + 4, _round_up(li + 2, 8), _round_up(lj + 2, 128))


def pad_block(xb):
    """Local (lk, li, lj) block -> ghosted-padded (lk+4, Ip, Jp) with zero
    ghosts/pads (ghosts are refreshed by the halo exchange each iteration)."""
    lk, li, lj = xb.shape
    kp, ip, jp = block_layout(xb.shape)
    return jnp.pad(xb, ((2, 2), (1, ip - li - 1), (1, jp - lj - 1)))


def unpad_block(xp, block_shape):
    lk, li, lj = block_shape
    return xp[2 : lk + 2, 1 : li + 1, 1 : lj + 1]


def _dist_masks(rows, Ip, Jp, lk, li, lj, gshape, offs_ref, lk_start, offset,
                shrink_shell: bool = False):
    """(inner&local, par) for ``rows`` extended K-rows whose first row has
    *local* index ``lk_start``; global offsets read from the SMEM ref.

    ``shrink_shell`` additionally excludes the one-cell local boundary
    shell (cells whose stencil touches a ghost plane) — the interior
    half of the halo/compute overlap split (dist_fused overlap step):
    the kernel runs while the ghost collectives fly, and the shell is
    recomputed afterwards from the refreshed ghosts."""
    Kg, Ig, Jg = gshape
    k0g = offs_ref[0, 0]
    i0g = offs_ref[0, 1]
    j0g = offs_ref[0, 2]
    s = 1 if shrink_shell else 0
    lkidx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + jnp.asarray(
        lk_start, jnp.int32
    )
    gk = lkidx + k0g
    ok_k = (lkidx >= s) & (lkidx <= lk - 1 - s) & (gk >= 1) & (gk <= Kg - 2)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, Ip, Jp), 1)
    cj = jax.lax.broadcasted_iota(jnp.int32, (1, Ip, Jp), 2)
    gi = ci - 1 + i0g
    gj = cj - 1 + j0g
    ok_ij = (
        (ci >= 1 + s) & (ci <= li - s) & (cj >= 1 + s) & (cj <= lj - s)
        & (gi >= 1) & (gi <= Ig - 2) & (gj >= 1) & (gj <= Jg - 2)
    )
    two = jnp.asarray(2, jnp.int32)
    # +4 keeps the argument non-negative (gk/gi/gj >= -1) without changing
    # parity of (i+j+k+offset+1)
    par = jax.lax.rem(gk + gi + gj + (offset + 5), two)
    return ok_k & ok_ij, par


def _delta(xfull, mask, bmid, omega, dtype):
    xc = xfull[1:-1]
    ss = (
        xfull[:-2]
        + xfull[2:]
        + _roll(xc, 1, 1)
        + _roll(xc, -1, 1)
        + _roll(xc, 1, 2)
        + _roll(xc, -1, 2)
    )
    upd = (ss * R6 - xc) * omega if bmid is None else ((ss - bmid) * R6 - xc) * omega
    dp = jnp.where(mask, upd, jnp.zeros((), dtype))
    return xc + dp, dp


def _block_kernel(
    offs_ref, xhp_ref, bhp_ref, out_ref, r2_ref,
    xs, bs, outs, in_sems, b_sems, out_sems,
    *, kind, gshape, lk, li, lj, Ip, Jp, kt, omega, offset, b_is_zero, color,
    shrink_shell=False
):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    two = jnp.asarray(2, t.dtype)
    slot = jax.lax.rem(t, two)
    nslot = jax.lax.rem(t + 1, two)
    dtype = xs.dtype
    fused_rb = kind == "sor2sma" and color is None
    x_halo = 4 if fused_rb else 2
    x_off = 0 if fused_rb else 1
    b_off = 1 if fused_rb else 2
    b_rows = kt + 2 if fused_rb else kt

    def in_dma(s, idx):
        return pltpu.make_async_copy(
            xhp_ref.at[pl.ds(idx * kt + x_off, kt + x_halo)], xs.at[s], in_sems.at[s]
        )

    def b_dma(s, idx):
        return pltpu.make_async_copy(
            bhp_ref.at[pl.ds(idx * kt + b_off, b_rows)], bs.at[s], b_sems.at[s]
        )

    def out_dma(s, idx):
        return pltpu.make_async_copy(
            outs.at[s], out_ref.at[pl.ds(idx * kt + 2, kt)], out_sems.at[s]
        )

    # in-place pipeline (see lines.py): tile t+1's input rows overlap
    # out_dma(t)'s write range by 1-2 pre-update halo rows, so the next
    # tile's in-DMA is awaited before this tile's in-place out-DMA starts
    # (hazard fence below) — only tile 0 waits here
    @pl.when(t == 0)
    def _():
        in_dma(0, 0).start()
        in_dma(0, 0).wait()
        if not b_is_zero:
            b_dma(0, 0).start()
        r2_ref[0, 0] = jnp.zeros((), jnp.float32)

    @pl.when(t + 1 < T)
    def _():
        in_dma(nslot, t + 1).start()
        if not b_is_zero:
            b_dma(nslot, t + 1).start()

    if not b_is_zero:
        b_dma(slot, t).wait()

    xv = xs[slot]
    bv = None if b_is_zero else bs[slot]
    k0 = t * kt

    if fused_rb:
        # extended color-0 range: kt+2 rows, local [k0-1, k0+kt]
        upd, par = _dist_masks(
            kt + 2, Ip, Jp, lk, li, lj, gshape, offs_ref, k0 - 1, offset
        )
        x0, dp0 = _delta(xv, upd & (par == 0), bv, omega, dtype)
        bmid = None if b_is_zero else bv[1:-1]
        x1, dp1 = _delta(x0, (upd & (par == 1))[1:-1], bmid, omega, dtype)
        dpc = dp0[1:-1].astype(jnp.float32)
        r2 = jnp.sum(dpc * dpc) + jnp.sum(
            dp1.astype(jnp.float32) * dp1.astype(jnp.float32)
        )
    else:
        upd, par = _dist_masks(
            kt, Ip, Jp, lk, li, lj, gshape, offs_ref, k0, offset,
            shrink_shell=shrink_shell,
        )
        if color is not None:  # one color of the per-color-sync RB sweep
            upd = upd & (par == color)
        x1, dp = _delta(xv, upd, bv, omega, dtype)
        dpf = dp.astype(jnp.float32)
        r2 = jnp.sum(dpf * dpf)

    # aliasing hazard fence: the next tile's input rows must be in VMEM
    # before the in-place write begins
    @pl.when(t + 1 < T)
    def _():
        in_dma(nslot, t + 1).wait()

    @pl.when(t >= 2)
    def _():
        out_dma(slot, t - 2).wait()

    outs[slot] = x1
    out_dma(slot, t).start()
    r2_ref[0, 0] += r2

    @pl.when(t == T - 1)
    def _():
        out_dma(slot, t).wait()

    @pl.when((t == T - 1) & (t >= 1))
    def _():
        out_dma(nslot, t - 1).wait()


def make_block_sweep(
    kind: str,
    block_shape,
    gshape,
    dtype=jnp.float32,
    *,
    omega: float,
    offset: int = 0,
    kt: int | None = None,
    b_is_zero: bool = False,
    color: int | None = None,
    shrink_shell: bool = False,
    vmem_limit_bytes: int = 100 << 20,
    interpret: bool = False,
):
    """Build ``sweep(xhp, bhp, offs) -> (xhp_new, r2_local)`` on the
    ghosted-padded block state; ``offs`` is a (1, 3) int32 array of the
    block's global (k0, i0, j0).  Ghost/dead rows of the output hold
    garbage — the caller refreshes ghosts before the next sweep and all
    reads mask on true bounds.

    ``color``: for kind='sor2sma', None fuses both colors in one pass
    (reference lowsync semantics); 0/1 sweeps a single color (the caller
    refreshes ghosts between colors -> serial-equivalent).  Returns None if
    no viable K tiling."""
    from .sweeps import choose_kt

    lk, li, lj = block_shape
    Kp, Ip, Jp = block_layout(block_shape)
    fused_rb = kind == "sor2sma" and color is None
    x_halo = 4 if fused_rb else 2
    itemsize = jnp.dtype(dtype).itemsize
    if kt is None:
        kt = choose_kt((lk, Ip, Jp), itemsize, halo=x_halo)
    if kt is None or lk % kt:
        return None
    if fused_rb and kt < 2:
        # the fused-rb slab extends 2 rows each side (x_halo=4, x_off=0):
        # at kt=1 in_dma(t+2) — started during tile t+1 — overlaps
        # out_dma(t)'s in-place write range, outside the hazard fence
        return None
    T = lk // kt
    b_halo = 2 if fused_rb else 0
    b_rows = kt + 2 if fused_rb else kt

    kern = functools.partial(
        _block_kernel,
        kind=kind,
        gshape=tuple(gshape),
        lk=lk,
        li=li,
        lj=lj,
        Ip=Ip,
        Jp=Jp,
        kt=kt,
        omega=float(omega),
        offset=int(offset),
        b_is_zero=bool(b_is_zero),
        color=color,
        shrink_shell=bool(shrink_shell),
    )

    call = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Kp, Ip, Jp), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kt + x_halo, Ip, Jp), dtype),
            pltpu.VMEM((2, (kt + b_halo) if not b_is_zero else 1, Ip, Jp), dtype),
            pltpu.VMEM((2, kt, Ip, Jp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(18 if color is None else 9) * lk * li * lj,
            bytes_accessed=(2 if b_is_zero else 3) * Kp * Ip * Jp * itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        # in-place block update (input 1 = xhp): safe via the hazard fence
        input_output_aliases={1: 0},
        interpret=interpret,
    )

    def sweep(xhp, bhp, offs):
        out, r2 = call(offs, xhp, bhp)
        return out, r2[0, 0]

    sweep.kt = kt
    return sweep
