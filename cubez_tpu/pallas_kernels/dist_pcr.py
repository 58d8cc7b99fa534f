"""Block-local fused line-PCR for the distributed (shard_map) path.

Line-solver analog of dist_sweeps.py: each device holds its block in
**ghosted line layout** (li+2, lkp, ljp) — I leading (ghost columns at 0
and li+1), K on sublanes including the two K-ghost rows (extent lk+2,
padded to the 8-tile), J on lanes (ghost lanes at 0 and lj+1, padded to
the 128-tile).

K-lines stay block-local exactly like the reference's multi-rank line
solvers (SURVEY §2.5): each local line is extended with its two ghost rows
as **identity equations** (x_ghost = known) — algebraically the reference's
``d(kst) += x(kst-1)/6`` end fold (cz_solver.f90:578-579) — which also
makes rows on the physical Dirichlet faces identity rows, so one uniform
SPMD program serves boundary and interior blocks.  The identity
formulation makes the tridiagonal data-dependent, so the stages run the
variable-coefficient PCR recurrence in VMEM (same math as
parallel/dist.py's jnp ``line_solve``, which the tests compare against).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.tdma import num_stage
from .lines import batched_solve_const, batched_solve_maf
from .pcr import R6, _pcr_solve_var, _roll, choose_it
from .sweeps import _round_up


def line_block_layout(block_shape, gj: int = 1):
    """(lk, li, lj) -> per-block line state shape (li+2, lkp, ljp).

    ``gj`` is the J ghost-lane count per side: 1 on Y-split meshes, 0 on
    Y-unsplit meshes — there the wall columns themselves occupy lanes 0
    and lj-1, and dropping the ghost lanes keeps ljp at the 128 multiple
    of lj itself (128^3 blocks: 128 lanes instead of 256 — half the HBM
    traffic and dense-solve width of the ghosted layout)."""
    lk, li, lj = block_shape
    return (li + 2, _round_up(lk + 2, 8), _round_up(lj + 2 * gj, 128))


def pad_line_block(xb, gj: int = 1):
    """Local (lk, li, lj) block -> ghosted line state (li+2, lkp, ljp)."""
    lk, li, lj = xb.shape
    _, kp, jp = line_block_layout(xb.shape, gj)
    t = xb.transpose(1, 0, 2)  # (li, lk, lj)
    return jnp.pad(t, ((1, 1), (1, kp - lk - 1), (gj, jp - lj - gj)))


def unpad_line_block(xp, block_shape, gj: int = 1):
    lk, li, lj = block_shape
    return xp[1 : li + 1, 1 : lk + 1, gj : lj + gj].transpose(1, 0, 2)


def _dist_pcr_kernel(
    offs_ref, xp_ref, bp_ref, tki_ref, tkj_ref, tkk_ref,
    m1_ref, m2_ref, mu_ref,
    out_ref, r2_ref,
    xs, bs, outs, in_sems, b_sems, out_sems,
    *, gshape, lk, li, lj, Kp, Jp, it, omega, offset, color, b_is_zero, pn,
    maf, fastdiag, wzm0, wzpn, gjl
):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    two = jnp.asarray(2, t.dtype)
    slot = jax.lax.rem(t, two)
    nslot = jax.lax.rem(t + 1, two)
    dtype = xs.dtype
    Kg, Ig, Jg = gshape
    n = lk + 2  # line extent including the two ghost/identity rows

    def in_dma(s, idx):
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(idx * it, it + 2)], xs.at[s], in_sems.at[s]
        )

    def b_dma(s, idx):
        return pltpu.make_async_copy(
            bp_ref.at[pl.ds(idx * it + 1, it)], bs.at[s], b_sems.at[s]
        )

    def out_dma(s, idx):
        return pltpu.make_async_copy(
            outs.at[s], out_ref.at[pl.ds(idx * it + 1, it)], out_sems.at[s]
        )

    # in-place pipeline (see lines.py): tile t+1's first input row overlaps
    # out_dma(t)'s write range, so the next tile's in-DMA is awaited before
    # this tile's in-place out-DMA starts (hazard fence below)
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

    xv = xs[slot]  # (it+2, Kp, Jp)
    xc = xv[1:-1]
    # fastdiag solves over the full padded sublane extent (the dense
    # inverse/eigenbasis tables are zero outside the interior rows, so
    # pad rows cannot pollute the matmul); PCR recurs over the true
    # line extent only
    span = Kp if fastdiag else n
    xline = xc[:, :span, :]  # line extent: ghost, lk locals, ghost[, pad]

    k0g = offs_ref[0, 0]
    i0g = offs_ref[0, 1]
    j0g = offs_ref[0, 2]

    # update mask from global indices (ghost cols/lanes are never local);
    # xc column ci maps to state row t*it + ci + 1, i.e. local i = t*it + ci.
    # Lane c holds local j = c - gjl (gjl=0: no J ghost lanes, wall columns
    # in-state; the J rolls then wrap at the walls, but wall/pad lanes are
    # masked out of line_ok so the wrapped values never enter an update)
    ci = jax.lax.broadcasted_iota(jnp.int32, (it, 1, Jp), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (it, 1, Jp), 2)
    li_idx = ci + (t * it)
    gi = li_idx + i0g
    gj = cj - gjl + j0g
    line_ok = (
        (li_idx >= 0) & (li_idx <= li - 1)
        & (cj >= gjl) & (cj <= lj - 1 + gjl)
        & (gi >= 1) & (gi <= Ig - 2) & (gj >= 1) & (gj <= Jg - 2)
    )
    par = jax.lax.rem(
        gi + gj + jnp.asarray(offset + 4, jnp.int32), jnp.asarray(2, jnp.int32)
    )
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, span, 1), 1)
    gk = kidx - 1 + k0g  # line row 0 is the low ghost (global k0g-1)
    inner_k = (kidx >= 1) & (kidx <= lk) & (gk >= 1) & (gk <= Kg - 2)
    m = line_ok & inner_k  # rows that get the stencil equation

    zero = jnp.zeros((), dtype)
    r6 = jnp.asarray(R6, dtype)
    half = jnp.asarray(0.5, dtype)
    if maf:
        # variable (MAF) block-local tridiagonal: per-block metric tables
        # arrive pre-sliced from the shard_map body (block offsets are
        # traced there); math mirrors parallel/dist.py line_solve_maf
        # (cz_maf.f90:519-572 normalized by dw).  The fastdiag form keeps
        # the serial rblines normalization instead (no dw; the
        # eigen-tables absorb it).
        ti = tki_ref[pl.ds(t * it + 1, it)]  # (it, 2, Jp): c1, c7 per line
        c1 = ti[:, 0:1, :]
        c7 = ti[:, 1:2, :]
        c2 = tkj_ref[0][None]  # (1, 1, Jp)
        c8 = tkj_ref[1][None]
        trans = (
            (c1 + half * c7) * xv[2:, :span, :]
            + (c1 - half * c7) * xv[:-2, :span, :]
            + (c2 + half * c8) * _roll(xline, -1, 2)
            + (c2 - half * c8) * _roll(xline, 1, 2)
        )
        if fastdiag:
            d = trans if b_is_zero else trans - bs[slot][:, :span, :]
            # Dirichlet K-face folds (serial rblines convention): the
            # wall rows gk=0 / gk=Kg-1 sit at line rows 1 / lk (K is
            # unsplit in this mode)
            d = d + jnp.where(
                kidx == 2, jnp.asarray(wzm0, dtype) * xline[:, 1:2, :],
                zero,
            )
            d = d + jnp.where(
                kidx == lk - 1,
                jnp.asarray(wzpn, dtype) * xline[:, lk : lk + 1, :], zero,
            )
            d = jnp.where(m, d, zero)
        else:
            c3 = tkk_ref[0][None, :span, :]  # (1, n, Jp) line extent
            c9 = tkk_ref[1][None, :span, :]
            dw = half / (c1 + c2 + c3)
            rhs = trans * dw if b_is_zero else (
                (trans - bs[slot][:, :span, :]) * dw
            )
            a = jnp.where(m, -(c3 - half * c9) * dw, zero)
            c = jnp.where(m, -(c3 + half * c9) * dw, zero)
            d = jnp.where(m, rhs, xline)
    else:
        trans = (
            xv[2:, :span, :]
            + xv[:-2, :span, :]
            + _roll(xline, -1, 2)
            + _roll(xline, 1, 2)
        )
        if b_is_zero:
            rhs = trans * r6
        else:
            rhs = (trans - bs[slot][:, :span, :]) * r6
        if fastdiag:
            rhs = rhs + jnp.where(
                kidx == 2, xline[:, 1:2, :] * r6, zero
            )
            rhs = rhs + jnp.where(
                kidx == lk - 1, xline[:, lk : lk + 1, :] * r6, zero
            )
            d = jnp.where(m, rhs, zero)
        else:
            # identity equations (x = current value) on every non-stencil
            # row: ghosts, physical-boundary rows, and non-line columns
            a = jnp.where(m, -r6, zero)
            c = jnp.where(m, -r6, zero)
            d = jnp.where(m, rhs, xline)

    if fastdiag:
        if maf:
            # lambda(i, j) = 2 (c1_i + c2_j) — separable, so it comes
            # straight from the per-block metric rows/lanes already
            # in VMEM (fastdiag.maf_lambda_table semantics)
            lam_t = 2.0 * (c1 + c2)  # (it, 1, Jp)
            sol = batched_solve_maf(
                m1_ref[:], m2_ref[:], mu_ref[:],
                [lam_t[r] for r in range(it)], d, Jp, dtype,
            )
        else:
            sol = batched_solve_const(m1_ref[:], d, Jp, dtype)
    else:
        sol = _pcr_solve_var(a, c, d, pn)

    upd = m if color is None else m & (par == color)
    dp = jnp.where(upd, (sol - xline) * omega, zero)

    # aliasing hazard fence: the next tile's input rows must be in VMEM
    # before the in-place write begins
    @pl.when(t + 1 < T)
    def _():
        in_dma(nslot, t + 1).wait()

    @pl.when(t >= 2)
    def _():
        out_dma(slot, t - 2).wait()

    # pass pad K-sublanes through unchanged (fastdiag spans them already,
    # with masked-zero dp there)
    if fastdiag:
        outs[slot] = xline + dp
    else:
        outs[slot] = jnp.concatenate([xline + dp, xc[:, n:, :]], axis=1)
    out_dma(slot, t).start()

    dpf = dp.astype(jnp.float32)
    r2_ref[0, 0] += jnp.sum(dpf * dpf)

    @pl.when(t == T - 1)
    def _():
        out_dma(slot, t).wait()

    @pl.when((t == T - 1) & (t >= 1))
    def _():
        out_dma(nslot, t - 1).wait()


def make_block_pcr(
    block_shape,
    gshape,
    dtype=jnp.float32,
    *,
    omega: float,
    color: int | None = None,
    offset: int = 0,
    it: int | None = None,
    b_is_zero: bool = False,
    maf: bool = False,
    mc=None,
    solver: str = "pcr",
    gj: int = 1,
    vmem_limit_bytes: int = 100 << 20,
    interpret: bool = False,
):
    """Build ``sweep(xp, bp, offs[, tki, tkj, tkk]) -> (xp_new, r2_local)``
    on the block line state; ``offs`` = (1,3) int32 global (k0, i0, j0).
    ``color`` as in the serial fused PCR.  None if no viable I tiling.

    ``maf=True`` switches to the variable-coefficient MAF line solve; the
    caller passes per-block metric tables (built in the shard_map body —
    block offsets are traced there; see dist_fused.make_dist_fused_step):
    tki (li+2, 2, Jp) c1/c7 rows, tkj (2, 1, Jp) c2/c8 lanes,
    tkk (2, Kp, Jp) c3/c9 over the ghost-extended line extent.

    ``solver``: 'pcr' runs the variable-coefficient PCR stage recurrence
    over the identity-extended local line (depth num_stage(lk+2), any
    mesh — matches parallel/dist.py's jnp line_solve bit-for-bit).
    'fastdiag' is the MXU production form for K-UNSPLIT meshes (lk must
    equal the global K): every block's lines span the full K extent, so
    the serial kernels' dense-inverse / fast-diagonalization solve
    (lines.py / rblines.py, cz_solver.f90:497-662 semantics) applies per
    block unchanged — one precomputed (Kp, Kp) eigen/inverse operand and
    batched MXU matmuls replace the log2(n) stage rounds.  'fastdiag'
    with maf requires ``mc`` (the global MafCoeffs) for the host-side
    eigendecomposition.

    ``gj``: J ghost-lane count per side (line_block_layout).  Pass 0 on
    Y-unsplit meshes — the wall columns sit in-state and the lane extent
    drops to the 128-multiple of lj itself (128-lane blocks keep 128
    lanes instead of 256: half the HBM traffic and dense-solve width).
    The caller's state must be packed with the same ``gj``
    (pad_line_block / dist_fused.to_line_block_state derive it from the
    mesh division).
    """
    import numpy as np

    from ..ops import fastdiag as fd_ops

    lk, li, lj = block_shape
    Ip, Kp, Jp = line_block_layout(block_shape, gj)
    if lk < 1:
        return None
    fastdiag = solver == "fastdiag"
    n_int = lk - 2
    if fastdiag and (lk != gshape[0] or n_int < 2 or (maf and mc is None)):
        return None
    itemsize = jnp.dtype(dtype).itemsize
    if it is None:
        it = choose_it((Kp, li, Jp), itemsize)
    if it is None or li % it:
        return None
    T = li // it
    pn = num_stage(lk + 2)

    npdt = np.dtype(dtype)
    dummy2 = jnp.zeros((8, 128), dtype)
    wzm0 = wzpn = 0.0
    m1 = m2 = mu_t = dummy2
    if fastdiag:
        # interior line system at sublane rows [2, lk): line row r holds
        # global k = r - 1, interior k in [1, Kg-2]
        def place(mat):
            out = np.zeros((Kp, Kp), np.float64)
            out[2:lk, 2:lk] = mat
            return jnp.asarray(out.astype(npdt))

        if maf:
            V, Vi, mu = fd_ops.maf_line_diag(mc, n_int, np.float64)
            m1 = place(V)
            m2 = place(Vi)
            mu_np = np.ones((Kp, Jp), np.float64)
            mu_np[2:lk, :] = mu[:, None]
            mu_t = jnp.asarray(mu_np.astype(npdt))
            wzm, wzp, _d2, _li2, _lj2 = fd_ops.maf_line_coeffs(mc, n_int)
            wzm0, wzpn = float(wzm[0]), float(wzp[-1])
        else:
            m1 = place(fd_ops.const_line_inverse(n_int, np.float64))

    kern = functools.partial(
        _dist_pcr_kernel,
        gshape=tuple(gshape),
        lk=lk,
        li=li,
        lj=lj,
        Kp=Kp,
        Jp=Jp,
        it=it,
        omega=float(omega),
        offset=int(offset),
        color=color,
        b_is_zero=bool(b_is_zero),
        pn=pn,
        maf=maf,
        fastdiag=fastdiag,
        wzm0=wzm0,
        wzpn=wzpn,
        gjl=int(gj),
    )

    call = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda t: (0, 0), memory_space=pltpu.SMEM),
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
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((li + 2, Kp, Jp), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, it + 2, Kp, Jp), dtype),
            pltpu.VMEM((2, it, Kp if not b_is_zero else 1, Jp), dtype),
            pltpu.VMEM((2, it, Kp, Jp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(
                int(2 * Kp * Kp * Jp) * it * (2 if maf else 1) * T
                + 20 * lk * li * lj
            )
            if fastdiag
            else int((6 + 42 * (pn - 1) + 21) * lk * li * lj),
            bytes_accessed=(2 if b_is_zero else 3) * Ip * Kp * Jp * itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        # in-place block update (input 1 = xp): safe via the hazard fence
        input_output_aliases={1: 0},
        interpret=interpret,
    )

    _dti = jnp.zeros((1, 2, Jp), dtype)
    _dtj = jnp.zeros((2, 1, Jp), dtype)
    _dtk = jnp.zeros((2, 8, Jp), dtype)

    def sweep(xp, bp, offs, tki=None, tkj=None, tkk=None):
        out, r2 = call(
            offs, xp, bp,
            _dti if tki is None else tki,
            _dtj if tkj is None else tkj,
            _dtk if tkk is None else tkk,
            m1, m2, mu_t,
        )
        return out, r2[0, 0]

    sweep.it = it
    sweep.solver = solver
    sweep.gj = int(gj)
    return sweep
