"""Distributed solver steps with per-block fused Pallas sweeps.

The production multi-chip path: state lives as one ghosted-padded block per
device (pallas_kernels/dist_sweeps.py layout), an iteration is

    refresh 6 ghost planes (lax.ppermute per mesh axis, width 1)
    -> one fused block sweep (speed-of-light, both RB colors in one pass)
    -> psum the residual,

which is exactly the reference's multi-rank skeleton — kernel, Comm_S(X,1),
Comm_SUM_1 (cz_Poisson.cpp:39-79) — with the kernel at per-chip roofline.
Red-black halo cadence is selectable (see make_dist_fused_step): per-color
exchange (serial-equivalent, default) or the reference's single exchange
per iteration (cz_Poisson.cpp:194-215).

The jnp steps in parallel/dist.py remain as the portable/reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from ..core.problem import Problem
from ..pallas_kernels.dist_pcr import (
    make_block_pcr,
    pad_line_block,
    unpad_line_block,
)
from ..pallas_kernels.dist_sweeps import make_block_sweep, pad_block, unpad_block
from .mesh import AXES, CubeMesh, FIELD_SPEC


def _block_shape(cmesh: CubeMesh, gshape):
    dz, dx, dy = cmesh.div
    nk, ni, nj = gshape
    if nk % dz or ni % dx or nj % dy:
        raise ValueError(f"grid {gshape} not divisible by mesh {cmesh.div}")
    return (nk // dz, ni // dx, nj // dy)


def to_block_state(cmesh: CubeMesh, arr):
    """Global (K, I, J) array -> sharded ghosted-padded block state."""
    _block_shape(cmesh, arr.shape)  # validate divisibility
    fn = shard_map(
        pad_block, mesh=cmesh.mesh, in_specs=(FIELD_SPEC,), out_specs=FIELD_SPEC
    )
    return fn(cmesh.shard(arr))


def from_block_state(cmesh: CubeMesh, state, gshape):
    bs = _block_shape(cmesh, gshape)
    fn = shard_map(
        lambda xp: unpad_block(xp, bs),
        mesh=cmesh.mesh,
        in_specs=(FIELD_SPEC,),
        out_specs=FIELD_SPEC,
    )
    return fn(state)


def _refresh_ghosts(xp, block_shape):
    """Write fresh width-1 ghost planes from the mesh neighbors into the
    padded block (zeros at physical boundaries, like CBrick's absent
    neighbors nID<0)."""
    lk, li, lj = block_shape
    # (array axis, mesh axis, low-local-index, high-local-index)
    # local data spans [2, lk+2) on K and [1, li+1) on I/J
    spans = [
        (0, "z", 2, lk + 1, 1, lk + 2),
        (1, "x", 1, li, 0, li + 1),
        (2, "y", 1, lj, 0, lj + 1),
    ]
    for ax, mesh_ax, lo_dat, hi_dat, lo_gst, hi_gst in spans:
        n = lax.axis_size(mesh_ax)
        idx = [slice(None)] * 3
        idx[ax] = lo_dat
        lo_face = xp[tuple(idx)]
        idx[ax] = hi_dat
        hi_face = xp[tuple(idx)]
        if n == 1:
            ghost_hi = jnp.zeros_like(lo_face)
            ghost_lo = jnp.zeros_like(hi_face)
        else:
            ghost_hi = lax.ppermute(
                lo_face, mesh_ax, [(i, i - 1) for i in range(1, n)]
            )
            ghost_lo = lax.ppermute(
                hi_face, mesh_ax, [(i, i + 1) for i in range(n - 1)]
            )
        idx[ax] = lo_gst
        xp = xp.at[tuple(idx)].set(ghost_lo)
        idx[ax] = hi_gst
        xp = xp.at[tuple(idx)].set(ghost_hi)
    return xp


def _collect_ghosts(xp, block_shape):
    """All six width-1 ghost planes from the mesh neighbors, gathered from
    the CURRENT block faces with NO writes in between — the collect half
    of the halo/compute overlap split (every ppermute is data-independent
    of the interior sweep, so XLA's latency-hiding scheduler runs the
    collectives while the kernel computes).  Edge/corner parts of the
    planes are stale sender-side ghosts, which no width-1 7-pt consumer
    reads (NOFACE=6 semantics, CB_Define_stub.h:31-35)."""
    lk, li, lj = block_shape
    spans = [
        (0, "z", 2, lk + 1, 1, lk + 2),
        (1, "x", 1, li, 0, li + 1),
        (2, "y", 1, lj, 0, lj + 1),
    ]
    out = []
    for ax, mesh_ax, lo_dat, hi_dat, lo_gst, hi_gst in spans:
        n = lax.axis_size(mesh_ax)
        idx = [slice(None)] * 3
        idx[ax] = lo_dat
        lo_face = xp[tuple(idx)]
        idx[ax] = hi_dat
        hi_face = xp[tuple(idx)]
        if n == 1:
            ghost_hi = jnp.zeros_like(lo_face)
            ghost_lo = jnp.zeros_like(hi_face)
        else:
            ghost_hi = lax.ppermute(
                lo_face, mesh_ax, [(i, i - 1) for i in range(1, n)]
            )
            ghost_lo = lax.ppermute(
                hi_face, mesh_ax, [(i, i + 1) for i in range(n - 1)]
            )
        out.append((ax, lo_gst, hi_gst, ghost_lo, ghost_hi))
    return out


def _write_ghosts(xp, ghosts):
    for ax, lo_gst, hi_gst, ghost_lo, ghost_hi in ghosts:
        idx = [slice(None)] * 3
        idx[ax] = lo_gst
        xp = xp.at[tuple(idx)].set(ghost_lo)
        idx[ax] = hi_gst
        xp = xp.at[tuple(idx)].set(ghost_hi)
    return xp


def _line_gj(cmesh: CubeMesh) -> int:
    """J ghost-lane count for the line layout: 0 on Y-unsplit meshes (the
    wall columns sit in-state; halves the lane extent of 128-lane blocks),
    1 otherwise (dist_pcr.line_block_layout)."""
    return 1 if cmesh.div[2] > 1 else 0


def to_line_block_state(cmesh: CubeMesh, arr):
    """Global (K, I, J) array -> sharded ghosted line-layout block state
    (for the distributed fused line solvers)."""
    _block_shape(cmesh, arr.shape)
    gj = _line_gj(cmesh)
    fn = shard_map(
        lambda xb: pad_line_block(xb, gj),
        mesh=cmesh.mesh, in_specs=(FIELD_SPEC,),
        out_specs=FIELD_SPEC,
    )
    return fn(cmesh.shard(arr))


def from_line_block_state(cmesh: CubeMesh, state, gshape):
    bs = _block_shape(cmesh, gshape)
    gj = _line_gj(cmesh)
    fn = shard_map(
        lambda xp: unpad_line_block(xp, bs, gj),
        mesh=cmesh.mesh,
        in_specs=(FIELD_SPEC,),
        out_specs=FIELD_SPEC,
    )
    return fn(state)


def _refresh_ghosts_line(xp, block_shape, gj: int = 1):
    """Ghost refresh for the line layout (li+2, Kp, Jp): I on the leading
    axis, K on sublanes (ghosts at 1-based rows 0 / lk+1), J on lanes.
    ``gj=0`` (Y-unsplit layout) carries no J ghost lanes — the J span is
    skipped entirely (writing it would clobber the in-state wall
    columns)."""
    lk, li, lj = block_shape
    spans = [
        (0, "x", 1, li, 0, li + 1),
        (1, "z", 1, lk, 0, lk + 1),
    ]
    if gj:
        spans.append((2, "y", 1, lj, 0, lj + 1))
    for ax, mesh_ax, lo_dat, hi_dat, lo_gst, hi_gst in spans:
        n = lax.axis_size(mesh_ax)
        idx = [slice(None)] * 3
        idx[ax] = lo_dat
        lo_face = xp[tuple(idx)]
        idx[ax] = hi_dat
        hi_face = xp[tuple(idx)]
        if n == 1:
            ghost_hi = jnp.zeros_like(lo_face)
            ghost_lo = jnp.zeros_like(hi_face)
        else:
            ghost_hi = lax.ppermute(
                lo_face, mesh_ax, [(i, i - 1) for i in range(1, n)]
            )
            ghost_lo = lax.ppermute(
                hi_face, mesh_ax, [(i, i + 1) for i in range(n - 1)]
            )
        idx[ax] = lo_gst
        xp = xp.at[tuple(idx)].set(ghost_lo)
        idx[ax] = hi_gst
        xp = xp.at[tuple(idx)].set(ghost_hi)
    return xp


def make_dist_fused_overlap_step(
    problem: Problem,
    cmesh: CubeMesh,
    omega: float,
    *,
    b_is_zero: bool = False,
    interpret: bool | None = None,
):
    """sor2sma step with the halo exchange OVERLAPPED with the fused
    interior kernel — the capability the reference lacks (its loop is
    strictly kernel -> Comm_S -> allreduce, cz_Poisson.cpp:39-79).

    Per color: (1) gather all six ghost planes from the CURRENT faces
    (_collect_ghosts — data-independent of the sweep, so the ppermutes
    fly while the kernel runs); (2) fused block sweep with the one-cell
    local boundary shell masked off (dist_sweeps shrink_shell); (3) write
    the received ghosts; (4) recompute the six shell faces from the
    refreshed state with the kernel's exact arithmetic order.

    Equivalent to the sequential per-color path (sync='color') by
    construction: a color-c cell's seven stencil reads are all color 1-c
    or ghosts — none is touched by this color's kernel pass — so
    interior and shell both see exactly the synchronized values, and the
    shell patch replicates the kernel's operand order.  Measured
    agreement is 0-2 ulp (the XLA-fused patch and the Pallas kernel may
    contract multiply-adds differently), with identical iteration
    counts; residual partial sums group differently (interior kernel +
    disjoint face sums).  Constant coefficients, f32."""
    g = problem.grid
    if g.dtype != jnp.float32 or problem.mc is not None:
        return None
    gshape = g.shape_kij
    Kg, Ig, Jg = gshape
    bs = _block_shape(cmesh, gshape)
    lk, li, lj = bs
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kw = dict(omega=omega, b_is_zero=b_is_zero, interpret=interpret)
    sweeps = [
        make_block_sweep("sor2sma", bs, gshape, g.dtype, color=c,
                         shrink_shell=True, **kw)
        for c in (0, 1)
    ]
    if any(s is None for s in sweeps):
        return None
    dtype = g.dtype
    om = jnp.asarray(omega, dtype)
    r6 = jnp.asarray(1.0 / 6.0, dtype)

    # The six face windows partition the one-cell shell DISJOINTLY: K
    # faces take their whole plane, I faces drop the k-edges, J faces
    # drop k- and i-edges.  Disjointness is load-bearing, not just r2
    # accounting: the SOR update is not idempotent in the cell's own
    # value (x_new = (1-w)x + w*ss/6), so a cell patched by two
    # overlapping windows would be over-relaxed twice.
    def win_slices(axis, at_lo):
        starts = [2, 1, 1]
        sizes = [lk, li, lj]
        sl = [
            slice(starts[a], starts[a] + sizes[a]) for a in range(3)
        ]
        if axis >= 1:  # drop k-edges (owned by the K faces)
            sl[0] = slice(3, lk + 1)
        if axis == 2:  # drop i-edges (owned by the I faces)
            sl[1] = slice(2, li)
        pos = starts[axis] if at_lo else starts[axis] + sizes[axis] - 1
        sl[axis] = slice(pos, pos + 1)
        return sl

    def face_mask(sl, k0, i0, j0, color):
        shp = tuple(s.stop - s.start for s in sl)
        gk = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + (
            sl[0].start - 2 + k0
        )
        gi = jax.lax.broadcasted_iota(jnp.int32, shp, 1) + (
            sl[1].start - 1 + i0
        )
        gj = jax.lax.broadcasted_iota(jnp.int32, shp, 2) + (
            sl[2].start - 1 + j0
        )
        inner = (
            (gk >= 1) & (gk <= Kg - 2)
            & (gi >= 1) & (gi <= Ig - 2)
            & (gj >= 1) & (gj <= Jg - 2)
        )
        par = jax.lax.rem(gk + gi + gj + 1, jnp.asarray(2, jnp.int32))
        return inner & (par == color)

    def patch_face(xp, bp, k0, i0, j0, color, axis, at_lo):
        sl = win_slices(axis, at_lo)

        def nb(a, d):
            s = list(sl)
            s[a] = slice(s[a].start + d, s[a].stop + d)
            return xp[tuple(s)]

        xc = xp[tuple(sl)]
        # kernel add order (dist_sweeps._delta): k-1, k+1, i-1, i+1,
        # j-1, j+1 — bitwise parity with the fused sweep requires it
        ss = (
            nb(0, -1) + nb(0, 1) + nb(1, -1) + nb(1, 1)
            + nb(2, -1) + nb(2, 1)
        )
        if b_is_zero:
            upd = (ss * r6 - xc) * om
        else:
            upd = ((ss - bp[tuple(sl)]) * r6 - xc) * om
        mask = face_mask(sl, k0, i0, j0, color)
        dp = jnp.where(mask, upd, jnp.zeros((), dtype))
        xp = xp.at[tuple(sl)].set(xc + dp)
        dpf = dp.astype(jnp.float32)
        return xp, jnp.sum(dpf * dpf)

    def body(xp, bp):
        k0 = lax.axis_index("z").astype(jnp.int32) * lk
        i0 = lax.axis_index("x").astype(jnp.int32) * li
        j0 = lax.axis_index("y").astype(jnp.int32) * lj
        offs = jnp.stack([k0, i0, j0]).reshape(1, 3)
        r2 = jnp.zeros((), jnp.float32)
        for c, sweep in enumerate(sweeps):
            ghosts = _collect_ghosts(xp, bs)  # independent of the sweep
            xp, r2i = sweep(xp, bp, offs)     # interior, shell masked off
            xp = _write_ghosts(xp, ghosts)
            r2 = r2 + r2i
            for axis in (0, 1, 2):
                for at_lo in (True, False):
                    xp, r2f = patch_face(xp, bp, k0, i0, j0, c, axis, at_lo)
                    r2 = r2 + r2f
        return xp, lax.psum(r2, AXES)

    return shard_map(
        body,
        mesh=cmesh.mesh,
        in_specs=(FIELD_SPEC, FIELD_SPEC),
        out_specs=(FIELD_SPEC, P()),
        check_vma=False,
    )


def make_dist_fused_step(
    problem: Problem,
    cmesh: CubeMesh,
    kind: str,
    omega: float,
    *,
    b_is_zero: bool = False,
    sync: str = "color",
    interpret: bool | None = None,
):
    """step(xstate, bstate) -> (xstate_new, r2) on block states (see
    to_block_state).  kind: 'jacobi' | 'sor2sma'.

    ``sync`` (red-black only): 'color' exchanges ghosts before each color —
    serial-equivalent and unconditionally stable; 'iter' exchanges once per
    iteration with both colors fused in one kernel pass — the reference's
    multi-rank semantics (cz_Poisson.cpp:194-215), ~2x less HBM traffic,
    but measurably unstable at high omega with small blocks (we observed
    divergence at omega=1.5 on 16^3 blocks; the reference's Intel-MPI
    'wrong results' note, Readme.md:164, is consistent with this).

    None if no viable tiling."""
    g = problem.grid
    gshape = g.shape_kij
    bs = _block_shape(cmesh, gshape)
    lk, li, lj = bs
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    mc = problem.mc
    maf = mc is not None
    kw = dict(omega=omega, b_is_zero=b_is_zero, interpret=interpret)
    line = kind in ("pcr", "pcr_rb")
    if line:
        gj = _line_gj(cmesh)
        refresh = functools.partial(_refresh_ghosts_line, gj=gj)

        # K-unsplit meshes dispatch the block-local line solve through
        # the MXU fast-diagonalization form (the serial production
        # kernels' solve, lines.py/rblines.py) — block lines span the
        # full K extent so the dense eigen/inverse tables apply per
        # block unchanged; K-split meshes keep the identity-extended
        # PCR recurrence
        def _mk_line(c):
            s = None
            if cmesh.div[0] == 1:
                s = make_block_pcr(
                    bs, gshape, g.dtype, color=c, maf=maf, mc=mc,
                    solver="fastdiag", gj=gj, **kw,
                )
            if s is None:
                s = make_block_pcr(bs, gshape, g.dtype, color=c, maf=maf,
                                   gj=gj, **kw)
            return s

        if kind == "pcr_rb":
            sweeps = [_mk_line(c) for c in (0, 1)]
        else:
            sweeps = [_mk_line(None)]
    else:
        if maf:
            return None  # MAF point sweeps: explicit jnp dist step covers
        refresh = _refresh_ghosts
        if kind == "sor2sma" and sync == "color":
            sweeps = [
                make_block_sweep(kind, bs, gshape, g.dtype, color=c, **kw)
                for c in (0, 1)
            ]
        else:
            sweeps = [make_block_sweep(kind, bs, gshape, g.dtype, **kw)]
    if any(s is None for s in sweeps):
        return None

    if line and maf:
        # replicated padded global metric tables; each block dynamic-slices
        # its ghost-extended extent in the shard_map body (offsets are
        # traced there) and hands the slices to the kernel
        import numpy as np

        from ..pallas_kernels.dist_pcr import line_block_layout

        _, Kp, Jp = line_block_layout(bs, gj)
        npdt = np.dtype(g.dtype)
        Kg, Ig, Jg = gshape

        def pad1d(v, ng, fill):
            out = np.full(ng, fill, npdt)
            vv = np.asarray(v, npdt).reshape(-1)
            out[1 : 1 + len(vv)] = vv
            return out

        # entry p maps to global index p-1 (one ghost each side + slack)
        c1g = pad1d(mc.c1, Ig + 2, 1.0)
        c7g = pad1d(mc.c7, Ig + 2, 0.0)
        tki_g = jnp.asarray(
            np.broadcast_to(
                np.stack([c1g, c7g], axis=1)[:, :, None], (Ig + 2, 2, Jp)
            ).copy()
        )
        c2g = pad1d(mc.c2, Jg + 2 + Jp, 1.0)
        c8g = pad1d(mc.c8, Jg + 2 + Jp, 0.0)
        tkj_g = jnp.asarray(np.stack([c2g, c8g])[:, None, :])
        c3g = pad1d(mc.c3, Kg + 2 + Kp, 1.0)
        c9g = pad1d(mc.c9, Kg + 2 + Kp, 0.0)
        tkk_g = jnp.asarray(
            np.broadcast_to(
                np.stack([c3g, c9g])[:, :, None], (2, Kg + 2 + Kp, Jp)
            ).copy()
        )

        def block_tables():
            z0 = jnp.zeros((), jnp.int32)
            k0 = lax.axis_index("z").astype(jnp.int32) * lk
            i0 = lax.axis_index("x").astype(jnp.int32) * li
            j0 = lax.axis_index("y").astype(jnp.int32) * lj
            tki = lax.dynamic_slice(tki_g, (i0, z0, z0), (li + 2, 2, Jp))
            # lane c holds global j = j0 + c - gj; table entry p holds
            # global p - 1, so the slice starts at j0 + 1 - gj
            tkj = lax.dynamic_slice(
                tkj_g, (z0, z0, j0 + (1 - gj)), (2, 1, Jp)
            )
            tkk = lax.dynamic_slice(tkk_g, (z0, k0, z0), (2, Kp, Jp))
            return tki, tkj, tkk

    def body(xp, bp):
        offs = jnp.stack(
            [
                lax.axis_index("z").astype(jnp.int32) * lk,
                lax.axis_index("x").astype(jnp.int32) * li,
                lax.axis_index("y").astype(jnp.int32) * lj,
            ]
        ).reshape(1, 3)
        tabs = block_tables() if (line and maf) else ()
        r2 = jnp.zeros((), jnp.float32)
        for sweep in sweeps:
            xp = refresh(xp, bs)
            xp, r2c = sweep(xp, bp, offs, *tabs)
            r2 = r2 + r2c
        return xp, lax.psum(r2, AXES)

    return shard_map(
        body,
        mesh=cmesh.mesh,
        in_specs=(FIELD_SPEC, FIELD_SPEC),
        out_specs=(FIELD_SPEC, P()),
        # pallas_call outputs carry no varying-mesh-axes annotation
        check_vma=False,
    )
