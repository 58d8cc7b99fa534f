"""Production distributed sor2sma: packed-RB blocks, deep-halo exchange,
communication-avoiding temporal blocking.

One step runs ``n`` full red-black iterations:

    exchange ghost depth h = 2n on each SPLIT mesh axis
    (one slab-ppermute phase per split axis, sequential)
    -> one Pallas window-chain call per block (dist_rbpack.py — the
       serial production kernel family, rbpack/sweeps2x)
    -> psum of the (n,) owned-residual vector.

Owned cells are bitwise the serial n-iteration result (deep-halo
redundant compute; see dist_rbpack.py's correctness argument), so
iteration counts and histories equal the serial production path on ANY
mesh — the reference's same-kernel-per-rank property
(cz_Poisson.cpp:194-215) plus a communication schedule it lacks: one
exchange per n iterations instead of per color.

Unsplit axes carry no ghosts (dist_rbpack.py's per-axis cost model: a
J split pays 128-lane rounding, so production divisions keep Y whole —
auto_division_packed in decomp.py).  Exchange order Z -> X -> Y, each
phase sending slabs that span the FULL extent of the already-refreshed
axes, so edge and corner ghost regions (which deep-halo windows DO
read, unlike width-1 face exchange) fill transitively with fresh
two/three-hop values.  All slabs are verbatim slices of the packed
arrays — see dist_rbpack.py's layout argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from ..core.problem import Problem
from ..pallas_kernels import dist_rbpack
from .dist_fused import _block_shape
from .mesh import AXES, CubeMesh, FIELD_SPEC


def _perm_up(n):
    return [(i, i - 1) for i in range(1, n)]


def _perm_down(n):
    return [(i, i + 1) for i in range(n - 1)]


def exchange_ghosts_packed(xp, block_shape, hs, I2e, I2ep):
    """Ghost refresh on one extended packed block (inside shard_map),
    depth ``hs[ax]`` per axis (0 = unsplit, skipped).  ppermute fills
    zeros at mesh edges — the out-of-domain ring the masked kernels
    expect (nID<0 analog)."""
    lk, li, lj = block_shape
    hz, hx, hy = hs

    def permute(lo, hi, mesh_ax):
        n = lax.axis_size(mesh_ax)
        # my high ghost <- +axis neighbor's low slab, and vice versa
        ghost_hi = lax.ppermute(lo, mesh_ax, _perm_up(n))
        ghost_lo = lax.ppermute(hi, mesh_ax, _perm_down(n))
        return ghost_lo, ghost_hi

    # A depth on a SIZE-1 mesh axis needs no refresh at all: the ring was
    # zeroed at pack time (out-of-domain), masked updates preserve center
    # values bitwise, so it stays zero — and XLA fuses a zeros-DUS into a
    # full-array rewrite, which is exactly the pass this skip saves.
    # (Size-1 axes are normally unsplit anyway; this arises when a 1-chip
    # mesh runs the multi-chip layout for rate measurement.)
    # ---- Z: packed K rows (el_k + 2) -----------------------------------
    if hz and lax.axis_size("z") > 1:
        gl, gh = permute(
            xp[hz + 2 : 2 * hz + 2], xp[lk + 2 : lk + hz + 2], "z"
        )
        xp = xp.at[2 : hz + 2].set(gl)
        xp = xp.at[lk + hz + 2 : lk + 2 * hz + 2].set(gh)

    # ---- X: whole pair-rows, R and B halves concatenated ---------------
    if hx and lax.axis_size("x") > 1:
        hh = hx // 2
        lo = jnp.concatenate(
            [xp[:, hh:hx], xp[:, I2ep + hh : I2ep + hx]], axis=1
        )
        hi = jnp.concatenate(
            [
                xp[:, li // 2 : (li + hx) // 2],
                xp[:, I2ep + li // 2 : I2ep + (li + hx) // 2],
            ],
            axis=1,
        )
        gl, gh = permute(lo, hi, "x")
        xp = xp.at[:, 0:hh].set(gl[:, :hh])
        xp = xp.at[:, I2ep : I2ep + hh].set(gl[:, hh:])
        xp = xp.at[:, (li + hx) // 2 : I2e].set(gh[:, :hh])
        xp = xp.at[:, I2ep + (li + hx) // 2 : I2ep + I2e].set(gh[:, hh:])

    # ---- Y: lanes ------------------------------------------------------
    if hy and lax.axis_size("y") > 1:
        gl, gh = permute(
            xp[:, :, hy : 2 * hy], xp[:, :, lj : lj + hy], "y"
        )
        xp = xp.at[:, :, 0:hy].set(gl)
        xp = xp.at[:, :, hy + lj : lj + 2 * hy].set(gh)
    return xp


def to_packed_state(cmesh: CubeMesh, arr, hs, offset: int = 0):
    """Global (K, I, J) array -> sharded extended-packed block state."""
    _block_shape(cmesh, arr.shape)  # validate divisibility
    fn = shard_map(
        lambda xb: dist_rbpack.pack_ext_block(xb, hs, offset),
        mesh=cmesh.mesh, in_specs=(FIELD_SPEC,), out_specs=FIELD_SPEC,
    )
    return fn(cmesh.shard(arr))


def from_packed_state(cmesh: CubeMesh, state, gshape, hs, offset: int = 0):
    bs = _block_shape(cmesh, gshape)
    fn = shard_map(
        lambda xp: dist_rbpack.unpack_ext_block(xp, bs, hs, offset),
        mesh=cmesh.mesh, in_specs=(FIELD_SPEC,), out_specs=FIELD_SPEC,
    )
    return fn(state)


def make_dist_packed_step(
    problem: Problem,
    cmesh: CubeMesh,
    omega: float,
    *,
    n: int | None = None,
    offset: int = 0,
    interpret: bool | None = None,
    split=None,
):
    """Build ``step(xstate, bstate) -> (xstate_new, r2_vec)`` on packed
    block states (see to_packed_state; bstate is accepted and ignored —
    zero-RHS configuration).  ``n`` pins the window depth; default picks
    the deepest that fits (the serial production dispatch order).
    ``split`` overrides the per-axis ghost flags (default: derived from
    the mesh division; an override lets a 1-chip mesh run the exact
    multi-chip layout for per-chip rate measurement).  MAF problems run
    the packed MAF update with per-block dynamic-sliced metric tables.
    None when the configuration doesn't apply (dtype/RHS/odd blocks/no
    tiling)."""
    g = problem.grid
    if g.dtype != jnp.float32 or not problem.rhs_is_inner_zero():
        return None
    bs = _block_shape(cmesh, g.shape_kij)
    lk, li, lj = bs
    if split is None:
        split = tuple(d > 1 for d in cmesh.div)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kern = None
    # MAF pair update is VPU-bound (BENCH_RESULTS): prefer shallow windows.
    # Const prefers the deepest window that sizes: measured v5e at a 256^3
    # zx-split block, n=5 (kt=12) 165.6 us/iter vs n=4 (kt=17) 172.5 —
    # plus one exchange per 5 iterations instead of 4 on a real mesh;
    # n=6 (kt=14, raised 118-124 MB limits) REGRESSES to 211-215 us/iter
    # (window-chain VMEM pressure forces the small kt), so the standard
    # budgets' refusal of n=6 there is correct, not a limitation
    # (scripts/exp_dist_n6.py).
    cand_n = [n] if n else ([2, 3, 4] if problem.mc is not None
                            else [6, 5, 4, 3, 2])
    for nx in cand_n:
        kern = dist_rbpack.make_dist_packed_sweepnx(
            bs, g.shape_kij, g.dtype, omega=omega, n=nx, split=split,
            offset=offset, mc=problem.mc, interpret=interpret,
        )
        if kern is not None:
            break
    if kern is None:
        return None
    hs = kern.hs
    _, _, _, I2e, I2ep, _ = dist_rbpack.ext_dims(bs, hs)

    def body(xp, bp):
        del bp
        k0 = lax.axis_index("z").astype(jnp.int32) * lk
        i0 = lax.axis_index("x").astype(jnp.int32) * li
        j0 = lax.axis_index("y").astype(jnp.int32) * lj
        offs = jnp.stack([k0, i0, j0]).reshape(1, 3)
        xp = exchange_ghosts_packed(xp, bs, hs, I2e, I2ep)
        if kern.maf:
            ti, tk = kern.block_tables(k0, i0, j0)
            xp, r2 = kern(xp, offs, ti, tk)
        else:
            xp, r2 = kern(xp, offs)
        return xp, lax.psum(r2, AXES)

    fn = shard_map(
        body,
        mesh=cmesh.mesh,
        in_specs=(FIELD_SPEC, FIELD_SPEC),
        out_specs=(FIELD_SPEC, P()),
        # pallas_call outputs carry no varying-mesh-axes annotation
        check_vma=False,
    )

    def step(x, b):
        return fn(x, b)

    step.iters_per_call = kern.iters_per_call
    step.hs = hs
    return step
