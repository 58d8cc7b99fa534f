"""Temporally-blocked red-black SOR: TWO full iterations per HBM pass.

The single-iteration fused kernel (sweeps.py) is already at the
one-iteration speed-of-light (read x + write x with the RHS skipped).  This
kernel halves the traffic per iteration by keeping a second, lagged
iteration window resident in VMEM while the K-slab pipeline streams through
the cube once:

    tile t (t = 0..T, one drain tile past the T input tiles):
      W1_t = x1 (iteration n+1) rows [t*kt-2, (t+1)*kt-2)   in true K rows
      W2_t = x2 (iteration n+2) rows [t*kt-4, (t+1)*kt-4)   (lag 2)

x1 rows are carried 4-deep in VMEM between tiles, so W2_t's red-black pair
has exactly the x1 neighborhood it needs.  Per PAIR of iterations: one read
of x, one write of x — ~1 HBM pass per iteration, 2x the single-iteration
speed-of-light.

The per-row arithmetic is identical to sweeps.py's fused RB pair, so field
values are bitwise-equal to two single sweeps (residual partial sums group
differently — roundoff-level).  Constant coefficients, zero inner RHS only
(the reference Laplace problem); other configurations use the
single-iteration kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweeps import _masked_delta, _round_up, choose_kt


def _masks(rows, Ip, Jp, K, I, J, k_start, offset):
    """Like sweeps._iota_masks but safe for k_start down to -19 (deepest
    n-iterations-per-pass window, n <= 9)."""
    k1 = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + jnp.asarray(
        k_start, jnp.int32
    )
    inner_k = (k1 >= 1) & (k1 <= K - 2)
    ij_i = jax.lax.broadcasted_iota(jnp.int32, (1, Ip, Jp), 1)
    ij_j = jax.lax.broadcasted_iota(jnp.int32, (1, Ip, Jp), 2)
    inner_ij = (ij_i >= 1) & (ij_i <= I - 2) & (ij_j >= 1) & (ij_j <= J - 2)
    inner = inner_k & inner_ij
    two = jnp.asarray(2, jnp.int32)
    kpar = jax.lax.rem(k1 + (offset + 21), two)  # +21 keeps the arg >= 0
    ijpar = jax.lax.rem(ij_i + ij_j, two)
    par = jax.lax.rem(kpar + ijpar, two)
    return inner, par == 0, par == 1


def _rb_pair(xfull, k0_ext, bv, *, K, I, J, Ip, Jp, offset, omega, dtype):
    """One full red-black iteration on ``xfull``: color 0 on the middle
    rows (xfull[1:-1], first middle row has true K index ``k0_ext``), then
    color 1 on the center of that.  Returns (x_new center rows,
    r2_color0_center, r2_color1) — center = xfull rows [2, -2).  The
    interleaved pipeline is zero-RHS only (``bv`` unused; the packed
    layout's pair streams a RHS, rbpack._rb_pair_packed)."""
    del bv
    rows = xfull.shape[0] - 2
    inner, c0, c1 = _masks(rows, Ip, Jp, K, I, J, k0_ext, offset)
    x0, dp0 = _masked_delta(xfull, inner & c0, None, omega, dtype)
    x1, dp1 = _masked_delta(x0, (inner & c1)[1:-1], None, omega, dtype)
    dpc = dp0[1:-1].astype(jnp.float32)
    dpf = dp1.astype(jnp.float32)
    return x1, jnp.sum(dpc * dpc), jnp.sum(dpf * dpf)


def _sweep2x_kernel(
    xp_ref, *args,
    K, IP, Jp, kt, pair_fn, n_tabs, has_b,
):
    """Generic two-iterations-per-pass pipeline over (rows, IP, Jp) slabs.

    ``pair_fn(xv, k0_mid, bv, *tab_refs) -> (x_center, r2_c0, r2_c1)``
    runs one full RB iteration on slab ``xv``: colors on the middle rows
    (``xv[1:-1]``, first middle row has true K index ``k0_mid``), returning
    the center rows ``xv[2:-2]`` updated.  ``bv`` is None without a RHS;
    with ``has_b`` it carries kt+2 RHS rows aligned with the middle rows.
    Interleaved layout uses _rb_pair; the packed layout (rbpack.py) plugs
    in its dense pair.  ``n_tabs`` resident VMEM table inputs (e.g. MAF
    metric tables) follow the streamed inputs and are handed to pair_fn.

    RHS streaming: slab row s of ``bs`` holds true row t*kt - 5 + s
    (padded-array row t*kt - 3 + s), covering BOTH windows: W1 (lag 0)
    reads slab rows [2, kt+4), W2 (lag 2) rows [0, kt+2).  Edge tiles
    copy only the in-bounds span (t=0: padded [0, kt+3) -> slab [3, .);
    drain tile: padded [K-3, K+4) -> slab [0, 7)); rows outside the span
    are stale VMEM, but every row a pair actually *keeps* is masked on
    true bounds, and jnp.where SELECTS, so garbage never propagates."""
    if has_b:
        bp_ref = args[0]
        args = args[1:]
    tab_refs = args[:n_tabs]
    if has_b:
        (out_ref, r2_ref, xs, x1s, outs, bs,
         in_sems, out_sems, b_sems) = args[n_tabs:]
    else:
        bs = b_sems = None
        (out_ref, r2_ref, xs, x1s, outs, in_sems, out_sems) = args[n_tabs:]
    t = pl.program_id(0)
    T = K // kt  # input tiles; the grid runs T+1 steps to drain the lag
    two = jnp.asarray(2, t.dtype)
    slot = jax.lax.rem(t, two)
    nslot = jax.lax.rem(t + 1, two)
    dtype = xs.dtype

    # x0 slab for tile t: rows s in [0, kt+4) hold true rows t*kt - 4 + s
    # (padded-array rows t*kt - 2 + s); rows [0, 4) are carried over.
    def in0_dma(s):  # tile 0: padded rows [0, kt+2) -> slab rows [2, kt+4)
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(0, kt + 2)], xs.at[s, pl.ds(2, kt + 2)],
            in_sems.at[s],
        )

    def in_dma(s, idx):  # tiles 1..T-1: padded rows [idx*kt+2, +kt)
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(idx * kt + 2, kt)], xs.at[s, pl.ds(4, kt)],
            in_sems.at[s],
        )

    # x2 output buffer rows [0, kt) hold W2_t = padded rows [t*kt-2, +kt)
    def out_dma0(s):  # tile 0: clip to padded rows [0, kt-2)
        return pltpu.make_async_copy(
            outs.at[s, pl.ds(2, kt - 2)], out_ref.at[pl.ds(0, kt - 2)],
            out_sems.at[s],
        )

    def out_dma(s, idx):  # tiles 1..T-1: padded rows [idx*kt-2, +kt)
        return pltpu.make_async_copy(
            outs.at[s], out_ref.at[pl.ds(idx * kt - 2, kt)], out_sems.at[s]
        )

    def out_dmaT(s):  # drain tile: padded rows [K-2, K+4) (6 rows)
        return pltpu.make_async_copy(
            outs.at[s, pl.ds(0, 6)], out_ref.at[pl.ds(K - 2, 6)],
            out_sems.at[s],
        )

    # RHS slab DMAs (see docstring for the row map); only the in-bounds
    # span moves on the edge tiles
    def b_dma(s, idx):
        return pltpu.make_async_copy(
            bp_ref.at[pl.ds(idx * kt - 3, kt + 6)], bs.at[s], b_sems.at[s]
        )

    def b_dma0(s):
        return pltpu.make_async_copy(
            bp_ref.at[pl.ds(0, kt + 3)], bs.at[s, pl.ds(3, kt + 3)],
            b_sems.at[s],
        )

    def b_dmaT(s):
        return pltpu.make_async_copy(
            bp_ref.at[pl.ds(K - 3, 7)], bs.at[s, pl.ds(0, 7)], b_sems.at[s]
        )

    # one dispatcher for both .start() and .wait() so the two sides can
    # never select different descriptors for the same (slot, idx).  The
    # interior span only exists on multi-tile grids (T >= 2); with one
    # tile its kt+6-row slice would exceed the K+4-row operand when traced.
    def b_io(s, idx, op):
        @pl.when(idx == 0)
        def _():
            op(b_dma0(s))

        if T >= 2:

            @pl.when((idx > 0) & (idx < T))
            def _():
                op(b_dma(s, idx))

        @pl.when(idx >= T)
        def _():
            op(b_dmaT(s))

    def b_start(s, idx):
        b_io(s, idx, lambda d: d.start())

    def b_wait(s, idx):
        b_io(s, idx, lambda d: d.wait())

    # ---- input pipeline ----------------------------------------------------
    if has_b:

        @pl.when(t == 0)
        def _():
            b_start(0, 0)

        @pl.when(t + 1 <= T)
        def _():
            b_start(nslot, t + 1)

    @pl.when(t == 0)
    def _():
        in0_dma(0).start()
        in0_dma(0).wait()
        # slab rows [0, 2) sit below the padded array; finite zeros
        xs[0, 0:2] = jnp.zeros((2, IP, Jp), dtype)

    @pl.when((t > 0) & (t < T))
    def _():
        in_dma(slot, t).wait()

    # carry the slab head from the previous slab's tail (same true rows),
    # including into the drain tile (whose W1 window tops out the cube)
    @pl.when((t > 0) & (slot == 0))
    def _():
        xs[0, 0:4] = xs[1, kt : kt + 4]

    @pl.when((t > 0) & (slot == 1))
    def _():
        xs[1, 0:4] = xs[0, kt : kt + 4]

    @pl.when((t + 1 < T) & (t > 0))
    def _():
        in_dma(nslot, t + 1).start()

    if T > 1:
        @pl.when(t == 0)
        def _():
            in_dma(nslot, 1).start()

    # ---- iteration n+1 on W1_t ---------------------------------------------
    # x1 buffer rows [0, 4) carry true rows [t*kt-6, t*kt-2);
    # rows [4, kt+4) receive W1_t (true rows [t*kt-2, (t+1)*kt-2))
    @pl.when(slot == 0)
    def _():
        x1s[0, 0:4] = x1s[1, kt : kt + 4]

    @pl.when((slot == 1) & (t > 0))
    def _():
        x1s[1, 0:4] = x1s[0, kt : kt + 4]

    if has_b:
        b_wait(slot, t)
    xv = xs[slot]
    bv1 = bs[slot, 2 : kt + 4] if has_b else None
    x1_mid, r2a, r2b = pair_fn(xv, t * kt - 3, bv1, *tab_refs)
    x1s[slot, 4 : kt + 4] = x1_mid
    r2_ref[t, 0] = r2a
    r2_ref[t, 1] = r2b

    # ---- iteration n+2 on W2_t (lag 2 rows) --------------------------------
    # drain the out slot last used two tiles ago before overwriting it
    @pl.when(t == 2)
    def _():
        out_dma0(slot).wait()

    @pl.when(t > 2)
    def _():
        out_dma(slot, t - 2).wait()

    x1v = x1s[slot]
    bv2 = bs[slot, 0 : kt + 2] if has_b else None
    x2_mid, r2c, r2d = pair_fn(x1v, t * kt - 5, bv2, *tab_refs)
    outs[slot] = x2_mid
    r2_ref[t, 2] = r2c
    r2_ref[t, 3] = r2d

    @pl.when(t == 0)
    def _():
        out_dma0(0).start()

    @pl.when((t > 0) & (t < T))
    def _():
        out_dma(slot, t).start()

    # ---- drain tile --------------------------------------------------------
    @pl.when(t == T)
    def _():
        out_dmaT(slot).start()
        out_dmaT(slot).wait()

    if T >= 2:
        @pl.when(t == T)
        def _():
            out_dma(nslot, T - 1).wait()
    else:
        @pl.when(t == T)
        def _():
            out_dma0(nslot).wait()


def _sweepnx_kernel(
    xp_ref, *args,
    K, IP, Jp, kt, n, pair_fn, n_tabs,
):
    """Generic n-iterations-per-pass pipeline (zero-RHS configurations).

    Generalizes :func:`_sweep2x_kernel`'s two windows to a chain of ``n``:
    buffer ``w`` (w = 0 the streamed x0 slab, w = 1..n-1 VMEM-resident
    iteration windows) holds rows s <-> true K rows ``t*kt - 2w - 4 + s``,
    each carried 4 rows deep between tiles; window ``w``'s red-black pair
    runs at ``k0_mid = t*kt - 2w - 1`` and its center output feeds buffer
    ``w`` (or, for w = n, the output pipeline at row lag ``2(n-1)``).  Per
    PASS of the cube: one read + one write of x for ``n`` full iterations.
    The RHS-streaming configuration (the BiCGSTAB preconditioner) stays on
    the 2x pipeline: its fixed 8-sweep count is not divisible by 3, and
    the b-slab row map would need the same generalization for no headline
    benefit (the reference problem's inner RHS is zero, cz_Evaluate.cpp).

    Validity at the edges follows the 2x argument verbatim: every row a
    window *keeps* is masked on true bounds inside pair_fn, boundary rows
    (k = 0, K-1) pass through every window unchanged (their updates are
    masked, so they stay the streamed Dirichlet values), and garbage rows
    (true k < 0 or > K-1, carried-from-uninitialized at t = 0) are only
    ever read by updates of masked rows, so they never propagate.  Row
    coverage: window n updates all inner rows iff kt > 2n - 2, and the
    drain tile's clipped write takes 2(n-1)+4 rows from the kt-row out
    buffer — so the builders enforce kt >= max(8, 2n + 2).
    """
    tab_refs = args[:n_tabs]
    rest = args[n_tabs:]
    out_ref, r2_ref, xs = rest[0], rest[1], rest[2]
    bufs = rest[3 : 3 + (n - 1)]
    outs, in_sems, out_sems = rest[3 + (n - 1) :]
    t = pl.program_id(0)
    T = K // kt
    two = jnp.asarray(2, t.dtype)
    slot = jax.lax.rem(t, two)
    nslot = jax.lax.rem(t + 1, two)
    dtype = xs.dtype
    lag = 2 * (n - 1)

    # ---- x0 input pipeline (identical to _sweep2x_kernel) -------------------
    def in0_dma(s):  # tile 0: padded rows [0, kt+2) -> slab rows [2, kt+4)
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(0, kt + 2)], xs.at[s, pl.ds(2, kt + 2)],
            in_sems.at[s],
        )

    def in_dma(s, idx):  # tiles 1..T-1: padded rows [idx*kt+2, +kt)
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(idx * kt + 2, kt)], xs.at[s, pl.ds(4, kt)],
            in_sems.at[s],
        )

    # output buffer rows [0, kt) hold padded rows [t*kt - lag, +kt)
    def out_dma0(s):  # tile 0: clip to padded rows [0, kt-lag)
        return pltpu.make_async_copy(
            outs.at[s, pl.ds(lag, kt - lag)], out_ref.at[pl.ds(0, kt - lag)],
            out_sems.at[s],
        )

    def out_dma(s, idx):  # tiles 1..T-1: padded rows [idx*kt-lag, +kt)
        return pltpu.make_async_copy(
            outs.at[s], out_ref.at[pl.ds(idx * kt - lag, kt)], out_sems.at[s]
        )

    def out_dmaT(s):  # drain tile: padded rows [K-lag, K+4)
        return pltpu.make_async_copy(
            outs.at[s, pl.ds(0, lag + 4)], out_ref.at[pl.ds(K - lag, lag + 4)],
            out_sems.at[s],
        )

    @pl.when(t == 0)
    def _():
        in0_dma(0).start()
        in0_dma(0).wait()
        xs[0, 0:2] = jnp.zeros((2, IP, Jp), dtype)

    @pl.when((t > 0) & (t < T))
    def _():
        in_dma(slot, t).wait()

    @pl.when((t > 0) & (slot == 0))
    def _():
        xs[0, 0:4] = xs[1, kt : kt + 4]

    @pl.when((t > 0) & (slot == 1))
    def _():
        xs[1, 0:4] = xs[0, kt : kt + 4]

    @pl.when((t + 1 < T) & (t > 0))
    def _():
        in_dma(nslot, t + 1).start()

    if T > 1:
        @pl.when(t == 0)
        def _():
            in_dma(nslot, 1).start()

    # ---- window chain --------------------------------------------------------
    prev = xs
    for w in range(1, n + 1):
        if w < n:
            bw = bufs[w - 1]

            # carry the 4-row head from the other slot's tail (same true
            # rows); at t=0 the copy reads uninitialized VMEM — harmless,
            # those rows sit below the cube and only feed masked updates
            @pl.when(slot == 0)
            def _(bw=bw):
                bw[0, 0:4] = bw[1, kt : kt + 4]

            @pl.when((slot == 1) & (t > 0))
            def _(bw=bw):
                bw[1, 0:4] = bw[0, kt : kt + 4]

        if w == n:
            # drain the out slot last used two tiles ago before overwriting
            @pl.when(t == 2)
            def _():
                out_dma0(slot).wait()

            @pl.when(t > 2)
            def _():
                out_dma(slot, t - 2).wait()

        x_mid, r2a, r2b = pair_fn(prev[slot], t * kt - 2 * w - 1, None,
                                  *tab_refs)
        if w < n:
            bw[slot, 4 : kt + 4] = x_mid
            prev = bw
        else:
            outs[slot] = x_mid
        r2_ref[t, 2 * (w - 1)] = r2a
        r2_ref[t, 2 * w - 1] = r2b

    # ---- output pipeline -----------------------------------------------------
    @pl.when(t == 0)
    def _():
        out_dma0(0).start()

    @pl.when((t > 0) & (t < T))
    def _():
        out_dma(slot, t).start()

    @pl.when(t == T)
    def _():
        out_dmaT(slot).start()
        out_dmaT(slot).wait()

    if T >= 2:
        @pl.when(t == T)
        def _():
            out_dma(nslot, T - 1).wait()
    else:
        @pl.when(t == T)
        def _():
            out_dma0(nslot).wait()


def build_nx(pair_fn, K, IP, Jp, kt, dtype, n, *, flops, vmem_limit_bytes,
             interpret, tables=(), dyn_smem_shapes=(), dyn_vmem_count=0):
    """pallas_call for the n-iterations-per-pass pipeline over
    (K+4, IP, Jp) zero-RHS state (see _sweepnx_kernel).  Returns a callable
    ``xp -> (xp_new, r2)`` with r2 of shape (T+1, 2n) — per-tile partial
    sums of the n iterations' two colors.

    ``dyn_smem_shapes``: shapes of per-call dynamic scalar inputs (int32,
    SMEM) handed to pair_fn as refs BEFORE the resident ``tables`` — the
    distributed per-block form (dist_rbpack.py) passes its traced global
    offsets this way.  ``dyn_vmem_count``: per-call dynamic whole-array
    VMEM inputs after the SMEM ones (the distributed MAF metric tables,
    dynamic-sliced per block in the shard_map body).  With any dynamic
    inputs the returned callable takes ``(xp, *dyn) -> (xp_new, r2)``."""
    itemsize = jnp.dtype(dtype).itemsize
    T = K // kt
    if kt < max(8, 2 * n + 2) or K % kt:
        raise ValueError(f"kt={kt} unusable for n={n} (need kt >= "
                         f"{max(8, 2 * n + 2)} and kt | K)")
    kern = functools.partial(
        _sweepnx_kernel, K=K, IP=IP, Jp=Jp, kt=kt, n=n, pair_fn=pair_fn,
        n_tabs=len(dyn_smem_shapes) + dyn_vmem_count + len(tables),
    )
    scratch = [pltpu.VMEM((2, kt + 4, IP, Jp), dtype)]  # x0 slabs
    scratch += [
        pltpu.VMEM((2, kt + 4, IP, Jp), dtype) for _ in range(n - 1)
    ]  # iteration windows (+4-row carry)
    scratch += [
        pltpu.VMEM((2, kt, IP, Jp), dtype),  # outputs
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    inner = pl.pallas_call(
        kern,
        grid=(T + 1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(shp, (lambda t, _nd=len(shp): (0,) * _nd),
                         memory_space=pltpu.SMEM)
            for shp in dyn_smem_shapes
        ]
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
            for _ in range(dyn_vmem_count)
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in tables],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K + 4, IP, Jp), dtype),
            jax.ShapeDtypeStruct((T + 1, 2 * n), jnp.float32),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * K * IP * Jp * itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        # In-place update (see sweeps.py): the final-window write for tile
        # t covers padded rows [t*kt - 2(n-1), +kt) — at least a 2-row lag
        # behind the input pipeline's furthest outstanding read.
        input_output_aliases={0: 0},
        interpret=interpret,
    )
    if dyn_smem_shapes or dyn_vmem_count:
        return lambda xp, *dyn: inner(xp, *dyn, *tables)
    if not tables:
        return inner
    return lambda xp: inner(xp, *tables)


def build_2x(pair_fn, K, IP, Jp, kt, dtype, *, flops, vmem_limit_bytes,
             interpret, tables=(), has_b=False):
    """pallas_call for the two-iterations-per-pass pipeline over
    (K+4, IP, Jp) state; shared by the interleaved and packed layouts.
    ``tables``: resident VMEM side inputs appended to the call and handed
    to pair_fn as refs (the caller closes over the actual arrays).
    ``has_b``: stream a (K+4, IP, Jp) RHS alongside the state (the
    returned callable takes (xp, bp)); both pair windows read it from one
    double-buffered kt+6-row slab."""
    itemsize = jnp.dtype(dtype).itemsize
    T = K // kt
    kern = functools.partial(
        _sweep2x_kernel, K=K, IP=IP, Jp=Jp, kt=kt, pair_fn=pair_fn,
        n_tabs=len(tables), has_b=has_b,
    )
    scratch = [
        pltpu.VMEM((2, kt + 4, IP, Jp), dtype),   # x0 slabs
        pltpu.VMEM((2, kt + 4, IP, Jp), dtype),   # x1 windows (+carry)
        pltpu.VMEM((2, kt, IP, Jp), dtype),       # x2 outputs
    ]
    if has_b:
        scratch.append(pltpu.VMEM((2, kt + 6, IP, Jp), dtype))  # b slabs
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if has_b:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    inner = pl.pallas_call(
        kern,
        grid=(T + 1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + ([pl.BlockSpec(memory_space=pl.ANY)] if has_b else [])
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in tables],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K + 4, IP, Jp), dtype),
            jax.ShapeDtypeStruct((T + 1, 4), jnp.float32),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(3 if has_b else 2) * K * IP * Jp * itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        # In-place update (see sweeps.py): the x2 write for tile t covers
        # padded rows [t*kt-2, t*kt+kt-2) — a 4-row lag behind the input
        # pipeline, whose furthest outstanding read starts at (t+1)*kt+2.
        input_output_aliases={0: 0},
        interpret=interpret,
    )
    if has_b:
        return lambda xp, bp: inner(xp, bp, *tables)
    if not tables:
        return inner
    return lambda xp: inner(xp, *tables)


def make_fused_sweep2x(
    shape,
    dtype=jnp.float32,
    *,
    omega: float,
    offset: int = 0,
    kt: int | None = None,
    vmem_limit_bytes: int = 100 << 20,
    interpret: bool = False,
):
    """Build ``pair_step(xp, bp) -> (xp2, r2_pair)`` over pad_k2 state:
    two full sor2sma iterations per call; r2_pair is a (2,) vector of the
    two iterations' residual sums.  Constant coefficients, zero inner RHS
    (bp accepted and ignored).  None if no viable tiling."""
    K, I, J = shape
    Ip, Jp = _round_up(I, 8), _round_up(J, 128)
    itemsize = jnp.dtype(dtype).itemsize
    if kt is None:
        kt = choose_kt((K, Ip, Jp), itemsize, halo=8, kt_cap=32)
    if kt is None or K % kt or kt < 8:
        return None
    T = K // kt

    pair_fn = functools.partial(
        _rb_pair, K=K, I=I, J=J, Ip=Ip, Jp=Jp, offset=int(offset),
        omega=float(omega), dtype=dtype,
    )
    call = build_2x(
        pair_fn, K, Ip, Jp, kt, dtype,
        flops=2 * 18 * K * I * J,
        vmem_limit_bytes=vmem_limit_bytes, interpret=interpret,
    )

    def pair_step(xp, bp):
        del bp
        out, r2 = call(xp)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        r2 = r2.astype(acc)
        return out, jnp.stack(
            [jnp.sum(r2[:, 0] + r2[:, 1]), jnp.sum(r2[:, 2] + r2[:, 3])]
        )

    pair_step.kt = kt
    pair_step.iters_per_call = 2
    return pair_step
