"""Fused Pallas kernels for the line-PCR (LSOR) solver family.

One kernel invocation performs a complete line-relaxation pass: build the
tridiagonal RHS from the transverse stencil, run all PCR stages, invert the
final 2x2 pairs, and apply the masked omega-relaxation — entirely in VMEM.
The XLA path (ops/pcr.py) materializes d in HBM and re-streams it for each
of the log2(K) stages (~20 HBM passes per iteration); here an iteration is
~2-3 passes (read x [+ b], write x).

Reference kernels re-created: pcr / pcr_eda / pcr_esa / pcr_j_esa
(cz_solver.f90:666-1676, one full-plane line-Jacobi pass) and pcr_rb /
pcr_rb_esa (cz_solver.f90:497-662, red-black by line parity (i+j)%2).  Each
color is its own kernel invocation serialized through HBM, so color 1 sees
every color-0 line fully updated — exactly the serial reference semantics.

Layout: the line-solver state is **(I, K, J)** — K on the *sublane* axis so
every PCR stage shift is a native sublane rotate, J on the lane axis for the
transverse stencil's lane rolls, I tiled with overlap-by-2 slabs via manual
DMA (same scheme as sweeps.py; the cube state is transposed into this layout
once per solve, not per iteration).  Leading-axis (K-major) rolls were the
first design; Mosaic compile time explodes combinatorially on chained
leading-axis rolls of deep arrays, while the sublane form compiles in
seconds — this is why line solves want K on sublanes on TPU.

Stage-shift wraparound is harmless: at stride s the stage tables satisfy
a[k] = 0 for k < s and c[k] = 0 for k >= n - s (the zero-extension of
pcr_eda, cz_solver.f90:919-929), so wrapped (finite) values are multiplied
by exactly zero.  Tables are precomputed in float64 and streamed as one
(3*(pn-1)+3, n, J) lane-broadcast array (~1 MB; scalar-per-sublane
broadcasts from 1D tables would need lane-transposing reshapes, which
Mosaic rejects).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.tdma import num_stage

R6 = 1.0 / 6.0


def _round_up(v, m):
    return -(-v // m) * m


def to_line_layout(x):
    """(K, I, J) cube state -> I-padded (I+2, Kp, Jp) line-solver state with
    K/J rounded up to the (8, 128) tile (DMA slices must be tile-aligned on
    hardware; pad sublanes/lanes are inert — all consumers mask on true
    bounds)."""
    K, I, J = x.shape[-3], x.shape[-2], x.shape[-1]
    t = x.transpose(1, 0, 2)
    return jnp.pad(
        t, ((1, 1), (0, _round_up(K, 8) - K), (0, _round_up(J, 128) - J))
    )


def from_line_layout(xp, shape=None):
    """Inverse of to_line_layout; pass the true (K, I, J) ``shape`` for
    grids that needed K/J tile padding."""
    if shape is None:
        return xp[1:-1].transpose(1, 0, 2)
    K, I, J = shape
    return xp[1:-1, :K, :J].transpose(1, 0, 2)


def _roll(x, shift, axis):
    if shift < 0:
        shift += x.shape[axis]
    return pltpu.roll(x, shift=shift, axis=axis)


def build_tables(n: int, dtype=jnp.float32) -> np.ndarray:
    """Stage + final tables as one ((pn-1)*3 + 3, n) array.

    Rows 3p..3p+2 hold (a, c, e) of stage p (stride 2^p); the last 3 rows
    hold (c_lo, a_hi, jj) of the final 2x2 inversion, zero-padded from
    length s = 2^(pn-1) to n.  Evolved in float64 like build_pcr_plan.
    """
    pn = num_stage(n)

    def shift_np(v, d):
        out = np.zeros_like(v)
        if d > 0:
            out[:-d] = v[d:]
        elif d < 0:
            out[-d:] = v[:d]
        else:
            out[:] = v
        return out

    a = np.full(n, -R6, np.float64)
    c = np.full(n, -R6, np.float64)
    a[0] = 0.0
    c[-1] = 0.0
    rows = []
    for p in range(1, pn):
        s = 2 ** (p - 1)
        al, ar = shift_np(a, -s), shift_np(a, s)
        cl, cr = shift_np(c, -s), shift_np(c, s)
        e = 1.0 / (1.0 - a * cl - c * ar)
        rows += [a.copy(), c.copy(), e]
        a, c = -e * a * al, -e * c * cr

    s = 2 ** (pn - 1)
    a_hi = np.zeros(s)
    a_hi[: max(n - s, 0)] = a[s:]
    c_lo = c[:s].copy()
    jj = 1.0 / (1.0 - a_hi * c_lo)

    def padn(v):
        out = np.zeros(n)
        out[: v.shape[0]] = v
        return out

    rows += [padn(c_lo), padn(a_hi), padn(jj)]
    return np.asarray(rows, dtype=np.dtype(dtype))


def _pcr_solve(d, tab_ref, pn, n):
    """All PCR stages + final 2x2 on d (it, n, J); K is the sublane axis."""

    def trow(r):
        return tab_ref[r][None]  # (1, n, J), broadcasts over I

    for p in range(pn - 1):
        s = 2**p
        ap, cp, e = trow(3 * p), trow(3 * p + 1), trow(3 * p + 2)
        dl = _roll(d, -s, 1)  # d[k+s]; wrap killed by cp[k]=0 for k>=n-s
        dr = _roll(d, s, 1)  # d[k-s]; wrap killed by ap[k]=0 for k<s
        d = e * (d - ap * dr - cp * dl)

    s = 2 ** (pn - 1)
    fin = 3 * (pn - 1)
    c_lo, a_hi, jj = trow(fin), trow(fin + 1), trow(fin + 2)
    d_hi = _roll(d, -s, 1)  # rows [s,n) then wrap; wrap killed by c_lo/a_hi=0
    x_lo = (d - c_lo * d_hi) * jj  # valid sublanes [0, s)
    x_hi = (d_hi - a_hi * d) * jj  # valid sublanes [0, n-s)
    return jnp.concatenate([x_lo[:, :s], _roll(x_hi, s, 1)[:, s:]], axis=1)


def _pcr_solve_var(a, c, d, pn):
    """Variable-coefficient PCR stages + final 2x2 on (it, n, J) arrays
    (the in-VMEM pcr_reduce_var; zero-propagation of the a/c ends makes the
    roll wraparound multiply exactly zero at every stage)."""
    for p in range(pn - 1):
        s = 2**p
        al, cl, dl = _roll(a, s, 1), _roll(c, s, 1), _roll(d, s, 1)  # [k-s]
        ar, cr, dr = _roll(a, -s, 1), _roll(c, -s, 1), _roll(d, -s, 1)  # [k+s]
        e = 1.0 / (1.0 - a * cl - c * ar)
        a, c, d = -e * a * al, -e * c * cr, e * (d - a * dl - c * dr)

    s = 2 ** (pn - 1)
    d_hi = _roll(d, -s, 1)
    a_hi = _roll(a, -s, 1)
    jj = 1.0 / (1.0 - a_hi * c)
    x_lo = (d - c * d_hi) * jj
    x_hi = (d_hi - a_hi * d) * jj
    return jnp.concatenate([x_lo[:, :s], _roll(x_hi, s, 1)[:, s:]], axis=1)


def _pcr_kernel(
    xp_ref, bp_ref, tab_ref, tabi_ref, tabj_ref, tabk_ref, out_ref, r2_ref,
    xs, bs, outs, in_sems, b_sems, out_sems,
    *, K, I, J, Kp, Jp, it, omega, offset, color, b_is_zero, pn, maf
):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    two = jnp.asarray(2, t.dtype)
    slot = jax.lax.rem(t, two)
    nslot = jax.lax.rem(t + 1, two)
    dtype = xs.dtype
    n = K - 2  # inner line length

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

    @pl.when(t == 0)
    def _():
        in_dma(0, 0).start()
        if not b_is_zero:
            b_dma(0, 0).start()

    @pl.when(t + 1 < T)
    def _():
        in_dma(nslot, t + 1).start()
        if not b_is_zero:
            b_dma(nslot, t + 1).start()

    in_dma(slot, t).wait()
    if not b_is_zero:
        b_dma(slot, t).wait()

    xv = xs[slot]  # (it+2, Kp, Jp)
    xc = xv[1:-1]  # this tile's lines
    xin = xc[:, 1 : K - 1, :]  # inner K sublanes (true extent)
    i_start = t * it  # global i of xc line 0

    # line masks: inner (i, j) and (i + j + offset) parity
    gi = jax.lax.broadcasted_iota(jnp.int32, (it, 1, Jp), 0) + jnp.asarray(
        i_start, jnp.int32
    )
    gj = jax.lax.broadcasted_iota(jnp.int32, (it, 1, Jp), 2)
    inner_line = (gi >= 1) & (gi <= I - 2) & (gj >= 1) & (gj <= J - 2)
    par = jax.lax.rem(gi + gj + jnp.asarray(offset, jnp.int32), jnp.asarray(2, jnp.int32))

    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    zero = jnp.zeros((), dtype)
    xip = xv[2:, 1 : K - 1, :]  # x(i+1)
    xim = xv[:-2, 1 : K - 1, :]  # x(i-1)
    xjp = _roll(xin, -1, 2)  # x(j+1); lane wrap lands on masked j-boundary
    xjm = _roll(xin, 1, 2)
    bmid = None if b_is_zero else bs[slot][:, 1 : K - 1, :]

    if not maf:
        # transverse 4-neighbor source over inner K sublanes; boundary fold:
        # ends absorb the Dirichlet K-faces (cz_solver.f90:578-579) —
        # row-select via where (scatter/.at stores don't lower on TPU)
        trans = xip + xim + xjp + xjm
        d = trans * R6 if bmid is None else (trans - bmid) * R6
        d = d + jnp.where(kidx == 0, xc[:, 0:1, :] * R6, zero)
        d = d + jnp.where(kidx == n - 1, xc[:, K - 1 : K, :] * R6, zero)
        d = jnp.where(inner_line, d, zero)
        sol = _pcr_solve(d, tab_ref, pn, n)
    else:
        # variable (MAF) tridiagonal from the separable metric tables,
        # normalized to unit diagonal by dw = 0.5/(C1+C2+C3)
        # (build_line_system_maf / pcr_rb_maf, cz_maf.f90:519-572)
        ti = tabi_ref[pl.ds(t * it, it)]  # (it, 2, Jp)
        c1 = ti[:, 0:1, :]
        c7 = ti[:, 1:2, :]
        c2 = tabj_ref[0][None]
        c8 = tabj_ref[1][None]
        c3 = tabk_ref[0][None]
        c9 = tabk_ref[1][None]
        half = jnp.asarray(0.5, dtype)
        dw = half / (c1 + c2 + c3)
        wzm = (c3 - half * c9) * dw
        wzp = (c3 + half * c9) * dw
        ones = jnp.ones_like(xin)
        a = jnp.where(kidx == 0, zero, -wzm) * ones
        c = jnp.where(kidx == n - 1, zero, -wzp) * ones
        trans = (
            (c1 + half * c7) * xip
            + (c1 - half * c7) * xim
            + (c2 + half * c8) * xjp
            + (c2 - half * c8) * xjm
        )
        d = trans * dw if bmid is None else (trans - bmid) * dw
        d = d + jnp.where(kidx == 0, wzm * xc[:, 0:1, :], zero)
        d = d + jnp.where(kidx == n - 1, wzp * xc[:, K - 1 : K, :], zero)
        d = jnp.where(inner_line, d, zero)
        a = jnp.where(inner_line, a, zero)
        c = jnp.where(inner_line, c, zero)
        sol = _pcr_solve_var(a, c, d, pn)

    upd = inner_line if color is None else inner_line & (par == color)
    dp = jnp.where(upd, (sol - xin) * omega, zero)

    @pl.when(t >= 2)
    def _():
        out_dma(slot, t - 2).wait()

    # pass K-pad sublanes (if any) through unchanged
    parts = [xc[:, 0:1, :], xin + dp, xc[:, K - 1 : K, :]]
    if Kp > K:
        parts.append(xc[:, K:Kp, :])
    outs[slot] = jnp.concatenate(parts, axis=1)
    out_dma(slot, t).start()

    dpf = dp.astype(jnp.float32)
    # per-tile partial (own SMEM row per grid step); caller tree-sums in
    # f64 under x64 — matches the reference's double accumulators in effect
    r2_ref[t, 0] = jnp.sum(dpf * dpf)

    @pl.when(t == T - 1)
    def _():
        out_dma(slot, t).wait()

    @pl.when((t == T - 1) & (t >= 1))
    def _():
        out_dma(nslot, t - 1).wait()


def _round_up(v, m):
    return -(-v // m) * m


def choose_it(shape, itemsize=4, max_vmem_bytes=64 << 20, it_cap=32):
    """Largest divisor of I (<= it_cap) whose total VMEM footprint fits.

    Model: double-buffered input slabs 2*(it+2) lines + outputs 2*it +
    PCR temporaries ~6*it lines of (K, J) each, K/J padded to (8, 128)."""
    K, I, J = shape
    line = _round_up(K, 8) * _round_up(J, 128) * itemsize  # bytes per line
    best = None
    for it in range(1, min(I, it_cap) + 1):
        if I % it:
            continue
        total = (2 * (it + 2) + 2 * it + 6 * it) * line
        if total <= max_vmem_bytes:
            best = it
    return best


def make_fused_pcr(
    shape,
    dtype=jnp.float32,
    *,
    omega: float,
    color: int | None = None,
    offset: int = 0,
    it: int | None = None,
    b_is_zero: bool = False,
    mc=None,
    vmem_limit_bytes: int = 100 << 20,
    interpret: bool = False,
):
    """Build ``pass_(xp, bp) -> (xp_new, r2)`` over line-layout state
    (shape (I+2, K, J); see :func:`to_line_layout`).

    ``color=None`` is the full-plane line-Jacobi pass (reference pcr /
    pcr_eda / pcr_esa / pcr_j_esa); color 0/1 updates only lines with
    (i + j + offset) % 2 == color (reference pcr_rb).  ``mc`` (MafCoeffs)
    switches to the variable-coefficient MAF line solve (pcr_*_maf family).
    Returns None if no viable I tiling exists.
    """
    K, I, J = shape
    n = K - 2
    if n < 1:
        return None
    Kp, Jp = _round_up(K, 8), _round_up(J, 128)
    itemsize = jnp.dtype(dtype).itemsize
    if it is None:
        it = choose_it((Kp, I, Jp), itemsize)
    if it is None or I % it:
        return None
    T = I // it
    pn = num_stage(n)
    maf = mc is not None

    if maf:
        npdt = np.dtype(dtype)
        tables = jnp.zeros((1, 8, Jp), dtype)  # unused in the MAF branch

        def lane(v, m):
            return np.broadcast_to(
                np.asarray(v, npdt).reshape(m)[:, None], (m, Jp)
            )

        tabi = jnp.asarray(
            np.stack([lane(mc.c1, I), lane(mc.c7, I)], axis=1)
        )  # (I, 2, Jp)
        tabj_np = np.zeros((2, 1, Jp), npdt)
        tabj_np[0, 0, :J] = np.asarray(mc.c2, npdt).reshape(J)
        tabj_np[1, 0, :J] = np.asarray(mc.c8, npdt).reshape(J)
        # pad lanes 1.0 on c2 so dw stays finite there (values masked)
        tabj_np[0, 0, J:] = 1.0
        tabj = jnp.asarray(tabj_np)
        c3v = np.asarray(mc.c3, npdt).reshape(K)[1 : K - 1]
        c9v = np.asarray(mc.c9, npdt).reshape(K)[1 : K - 1]
        tabk = jnp.asarray(
            np.stack(
                [np.broadcast_to(c3v[:, None], (n, Jp)),
                 np.broadcast_to(c9v[:, None], (n, Jp))]
            )
        )  # (2, n, Jp)
    else:
        tab_np = build_tables(n, dtype)  # (rows, n)
        tables = jnp.asarray(
            np.broadcast_to(tab_np[:, :, None], tab_np.shape + (Jp,))
        )
        tabi = jnp.zeros((it, 2, Jp), dtype)
        tabj = jnp.zeros((2, 1, Jp), dtype)
        tabk = jnp.zeros((2, 8, Jp), dtype)

    kern = functools.partial(
        _pcr_kernel,
        K=K,
        I=I,
        J=J,
        Kp=Kp,
        Jp=Jp,
        it=it,
        omega=float(omega),
        offset=int(offset),
        color=color,
        b_is_zero=bool(b_is_zero),
        pn=pn,
        maf=maf,
    )

    flops = int((6 + (42 if maf else 14) * (pn - 1) + 9 + 12) * K * I * J)
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
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((I + 2, Kp, Jp), dtype),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
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
            flops=flops, bytes_accessed=passes * K * I * J * itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )

    def pass_(xp, bp):
        out, r2 = call(xp, bp, tables, tabi, tabj, tabk)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return out, jnp.sum(r2.astype(acc))

    pass_.it = it
    return pass_


def make_fused_pcr_step(
    kind: str,
    shape,
    dtype=jnp.float32,
    *,
    omega: float,
    offset: int = 0,
    it: int | None = None,
    b_is_zero: bool = False,
    mc=None,
    interpret: bool = False,
):
    """step(xp, bp) -> (xp_new, r2) for 'pcr' (full plane) or 'pcr_rb'
    (both colors, serial-equivalent); ``mc`` selects the MAF variant.
    None if no viable tiling."""
    kw = dict(
        omega=omega, offset=offset, it=it, b_is_zero=b_is_zero, mc=mc,
        interpret=interpret,
    )
    if kind == "pcr":
        return make_fused_pcr(shape, dtype, color=None, **kw)
    if kind == "pcr_rb":
        p0 = make_fused_pcr(shape, dtype, color=0, **kw)
        p1 = make_fused_pcr(shape, dtype, color=1, **kw)
        if p0 is None or p1 is None:
            return None

        def step(xp, bp):
            xp, r0 = p0(xp, bp)
            xp, r1 = p1(xp, bp)
            return xp, r0 + r1

        step.it = p0.it
        return step
    raise ValueError(kind)


# kept as the public pad/unpad names used by solvers/api.py
pad_i1 = to_line_layout
unpad_i1 = from_line_layout
