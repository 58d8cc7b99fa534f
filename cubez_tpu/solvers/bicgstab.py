"""Preconditioned BiCGSTAB (CZ::PBiCGSTAB, cz_Poisson.cpp:332-504).

The whole Krylov loop runs on-device in one ``lax.while_loop``; dot products
lower to tree reductions (and to psum all-reduces under sharding, the analog
of Fdot1/Fdot2 + Comm_SUM_1, cz_Poisson.cpp:239-270).

The preconditioner is a fixed 8 sweeps of the selected inner solver with no
convergence check (lc_max = 8, cz_Poisson.cpp:280); "none" copies b
(cz_Poisson.cpp:320).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import Problem
from ..ops import blas
from ..ops import maf as maf_ops
from . import steps as steps_mod
from .driver import SolveResult, _res_dtype, fixed_sweeps

FLT_MIN = float(np.finfo(np.float32).tiny)  # rho breakdown (cz_Poisson.cpp:379)
PRECOND_SWEEPS = 8


def _fused_precon(problem: Problem, precond: str, omega: float, impl: str,
                  cmesh=None):
    """Fused-Pallas 8-sweep preconditioner when eligible, else None.

    With ``cmesh`` the preconditioner runs the fused PER-BLOCK distributed
    sweeps (dist_fused): the Krylov vectors stay plain sharded fields and
    are converted to/from ghosted block state around the 8 sweeps."""
    import jax

    if impl == "jnp" or problem.grid.dtype != jnp.float32:
        return None
    kind, p_maf = steps_mod.parse_name(precond)
    if p_maf:
        return None
    on_tpu = jax.default_backend() == "tpu"
    if impl != "pallas" and not on_tpu:
        return None
    interpret = not on_tpu
    g = problem.grid
    if kind not in ("jacobi", "sor2sma", "pcr", "pcr_rb"):
        return None

    if cmesh is not None:
        from ..parallel import dist_fused

        step = dist_fused.make_dist_fused_step(
            problem, cmesh, kind, omega, interpret=interpret
        )
        if step is None:
            return None
        line = kind in ("pcr", "pcr_rb")
        to_state = (
            dist_fused.to_line_block_state if line else dist_fused.to_block_state
        )
        from_state = (
            dist_fused.from_line_block_state
            if line
            else dist_fused.from_block_state
        )

        def precon_dist(bb):
            bp = to_state(cmesh, bb)
            xp = fixed_sweeps(step, jnp.zeros_like(bp), bp, PRECOND_SWEEPS)
            return from_state(cmesh, xp, g.shape_kij)

        return precon_dist

    from .fused_cache import get_fused_step, pad_unpad

    # allow_pair=False under interpret: see get_fused_step
    step = get_fused_step(kind, g, omega, None, interpret,
                          allow_pair=not interpret)
    pad, unpad = pad_unpad(kind, g, step)
    if step is None:
        return None

    def precon(bb):
        bp = pad(bb)
        xp = fixed_sweeps(step, jnp.zeros_like(bp), bp, PRECOND_SWEEPS)
        return unpad(xp)

    return precon


def make_bicgstab(
    problem: Problem, name: str, omega_accel: float, precond: str | None,
    impl: str = "auto", cmesh=None,
):
    """Returns run(x0, b, itr_max, eps) -> (x, itr, res, hist).

    ``cmesh``: distributed mode — blas ops run auto-SPMD on the sharded
    Krylov vectors (dots lower to psum all-reduces) while the
    preconditioner uses the fused per-block sweeps."""
    _, is_maf = steps_mod.parse_name(name)
    g = problem.grid
    msk = problem.msk
    mc, pvt = problem.mc, problem.pvt

    if is_maf:
        ax = lambda p: maf_ops.calc_ax_maf(p, msk, mc, pvt)
        rk = lambda p, b: maf_ops.calc_rk_maf(p, b, msk, mc, pvt)
    else:
        ax = lambda p: blas.calc_ax(p, msk)
        rk = lambda p, b: blas.calc_rk(p, b, msk)

    if precond and precond.lower() not in ("none", "copy"):
        # one V-cycle is the canonical multigrid preconditioner (extension;
        # the reference's fixed-8 rule applies to its single-level sweeps).
        # "fmg" as a preconditioner means the same thing: the F-cycle is a
        # solve-level INITIALIZER (and is affine in b through its BC
        # shells — not a linear operator), so it maps to one V-cycle too.
        # "fd" (exact fast-diagonalization inverse) is likewise one
        # application.  All three run at the smoothing omega = 1.0.
        p_is_mg = steps_mod.parse_name(precond)[0] in ("mg", "fmg", "fd")
        if p_is_mg:
            precond = precond.replace("fmg", "mg")
        nsw = 1 if p_is_mg else PRECOND_SWEEPS
        precon = _fused_precon(problem, precond, omega_accel, impl, cmesh)
        if precon is None:
            pstep = steps_mod.make_step(
                problem, precond, 1.0 if p_is_mg else omega_accel,
                b_arg_is_problem_rhs=False,
            )
            precon = lambda bb: fixed_sweeps(
                pstep, jnp.zeros_like(bb), bb, nsw
            )
    else:
        precon = lambda bb: bb  # default: copy (cz_Poisson.cpp:320)

    dot1 = lambda v: blas.dot1(v, msk)
    dot2 = lambda v, w: blas.dot2(v, w, msk)

    @partial(jax.jit, static_argnames=("itr_max",))
    def run(x0, b, itr_max: int, eps: float, res_normal: float):
        rdt = _res_dtype()
        dt = x0.dtype
        hist0 = jnp.zeros((itr_max,), rdt)

        r = rk(x0, b)
        r0 = r
        q = jnp.zeros_like(x0)
        p = jnp.zeros_like(x0)

        def cond(st):
            (x, r, p, q, itr, res, rho_old, alpha, omega, hist, stop) = st
            return jnp.logical_and(
                itr < itr_max,
                jnp.logical_and(
                    jnp.logical_not(stop), jnp.logical_or(itr == 0, res >= eps)
                ),
            )

        def body(st):
            (x, r, p, q, itr, res, rho_old, alpha, omega, hist, stop) = st
            rho = dot2(r, r0)
            breakdown = jnp.abs(rho) < FLT_MIN

            def advance(op):
                x, r, p, q, itr, res, alpha, omega, hist = op
                beta = rho / rho_old * alpha / omega
                p = jnp.where(
                    itr == 0, r, blas.bicg_1(p, r, q, beta, omega, msk)
                )
                p_ = precon(p)
                q = ax(p_)
                den_q = dot2(q, r0)
                alpha = rho / jnp.where(jnp.abs(den_q) < FLT_MIN, 1.0, den_q)
                s = blas.triad(q, r, -alpha, msk)
                s_ = precon(s)
                t_ = ax(s_)
                den_t = dot1(t_)
                omega = dot2(t_, s) / jnp.where(den_t < FLT_MIN, 1.0, den_t)
                x = blas.bicg_2(x, p_, s_, alpha, omega, msk)
                r = blas.triad(t_, s, -omega, msk)

                res2 = dot1(r)
                res = jnp.sqrt(res2.astype(rdt) * jnp.asarray(res_normal, rdt))
                hist = jax.lax.dynamic_update_index_in_dim(hist, res, itr, 0)
                return (x, r, p, q, itr + 1, res, alpha, omega, hist)

            # |rho| < FLT_MIN breaks BEFORE the iteration touches any state
            # (cz_Poisson.cpp:379-383: itr = 0; break) — the whole update is
            # inside the cond so x is provably untouched on breakdown.
            op = (x, r, p, q, itr, res, alpha, omega, hist)
            x, r, p, q, itr, res, alpha, omega, hist = jax.lax.cond(
                breakdown, lambda op: op, advance, op
            )
            return (x, r, p, q, itr, res, rho, alpha, omega, hist, breakdown)

        one = jnp.ones((), dt)
        st0 = (
            x0,
            r,
            p,
            q,
            jnp.int32(0),
            jnp.asarray(jnp.inf, rdt),
            one,  # rho_old = 1 (cz_Poisson.cpp:368)
            jnp.zeros((), dt),  # alpha = 0
            one,  # omega = 1
            hist0,
            jnp.bool_(False),
        )
        x, r, p, q, itr, res, *_rest, hist, stop = jax.lax.while_loop(
            cond, body, st0
        )
        return x, itr, res, hist, stop

    def solve(x0, b, itr_max: int, eps: float, res_normal: float) -> SolveResult:
        # reference loops itr = 1 .. ItrMax-1 (cz_Poisson.cpp:373)
        x, itr, res, hist, stop = run(
            x0, b, max(int(itr_max) - 1, 1), float(eps), float(res_normal)
        )
        # one batched host transfer (separate int()/bool()/float() fetches
        # each pay a full tunnel round-trip)
        done, stop_v, res_v = jax.device_get((itr, stop, res))
        done = int(done)  # iterations that completed (wrote a history row)
        # rho breakdown reports itr = 0 like the reference (cz_Poisson.cpp:381)
        iters = 0 if bool(stop_v) else done
        return SolveResult(
            x=x, iters=iters, res=float(res_v), history=hist[:done]
        )

    return solve
