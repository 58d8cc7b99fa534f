"""Iteration drivers: the while-loop + convergence logic of cz_Poisson.cpp.

Each driver runs entirely on-device as a single ``lax.while_loop`` under jit:
sweep -> residual reduce -> history append -> Dirichlet re-imposition ->
eps test (the per-iteration skeleton of cz_Poisson.cpp:39-79).  The residual
history lives in a preallocated on-device buffer so there are no host
round-trips inside the loop.

Residual definition (cz_Poisson.cpp:67-71, cz_Evaluate.cpp:222-224):
    res = sqrt( sum(dp^2 over inner) / N_inner ),   stop when res < eps.
The default eps = 1.0e-5 matches cz.h:162.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EPS_DEFAULT = 1.0e-5


@dataclasses.dataclass
class SolveResult:
    x: jax.Array
    iters: int
    res: float
    history: np.ndarray  # residual per iteration, length == iters

    def write_history(self, path):
        """History file with the reference's exact format
        (cz_Evaluate.cpp:217, cz_Poisson.cpp:71); native writer when built."""
        from ..utils.native import write_history

        write_history(path, self.history)


def _res_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@partial(jax.jit, static_argnames=("step", "itr_max", "apply_bc"))
def _run_loop(step, x0, b, res_normal, eps, itr_max: int, apply_bc):
    """On-device iteration loop.  The per-iteration bookkeeping is minimal:
    the raw sum(dp^2) is compared against eps^2/res_normal (sqrt is
    monotone, so the stopping decision is the same) and the history stores
    r2; the caller converts to residuals once after the loop."""
    rdt = _res_dtype()
    hist0 = jnp.zeros((itr_max,), rdt)
    # res >= eps  <=>  r2 >= eps^2 / res_normal
    thresh = (
        jnp.asarray(eps, rdt) * jnp.asarray(eps, rdt)
        / jnp.asarray(res_normal, rdt)
    )

    def cond(state):
        x, itr, r2, hist = state
        return jnp.logical_and(
            itr < itr_max, jnp.logical_or(itr == 0, r2 >= thresh)
        )

    def body(state):
        x, itr, _r2, hist = state
        x, r2 = step(x, b)
        r2 = r2.astype(rdt)
        hist = jax.lax.dynamic_update_index_in_dim(hist, r2, itr, 0)
        if apply_bc is not None:
            x = apply_bc(x)
        return (x, itr + 1, r2, hist)

    state = (x0, jnp.int32(0), jnp.asarray(jnp.inf, rdt), hist0)
    x, itr, r2, hist = jax.lax.while_loop(cond, body, state)
    res_hist = jnp.sqrt(hist * jnp.asarray(res_normal, rdt))
    res = jnp.sqrt(r2 * jnp.asarray(res_normal, rdt))
    return x, itr, res, res_hist


def run_iterative(
    step,
    x0,
    b,
    res_normal: float,
    itr_max: int,
    eps: float = EPS_DEFAULT,
    apply_bc=None,
) -> SolveResult:
    """Run a relaxation/line solver to convergence.

    ``apply_bc`` mirrors the per-iteration bc_k_ call (cz_Poisson.cpp:74);
    with masked sweeps it is mathematically a no-op on a single block, so the
    default skips it.
    """
    x, itr, res, hist = _run_loop(
        step, x0, b, float(res_normal), float(eps), int(itr_max), apply_bc
    )
    iters = int(itr)
    return SolveResult(
        x=x, iters=iters, res=float(res), history=np.asarray(hist)[:iters]
    )


def fixed_sweeps(step, x, b, count: int):
    """``count`` sweeps without convergence checks — the preconditioner mode
    (converge_check=false path of cz_Poisson.cpp:66,280)."""

    def body(_, xx):
        xx, _r2 = step(xx, b)
        return xx

    return jax.lax.fori_loop(0, count, body, x)
