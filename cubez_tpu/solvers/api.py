"""Top-level solve API — the equivalent of CZ::Evaluate's solver dispatch
(cz_Evaluate.cpp:414-489) as a function.

    result = solve(Problem.poisson_cube(64), "sor2sma", omega=1.5,
                   itr_max=10000)
"""

from __future__ import annotations

from typing import Optional

import dataclasses

import jax
import jax.numpy as jnp

from ..core.problem import Problem
from . import steps as steps_mod
from .driver import EPS_DEFAULT, SolveResult, run_iterative

SOLVERS = steps_mod.ALL_SOLVERS

# solvers with a fused single-HBM-pass Pallas kernel
# (pallas_kernels/sweeps.py for the point sweeps, pallas_kernels/pcr.py for
# the line solvers)
FUSED = ("jacobi", "sor2sma", "pcr", "pcr_rb")


def _sharded(problem: Problem) -> bool:
    return getattr(problem.x0, "is_fully_addressable", True) is False or (
        hasattr(problem.x0, "sharding")
        and getattr(problem.x0.sharding, "num_devices", 1) > 1
    )


def _can_fuse(problem: Problem, kind: str, is_maf: bool, impl: str) -> bool:
    if impl == "jnp" or kind not in FUSED:
        return False
    if is_maf and problem.mc is None:
        return False
    if problem.grid.dtype != jnp.float32:
        return False
    if _sharded(problem):
        return False  # sharded runs go through the distributed steps
    if impl == "pallas":
        return True
    return jax.default_backend() == "tpu"


def _initial_x(step, problem: Problem):
    """The solve's starting iterate: ``problem.x0`` normally; steps that
    carry an ``fmg_init`` (full multigrid, solvers/multigrid.py) derive it
    from the RHS with one F-cycle instead.  The jitted initializer is
    cached on the step so repeated solves reuse the executable.

    The F-cycle keeps x0's boundary shell (it becomes the per-level
    Dirichlet data) but DISCARDS x0's interior (derived from the RHS
    instead), so silently accepting an x0 with interior state — a
    checkpoint restart — would throw the caller's state away; reject
    those (``mg`` honors x0)."""
    init = getattr(step, "fmg_init", None)
    if init is None:
        return problem.x0
    if not getattr(step, "_fmg_x0_checked", False):
        import numpy as np

        if np.any(np.asarray(problem.x0 * problem.msk)):
            raise ValueError(
                "fmg derives its initial interior from the RHS and would "
                "discard this problem's x0 interior; use 'mg' to iterate "
                "from a custom or restarted x0"
            )
        step._fmg_x0_checked = True  # steps are cached per problem object
    jitted = getattr(step, "_fmg_init_jit", None)
    if jitted is None:
        jitted = step._fmg_init_jit = jax.jit(init)
    return jitted(problem.rhs)


def solve(
    problem: Problem,
    solver: str,
    omega: float,
    itr_max: int,
    eps: float = EPS_DEFAULT,
    precond: Optional[str] = None,
    history_path: Optional[str] = None,
    impl: str = "auto",
    check_every: Optional[int] = None,
) -> SolveResult:
    """``impl``: 'auto' (fused Pallas kernels on TPU, XLA elsewhere),
    'pallas' (force fused kernels; interpreted off-TPU), 'jnp' (force XLA).
    ``check_every``: convergence-check granularity (None = auto; see
    driver.run_iterative — counts/histories are granularity-independent)."""
    kind, is_maf = steps_mod.parse_name(solver)
    g = problem.grid

    if kind == "pbicgstab":
        from .fused_cache import get_bicgstab

        run = get_bicgstab(
            problem, solver, omega, precond,
            "jnp" if _sharded(problem) else impl,
        )
        result = run(problem.x0, problem.rhs, itr_max, eps, g.res_normal)
    elif kind == "cg":
        from .fused_cache import get_cg

        run = get_cg(
            problem, omega, precond, "jnp" if _sharded(problem) else impl
        )
        result = run(problem.x0, problem.rhs, itr_max, eps, g.res_normal)
    elif _can_fuse(problem, kind, is_maf, impl):
        from .fused_cache import get_fused_step, pad_unpad

        interpret = jax.default_backend() != "tpu"
        step = get_fused_step(
            kind, g, omega, problem.mc if is_maf else None, interpret,
            b_is_zero=problem.rhs_is_inner_zero(),
        )
        if step is None:  # no viable tiling — fall back
            from .fused_cache import get_jnp_step

            step = get_jnp_step(problem, solver, omega)
            result = run_iterative(
                step, problem.x0, problem.rhs, g.res_normal, itr_max, eps,
                check_every=check_every,
            )
        else:
            # the layout converters fold into the loop executable (one
            # dispatch per solve); attach once so the jit static key is a
            # stable identity across solves
            if not hasattr(step, "_pre"):
                step._pre, step._post = pad_unpad(kind, g, step)
            result = run_iterative(
                step, problem.x0, problem.rhs, g.res_normal,
                itr_max, eps, check_every=check_every,
                pre=step._pre, post=step._post,
            )
    else:
        from .fused_cache import get_jnp_step

        step = get_jnp_step(problem, solver, omega)
        result = run_iterative(
            step, _initial_x(step, problem), problem.rhs, g.res_normal,
            itr_max, eps, check_every=check_every,
            # steps that run on their own state layout (psor's skewed
            # diagonal layout, ops/psor_scan.py) carry converters
            pre=getattr(step, "_pre", None),
            post=getattr(step, "_post", None),
        )

    if history_path:
        result.write_history(history_path)
    return result
