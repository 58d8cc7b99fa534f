"""Top-level solve API — the equivalent of CZ::Evaluate's solver dispatch
(cz_Evaluate.cpp:414-489) as a function.

    result = solve(Problem.poisson_cube(64), "sor2sma", omega=1.5,
                   itr_max=10000)
"""

from __future__ import annotations

from typing import Optional

from ..core.problem import Problem
from . import steps as steps_mod
from .bicgstab import make_bicgstab
from .driver import EPS_DEFAULT, SolveResult, run_iterative

SOLVERS = steps_mod.ALL_SOLVERS


def solve(
    problem: Problem,
    solver: str,
    omega: float,
    itr_max: int,
    eps: float = EPS_DEFAULT,
    precond: Optional[str] = None,
    history_path: Optional[str] = None,
) -> SolveResult:
    kind, is_maf = steps_mod.parse_name(solver)
    g = problem.grid

    if kind == "pbicgstab":
        run = make_bicgstab(problem, solver, omega, precond)
        result = run(problem.x0, problem.rhs, itr_max, eps, g.res_normal)
    else:
        step = steps_mod.make_step(problem, solver, omega)
        result = run_iterative(
            step, problem.x0, problem.rhs, g.res_normal, itr_max, eps
        )

    if history_path:
        result.write_history(history_path)
    return result
