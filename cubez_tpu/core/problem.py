"""Problem setup: fields + coefficient bundles for a solve.

Equivalent of the allocation/IC/BC phase of CZ::Evaluate
(cz_Evaluate.cpp:222-390) — grid, solution/RHS fields, inner mask, MAF metric
coefficients, and the pivot scaling used by MAF-BiCGSTAB.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from .grid import Grid
from ..ops.maf import MafCoeffs


@dataclasses.dataclass(frozen=True)
class Problem:
    grid: Grid
    x0: jnp.ndarray
    rhs: jnp.ndarray
    msk: jnp.ndarray
    mc: Optional[MafCoeffs] = None
    pvt: Optional[jnp.ndarray] = None
    # True when rhs == 0 on every inner node (the reference Laplace problem):
    # lets the fused sweeps skip streaming b entirely (one less HBM pass)
    rhs_inner_zero: bool = False

    def rhs_is_inner_zero(self) -> bool:
        """The rhs_inner_zero hint, verified against the actual array.

        The stored flag survives ``dataclasses.replace(prob, rhs=...)``
        unchanged, so consumers that would *drop* the RHS (fused kernels
        with ``b_is_zero``) must call this instead of trusting the field:
        one cheap device reduction guards against silently solving the
        wrong problem."""
        if not self.rhs_inner_zero:
            return False
        return not bool(jnp.any(self.rhs * self.msk))

    @classmethod
    def poisson_cube(cls, n, dtype=jnp.float32, maf: bool = False) -> "Problem":
        """The reference's only problem: Laplace on the unit cube with the
        sin*sin K-face Dirichlet profile (cz_Evaluate.cpp:15-18,374-390)."""
        if isinstance(n, int):
            n = (n, n, n)
        ni, nj, nk = n
        grid = Grid(ni=ni, nj=nj, nk=nk, dtype=dtype)
        mc = pvt = None
        if maf:
            mc = MafCoeffs.from_coords(grid.xc, grid.yc, grid.zc)
            pvt = mc.pivot()
        return cls(
            grid=grid,
            x0=grid.initial_p(),
            rhs=grid.initial_rhs(),
            msk=grid.inner_mask,
            mc=mc,
            pvt=pvt,
            rhs_inner_zero=True,
        )
