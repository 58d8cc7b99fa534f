"""Analytic per-kernel cost model — flop/byte constants for roofline checks.

Flop-per-point constants mirror the reference's in-kernel flop accounting
(jacobi/psor 18: cz_solver.f90:238-241,315-318; sor2sma 18 per full RB pair:
cz_solver.f90:438-441; calc_ax 13 / calc_rk 14: cz_blas.f90:607-610,686-689;
triad 2 / dot 2 / bicg_1 4 / bicg_2 4: cz_blas.f90:278,341,407,471,536;
MAF point kernels 66: cz_maf.f90:50-53; PCR: cz_solver.f90:523-530,694-701).

Byte counts model the *minimal* HBM traffic of an ideally fused kernel
(streams actually touched, one read or write each), which is what the Pallas
kernels achieve — so %SoL is meaningful against them.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class KernelCost:
    flops_per_pt: float
    streams: float  # HBM passes over the N^3 field (reads + writes)

    def flops(self, npts: int) -> float:
        return self.flops_per_pt * npts

    def bytes(self, npts: int, itemsize: int = 4) -> float:
        return self.streams * npts * itemsize


def pcr_flops_per_pt(n: int) -> float:
    """Full-plane PCR per line point (pcr, cz_solver.f90:694-701)."""
    pn = 1
    while (1 << pn) <= n:
        pn += 1
    return 6 + 14 * max(pn - 2, 0) + 74 * (2 ** max(pn - 2, 0)) / n + 6 + 6


# streams: fused-kernel ideal (x read + x write [+ b read])
COSTS = {
    "jacobi": KernelCost(18, 3),
    "jacobi_b0": KernelCost(18, 2),
    "psor": KernelCost(18, 3),
    "sor2sma": KernelCost(18, 3),      # both colors fused: read x, b; write x
    "sor2sma_b0": KernelCost(18, 2),
    "jacobi_maf": KernelCost(66, 3),
    "psor_maf": KernelCost(66, 3),
    "sor2sma_maf": KernelCost(66, 3),
    "calc_ax": KernelCost(13, 3),
    "calc_rk": KernelCost(14, 4),
    "calc_ax_maf": KernelCost(63, 3),
    "calc_rk_maf": KernelCost(63, 4),
    "dot1": KernelCost(2, 1),
    "dot2": KernelCost(2, 2),
    "triad": KernelCost(2, 3),
    "bicg_1": KernelCost(4, 4),
    "bicg_2": KernelCost(4, 4),
}


def sweep_cost(name: str, shape, itemsize: int = 4, b_is_zero: bool = False):
    """(flops, bytes) for one sweep of ``name`` over grid ``shape``."""
    key = name
    if b_is_zero and f"{name}_b0" in COSTS:
        key = f"{name}_b0"
    if key not in COSTS and name.startswith("pcr"):
        # MXU line kernels: dense T^-1 matmul per line = 2K flop/pt (const)
        # or 4K (MAF fast-diagonalization: V^-1 and V matmuls); transverse
        # build ~6-12 flop/pt.  The production rb kernel packs lines by
        # color (pallas_kernels/rblines.py), so one red-black iteration is
        # ONE full-plane solve — same per-point matmul work as the
        # line-Jacobi form, NOT two.  The matmul contracts over the padded
        # K extent (Kp = round_up(K, 8)).  HBM traffic stays read x +
        # write x [+ read b] — the solve lives in VMEM/MXU.
        kp = -(-shape[0] // 8) * 8
        per_pt = 6.0 + 2.0 * kp
        if name.endswith("_maf"):
            per_pt *= 2.0  # V and V^-1 matmuls
        npts = math.prod(shape)
        streams = 2 if b_is_zero else 3  # kernels skip the zero-RHS stream
        return per_pt * npts, streams * npts * itemsize
    c = COSTS[key]
    npts = math.prod(shape)
    return c.flops(npts), c.bytes(npts, itemsize)
