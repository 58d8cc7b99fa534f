"""Per-kernel roofline for the MXU line solvers (and the point-sweep
reference row) — names the binding resource of each production kernel.

    python scripts/roofline_lines.py            # on the TPU

Method: marginal per-iteration device time by in-executable scan
differencing — time ONE jitted executable running N_HI sweeps and one
running N_LO sweeps of the same step (jax.lax.fori_loop, no per-iteration
dispatch), difference and divide.  This cancels the fixed dispatch/tunnel
cost exactly and is the methodology BENCH_RESULTS' evidence sections use
for mg/fd.  Flop/byte attributions come from perf/roofline.py (analytic,
mirroring the reference's in-kernel accounting) with the matmul contraction
over the padded K extent.

Rooflines (stated assumptions, TPU v5e):
  * HBM: 819 GB/s (perf/pmlib.py::device_hbm_gbps default).
  * MXU f32: the kernels run jnp.dot with Precision.HIGHEST (three bf16
    passes per operand pair -> ~1/8 of the 197 TFLOP/s bf16 peak):
    24.6 TFLOP/s.  The fd solver's measured 13 TF and pcr_rb's measured
    ~20 TF are consistent with this ceiling.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from cubez_tpu import Problem
from cubez_tpu.perf.roofline import sweep_cost
from cubez_tpu.perf.pmlib import device_hbm_gbps
from cubez_tpu.solvers.driver import fixed_sweeps
from cubez_tpu.solvers.fused_cache import get_fused_step, pad_unpad
from cubez_tpu.solvers.steps import parse_name

HBM_GBPS = device_hbm_gbps()
MXU_F32_TFLOPS = 197.0 / 8.0  # Precision.HIGHEST, see module docstring
N_HI, N_LO = 2000, 250


REPS = 5


def _timed(step, starts, b, count):
    """Median wall time of ``count`` sweeps: distinct random start per rep
    and a host-fetched scalar digest per call — the tunnel serves
    identical-input calls from cache and block_until_ready may not reflect
    completion (bench.py's honest method; see the verify skill notes)."""
    run = jax.jit(
        lambda x, b, n=count: jnp.sum(fixed_sweeps(step, x, b, n)[::7, ::5])
    )
    _ = float(run(starts[-1], b))  # compile + warm
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        _ = float(run(starts[i], b))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def measure(name: str, n: int = 128):
    kind, is_maf = parse_name(name)
    prob = Problem.poisson_cube(n, dtype=jnp.float32, maf=is_maf)
    omega = {"pcr_j_esa": 1.0}.get(name, 1.5)
    step = get_fused_step(
        kind, prob.grid, omega, prob.mc if is_maf else None,
        jax.default_backend() != "tpu",
        b_is_zero=prob.rhs_is_inner_zero(),
    )
    assert step is not None, f"no fused kernel for {name}"
    pad, _ = pad_unpad(kind, prob.grid, step)
    x, b = pad(prob.x0), pad(prob.rhs)
    key = jax.random.PRNGKey(7)
    starts = [
        x + 0.01 * jax.random.normal(k, x.shape, x.dtype)
        for k in jax.random.split(key, REPS + 1)
    ]
    jax.block_until_ready(starts)
    t = (_timed(step, starts, b, N_HI) - _timed(step, starts, b, N_LO)) / (
        N_HI - N_LO
    )

    flops, bytes_ = sweep_cost(
        name, prob.grid.shape_kij, 4, b_is_zero=prob.rhs_is_inner_zero()
    )
    # temporally-blocked pair kernels stream HBM once per CALL, i.e. once
    # per iters_per_call iterations — attribute per-iteration bytes
    # accordingly (flops are genuinely per-iteration)
    ipc = getattr(step, "iters_per_call", 1)
    bytes_ = bytes_ / ipc
    gbps = bytes_ / t / 1e9
    tflops = flops / t / 1e12
    sol_hbm = 100.0 * gbps / HBM_GBPS
    sol_mxu = 100.0 * tflops / MXU_F32_TFLOPS
    # when neither modeled ceiling is near saturation the kernel is bound
    # by the resource this model can't attribute analytically: the VPU
    # (elementwise/select/roll work) — true of the temporally-blocked
    # point sweeps at n >= 4
    if max(sol_hbm, sol_mxu) < 60.0:
        binding = "VPU"
    else:
        binding = "HBM" if sol_hbm >= sol_mxu else "MXU"
    return {
        "name": name, "us_per_iter": t * 1e6,
        "mcells": prob.grid.num_inner / t / 1e6,
        "gbps": gbps, "tflops": tflops,
        "sol_hbm": sol_hbm, "sol_mxu": sol_mxu, "binding": binding,
    }


def main():
    rows = []
    for name in ("sor2sma", "pcr_rb", "pcr_j_esa", "pcr_rb_maf"):
        r = measure(name)
        rows.append(r)
        print(
            f"{r['name']:<12} {r['us_per_iter']:7.1f} us/iter "
            f"{r['mcells']:7.0f} Mcells/s  {r['gbps']:6.0f} GB/s "
            f"({r['sol_hbm']:4.1f}% HBM)  {r['tflops']:5.1f} TF "
            f"({r['sol_mxu']:4.1f}% MXU)  -> {r['binding']}-bound",
            flush=True,
        )
    print("\nmarkdown:\n")
    print("| kernel (128^3) | us/iter | Mcells/s | GB/s | %SoL HBM | "
          "TFLOP/s | %SoL MXU(f32) | binding |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['name']} | {r['us_per_iter']:.1f} | {r['mcells']:.0f} | "
            f"{r['gbps']:.0f} | {r['sol_hbm']:.0f}% | {r['tflops']:.1f} | "
            f"{r['sol_mxu']:.0f}% | {r['binding']} |"
        )


if __name__ == "__main__":
    main()
