"""Headline benchmark: cell-updates/s/chip on the 128^3 Poisson problem.

Runs the red-black SOR sweep (the reference's documented headline config,
``./cz 124 124 124 sor2sma 10000 1.5`` — Readme.md:384-392) for a fixed
iteration count on the local chip and prints ONE JSON line.

``vs_baseline`` is the fraction of the HBM-bandwidth speed-of-light for the
sweep (the reference publishes no absolute numbers — BASELINE.md — so the
roofline is the meaningful yardstick; >0.7 is the BASELINE.json target).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

N = 128
ITERS = 200
OMEGA = 1.5

# HBM bandwidth per chip (GB/s) for the roofline denominator.
HBM_GBPS = {
    "TPU v5 lite": 819.0,  # v5e
    "TPU v5e": 819.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,  # v6e / Trillium
    "cpu": 50.0,
}


def device_bw():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for k, v in HBM_GBPS.items():
        if k.lower() in str(kind).lower():
            return v
    return HBM_GBPS["cpu"] if d.platform == "cpu" else 819.0


def main():
    from cubez_tpu import Problem
    from cubez_tpu.solvers.driver import fixed_sweeps
    from cubez_tpu.solvers.steps import make_step

    prob = Problem.poisson_cube(N, dtype=jnp.float32)
    step = make_step(prob, "sor2sma", omega=OMEGA)

    run = jax.jit(lambda x, b: fixed_sweeps(step, x, b, ITERS))

    x = run(prob.x0, prob.rhs)  # compile + warmup
    jax.block_until_ready(x)

    t0 = time.perf_counter()
    x = run(prob.x0, prob.rhs)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0

    cells = prob.grid.num_inner * ITERS
    cups = cells / dt  # cell updates per second

    # Roofline: per iteration (both colors) the minimal HBM traffic is
    # 2x(read x + write x) + 2x read b  (masks/colors fold into constants
    # in an ideal fused kernel) = 6 passes of 4 bytes over N^3.
    bytes_per_iter = 6 * (N ** 3) * 4
    sol_iters = device_bw() * 1e9 / bytes_per_iter
    sol_cups = sol_iters * prob.grid.num_inner

    print(
        json.dumps(
            {
                "metric": "cell-updates/s/chip (sor2sma 128^3 f32)",
                "value": round(cups / 1e6, 2),
                "unit": "Mcells/s",
                "vs_baseline": round(cups / sol_cups, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
