"""Headline benchmark: cell-updates/s/chip on the 128^3 Poisson problem.

Runs the fused red-black SOR sweep (the reference's documented headline
config, ``./cz 124 124 124 sor2sma 10000 1.5`` — Readme.md:384-392) for a
fixed iteration count on the local chip and prints ONE JSON line.

``vs_baseline`` is the fraction of the HBM-bandwidth speed-of-light for the
sweep (the reference publishes no absolute numbers — BASELINE.md — so the
roofline is the meaningful yardstick).  The SoL denominator is the *minimal*
HBM traffic for one full RB iteration with zero RHS: one read + one write of
the field (2 passes).  The temporally-blocked kernels (sweeps2x.py) amortize
that traffic over n iterations (the pair, and the generalized n-window
pipeline at n=4/6), so vs_baseline may legitimately exceed 1.0 — they beat
the single-iteration speed-of-light.  All viable kernels are timed and the
fastest is reported (measured on v5e the sweep is VPU-bound, so deeper
blocking does not automatically win; hard-coding a preference mis-reported
the headline in round 2).

Timing methodology (hardened against remote-execution tunnels):
* every timed call computes a scalar digest fetched to the host, so a
  non-blocking ``block_until_ready`` cannot fake completion;
* every call starts from a distinct random field (identical-input calls can
  be served from caches, and a converged solve reaches a bitwise fixed
  point);
* the per-iteration time is the difference between long and short runs,
  cancelling fixed per-call dispatch/tunnel overhead.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

N = 128
OMEGA = 1.5
# the long-minus-short difference must dwarf the tunnel's per-call jitter
# (measured up to +-3 ms): at ~16 us/iter a 3500-iteration difference is
# ~56 ms of pure kernel time
ITERS_SHORT, ITERS_LONG = 500, 4000
REPS = 5


def _error_json(msg: str) -> str:
    return json.dumps(
        {
            "metric": "cell-updates/s/chip (sor2sma 128^3 f32)",
            "value": 0,
            "unit": "Mcells/s",
            "vs_baseline": 0,
            "error": msg,
        }
    )


def _probe_device(timeout_s: int = 90, retries: int = 8):
    """None if the backend answers a trivial op within timeout_s (retrying —
    wedges sometimes clear in minutes), else a failure-reason string.  The
    probe runs in a SUBPROCESS: a call blocked on the wedged axon tunnel
    never re-enters the Python interpreter, so an in-process SIGALRM
    handler never fires (measured: a 120 s alarm still hanging at 400 s).
    A child we can kill is the only reliable guard, and killing it cannot
    wedge this process, which has not touched the device yet.

    A crash (nonzero exit) is NOT a wedge: it reproduces fast, so after a
    second identical failure the last stderr lines are returned instead of
    burning the remaining retries sleeping on a broken install."""
    import subprocess
    import sys

    code = "import jax, jax.numpy as jnp; " \
           "jax.block_until_ready(jnp.ones((8, 8)).sum())"
    crashes = 0
    reason = "unreachable"
    for i in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s,
                capture_output=True, text=True,
            )
            if r.returncode == 0:
                return None
            crashes += 1
            tail = (r.stderr or "").strip().splitlines()[-3:]
            reason = f"probe exited {r.returncode}: " + " | ".join(tail)
            if crashes >= 2:
                return reason
        except subprocess.TimeoutExpired:
            reason = f"device unreachable (tunnel wedged? {timeout_s}s probe)"
        if i < retries - 1:
            time.sleep(30)
    return reason


def main():
    from cubez_tpu import Problem
    from cubez_tpu.perf.pmlib import device_hbm_gbps
    from cubez_tpu.solvers.driver import fixed_sweeps
    from cubez_tpu.solvers.steps import make_step

    # the parent watchdog already probed with retries; one quick recheck
    # covers a wedge that started in between
    why = _probe_device(retries=1)
    if why is not None:
        print(_error_json(why))
        return

    prob = Problem.poisson_cube(N, dtype=jnp.float32)
    shape = prob.grid.shape_kij

    candidates = []  # (name, step, x0, b0) that pass a smoke run
    if jax.default_backend() == "tpu":
        from cubez_tpu.pallas_kernels import sweeps as fused

        def _packed():
            from cubez_tpu.pallas_kernels import rbpack

            step = rbpack.make_packed_sweep(
                shape, jnp.float32, omega=OMEGA, b_is_zero=True
            )
            return step

        def _packed2x():
            from cubez_tpu.pallas_kernels import rbpack

            return rbpack.make_packed_sweep2x(shape, jnp.float32, omega=OMEGA)

        def _packednx(n):
            from cubez_tpu.pallas_kernels import rbpack

            return rbpack.make_packed_sweepnx(
                shape, jnp.float32, omega=OMEGA, n=n
            )

        maybe = [
            ("pallas-rbpack-4x", lambda: _packednx(4)),
            ("pallas-rbpack-6x", lambda: _packednx(6)),
            ("pallas-rbpack-2x", _packed2x),
            ("pallas-rbpack", _packed),
            ("pallas-fused",
             lambda: fused.make_fused_sweep(
                 "sor2sma", shape, jnp.float32, omega=OMEGA, b_is_zero=True
             )),
        ]

        def _2x():
            from cubez_tpu.pallas_kernels import sweeps2x

            return sweeps2x.make_fused_sweep2x(shape, jnp.float32, omega=OMEGA)

        maybe.append(("pallas-fused-2x", _2x))
        for name, build in maybe:
            try:
                fstep = build()
                if fstep is None:
                    continue
                pad = getattr(fstep, "pad", fused.pad_k2)
                # smoke-run one step before admitting the fused path
                # (fused-vs-XLA parity itself is covered by the test suite)
                y, _ = jax.jit(fstep)(pad(prob.x0), pad(prob.rhs))
                jax.block_until_ready(y)
                candidates.append((name, fstep, pad(prob.x0), pad(prob.rhs)))
            except Exception:
                pass

    if not candidates:
        candidates = [
            ("xla", make_step(prob, "sor2sma", omega=OMEGA), prob.x0, prob.rhs)
        ]

    def timed(step, starts, b0, iters):
        run = jax.jit(
            lambda x, b, n=iters: jnp.sum(fixed_sweeps(step, x, b, n)[::7, ::5])
        )
        _ = float(run(starts[-1], b0))  # compile + warm
        ts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            _ = float(run(starts[i], b0))  # digest fetch forces completion
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]  # median-of-REPS

    key = jax.random.PRNGKey(0)
    best = None  # (per_iter, name)
    for name, step, x0, b0 in candidates:
        starts = [
            x0 + jax.random.normal(k, x0.shape, x0.dtype)
            for k in jax.random.split(key, REPS + 1)
        ]
        jax.block_until_ready(starts)
        # fixed_sweeps rounds the count UP to whole multi-iteration calls
        # (iters_per_call) — divide by the sweeps actually executed
        ipc = getattr(step, "iters_per_call", 1)
        n_long = -(-ITERS_LONG // ipc) * ipc
        n_short = -(-ITERS_SHORT // ipc) * ipc
        per = (
            timed(step, starts, b0, ITERS_LONG)
            - timed(step, starts, b0, ITERS_SHORT)
        ) / (n_long - n_short)
        if per <= 0:
            continue  # jitter swamped the difference — not a usable timing
        if best is None or per < best[0]:
            best = (per, name)

    if best is None:
        # every difference drowned in jitter; report a conservative
        # absolute timing (includes per-call dispatch overhead)
        name, step, x0, b0 = candidates[0]
        starts = [
            x0 + jax.random.normal(k, x0.shape, x0.dtype)
            for k in jax.random.split(key, REPS + 1)
        ]
        jax.block_until_ready(starts)
        ipc = getattr(step, "iters_per_call", 1)
        n_long = -(-ITERS_LONG // ipc) * ipc
        best = (timed(step, starts, b0, ITERS_LONG) / n_long, name + "-abs")

    per_iter, kernel = best
    cups = prob.grid.num_inner / per_iter

    # SoL: minimal traffic per RB iteration = read x + write x = 2 passes.
    bytes_per_iter = 2 * (N**3) * 4
    sol_cups = device_hbm_gbps() * 1e9 / bytes_per_iter * prob.grid.num_inner

    print(
        json.dumps(
            {
                "metric": f"cell-updates/s/chip (sor2sma 128^3 f32, {kernel})",
                "value": round(cups / 1e6, 2),
                "unit": "Mcells/s",
                "vs_baseline": round(cups / sol_cups, 4),
            }
        )
    )


def _main_with_watchdog():
    """Run main() in a killable child: if the tunnel wedges MID-bench, the
    blocked device call never returns to the interpreter and no in-process
    guard can fire.  The child inherits stdout, so on success its JSON line
    is the output; on timeout we kill it and print the error line.

    The retrying probe runs HERE in the parent (its ~16-minute worst case
    must not eat the child's 30-minute bench budget), before any device
    contact.  Contract: exactly one JSON line is always printed and the
    exit code is always 0 — failures are reported in-band via the "error"
    field (the driver parses stdout; a nonzero exit could make it discard
    the line entirely)."""
    import os
    import subprocess
    import sys

    if os.environ.get("CZ_BENCH_INNER") == "1":
        main()
        return
    why = _probe_device()
    if why is not None:
        print(_error_json(why))
        return
    env = dict(os.environ, CZ_BENCH_INNER="1")
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            timeout=1800,
        )
        if r.returncode != 0:
            print(_error_json(f"bench child exited {r.returncode}"))
    except subprocess.TimeoutExpired:
        print(_error_json("bench timed out (tunnel wedged mid-run?)"))


if __name__ == "__main__":
    _main_with_watchdog()
