"""BASELINE.md protocol runner: solve the reference's benchmark configs to
tolerance on the current backend and write BENCH_RESULTS.md.

    python scripts/bench_protocol.py [--out BENCH_RESULTS.md]

Each row is a full convergent solve (compile excluded from the timing by a
short warm-up solve of the same shape), so the numbers are end-to-end
solver throughput, not kernel microbenchmarks.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from cubez_tpu import Problem, max_error, solve

# (label, N, solver, omega, precond, itr_max[, rate_iters[, eps]])
# rate_iters > 0: per-iteration rate probe instead of a full solve (no
# config needs it since the diagonal-scan rewrites of psor and line-GS
# pcr — ops/psor_scan.py, ops/pcr_gs.py — made every Gauss-Seidel form a
# practical FULL to-tolerance solve; kept for ad-hoc probing).
CONFIGS = [
    ("jacobi 64^3", 64, "jacobi", 0.8, None, 20000),
    ("sor2sma 128^3", 128, "sor2sma", 1.5, None, 20000),
    ("psor 128^3", 128, "psor", 1.1, None, 20000),
    ("pcr line-GS 128^3", 128, "pcr", 1.5, None, 20000),
    ("pcr_j_esa 128^3", 128, "pcr_j_esa", 1.0, None, 20000),
    ("pcr_rb 128^3", 128, "pcr_rb", 1.5, None, 20000),
    ("psor_maf 128^3", 128, "psor_maf", 1.1, None, 20000),
    ("sor2sma_maf 128^3", 128, "sor2sma_maf", 1.5, None, 20000),
    ("pcr_rb_maf 128^3", 128, "pcr_rb_maf", 1.5, None, 20000),
    ("pbicgstab+sor2sma 64^3", 64, "pbicgstab", 1.1, "sor2sma", 4000),
    ("pbicgstab+sor2sma 128^3", 128, "pbicgstab", 1.1, "sor2sma", 4000),
    ("pbicgstab_maf 128^3", 128, "pbicgstab_maf", 1.1, "sor2sma_maf", 4000),
    ("pbicgstab+sor2sma 256^3", 256, "pbicgstab", 1.1, "sor2sma", 4000),
    ("sor2sma 256^3", 256, "sor2sma", 1.5, None, 20000),
    ("sor2sma 512^3", 512, "sor2sma", 1.5, None, 40000),
    # BASELINE's stricter eps=1e-6 tier (BASELINE.json metric
    # "iters-to-1e-6"); oracle counts from the *_eps1e-6 histories
    ("sor2sma 128^3 @1e-6", 128, "sor2sma", 1.5, None, 20000, 0, 1e-6),
    ("psor 128^3 @1e-6", 128, "psor", 1.1, None, 20000, 0, 1e-6),
    ("pcr_rb 128^3 @1e-6", 128, "pcr_rb", 1.5, None, 20000, 0, 1e-6),
    ("jacobi 128^3 @1e-6", 128, "jacobi", 0.8, None, 40000, 0, 1e-6),
    ("pbicgstab+sor2sma 128^3 @1e-6", 128, "pbicgstab", 1.1, "sor2sma",
     4000, 0, 1e-6),
    # extensions beyond the reference (README "Beyond the reference"):
    # compare by WALL time-to-tolerance, not Mcells/s — one mg "iteration"
    # is a whole V-cycle, so the per-iteration cell rate is meaningless
    ("mg 128^3 (extension)", 128, "mg", 1.0, None, 100),
    ("fmg 128^3 (extension)", 128, "fmg", 1.0, None, 100),
    ("fd 128^3 (extension)", 128, "fd", 1.0, None, 10),
    ("fd 256^3 (extension)", 256, "fd", 1.0, None, 10),
    ("fd 512^3 (extension)", 512, "fd", 1.0, None, 10),
    ("pbicgstab+mg 128^3 (extension)", 128, "pbicgstab", 1.1, "mg", 100),
    ("cg+jacobi 128^3 (extension)", 128, "cg", 0.8, "jacobi", 4000),
]


def ref_iters(n, solver, omega, precond, eps=1e-5):
    """Iteration count of the serial reference-semantics oracle for this
    config, from the checked-in histories (tests/ref_histories)."""
    name = solver if not precond else f"{solver}_{precond}"
    sfx = "" if eps == 1e-5 else f"_eps{eps:.0e}".replace("e-0", "e-")
    f = (pathlib.Path(__file__).resolve().parent.parent / "tests" /
         "ref_histories" / f"f32_{name}_{n}_w{omega}{sfx}.txt")
    if not f.exists():
        return None
    return len(f.read_text().splitlines()) - 1


def run_one(label, n, solver, omega, precond, itr_max, rate_iters=0,
            eps=1e-5):
    maf = solver.endswith("_maf")
    prob = Problem.poisson_cube(n, dtype=jnp.float32, maf=maf)
    if rate_iters:
        # per-iteration rate only (see CONFIGS comment)
        solve(prob, solver, omega=omega, itr_max=rate_iters, precond=precond,
              eps=1e-30)
        t0 = time.perf_counter()
        r = solve(prob, solver, omega=omega, itr_max=rate_iters,
                  precond=precond, eps=1e-30)
        jax.block_until_ready(r.x)
        dt = time.perf_counter() - t0
        cups = prob.grid.num_inner * r.iters / dt
        return {
            "label": label, "iters": f"{r.iters} (rate run)", "res": r.res,
            "err": float("nan"), "wall_s": dt, "mcups": cups / 1e6,
        }
    # warm-up compiles the exact executable: same static itr_max, but a
    # trivially-satisfied eps stops it after one iteration/chunk
    solve(prob, solver, omega=omega, itr_max=itr_max, precond=precond, eps=1e9)
    # median-of-3: the first post-compile execution through the tunnel can
    # pay a ~0.5 s one-off cost that is not solver time
    walls, base = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        r = solve(prob, solver, omega=omega, itr_max=itr_max, precond=precond,
                  eps=eps)
        jax.block_until_ready(r.x)
        walls.append(time.perf_counter() - t0)
        # same executable, trivially-satisfied eps: one chunk of iterations
        # plus the full fixed per-solve cost (dispatch + tunnel round-trips)
        t0 = time.perf_counter()
        r0 = solve(prob, solver, omega=omega, itr_max=itr_max,
                   precond=precond, eps=1e9)
        jax.block_until_ready(r0.x)
        base.append((time.perf_counter() - t0, r0.iters))
    walls.sort()
    base.sort()
    dt = walls[1]
    it0 = base[0][1]
    err = max_error(prob.grid, r.x)
    cups = prob.grid.num_inner * r.iters / dt
    # net loop rate: fixed per-solve cost cancelled by differencing.
    # The lever for short solves (~25 ms of kernel time at 128^3) is
    # only ~10x the tunnel's +-ms jitter, so the difference uses the
    # MINIMUM of the reps on both sides — timing noise through the
    # tunnel is additive-positive (contention, retries), so min is the
    # best estimator of the deterministic quantity; the wall column
    # stays the median (it reports typical end-to-end latency, not a
    # capability).  Below ~10 net iterations even that gap cannot dwarf
    # the jitter — mark those "n/a" instead of publishing noise
    # (mg/fmg/fd device costs are measured by in-executable scan
    # differencing in the EVIDENCE section instead).
    net = None
    if r.iters - it0 >= 10 and walls[0] > base[0][0]:
        net = prob.grid.num_inner * (r.iters - it0) / (
            walls[0] - base[0][0]
        )
    return {
        "label": label,
        "iters": r.iters,
        "res": r.res,
        "err": err,
        "wall_s": dt,
        "mcups": cups / 1e6,
        "net_mcups": None if net is None else net / 1e6,
    }


def _run_cfg_subprocess(idx: int, timeout_s: int):
    """One config in a killable child (--one mode).  A wedged TPU tunnel
    blocks the device call WITHOUT returning to the interpreter, so an
    in-process loop would hang the whole protocol for hours (observed);
    a child bounded by ``timeout_s`` caps the damage to one row."""
    import json
    import os
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", str(idx)],
        timeout=timeout_s, capture_output=True, text=True,
    )
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-3:]
        raise RuntimeError(
            f"config exited {r.returncode}: " + " | ".join(tail)
        )
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_RESULTS.md")
    ap.add_argument("--one", type=int, default=None,
                    help="run CONFIGS[i], print its row as one JSON line "
                         "(child mode of the per-config watchdog)")
    ap.add_argument("--cfg-timeout", type=int, default=900)
    args = ap.parse_args()

    if args.one is not None:
        import json

        print(json.dumps(run_one(*CONFIGS[args.one])), flush=True)
        return

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform)
    rows = []
    for i, cfg in enumerate(CONFIGS):
        try:
            try:
                rows.append(_run_cfg_subprocess(i, args.cfg_timeout))
            except Exception as e:
                # the remote compile service behind the TPU tunnel throws
                # transient HTTP 500s / wedges that clear in ~1 min (but
                # can also last hours — hence the child timeout) — one
                # retry distinguishes transients from real failures
                print(f"{cfg[0]}: retrying after {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                time.sleep(90)
                rows.append(_run_cfg_subprocess(i, args.cfg_timeout))
            r = rows[-1]
            r["ref"] = ref_iters(cfg[1], cfg[2], cfg[3], cfg[4],
                                 cfg[7] if len(cfg) > 7 else 1e-5)
            net = r.get("net_mcups")
            print(
                f"{r['label']:<26} iters={r['iters']!s:<6} "
                f"ref={r['ref']} res={r['res']:.3e} "
                f"err={r['err']:.3e} wall={r['wall_s']:.2f}s "
                f"{r['mcups']:.0f} Mcells/s"
                + ("" if net is None else f" (loop {net:.0f})"),
                flush=True,
            )
        except Exception as e:  # keep going; report the failure
            print(f"{cfg[0]}: FAILED {type(e).__name__}: {e}", flush=True)
            rows.append({"label": cfg[0], "error": str(e)[:200]})

    with open(args.out, "w") as f:
        f.write("# BENCH_RESULTS — solve-to-tolerance protocol\n\n")
        f.write(f"Device: {kind} (backend {jax.default_backend()}), "
                f"eps=1e-5 f32 unless the label says @1e-6.\n")
        f.write("Timing covers the full convergent solve (compile excluded "
                "via a warm-up solve).  'ref iters' is the serial "
                "reference-semantics oracle count from the checked-in "
                "histories (tests/ref_histories/README.md).  'loop Mcells/s' "
                "is the on-device convergence-loop rate with the fixed "
                "per-solve cost (dispatch + remote-tunnel round-trips, "
                "~0.1 s/solve here) cancelled by differencing against a "
                "one-chunk solve of the same executable (minimum over 3 "
                "repeats on both sides: tunnel noise is additive-positive) "
                "— the number a local (non-tunneled) host would see "
                "end-to-end; printed '-' "
                "when the solve converges in <10 net iterations (the gap "
                "would not dwarf tunnel jitter; mg/fmg/fd device costs are "
                "scan-differenced in the evidence sections below instead)."
                "\n\n")
        f.write("| config | iters | ref iters | residual | err_max | "
                "wall [s] | Mcells/s | loop Mcells/s |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            if "error" in r:
                f.write(f"| {r['label']} | FAILED: {r['error']} | | | | | | |\n")
            else:
                ref = r.get("ref")
                net = r.get("net_mcups")
                f.write(
                    f"| {r['label']} | {r['iters']} | "
                    f"{'-' if ref is None else ref} | {r['res']:.3e} | "
                    f"{r['err']:.3e} | {r['wall_s']:.2f} | {r['mcups']:.0f} | "
                    f"{'-' if net is None else f'{net:.0f}'} |\n"
                )
        f.write(EVIDENCE)
    print(f"wrote {args.out}")


# Recorded precision/tolerance evidence (re-verified by tests/CI runs, not
# re-timed here: iteration counts are load- and backend-independent).
EVIDENCE = """
## Tolerance / precision evidence (BASELINE's eps=1e-6, f64 configs)

* **sor2sma 128^3 f32 fused @ eps=1e-6 (TPU): 3066 iterations** — exactly the
  f32 serial oracle's 3066 (`tests/ref_histories/f32_sor2sma_128_w1.5_eps1e-6.txt`)
  and one off the f64 oracle's 3065: the f32 path reaches the stricter
  tolerance without stalling (residual partials accumulate per-tile and
  tree-sum, matching the reference's double accumulators in effect).
* **pbicgstab+sor2sma 256^3 f64 (CPU x64, impl=jnp): 38 iterations, res
  2.59e-06** — exactly the f64 serial oracle's 38
  (`tests/ref_histories/f64_pbicgstab_sor2sma_256_w1.1.txt`).
* **Large-grid f32 iteration deltas vs the oracle (+12 @256^3, +398 @512^3)
  are pinned, with data, on f32 FIELD-trajectory rounding — and our
  trajectory is the one that tracks the true (f64) count.**  The full
  512^3 cross-check (r5, on-device):
  - *Framework-consistent*: impl=jnp on the TPU takes **5787** iterations
    at 512^3 — identical to the fused production kernel's 5787 (as at
    256^3, where both take 4236).
  - *Residual accumulation exonerated*: re-running the fused fields with
    the residual computed three other ways — per-K-plane partial sums
    (pairwise outer), one-shot full f32 reduce over dp^2, and a
    numpy-float64 ground truth at the near-threshold state — gives the
    SAME 5787.  Measured accumulation errors at the threshold state:
    kernel per-tile partials 2.8e-6 relative, full-f32 1.3e-7, plane
    1.0e-8 — all orders of magnitude under the ~2e-4/iteration residual
    decay, i.e. worth <0.02 iterations.  (The reference's
    double-accumulator, cz_solver.f90:214, defends against a sequential-
    sum error mode XLA's tree reductions never had.)
  - *The oracle's own f64 runs side with us*: serial-oracle f64 counts
    (r5, `/tmp ref_oracle --fp64`): **4235 @256^3** and **5781 @512^3**.
    Our f32 counts are 4236 (+1) and 5787 (+6, +0.1%); the oracle's f32
    counts are 4224 (-11) and 5389 (**-392, -6.8% under its own f64**).
    And our framework at f64 reproduces the oracle's f64 exactly: 4235
    @256^3 (impl=jnp, x64).  So the framework's simultaneous-update f32
    arithmetic tracks the true convergence to 0.1% at 512^3, while the
    oracle's serial in-place f32 loop crosses the threshold ~400
    iterations early — the "drift" is the reference's f32 under-
    iteration, not ours.  The same reading applies to
    pbicgstab+sor2sma 256^3 f32 (44 vs oracle-f32 42, while the f64
    counts match exactly at 38): near eps these counts are f32
    trajectory noise, not a solver difference.

## Multigrid device cost (the loop column is unreliable for 2-6-iteration solves)

The 'loop Mcells/s' differencing needs a long-minus-short gap that dwarfs
the ~ms tunnel jitter; mg/fmg converge in 2-6 V-cycles total, so their
loop column is noise.  Measured directly (32-cycle vs 2-cycle scan inside
one executable, v5e): **one 128^3 V-cycle = 0.25 ms on device** — mg
converges in 6 cycles = 1.5 ms of device time, fmg in one F-cycle + 2
V-cycles ~ 1 ms, versus sor2sma's 1813 x 15.9 us = 29 ms (and the
reference's thousands of sweeps).  Wall times in the table are
dispatch-floor dominated (~25 ms/solve through the tunnel).

Where the 0.24 ms goes (scan-differenced per component): fine-level
fused smoothing 34 us (2 sweeps), fine residual 20 us, fine
restrict+prolong 87 us, coarse chain ~50 us, correction/bookkeeping the
rest.  The transfer operators dominate — stride-2 slicing and
interleaving on the 128-lane axis relayouts in XLA; a lane-compaction
Pallas kernel could roughly halve them (~25% of a cycle), deliberately
not taken: the cycle is already ~20x cheaper than any single-level
alternative and the kernel would be the most fragile in the repo.

## Direct solver (fd) device cost and exactness

One fd application = six MXU contractions + residual metric: measured
(64-vs-4 scan differencing) **0.48 ms at 128^3, 4.0 ms at 256^3** (~13
TFLOP/s f32 HIGHEST) — one shot to machine-level residual (~2e-8),
versus 29 ms / 510 ms of device time for the eps=1e-5 sor2sma solves
(512^3: one shot in 0.12 s WALL vs sor2sma's 5.69 s, err 2.0e-6).
Its one-shot err_max IS the true discretization error (3.6e-5 at 128^3,
9.0e-6 at 256^3 — exact h^2 scaling), which shows the iterative rows'
err_max at eps=1e-5 is algebraic-error dominated (mg leaves 3.5e-4,
sor2sma 1.5e-2 at 128^3): solver accuracy comparisons at fixed eps
measure the stopping rule, not the discretization.

## MAF point-sweep temporal blocking (guard band lifted, r5)

The per-k resident table's guard band was widened 8 -> 16 rows, admitting
n <= 7 MAF window chains (rbpack._pair_setup); measured on v5e with the
distinct-starts difference harness (us/iter):

| kernel | 128^3 | 256^3 |
|---|---|---|
| maf single | 26.1 | 256.4 |
| maf pair (2x) | 24.9 | 172.5 |
| maf 3x | 26.3 | 209.7 (kt=8) |
| maf 4x | 25.9 | 178.3 |
| maf 6x | 39.2 | no tiling |

The MAF pair update is VPU-bound: blocking past n=2 buys nothing
(n=3/4 flat within noise) and n=6 regresses (window-chain VMEM pressure
forces small kt).  The production dispatch therefore keeps MAF on the
pair (fused_cache.py); the deeper windows remain available and
parity-tested (tests/test_sweeps2x.py n=3/4/6 on stretched metrics).

## Distributed production path (r5)

The multi-chip relaxation path now runs the serial production kernels
per block with communication-avoiding temporal blocking, and the line
solvers dispatch MXU fast-diagonalization on K-unsplit meshes —
per-chip rates, exchange payloads, and the honest config-5 ICI
projection are in SCALING.md ("Per-chip production rates").  Iteration
counts on any mesh equal the serial oracle exactly (owned cells are
bitwise the serial kernel's; tests/test_dist_pack.py, dryrun).

## Line-kernel rooflines (which resource binds; scripts/roofline_lines.py)

Marginal per-iteration device time by long-minus-short scan differencing
(2000-vs-250 sweeps inside single executables, distinct random starts +
host-fetched digest per call, median-of-5).  Attributions: analytic
streams (read x + write x; zero-RHS stream skipped; the temporally-blocked
sor2sma kernels stream HBM once per n iterations — the production
dispatch picks the deepest of n=6/4/3 that fits VMEM) and matmul
flops 2*Kp (const) / 4*Kp
(MAF) per point.  Ceilings assumed: HBM 819 GB/s; MXU f32 via
Precision.HIGHEST ~= 197/8 = 24.6 TFLOP/s (v5e).

| kernel (128^3) | us/iter | Mcells/s | GB/s | %SoL HBM | TFLOP/s | %SoL MXU(f32) | binding |
|---|---|---|---|---|---|---|---|
| sor2sma (nx, n=6) | 13.7 | 146110 | 204 | 25% | 2.8 | 11% | VPU |
| pcr_rb | 24.5 | 81732 | 685 | 84% | 22.4 | 91% | MXU |
| pcr_j_esa | 24.1 | 83087 | 697 | 85% | 22.8 | 93% | MXU |
| pcr_rb_maf | 43.5 | 45973 | 386 | 47% | 25.3 | 103% | MXU |

Reading: **the pcr_rb-vs-sor2sma cells/s gap is inherent on this
hardware.**  pcr_rb runs at ~90% of the f32 MXU ceiling *and* ~85% of
HBM simultaneously — there is no headroom on either resource, and the
temporal-blocking trick that lifted sor2sma past the 1-iteration HBM
speed-of-light only helps kernels whose per-iteration compute fits under
the stream (an n-iteration line kernel would still serialize on the same
MXU work).  sor2sma under deep blocking is VPU-bound — neither modeled
ceiling is near saturation, and n=4/6/8 measure within a few percent —
so ~11-14 us/iter (run-to-run tunnel spread; bench.py median 146-151
Gcells/s) is the point-sweep floor on this chip.  pcr_rb_maf saturates
the MXU outright (the ~3% over 100% is the model ignoring its +6%
packed-row padding), confirming the documented 2x matmul-count bound
below.

## MAF line-solver cost ratio

The inherent bound on pcr_rb_maf vs pcr_rb is 2x: the constant-coefficient
line solve is ONE dense MXU matmul per color (x = T^-1 d, the inverse
premultiplied at build time), while the variable-coefficient
fast-diagonalization solve needs TWO (w = V^-1 d, then x = V(w/(mu+lam)));
the middle diagonal depends on both the line (lambda_ij, lanes) and k
(mu_k, sublanes), so it cannot be folded into either matmul.  At 128^3 the
measured kernel is MXU-bound (~20 TFLOP/s f32 through Precision.HIGHEST),
so a ratio under 2x means the extra matmul partially hides under the HBM
stream — and it is far inside the reference's own MAF cost (66 flop/pt
recomputed metrics vs these precomputed separable tables).
"""


if __name__ == "__main__":
    main()
