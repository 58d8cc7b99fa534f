"""Measured per-phase profiling of solver runs — the PMlib report with real
section timings (PM.start/stop around every kernel and comm call,
cz.h:506-539, report cz_Evaluate.cpp:506-544).

Under jit a solve is one fused executable, so phases are measured by timing
dedicated sub-executables (sweep-only, halo-refresh-only) over a fixed
iteration count and attributing analytic flop/byte costs (the reference
accumulates flops analytically inside each kernel too,
cz_solver.f90:238-241).  COMM bytes use the reference's accounting:
2 (send+recv) x 2 (both directions) x face area x itemsize per axis per
exchange (cz_Evaluate.cpp:181-184).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from .pmlib import CALC, COMM, PerfMonitor, device_hbm_gbps
from .roofline import sweep_cost


def _timed(fn, *args, reps: int = 3):
    """Median wall time of fn(*args) with completion forced."""
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def comm_bytes_per_exchange(block_shape, itemsize: int) -> int:
    """CBrick width-1 6-face halo volume per exchange per device
    (comm_size = 2*2*(xy+yz+xz)*sizeof, cz_Evaluate.cpp:181-184)."""
    lk, li, lj = block_shape
    return 2 * 2 * (lk * li + li * lj + lj * lk) * itemsize


def profile_solve(problem, solver: str, omega: float, iters: int = 50,
                  cmesh=None, impl: str = "auto") -> PerfMonitor:
    """Measure per-phase sections for ``iters`` iterations of ``solver``.

    Serial: sweep kernel vs driver overhead.  Distributed (cmesh given):
    halo exchange (COMM, with bytes), block sweep (CALC), residual
    allreduce (COMM) — measured by timing sub-executables.
    """
    from ..solvers.driver import fixed_sweeps

    g = problem.grid
    itemsize = jnp.dtype(g.dtype).itemsize
    pm = PerfMonitor(hbm_gbps=device_hbm_gbps())
    kind = solver.lower()
    base = kind[:-4] if kind.endswith("_maf") else kind
    flops1, bytes1 = sweep_cost(base, g.shape_kij, itemsize)

    from ..solvers.steps import parse_name

    k, is_maf = parse_name(solver)

    if cmesh is None:
        from ..solvers.api import _can_fuse

        step = None
        if _can_fuse(problem, k, is_maf, impl):
            from ..solvers.fused_cache import get_fused_step, pad_unpad

            step = get_fused_step(
                k, g, omega, problem.mc if is_maf else None,
                jax.default_backend() != "tpu",
                b_is_zero=problem.rhs_is_inner_zero(),
            )
        if step is not None:
            pad, _ = pad_unpad(k, g, step)
            x, b = pad(problem.x0), pad(problem.rhs)
        else:  # no viable tiling / not fuseable — profile the XLA step
            from ..solvers.fused_cache import get_jnp_step

            step = get_jnp_step(problem, solver, omega)
            x, b = problem.x0, problem.rhs
        run = jax.jit(lambda x, b: fixed_sweeps(step, x, b, iters))
        t_sweeps = _timed(run, x, b)
        # fixed_sweeps rounds UP to whole multi-iteration calls
        # (iters_per_call) — attribute to the sweeps actually executed
        ipc = getattr(step, "iters_per_call", 1)
        n_exec = -(-iters // ipc) * ipc
        pm.add(f"{solver}_sweep", t_sweeps, kind=CALC,
               flops=flops1 * n_exec, bytes=bytes1 * n_exec, calls=n_exec)

        from ..solvers.driver import run_iterative

        t0 = time.perf_counter()
        r = run_iterative(step, x, b, g.res_normal, iters, eps=0.0)
        jax.block_until_ready(r.x)
        t_loop = time.perf_counter() - t0
        pm.add("driver_overhead", max(t_loop - t_sweeps, 0.0), kind=CALC,
               calls=iters)
        return pm

    # ---- distributed ------------------------------------------------------
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import dist_fused
    from ..parallel.dist import make_dist_step
    from ..parallel.mesh import AXES, FIELD_SPEC

    dz, dx, dy = cmesh.div
    bs = (g.nk // dz, g.ni // dx, g.nj // dy)
    cbytes = comm_bytes_per_exchange(bs, itemsize)

    # fused-path eligibility mirrors parallel/api.py::solve_dist; the
    # canonical kind (not the raw CLI name) selects the kernel, and line
    # kinds use the line-block state layout + line ghost refresh
    line = k in ("pcr", "pcr_rb")
    step = None
    on_tpu = jax.default_backend() == "tpu"
    if (
        (impl == "pallas" or (impl != "jnp" and on_tpu))
        and g.dtype == jnp.float32
        and k in ("jacobi", "sor2sma", "pcr", "pcr_rb")
        and (not is_maf or line)
    ):
        step = dist_fused.make_dist_fused_step(
            problem, cmesh, k, omega,
            b_is_zero=problem.rhs_is_inner_zero(),
            interpret=not on_tpu,
        )
    if step is not None:
        to_state = (
            dist_fused.to_line_block_state if line
            else dist_fused.to_block_state
        )
        if line:
            import functools

            # the line state's J ghost-lane count follows the mesh
            # division (gj=0 on Y-unsplit meshes)
            refresh_fn = functools.partial(
                dist_fused._refresh_ghosts_line,
                gj=dist_fused._line_gj(cmesh),
            )
        else:
            refresh_fn = dist_fused._refresh_ghosts
        x = to_state(cmesh, problem.x0)
        b = to_state(cmesh, problem.rhs)
        refresh = shard_map(
            lambda xp: refresh_fn(xp, bs),
            mesh=cmesh.mesh, in_specs=(FIELD_SPEC,), out_specs=FIELD_SPEC,
        )
    else:
        step = make_dist_step(problem, cmesh, solver, omega)
        x = cmesh.shard(problem.x0)
        b = cmesh.shard(problem.rhs)
        from ..parallel.halo import exchange_halo

        refresh = shard_map(
            lambda xb: exchange_halo(xb)[1:-1, 1:-1, 1:-1],
            mesh=cmesh.mesh, in_specs=(FIELD_SPEC,), out_specs=FIELD_SPEC,
        )

    run = jax.jit(lambda x, b: fixed_sweeps(step, x, b, iters))
    t_step = _timed(run, x, b)

    refresh_n = jax.jit(
        lambda x: jax.lax.fori_loop(0, iters, lambda _, xx: refresh(xx), x)
    )
    t_halo = _timed(refresh_n, x)

    psum_n = shard_map(
        lambda v: jax.lax.fori_loop(
            0, iters, lambda _, a: jax.lax.psum(a * 0.5, AXES), v
        ),
        mesh=cmesh.mesh, in_specs=(P(),), out_specs=P(),
    )
    t_psum = _timed(jax.jit(psum_n), jnp.ones(()))

    n_exch = 2 if k in ("sor2sma", "pcr_rb") else 1  # per-color refresh
    pm.add("halo_exchange", t_halo * n_exch, kind=COMM,
           bytes=cbytes * iters * n_exch, calls=iters * n_exch)
    pm.add("residual_allreduce", t_psum, kind=COMM,
           bytes=4 * 2 * iters, calls=iters)
    pm.add(f"{kind}_block_sweep",
           max(t_step - t_halo * n_exch - t_psum, 0.0), kind=CALC,
           flops=flops1 * iters, bytes=bytes1 * iters, calls=iters)
    return pm
