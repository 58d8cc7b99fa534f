"""Per-chip production rates of the MULTI-CHIP code paths, measured on
the single bench chip — the measured inputs of SCALING.md's ICI
projection.

    python scripts/scaling_tpu.py        # on the TPU

A 1x1x1 mesh with a forced ``split`` runs the EXACT multi-chip per-block
program (extended packed layout, redundant ghost-ring compute, dist
masks, window chain) minus the collectives, so every compute-side input
of the projection is a measurement, not a model.  The collectives'
payloads (slab bytes) are computed analytically alongside.

Timing uses bench.py's method: distinct random starts per call (the
tunnel serves identical-input calls from cache), host-fetched whole-sum
digests (strided digests of Pallas outputs crash the worker at some
shapes), and long-minus-short differencing.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

REPS = 5


def measure(step, x0, b0, ipc, iters_short=60, iters_long=480):
    key = jax.random.PRNGKey(0)
    starts = [
        x0 + jax.random.normal(k, x0.shape, x0.dtype)
        for k in jax.random.split(key, 2 * REPS + 2)
    ]
    jax.block_until_ready(starts)

    def timed(iters, ss):
        def loop(x, b):
            def bd(_, xx):
                xx, _ = step(xx, b)
                return xx
            return jnp.sum(lax.fori_loop(0, iters, bd, x))
        run = jax.jit(loop)
        _ = float(run(ss[-1], b0))
        ts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            _ = float(run(ss[i], b0))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    ns = max(1, iters_short // ipc)
    nl = max(ns + 1, iters_long // ipc)
    per = (timed(nl, starts[: REPS + 1]) - timed(ns, starts[REPS + 1 :])) / (
        (nl - ns) * ipc
    )
    return per


def main():
    from cubez_tpu import Problem
    from cubez_tpu.parallel import dist_fused, dist_pack
    from cubez_tpu.parallel.mesh import make_mesh
    from cubez_tpu.pallas_kernels import dist_rbpack
    from cubez_tpu.solvers.fused_cache import get_fused_step

    print("# per-chip production rates (1x1x1 mesh, forced multi-chip "
          "layout)\n")

    # ---- point sweeps: serial baseline + dist-packed per block shape ----
    for gshape, split, label in (
        ((128,) * 3, None, "serial 128^3"),
        ((256,) * 3, None, "serial 256^3"),
        ((128,) * 3, (True, True, False), "block 128^3 split zx"),
        ((256,) * 3, (True, True, False), "block 256^3 split zx"),
        ((256,) * 3, (True, True, True), "block 256^3 split zxy"),
        # BASELINE config 5: 512^3 over 8 chips as a (4,2,1) mesh
        ((128, 256, 512), (True, True, False),
         "block (128,256,512) split zx  [512^3 / (4,2,1)]"),
    ):
        nk, ni, nj = gshape
        prob = Problem.poisson_cube((ni, nj, nk), dtype=jnp.float32)
        cells = nk * ni * nj
        # the long-minus-short difference must dwarf the tunnel's +-3 ms
        # jitter: small grids need thousands of sweeps per call
        short, long_ = (500, 4000) if cells <= 128**3 * 2 else (60, 480)
        if split is None:
            s = get_fused_step("sor2sma", prob.grid, 1.5, None, False,
                               b_is_zero=True)
            per = measure(s, s.pad(prob.x0), s.pad(prob.rhs),
                          getattr(s, "iters_per_call", 1), short, long_)
            print(f"{label}: ipc={getattr(s, 'iters_per_call', 1)} "
                  f"{per*1e6:.1f} us/iter {cells/per/1e9:.1f} Gcells/s")
            continue
        cm = make_mesh(prob.grid.shape_kij, devices=jax.devices()[:1],
                       div=(1, 1, 1))
        st = dist_pack.make_dist_packed_step(prob, cm, 1.5, split=split)
        if st is None:
            print(f"{label}: no dist-packed tiling")
            continue
        xs = dist_pack.to_packed_state(cm, prob.x0, st.hs)
        bs = dist_pack.to_packed_state(cm, prob.rhs, st.hs)
        per = measure(st, xs, bs, st.iters_per_call, short, long_)
        n = st.iters_per_call
        # analytic exchange payload per window (both directions, split
        # axes only; verbatim packed slabs)
        lk, li, lj = prob.grid.shape_kij
        hs = st.hs
        _, _, _, I2e, I2ep, Jep = dist_rbpack.ext_dims(
            prob.grid.shape_kij, hs)
        Kp4 = lk + 2 * hs[0] + 4
        vol = 0
        if hs[0]:
            vol += 2 * hs[0] * 2 * I2ep * Jep * 4
        if hs[1]:
            vol += 2 * hs[1] * Kp4 * Jep * 4  # hx/2 pair rows x 2 halves
        if hs[2]:
            vol += 2 * hs[2] * Kp4 * 2 * I2ep * 4
        print(f"{label}: n={n} hs={hs} {per*1e6:.1f} us/iter "
              f"{cells/per/1e9:.1f} Gcells/s; exchange payload "
              f"{vol/1e6:.1f} MB per {n} iters "
              f"({vol/n/1e6:.2f} MB/iter)")

    # ---- line solvers: dist fastdiag vs PCR form (K-unsplit) -----------
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from cubez_tpu.parallel.mesh import FIELD_SPEC
    from cubez_tpu.pallas_kernels.dist_pcr import make_block_pcr

    N = 128
    prob = Problem.poisson_cube(N, dtype=jnp.float32)
    cm = make_mesh((N, N, N), devices=jax.devices()[:1], div=(1, 1, 1))
    s = get_fused_step("pcr_rb", prob.grid, 1.5, None, False,
                       b_is_zero=True)
    per = measure(s, s.pad(prob.x0), s.pad(prob.rhs), 1, 200, 1600)
    print(f"\nserial rblines 128^3: {per*1e6:.0f} us/iter "
          f"{N**3/per/1e9:.1f} Gcells/s")
    # gj=0: the 1x1x1 mesh leaves Y unsplit, so the line state carries no
    # J ghost lanes (to_line_block_state derives this from the division)
    # — the (1,n,1) production configuration, 128 lanes instead of 256
    for solver in ("fastdiag", "pcr"):
        sweeps = [
            make_block_pcr((N, N, N), prob.grid.shape_kij, jnp.float32,
                           omega=1.5, color=c, solver=solver,
                           gj=0, b_is_zero=True)
            for c in (0, 1)
        ]
        if any(x is None for x in sweeps):
            print(f"dist line {solver}: no kernel")
            continue

        def body(xp, bp, sweeps=tuple(sweeps)):
            offs = jnp.zeros((1, 3), jnp.int32)
            r2 = jnp.float32(0)
            for sw in sweeps:
                xp, r2c = sw(xp, bp, offs)
                r2 = r2 + r2c
            return xp, lax.psum(r2, ("z", "x", "y"))

        fn = shard_map(body, mesh=cm.mesh,
                       in_specs=(FIELD_SPEC, FIELD_SPEC),
                       out_specs=(FIELD_SPEC, P()), check_vma=False)
        xs = dist_fused.to_line_block_state(cm, prob.x0)
        bs = dist_fused.to_line_block_state(cm, prob.rhs)
        per = measure(lambda x, b, fn=fn: fn(x, b), xs, bs, 1, 40, 280)
        print(f"dist line {solver} 128^3 block: {per*1e6:.0f} us/iter "
              f"{N**3/per/1e9:.1f} Gcells/s")


if __name__ == "__main__":
    main()
