"""Experiment: can the dist packed window chain run n=5/6 at 256^3
blocks (split zx) under a raised VMEM budget, and does it pay?

SCALING.md's per-chip table runs n=4 at 256^3 blocks because the
two-pass sizing in dist_rbpack.make_dist_packed_sweepnx tops out at a
96 MB scratch budget; n=6 needs kt=14 (Ke=280 divisor) at ~102 MB of
declared DMA scratch.  This probes explicit (n, kt, vmem) points on the
bench chip with the scaling_tpu.py timing method.

    python scripts/exp_dist_n6.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from scaling_tpu import measure  # noqa: E402  (sibling script)

from cubez_tpu import Problem
from cubez_tpu.parallel import dist_pack
from cubez_tpu.parallel.mesh import make_mesh
from cubez_tpu.pallas_kernels import dist_rbpack


def main():
    gshape = (256, 256, 256)
    split = (True, True, False)
    prob = Problem.poisson_cube(gshape, dtype=jnp.float32)
    cm = make_mesh(prob.grid.shape_kij, devices=jax.devices()[:1],
                   div=(1, 1, 1))
    cells = 256 ** 3

    for n, kt, vmem in (
        (4, None, None),          # current production point (reference)
        (5, 12, 112 << 20),       # Ke=276: kt in {12, 23}
        (6, 14, 118 << 20),       # Ke=280: kt=14 -> ~102 MB DMA scratch
        (6, 14, 124 << 20),
    ):
        # build the kernel directly so kt/vmem can be pinned
        bs = prob.grid.shape_kij
        kern = dist_rbpack.make_dist_packed_sweepnx(
            bs, gshape, jnp.float32, omega=1.5, n=n, split=split,
            kt=kt, vmem_limit_bytes=vmem, interpret=False,
        )
        if kern is None:
            print(f"n={n} kt={kt} vmem={vmem and vmem >> 20}MB: no kernel")
            continue
        # measure the raw kernel through a 1-block wrapper (the dist
        # step's internal sizing cannot pin kt/vmem)
        from jax import lax, shard_map
        from jax.sharding import PartitionSpec as P

        from cubez_tpu.parallel.mesh import FIELD_SPEC

        hs = kern.hs
        _, _, _, I2e, I2ep, _ = dist_rbpack.ext_dims(bs, hs)

        def body(xp, bp):
            del bp
            offs = jnp.zeros((1, 3), jnp.int32)
            xp = dist_pack.exchange_ghosts_packed(xp, bs, hs, I2e, I2ep)
            xp, r2 = kern(xp, offs)
            return xp, lax.psum(r2, ("z", "x", "y"))

        fn = shard_map(body, mesh=cm.mesh,
                       in_specs=(FIELD_SPEC, FIELD_SPEC),
                       out_specs=(FIELD_SPEC, P()), check_vma=False)
        xs = dist_pack.to_packed_state(cm, prob.x0, hs)
        bs_state = dist_pack.to_packed_state(cm, prob.rhs, hs)
        try:
            per = measure(lambda x, b: fn(x, b), xs, bs_state,
                          n, 60, 480)
        except Exception as e:  # compile OOM etc.
            print(f"n={n} kt={kern.kt} "
                  f"vmem={vmem and vmem >> 20}MB: FAILED {type(e).__name__}:"
                  f" {str(e)[:200]}")
            continue
        print(f"n={n} kt={kern.kt} vmem={vmem and vmem >> 20}MB: "
              f"{per*1e6:.1f} us/iter {cells/per/1e9:.1f} Gcells/s")


if __name__ == "__main__":
    main()
